#!/usr/bin/env python
"""Tight-memory spill evidence (round-5 verdict item 1).

The round-4 10×-scale run proved ZERO spill on a 128 GiB box — which
cannot distinguish "spills gracefully" from "would OOM on a tight
executor". This tool re-runs the heavy dedup list on the 10× tables
(tools/bench_memory.py must have built them) under DELIBERATELY SMALL
executors — real executor processes, ``local-cluster[2,1,<mem>]``
with a ~1 GiB heap each, package shipped via addPyFile exactly as
spark-submit --py-files would — sized so the multi-GiB sorts CANNOT
fit in execution memory and MUST spill.

Pass criteria (the claim BENCH.md previously made only in prose):
  * every query completes (no OOM / executor loss),
  * diskBytesSpilled > 0 somewhere in the list (the sorts actually
    exceeded execution memory — the run was genuinely tight),
  * one SPILLED, ORACLED query (q_substring_dedup) is re-gated
    value-equal against DuckDB on the same 10× input — spill did not
    corrupt results.

Output: one JSON line per query + a summary line; table goes to
BENCH.md by hand (a one-shot record, not a per-round gate).

Env: SPARK_GRAFT_SF1_DIR   (default /tmp/spark_graft_sf1)
     SPARK_GRAFT_SPILL_MEM executor memory MiB (default 1024)
     SPARK_GRAFT_SPILL_QUERIES comma list (default the heavy trio)
"""

from __future__ import annotations

import json
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from bench_memory import SF1_DIR, _stage_rows  # noqa: E402
from check_queries import TABLES, to_multiset  # noqa: E402

from documentai_ocr_spark.session import get_spark  # noqa: E402

MEM_MB = int(os.environ.get("SPARK_GRAFT_SPILL_MEM", "1024"))
# FEW, LARGE shuffle partitions are the tightening lever: one core per
# executor means a sort task owns the whole ~0.43 GiB execution pool,
# so the partition count controls how many GiB each sort must order
SHUF_PARTS = int(os.environ.get("SPARK_GRAFT_SPILL_PARTS", "4"))
QUERIES_ENV = os.environ.get(
    "SPARK_GRAFT_SPILL_QUERIES",
    "q_substring_dedup,q_simhash_pairs_banded,x_semdedup",
)
# every q_* (oracled) query in the list is re-gated value-equal vs
# DuckDB on the same 10× input after the tight-memory run — the pass
# criterion requires at least one of the SPILLED ones among them


def main() -> int:
    if not os.path.exists(os.path.join(SF1_DIR, "_DONE")):
        print(f"10x dir {SF1_DIR} not built — run tools/bench_memory.py first")
        return 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = "/tmp/documentai_ocr_spark_spill.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(
            os.path.join(repo, "documentai_ocr_spark")
        ):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, repo))

    # worker memory = executor heap + overhead headroom; the heap is
    # what bounds execution memory (spark.memory.fraction of
    # heap − 300 MiB reserve), so 1024 MiB heap ≈ 430 MiB execution
    # memory per executor — the multi-GiB sorts must spill
    spark = get_spark(
        app_name="bench-spill",
        cores=2,
        shuffle_partitions=SHUF_PARTS,
        master=f"local-cluster[2,1,{MEM_MB + 512}]",
        extra={
            "spark.executor.memory": f"{MEM_MB}m",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.addPyFile(zip_path)
    store = spark._jsc.sc().statusStore()
    jvm = spark._jvm

    from documentai_ocr_spark.queries import ORACLES, QUERIES

    results = []
    kept: dict[str, tuple[list, list]] = {}  # oracled → (rows, cols)
    for name in QUERIES_ENV.split(","):
        name = name.strip()
        before = _stage_rows(store, jvm)
        t0 = time.time()
        df = QUERIES[name](spark, SF1_DIR)
        rows = df.collect()
        wall = time.time() - t0
        after = _stage_rows(store, jvm)
        new = {k: v for k, v in after.items() if k not in before}
        row = {
            "query": name,
            "wall_sec": round(wall, 2),
            "rows": len(rows),
            "spill_mem_bytes": int(sum(v[0] for v in new.values())),
            "spill_disk_bytes": int(sum(v[1] for v in new.values())),
            "peak_exec_mem_bytes": int(
                max((v[2] for v in new.values()), default=0)
            ),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        if name in ORACLES:
            kept[name] = ([tuple(r) for r in rows], df.columns)
    spark.stop()

    con = duckdb.connect()
    for t in TABLES:
        # the 10× tables are Spark-written parquet DIRECTORIES, not
        # single files — glob the part files for DuckDB
        p = f"{SF1_DIR}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    gate = {}
    for name, (srows, scols) in kept.items():
        rel = con.sql(ORACLES[name])
        gate[name] = to_multiset(srows, [c.lower() for c in scols]) == (
            to_multiset(rel.fetchall(), [c.lower() for c in rel.columns])
        )

    total_spill = sum(r["spill_disk_bytes"] for r in results)
    spilled = [r["query"] for r in results if r["spill_disk_bytes"] > 0]
    summary = {
        "metric": "tight_memory_spill",
        "executors": 2,
        "executor_mem_mb": MEM_MB,
        "shuffle_partitions": SHUF_PARTS,
        "queries": len(results),
        "total_disk_spill_bytes": int(total_spill),
        "spilled_queries": spilled,
        "oom": False,  # reaching here means every query completed
        "oracle_equal": gate,
        "spilled_and_oracle_equal": sorted(
            n for n in spilled if gate.get(n) is True
        ),
    }
    print(json.dumps(summary))
    ok = (
        total_spill > 0
        and all(gate.values())
        and len(summary["spilled_and_oracle_equal"]) > 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
