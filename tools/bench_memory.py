#!/usr/bin/env python
"""Memory-pressure evidence at 10× bench scale (round-4 verdict
item 4).

Synthesizes an sf1-equivalent directory by replicating every sf0.1
table 10× with key-column offsets (FK consistency preserved:
customer/orders/lineitem/part/supplier keys all shift by the same
rep × stride, so join fan-outs scale honestly; region/nation stay the
5/25-row dims they are at every TPC-H SF). documents 5k→50k rows,
lineitem 600k→6M, events 100k→1M; the extraction input is the 50k-doc
table at 192 turns/doc = 9.6M turns.

Then runs the frozen BENCH_QUERIES headline list ONCE at local[32]
and records, per query, from the Spark status store (AppStatusStore —
the UI/REST numbers, read in-process):

  * wall seconds
  * memoryBytesSpilled / diskBytesSpilled (delta over the query's
    stages)
  * max per-stage peakExecutionMemory

No OOM and spill confined to the sort-heavy dedup paths is the pass
criterion — this is what catches a hidden corpus-sized buffer the
plan TEXT cannot show.

Output: one JSON line per query + a summary line. Results table goes
to BENCH.md by hand (the numbers are a one-shot record, not a
per-round gate).

Env: SPARK_GRAFT_SRC_SF (default /root/testdata/sf0.1),
     SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.session import get_spark  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPS = 10

# key columns to offset per table: (column, stride-source-table-key)
# stride = max(key)+1 of the NAMED source column in the source data,
# so every FK family shifts together
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "c_custkey")],
    "supplier": [("s_suppkey", "s_suppkey")],
    "part": [("p_partkey", "p_partkey")],
    "orders": [("o_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "p_partkey"),
        ("l_suppkey", "s_suppkey"),
    ],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}
TABLES = list(OFFSETS)


# bump to force a rebuild of an existing /tmp dir when the synthesis
# changes (v2: perturbed replicas — see below)
BUILD_VER = "v2-perturbed"


def build_sf1(spark) -> None:
    done = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(done) and open(done).read().strip() == BUILD_VER:
        return
    strides: dict[str, int] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        for _col, src_key in OFFSETS[t]:
            if src_key not in strides:
                src_t = {
                    "c_custkey": "customer",
                    "s_suppkey": "supplier",
                    "p_partkey": "part",
                    "o_orderkey": "orders",
                    "event_id": "events",
                    "user_id": "events",
                    "doc_id": "documents",
                    "vec_id": "embeddings",
                }[src_key]
                m = (
                    spark.read.parquet(f"{SRC_SF}/{src_t}.parquet")
                    .agg(F.max(src_key))
                    .collect()[0][0]
                )
                strides[src_key] = int(m) + 1
    for t in TABLES:
        df = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        if not OFFSETS[t]:
            out = df  # bounded dim: same at every SF
        else:
            rep = df.crossJoin(
                spark.range(REPS).select(F.col("id").alias("_rep"))
            )
            for col, src_key in OFFSETS[t]:
                rep = rep.withColumn(
                    col,
                    (
                        F.col(col) + F.col("_rep") * F.lit(strides[src_key])
                    ).cast(dict(df.dtypes)[col]),
                )
            # round-4 verdict "what's wrong" #2: VERBATIM replication
            # gives every document ~REPS exact copies, so near-dup
            # pair density inflates quadratically and the 10× walls
            # of the banded-pair queries read superlinear. Perturb
            # the non-zero reps deterministically (rep 0 stays the
            # source bytes): documents get a per-rep word-prefix tag
            # (every shingle/hash distinct across reps, so total pair
            # count = REPS × the source's — linear), embeddings get a
            # ±2.5%-per-dim hash jitter (duplicate vectors decohere
            # instead of forming REPS-sized cosine-1 clumps).
            if t == "documents":
                tag = F.concat(
                    F.lit("r"), F.col("_rep").cast("string"), F.lit("_$1")
                )
                rep = rep.withColumn(
                    "text",
                    F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                        F.regexp_replace(F.col("text"), r"(\S+)", tag)
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings":
                rep = rep.withColumn(
                    "embedding",
                    F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                        F.expr(
                            "transform(embedding, (x, i) -> cast(x + 0.05 *"
                            " (pmod(_rep * 2654435761 + i * 40503, 97)"
                            " / 97.0 - 0.5) as float))"
                        )
                    ),
                )
            out = rep.drop("_rep")
        out.repartition(16 if OFFSETS[t] else 1).write.mode(
            "overwrite"
        ).parquet(f"{SF1_DIR}/{t}.parquet")
    open(os.path.join(SF1_DIR, "_DONE"), "w").write(BUILD_VER + "\n")


def _stage_rows(store, jvm):
    empty = jvm.java.util.Collections.emptyList()
    ds = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    sl = store.stageList(empty, *ds)
    out = {}
    for i in range(sl.size()):
        s = sl.apply(i)
        out[(s.stageId(), s.attemptId())] = (
            s.memoryBytesSpilled(),
            s.diskBytesSpilled(),
            s.peakExecutionMemory(),
        )
    return out


def main() -> None:
    build_spark = get_spark(app_name="sf1-build", cores=16)
    build_sf1(build_spark)
    build_spark.stop()
    time.sleep(2)

    spark = get_spark(
        app_name="bench-memory",
        cores=32,
        shuffle_partitions=64,
        extra={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.files.openCostInBytes": "1m",
            # keep MORE stages in the store than default so no query's
            # stages age out mid-measurement
            "spark.ui.retainedStages": "5000",
        },
    )
    store = spark._jsc.sc().statusStore()
    jvm = spark._jvm

    import bench  # the frozen headline list lives there

    from documentai_ocr_spark.extract import extract_turns
    from documentai_ocr_spark.queries import QUERIES
    from documentai_ocr_spark.synth import transcripts_from_documents

    results = []

    def record(name, fn):
        before = _stage_rows(store, jvm)
        t0 = time.time()
        fn()
        wall = time.time() - t0
        after = _stage_rows(store, jvm)
        new = {k: v for k, v in after.items() if k not in before}
        spill_mem = sum(v[0] for v in new.values())
        spill_disk = sum(v[1] for v in new.values())
        peak = max((v[2] for v in new.values()), default=0)
        row = {
            "query": name,
            "wall_sec": round(wall, 2),
            "spill_mem_bytes": int(spill_mem),
            "spill_disk_bytes": int(spill_disk),
            "peak_exec_mem_bytes": int(peak),
            "n_stages": len(new),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # the 9.6M-turn extraction first (the headline at 10×)
    tr_path = os.path.join(SF1_DIR, "transcripts_t192.parquet")
    if not os.path.exists(os.path.join(tr_path, "_SUCCESS")):
        transcripts_from_documents(
            spark, SF1_DIR, turns_per_doc=192
        ).repartition(256).write.mode("overwrite").parquet(tr_path)

    def _extract():
        ext = extract_turns(spark.read.parquet(tr_path))
        ext.agg(
            F.count(F.lit(1)), F.sum(F.length("text")), F.sum("n_spans")
        ).collect()

    record("extract_9p6M_turns", _extract)

    for name in bench.BENCH_QUERIES:
        record(name, lambda n=name: QUERIES[n](spark, SF1_DIR).collect())

    total_spill = sum(r["spill_disk_bytes"] for r in results)
    spilled = [r["query"] for r in results if r["spill_disk_bytes"] > 0]
    print(
        json.dumps(
            {
                "metric": "memory_at_10x",
                "queries": len(results),
                "total_disk_spill_bytes": int(total_spill),
                "spilled_queries": spilled,
                "max_peak_exec_mem": max(
                    r["peak_exec_mem_bytes"] for r in results
                ),
                "oom": False,
            }
        )
    )


if __name__ == "__main__":
    main()
