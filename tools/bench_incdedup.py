#!/usr/bin/env python
"""Rolling-ingest dedup at 10× scale (round-5, follows verdict item 3).

Drives incdedup.dedup_increment over the 10× documents table (50k
docs, tools/bench_memory.py must have built it) as a 3-batch rolling
ingest into a fresh state dir, then checks the union against the
one-shot fold — the same equality tests/test_incdedup.py pins at
sf0.001, here executed at 10× with walls recorded. Also reports the
state-table sizes (the whole point: the accumulated corpus is
represented by O(survivors) signature rows, not text).

Prints one JSON line per batch + a summary line (goes to BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_memory import SF1_DIR  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.incdedup import (  # noqa: E402
    dedup_increment,
    read_survivors,
    rolling_fold,
)
from documentai_ocr_spark.session import get_spark  # noqa: E402

STATE = "/tmp/spark_graft_incdedup_10x"


def main() -> int:
    if not os.path.exists(os.path.join(SF1_DIR, "_DONE")):
        print(f"10x dir {SF1_DIR} not built — run tools/bench_memory.py first")
        return 2
    shutil.rmtree(STATE, ignore_errors=True)
    spark = get_spark(app_name="bench-incdedup", cores=32,
                      shuffle_partitions=64)
    docs = (
        spark.read.parquet(f"{SF1_DIR}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    n = docs.count()
    walls = []
    for k in range(3):
        bk = docs.where((F.col("doc_id") % 3).cast("int") == k)
        t0 = time.time()
        st = dedup_increment(spark, bk, STATE, f"b{k}")
        w = round(time.time() - t0, 2)
        walls.append(w)
        print(json.dumps({"batch": k, "wall_sec": w, **st}), flush=True)

    t0 = time.time()
    inc = {
        (r["batch_seq"], r["doc_id"])
        for r in read_survivors(spark, STATE).collect()
    }
    one = {
        (r["batch_seq"], r["doc_id"])
        for r in rolling_fold(docs, 3).collect()
    }
    fold_wall = round(time.time() - t0, 2)
    sig_rows = sum(
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{STATE}/{sub}")
        .count()
        for sub in ("exact", "signatures")
    )
    print(
        json.dumps(
            {
                "metric": "incdedup_10x",
                "docs": int(n),
                "batch_walls_sec": walls,
                "survivors": len(inc),
                "equals_oneshot_fold": inc == one,
                "fold_wall_sec": fold_wall,
                "state_signature_rows": int(sig_rows),
            }
        )
    )
    spark.stop()
    return 0 if inc == one and len(inc) > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
