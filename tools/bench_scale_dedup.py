#!/usr/bin/env python
"""N→4N scaling record for the DEDUP family (round-5 verdict item 2).

All four round-4 local-cluster scaling records measure the extraction
job (the skew storm adds a rollup+SMJ). This tool measures the
shuffle-heaviest dedup surface — the MinHash LSH band build + pair
join (q_minhash_lsh_pairs) — end-to-end on a corpus DERIVED FROM the
960k-turn scaling input: extract_turns over the t192 transcripts, one
(doc_id, text) row per non-empty extracted turn, exact-deduped first
(the stage order every real pipeline uses before banding; it also
keeps band buckets honest — K byte-identical turns would otherwise
manufacture K² pairs that measure the synth's repetitiveness, not the
join).

Topology matches bench.py's scaling path exactly: real executor
processes (local-cluster[E,1,2560], 2 GiB heap each), package shipped
via addPyFile as spark-submit --py-files would, 3 back-to-back (N,4N)
PAIRS so a degraded hypervisor window hits both sides of a pair alike,
median pair = the record.

Output: one JSON line per run + a summary line (goes to BENCH.md).

Env: SPARK_GRAFT_SCALE_N  (default 2 → 4N=8)
     SPARK_GRAFT_DEDUP_QUERY (default q_minhash_lsh_pairs)
"""

from __future__ import annotations

import json
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.session import get_spark  # noqa: E402

SCALE_TR = "/tmp/spark_graft_bench/root_testdata_sf0.1_t192_scaling.parquet"
FULL_CORPUS = "/tmp/spark_graft_bench/dedup_corpus_t192/documents.parquet"
WARM_SF = "/root/testdata/sf0.01"
N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
QUERY = os.environ.get("SPARK_GRAFT_DEDUP_QUERY", "q_minhash_lsh_pairs_capped")
# the full 568k-survivor corpus makes the N=2 side a ~30-minute job —
# far more data than a THROUGHPUT RATIO needs. Default: a
# deterministic 1-in-4 doc_id sample (~142k turn-docs, still minutes
# per side); SPARK_GRAFT_DEDUP_SAMPLE_MOD=1 runs the full corpus
SAMPLE_MOD = int(os.environ.get("SPARK_GRAFT_DEDUP_SAMPLE_MOD", "4"))
CORPUS = (
    FULL_CORPUS
    if SAMPLE_MOD == 1
    else (
        "/tmp/spark_graft_bench/"
        f"dedup_corpus_t192_s{SAMPLE_MOD}/documents.parquet"
    )
)


def build_corpus() -> None:
    if os.path.exists(os.path.join(FULL_CORPUS, "_SUCCESS")):
        return
    from pyspark.sql.window import Window

    from documentai_ocr_spark.extract import extract_turns
    from documentai_ocr_spark.queries.util import content_hash_col
    from documentai_ocr_spark.synth import transcripts_from_documents

    spark = get_spark(app_name="dedup-corpus-build", cores=16)
    if not os.path.exists(os.path.join(SCALE_TR, "_SUCCESS")):
        transcripts_from_documents(
            spark, "/root/testdata/sf0.1", turns_per_doc=192
        ).repartition(64).write.mode("overwrite").parquet(SCALE_TR)
    ext = extract_turns(spark.read.parquet(SCALE_TR))
    docs = (
        ext.where(F.length("text") > 0)
        .select(
            (
                F.regexp_extract("conv_id", r"(\d+)", 1).cast("long") * 1000
                + F.col("turn_idx")
            ).alias("doc_id"),
            "text",
        )
        .withColumn("h", content_hash_col())
        .withColumn(
            "mind", F.min("doc_id").over(Window.partitionBy("h"))
        )
        .where(F.col("doc_id") == F.col("mind"))
        .select("doc_id", "text")
    )
    docs.repartition(64).write.mode("overwrite").parquet(FULL_CORPUS)
    spark.stop()
    time.sleep(2)


def build_sample() -> None:
    if SAMPLE_MOD == 1 or os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(app_name="dedup-corpus-sample", cores=16)
    (
        spark.read.parquet(FULL_CORPUS)
        .where((F.col("doc_id") % SAMPLE_MOD) == 0)
        .repartition(64)
        .write.mode("overwrite")
        .parquet(CORPUS)
    )
    spark.stop()
    time.sleep(2)


def main() -> int:
    build_corpus()
    build_sample()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = "/tmp/documentai_ocr_spark_dedupscale.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(
            os.path.join(repo, "documentai_ocr_spark")
        ):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, repo))

    corpus_dir = os.path.dirname(CORPUS)
    n_big = N_SMALL * 4

    def one_run(execs: int) -> dict:
        from documentai_ocr_spark.queries import QUERIES

        s = get_spark(
            app_name=f"dedup-scale-lc{execs}",
            cores=execs,
            shuffle_partitions=execs * 2,
            master=f"local-cluster[{execs},1,2560]",
            extra={
                "spark.executor.memory": "2g",
                "spark.sql.files.maxPartitionBytes": "4m",
                "spark.sql.files.openCostInBytes": "1m",
            },
        )
        s.sparkContext.addPyFile(zip_path)
        # warm pass at sf0.01: JVM + python workers + code paths
        QUERIES[QUERY](s, WARM_SF).agg(F.count(F.lit(1))).collect()
        n_docs = s.read.parquet(CORPUS).count()
        t0 = time.time()
        n_pairs = (
            QUERIES[QUERY](s, corpus_dir)
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
        wall = time.time() - t0
        s.stop()
        time.sleep(2)
        return {
            "executors": execs,
            "wall_sec": round(wall, 1),
            "docs": int(n_docs),
            "pairs": int(n_pairs),
            "docs_per_sec": round(n_docs / wall, 1),
        }

    pairs = []
    for _ in range(3):
        rn = one_run(N_SMALL)
        rb = one_run(n_big)
        eff = round(
            (rb["docs_per_sec"] / rn["docs_per_sec"]) / (n_big / N_SMALL), 3
        )
        rec = {"n": rn, "4n": rb, "efficiency": eff}
        pairs.append(rec)
        print(json.dumps(rec), flush=True)
    med = sorted(pairs, key=lambda p: p["efficiency"])[len(pairs) // 2]
    print(
        json.dumps(
            {
                "metric": "dedup_scaling",
                "query": QUERY,
                "mode": "local-cluster",
                "executors_n": N_SMALL,
                "executors_4n": n_big,
                "docs": med["n"]["docs"],
                "pairs_found": med["n"]["pairs"],
                "docs_per_sec_n": med["n"]["docs_per_sec"],
                "docs_per_sec_4n": med["4n"]["docs_per_sec"],
                "efficiency": med["efficiency"],
                "efficiency_pairs": [p["efficiency"] for p in pairs],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
