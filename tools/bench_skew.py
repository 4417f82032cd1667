#!/usr/bin/env python
"""Skew-storm scaling record (round-4 verdict item 3).

Every scaling number before round 4 was measured on UNIFORM synthetic
conversations; the north rule names conv_id skew explicitly. This
bench builds a hostile input —

  * ONE conv_id owns ~10% of ALL turns (every 10th document's turns
    are remapped into the single hot conversation, turn_idx re-based
    to stay unique — at 64 shuffle partitions the hot partition is
    ~7× the median, comfortably past AQE's 5× factor), and
  * ONE source owns 50% of documents (doc_id % 2 remaps to 'hot-src')

— then times a job that must survive it:

  1. extraction over the skewed transcripts (mapInPandas — turn-grain,
     skew-oblivious by construction),
  2. per-conversation rollup through skew.salted_agg (the hot conv
     spreads over 16 (conv_id, salt) reducers before the merge),
  3. the turn←conv-stats equi-join with broadcast DISABLED (at 10^12
     turns the conv dim does not broadcast) so the hot conv_id hits a
     sort-merge shuffle — AQE's skew-join split must fire (thresholds
     lowered to bench scale; at production scale the defaults fire on
     the same shape),
  4. per-source document rollup through salted_agg on the 50%-hot
     source column.

Run at N and 4N single-core executor PROCESSES (local-cluster, the
round-4 bench.py discipline), 3 back-to-back pairs, median efficiency
reported plus whether the executed plan showed the AQE skew split.

Output: ONE JSON line. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_N
(default 2), SPARK_GRAFT_SKEW_MODE=local for thread-mode fallback.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.extract import extract_turns  # noqa: E402
from documentai_ocr_spark.session import get_spark  # noqa: E402
from documentai_ocr_spark.skew import salted_agg  # noqa: E402
from documentai_ocr_spark.synth import transcripts_from_documents  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_SF_TAG = SF_DIR.strip("/").replace("/", "_")
TURNS_PER_DOC = 192
HOT_EVERY = 10  # every 10th doc's turns → the one hot conv (~10%)

SKEW_PATH = f"/tmp/spark_graft_bench/{_SF_TAG}_t{TURNS_PER_DOC}_h{HOT_EVERY}_skewstorm.parquet"
DOCS_PATH = f"/tmp/spark_graft_bench/{_SF_TAG}_docs_skewstorm.parquet"
ZIP_PATH = "/tmp/documentai_ocr_spark_bench.zip"


def _build_inputs() -> None:
    if os.path.exists(os.path.join(SKEW_PATH, "_SUCCESS")) and os.path.exists(
        os.path.join(DOCS_PATH, "_SUCCESS")
    ):
        return
    s = get_spark(app_name="skew-build", cores=16)
    tr = transcripts_from_documents(s, SF_DIR, turns_per_doc=TURNS_PER_DOC)
    doc_no = F.substring("conv_id", 6, 8).cast("long")
    skewed = tr.withColumn(
        "turn_idx",
        F.when(
            doc_no % HOT_EVERY == 0,
            (doc_no / HOT_EVERY).cast("int") * TURNS_PER_DOC
            + F.col("turn_idx"),
        ).otherwise(F.col("turn_idx")),
    ).withColumn(
        "conv_id",
        F.when(doc_no % HOT_EVERY == 0, F.lit("conv-hot")).otherwise(
            F.col("conv_id")
        ),
    )
    skewed.repartition(64).write.mode("overwrite").parquet(SKEW_PATH)
    docs = s.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit("hot-src")).otherwise(
            F.col("source")
        ),
    )
    docs.repartition(16).write.mode("overwrite").parquet(DOCS_PATH)
    s.stop()
    time.sleep(2)


def _skew_job(s) -> bool:
    """The timed skew-storm job; returns saw_skew_split.

    Shape: extract → salted per-conv rollup MATERIALIZED to parquet →
    enrich every turn with its conversation stats (the sort-merge
    join whose probe side carries the hot conv) → write to the noop
    sink. Two deliberate choices, both discovered by observing AQE
    refuse the split on the naive shapes:

    * the dim is MATERIALIZED, not joined lazily: with the merge-
      phase HashAggregate interposed between the join's Sort and its
      shuffle stage, OptimizeSkewedJoin cannot pattern-match the
      join (it must re-read raw shuffle partitions on both sides) —
      observed: no reader inserted at all. Persisting the dim (at
      10^12 turns conv-stats IS a table you'd persist) makes both
      join children raw shuffle reads and the rule fires:
      SortMergeJoin(skew=true), 64 → 71 tasks (hot partition split 8
      ways).
    * the join feeds a WRITE, not a global aggregate: with a
      same-stage aggregate above, the split is also declined
      (observed: "coalesced" only) — and writing enriched rows out
      is the production shape for this pipeline anyway.

    The skew evidence is read from the SQL status store's final
    adaptive plan for the write's execution."""
    ext = extract_turns(s.read.parquet(SKEW_PATH))
    conv_stats = salted_agg(
        ext,
        key="conv_id",
        unique_col="turn_idx",
        partial=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.length("text")).alias("pc"),
        ],
        merge=[
            F.sum("pn").alias("n_turns"),
            F.sum("pc").alias("n_chars"),
        ],
        n_salt=16,
    )
    dim_path = "/tmp/spark_graft_bench/skew_conv_stats.parquet"
    conv_stats.write.mode("overwrite").parquet(dim_path)
    enriched = ext.join(s.read.parquet(dim_path), "conv_id")
    enriched.write.format("noop").mode("overwrite").save()
    store = s._jsparkSession.sharedState().statusStore()
    el = store.executionsList()
    desc = el.apply(el.size() - 1).physicalPlanDescription()
    saw_skew = "skew=true" in desc or "skewed" in desc
    # the doc-side 50%-hot-source rollup (salted two-phase)
    docs = s.read.parquet(DOCS_PATH)
    per_src = salted_agg(
        docs,
        key="source",
        unique_col="doc_id",
        partial=[
            F.count(F.lit(1)).alias("pn"),
            F.sum("n_chars").alias("pc"),
        ],
        merge=[F.sum("pn").alias("n_docs"), F.sum("pc").alias("n_chars")],
        n_salt=16,
    )
    per_src.collect()
    return saw_skew


def _one_run(width: int, mode: str) -> tuple[float, bool]:
    extra = {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "1m",
        # at 10^12 turns the conv dim does not broadcast; force the
        # sort-merge path so the skew machinery is what gets measured
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE skew-split thresholds scaled to bench data volume (the
        # 256m default is production-sized; compressed shuffle text
        # makes the hot partition ~10 MB here, so the default 5x
        # factor is borderline — 3x is the demo setting)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        # partitions ≫ cores (the production norm) so the median
        # partition is small enough that the hot conv reads as skew
        "spark.sql.shuffle.partitions": "64",
    }
    if mode == "local-cluster":
        extra["spark.executor.memory"] = "2g"
        s = get_spark(
            app_name=f"skewstorm-lc{width}",
            cores=width,
            shuffle_partitions=width * 2,
            master=f"local-cluster[{width},1,2560]",
            extra=extra,
        )
        s.sparkContext.addPyFile(ZIP_PATH)
    else:
        s = get_spark(
            app_name=f"skewstorm-{width}",
            cores=width,
            shuffle_partitions=width * 2,
            extra=extra,
        )
    n = s.read.parquet(SKEW_PATH).count()  # metadata-cheap, pre-timed
    _skew_job(s)  # warm
    t0 = time.time()
    saw_skew = _skew_job(s)
    tps = n / (time.time() - t0)
    s.stop()
    time.sleep(2)
    return tps, saw_skew


def main() -> None:
    mode = os.environ.get("SPARK_GRAFT_SKEW_MODE", "local-cluster")
    if mode == "local-cluster":
        # always rebuild — a cached zip would ship stale executor code
        import zipfile

        pkg_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        with zipfile.ZipFile(ZIP_PATH, "w") as zf:
            for root, _d, files in os.walk(
                os.path.join(pkg_root, "documentai_ocr_spark")
            ):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, pkg_root))
    _build_inputs()
    n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n_big = n_small * 4
    pairs = []
    saw_any_skew = False
    for _ in range(3):
        tn, sk1 = _one_run(n_small, mode)
        tb, sk2 = _one_run(n_big, mode)
        saw_any_skew = saw_any_skew or sk1 or sk2
        pairs.append(
            {
                "tps_n": round(tn, 1),
                "tps_4n": round(tb, 1),
                "efficiency": round((tb / tn) / (n_big / n_small), 3),
            }
        )
    med = sorted(pairs, key=lambda p: p["efficiency"])[len(pairs) // 2]
    print(
        json.dumps(
            {
                "metric": "skew_storm_scaling",
                "mode": mode,
                "hot_conv_turn_frac": 1.0 / HOT_EVERY,
                "hot_source_doc_frac": 0.5,
                "executors_n": n_small,
                "executors_4n": n_big,
                "turns_per_sec_n": med["tps_n"],
                "turns_per_sec_4n": med["tps_4n"],
                "efficiency": med["efficiency"],
                "efficiency_pairs": [p["efficiency"] for p in pairs],
                "pairs": pairs,
                "aqe_skew_split_seen": saw_any_skew,
            }
        )
    )


if __name__ == "__main__":
    main()
