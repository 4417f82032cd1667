"""Salting correctness: salted two-phase agg and replicated join must
equal their unsalted forms, and the salt must actually spread a hot key."""

import pytest
from pyspark.sql import functions as F

from documentai_ocr_spark.skew import replicated_join, salted_agg, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' has 50x the rows of the others
    rows = [("hot", i, float(i % 7)) for i in range(5000)] + [
        (f"k{j}", 100000 + j * 100 + i, float(i)) for j in range(20) for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, uid bigint, v double").repartition(
        8
    )


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r.key): (r.n, r.s)
        for r in skewed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.key): (r.n, r.s)
        for r in salted_agg(
            skewed,
            "key",
            "uid",
            partial=[F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps")],
            merge=[
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
            ],
            n_salt=16,
        ).collect()
    }
    assert {k: (n, round(s, 6)) for k, (n, s) in plain.items()} == {
        k: (n, round(s, 6)) for k, (n, s) in salted.items()
    }


def test_salt_spreads_hot_key(spark, skewed):
    counts = (
        with_salt(skewed.where(F.col("key") == "hot"), "uid", 16)
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(counts) == 16
    # uniform-ish: no salt bucket holds more than 2x the fair share
    assert max(r["count"] for r in counts) < 2 * 5000 / 16


def test_replicated_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{j}", f"D{j}") for j in range(20)],
        "key string, label string",
    )
    plain = skewed.join(dim, "key").groupBy("label").count()
    salted = replicated_join(skewed, dim, "key", "uid", n_salt=8).groupBy(
        "label"
    ).count()
    assert {(r.label, r["count"]) for r in plain.collect()} == {
        (r.label, r["count"]) for r in salted.collect()
    }


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling evidence: a hot join key whose shuffle
    partition dwarfs the median must be SPLIT by AQE's OptimizeSkewedJoin
    (SortMergeJoin(skew=true) + 'skewed' AQEShuffleRead in the final
    adaptive plan) — the engine-level complement of the deterministic
    salting in this module, and what the 10^12-turn conv_id skew story
    relies on when salting isn't applied."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(0, 150000).select(
            F.lit(0).alias("k"), F.rand(7).alias("payload")
        )
        cold = spark.range(0, 5000).select(
            (F.col("id") % 50 + 1).alias("k"), F.rand(8).alias("payload")
        )
        right = spark.range(0, 51).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = hot.unionAll(cold).join(right, "k")
        assert len(j.collect()) == 155000
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:800]
        assert "skewed" in final_plan  # the split AQEShuffleRead
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
