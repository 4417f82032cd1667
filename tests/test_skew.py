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


def test_two_phase_source_windows_under_skew(spark, tmp_path):
    """One source 100x the others: the two-phase bucketed forms of
    token packing and score calibration must (a) still produce the
    exact single-window answer, and (b) spread the hot source across
    buckets so no (source, bucket) task holds more than a bounded
    multiple of the fair share — the property that kills the
    whole-source single-reducer sort at 100 TB."""
    import pandas as pd

    from documentai_ocr_spark.queries.textstats import (
        _CALIB_BUCKETS,
        _PACK_BUCKETS,
        q_score_calibration,
        q_token_packing,
    )

    hot_n, cold_n = 3000, 30
    # interleave: doc_id i -> hot unless i % 21 picks a cold slot
    data = []
    cold_sources = [f"cold{j}" for j in range(5)]
    ci = 0
    for i in range(hot_n + 5 * cold_n):
        if ci < 5 * cold_n and i % 21 == 0:
            src = cold_sources[ci % 5]
            ci += 1
        else:
            src = "hot"
        data.append(
            (i, src, "tok " * ((i * 7) % 40 + 1), ((i * 13) % 997) + 1)
        )
    pdf = pd.DataFrame(
        data, columns=["doc_id", "source", "text", "n_chars"]
    )
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "skewfix")
    sdf.repartition(4).write.parquet(f"{out}/documents.parquet")

    # (a) exactness vs a pandas single-pass reference
    pack = q_token_packing(spark, out).toPandas()
    ref = pdf.copy()
    ref["n"] = ref["text"].str.split(" ").str.len().astype("int64")
    ref = ref.sort_values(["source", "doc_id"])
    ref["tok_beg"] = ref.groupby("source")["n"].cumsum() - ref["n"]
    got = {(r.doc_id): r.tok_beg for r in pack.itertuples()}
    exp = {(r.doc_id): r.tok_beg for r in ref.itertuples()}
    assert got == exp

    calib = q_score_calibration(spark, out).toPandas()
    refc = pdf.copy()
    grp = refc.groupby("source")["n_chars"]
    refc["pct"] = grp.transform(
        lambda s: s.rank(method="max") / len(s)
    ).round(6)
    gotc = {r.doc_id: round(r.pct_rank, 6) for r in calib.itertuples()}
    expc = {r.doc_id: round(r.pct, 6) for r in refc.itertuples()}
    assert gotc == expc

    # (b) balance: the hot source's rows spread over the bucket grid;
    # max bucket load stays within 3x the fair share (uniform doc_ids)
    lo, hi = int(pdf.doc_id.min()), int(pdf.doc_id.max())
    width = max(1, (hi - lo + _PACK_BUCKETS) // _PACK_BUCKETS)
    hotp = pdf[pdf.source == "hot"].copy()
    hotp["b"] = (hotp.doc_id - lo) // width
    fair = len(hotp) / _PACK_BUCKETS
    assert hotp.groupby("b").size().max() <= 3 * fair
    assert hotp.b.nunique() >= _PACK_BUCKETS - 1

    clo, chi = int(pdf.n_chars.min()), int(pdf.n_chars.max())
    cwidth = max(1, (chi - clo + _CALIB_BUCKETS) // _CALIB_BUCKETS)
    hotp["vb"] = (hotp.n_chars - clo) // cwidth
    cfair = len(hotp) / _CALIB_BUCKETS
    assert hotp.groupby("vb").size().max() <= 3 * cfair


def test_mean_filter_keeps_null_lang_group(spark, tmp_path):
    """PARTITION BY lang groups NULL langs together, so the broadcast-
    join rewrite must be null-safe: untagged rows get their own group
    mean and survive the filter — a plain equality join would silently
    drop them (invisible to the gate: the driver corpus has no NULLs)."""
    import pandas as pd

    from documentai_ocr_spark.queries.relational import q_mean_filter

    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "lang": ["en", "en", None, None, None, "fr", "fr", None],
            "n_chars": [10, 20, 5, 15, 25, 7, 9, 35],
        }
    )
    out = str(tmp_path / "nulls")
    spark.createDataFrame(pdf).write.parquet(f"{out}/documents.parquet")
    got = {r.doc_id for r in q_mean_filter(spark, out).collect()}
    exp = set()
    for lang, grp in pdf.groupby("lang", dropna=False):
        m = grp.n_chars.mean()
        exp |= set(grp[grp.n_chars >= m].doc_id)
    assert got == exp
    assert any(pd.isna(pdf.lang[d]) for d in got)  # NULL rows present


def test_two_phase_ranks_helper_under_skew(spark):
    """The factored util.two_phase_ranks under a 100x hot group: exact
    equality to the plain whole-group window AND bucket-level balance
    (the hot group's rows spread across the value-bucket grid, max
    bucket within 3x fair share) — the same property test_two_phase_
    source_windows_under_skew pins for its two inlined predecessors."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from documentai_ocr_spark.queries.util import two_phase_ranks

    rows = [(i, "hot", ((i * 13) % 997) + 1) for i in range(3000)]
    rows += [(10000 + i, f"cold{i % 5}", i + 1) for i in range(150)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "g", "x"])
    df = spark.createDataFrame(pdf).repartition(4)
    got = {
        r["doc_id"]: r["r"]
        for r in two_phase_ranks(df, ["g"], "x", ["doc_id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "doc_id")
    want = {
        r["doc_id"]: r["r"]
        for r in df.withColumn(
            "r", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want

    # balance: replicate the helper's exact bucket rule in pandas
    lo, hi = int(pdf.x.min()), int(pdf.x.max())
    width = max(1, (hi - lo + 64) // 64)
    hot = pdf[pdf.g == "hot"].copy()
    hot["vb"] = (hot.x - lo) // width
    fair = len(hot) / 64
    assert hot.groupby("vb").size().max() <= 3 * fair
    assert hot.vb.nunique() >= 60
