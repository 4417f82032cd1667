"""Robust length statistics (median/MAD outlier screen, exact trimmed
mean) over the factored util.two_phase_ranks — engineered-verdict
corpora plus whole-corpus python replays at sf0.001, and a direct
equality pin of two_phase_ranks against the plain whole-group window."""

import pandas as pd

from documentai_ocr_spark.queries.relevance import (
    _MAD_SIGMA,
    _TRIM_DECI,
    q_robust_stats,
    q_trimmed_mean,
)
from documentai_ocr_spark.queries.util import two_phase_ranks

SF = "/root/testdata/sf0.001"


def _write(spark, tmp_path, name, pdf):
    d = str(tmp_path / name)
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    return d


def _lower_median(xs):
    xs = sorted(xs)
    return xs[(len(xs) + 1) // 2 - 1]


def _replay(docs):
    want = {}
    for src, g in docs.groupby("source"):
        xs = list(zip(g["n_chars"].astype(int), g["doc_id"].astype(int)))
        vals = [x for x, _ in xs]
        med = _lower_median(vals)
        devs = [abs(x - med) for x in vals]
        mad = _lower_median(devs)
        n_out = sum(1 for dv in devs if dv > _MAD_SIGMA * mad)
        want[src] = (len(vals), med, mad, n_out, 1000 * n_out // len(vals))
    return want


def test_two_phase_ranks_equals_plain_window(spark, tmp_path):
    """The factored helper == row_number() OVER (PARTITION BY g ORDER BY
    x, id) on a corpus engineered to stress bucket boundaries (heavy
    ties, a constant group, a two-value group)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    for i in range(200):
        rows.append((i, "ties", int(i % 3)))
    for i in range(200, 230):
        rows.append((i, "const", 7))
    rows.append((300, "two", 0))
    rows.append((301, "two", 10**9))
    pdf = pd.DataFrame(rows, columns=["doc_id", "g", "x"])
    df = spark.createDataFrame(pdf)
    got = {
        (r["g"], r["doc_id"]): r["r"]
        for r in two_phase_ranks(df, ["g"], "x", ["doc_id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("x", "doc_id")
    want = {
        (r["g"], r["doc_id"]): r["r"]
        for r in df.withColumn(
            "r", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_robust_stats_verdict_discriminates(spark, tmp_path):
    """A source of 19 hundred-char docs plus one 100k megadoc flags
    exactly the megadoc; a uniform source flags nothing and has MAD 0."""
    rows = []
    for i in range(19):
        rows.append((i, "x" * (100 + i), "en", "webby", 100 + i))
    rows.append((19, "x" * 100000, "en", "webby", 100000))
    for i in range(100, 110):
        rows.append((i, "y" * 50, "en", "flat", 50))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = _write(spark, tmp_path, "robust", pdf)
    got = {r["source"]: r for r in q_robust_stats(spark, d).collect()}
    r = got["webby"]
    assert r["n_docs"] == 20 and r["n_outliers"] == 1
    assert r["med"] == _lower_median(range(100, 119))
    assert r["outlier_milli"] == 1000 * 1 // 20
    f = got["flat"]
    assert f["mad"] == 0 and f["n_outliers"] == 0 and f["med"] == 50


def test_robust_stats_python_recount(spark):
    want = _replay(pd.read_parquet(f"{SF}/documents.parquet"))
    got = {r["source"]: r for r in q_robust_stats(spark, SF).collect()}
    assert set(got) == set(want)
    for src, (n, med, mad, n_out, milli) in want.items():
        r = got[src]
        assert (
            r["n_docs"],
            r["med"],
            r["mad"],
            r["n_outliers"],
            r["outlier_milli"],
        ) == (n, med, mad, n_out, milli), src


def test_trimmed_mean_python_recount(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["source"]: r for r in q_trimmed_mean(spark, SF).collect()}
    for src, g in docs.groupby("source"):
        xs = sorted(
            zip(g["n_chars"].astype(int), g["doc_id"].astype(int))
        )
        n = len(xs)
        t = n // _TRIM_DECI
        kept = [x for x, _ in xs[t : n - t]]
        r = got[src]
        assert (r["n_docs"], r["n_trim"], r["n_kept"]) == (n, t, len(kept))
        assert abs(r["mean"] - round(sum(x for x, _ in xs) / n, 6)) < 1e-9
        assert (
            abs(r["trimmed_mean"] - round(sum(kept) / len(kept), 6)) < 1e-9
        ), src


def test_trimmed_mean_megadoc_insensitivity(spark, tmp_path):
    """The trimmed mean provably ignores the tail the plain mean is
    dragged by: same corpus as the outlier pin — trimmed == mean of the
    middle 16 ranks, far below the megadoc-inflated mean."""
    rows = []
    for i in range(19):
        rows.append((i, 100 + i))
    rows.append((19, 100000))
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_chars"])
    pdf["text"] = ""
    pdf["lang"] = "en"
    pdf["source"] = "webby"
    d = _write(spark, tmp_path, "trim", pdf)
    r = q_trimmed_mean(spark, d).collect()[0]
    xs = sorted(pdf["n_chars"])
    t = 20 // _TRIM_DECI
    kept = xs[t : 20 - t]
    assert r["n_kept"] == 16
    assert abs(r["trimmed_mean"] - round(sum(kept) / len(kept), 6)) < 1e-9
    assert r["mean"] > 10 * r["trimmed_mean"]


def test_decile_grid_recount_and_median_reconciliation(spark):
    """Python replay of every (source, q) order statistic at sf0.001,
    plus the cross-operator identity: decile q=5's rank ceil(5n/10) ==
    the lower-median rank (n+1)//2, so q_decile_grid's q=5 value MUST
    equal q_robust_stats' med on every source."""
    from documentai_ocr_spark.queries.relevance import q_decile_grid

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {
        (r["source"], r["q"]): r
        for r in q_decile_grid(spark, SF).collect()
    }
    for src, g in docs.groupby("source"):
        xs = [
            x
            for x, _ in sorted(
                zip(g["n_chars"].astype(int), g["doc_id"].astype(int))
            )
        ]
        n = len(xs)
        for q in range(1, 10):
            r = got[(src, q)]
            assert (r["n_docs"], r["value"]) == (n, xs[(q * n + 9) // 10 - 1])
    med = {r["source"]: r["med"] for r in q_robust_stats(spark, SF).collect()}
    for src in med:
        assert got[(src, 5)]["value"] == med[src], src
