"""Embedding second-moment audits over the shared milli-quantized
component rendering: dimension-correlation matrix and per-dimension
Fisher separability — engineered-verdict fixtures plus numpy
whole-table replays at sf0.001."""

import math

import numpy as np
import pandas as pd

from documentai_ocr_spark.queries.simsearch import (
    _CORR_REDUNDANT,
    q_embed_dim_corr,
    q_fisher_score,
)

SF = "/root/testdata/sf0.001"


def _write(spark, tmp_path, name, vecs, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": labels,
        }
    )
    d = str(tmp_path / name)
    spark.createDataFrame(
        pdf, schema="vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


def _quant(vecs):
    return np.floor(np.asarray(vecs, dtype=np.float32).astype(np.float64) * 1000).astype(np.int64)


def test_dim_corr_engineered(spark, tmp_path):
    """dim1 == dim0 → r = 1 (redundant); dim2 == -dim0 → r = -1
    (redundant); dim3 constant → r NULL, redundant FALSE."""
    # dyadic values are exact in float32, so floor(±b·1000) is exactly
    # ±b·1000 and the hand-computed correlations are exact
    base = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75]
    vecs = [[b, b, -b, 0.5] for b in base]
    d = _write(spark, tmp_path, "corr", vecs, [0] * 6)
    got = {(r["di"], r["dj"]): r for r in q_embed_dim_corr(spark, d).collect()}
    assert len(got) == 6  # C(4,2)
    assert got[(0, 1)]["r"] == 1.0 and got[(0, 1)]["redundant"]
    assert got[(0, 2)]["r"] == -1.0 and got[(0, 2)]["redundant"]
    assert got[(0, 3)]["r"] is None and not got[(0, 3)]["redundant"]
    assert got[(1, 2)]["r"] == -1.0


def test_dim_corr_numpy_recount(spark):
    """Whole-table replay at sf0.001: numpy Pearson on the quantized
    integers equals the published rounded r on every pair."""
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = _quant(np.stack(emb["embedding"].to_numpy()))
    n, d = X.shape
    got = {(r["di"], r["dj"]): r for r in q_embed_dim_corr(spark, SF).collect()}
    assert len(got) == d * (d - 1) // 2
    sx = X.sum(0)
    sq = (X.astype(object) ** 2).sum(0)
    checked = 0
    for di in range(0, d, 7):  # every 7th row of the matrix: 640 pairs
        for dj in range(di + 1, d):
            x, y = X[:, di], X[:, dj]
            sxy = int((x * y).sum())
            num = n * sxy - int(sx[di]) * int(sx[dj])
            dex = n * int(sq[di]) - int(sx[di]) ** 2
            dey = n * int(sq[dj]) - int(sx[dj]) ** 2
            r = got[(di, dj)]
            assert r["n"] == n
            want = round(num / math.sqrt(dex * dey), 6)
            assert abs(r["r"] - want) < 5e-6, (di, dj)
            assert r["redundant"] == (abs(r["r"]) >= _CORR_REDUNDANT)
            checked += 1
    assert checked > 300


def test_fisher_engineered(spark, tmp_path):
    """dim0 separates the two labels cleanly (huge fisher); dim1 has the
    SAME distribution in both labels (fisher ≈ small); dim2 is constant
    within each class → zero within-scatter → NULL."""
    vecs, labels = [], []
    for i in range(10):
        jitter = 0.001 * (i % 2)
        vecs.append([0.0 + jitter, 0.1 * (i % 5), 0.2])
        labels.append(0)
    for i in range(10):
        jitter = 0.001 * (i % 2)
        vecs.append([0.5 + jitter, 0.1 * (i % 5), 0.4])
        labels.append(1)
    d = _write(spark, tmp_path, "fisher", vecs, labels)
    got = {r["dim"]: r for r in q_fisher_score(spark, d).collect()}
    assert got[0]["fisher"] > 1000 * (got[1]["fisher"] or 0.0)
    assert got[1]["fisher"] < 0.1
    assert got[2]["fisher"] is None
    assert all(r["n_labels"] == 2 for r in got.values())


def test_fisher_numpy_recount(spark):
    """Whole-table replay at sf0.001 reproducing the exact term +
    label-ordered-fold arithmetic."""
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = _quant(np.stack(emb["embedding"].to_numpy()))
    labels = emb["label"].to_numpy()
    got = {r["dim"]: r for r in q_fisher_score(spark, SF).collect()}
    n_all, d = X.shape
    for dim in range(d):
        x = X[:, dim]
        N = n_all
        S = int(x.sum())
        tb = tw = 0.0
        for lab in sorted(set(labels.tolist())):
            xl = x[labels == lab]
            nl = len(xl)
            s = int(xl.sum())
            ss = int((xl.astype(object) ** 2).sum())
            dd = float(s * N - S * nl)
            tb += (dd * dd) / (float(nl) * N * N)
            tw += float(nl * ss - s * s) / nl
        r = got[dim]
        if tw == 0.0:
            assert r["fisher"] is None
        else:
            assert abs(r["fisher"] - round(tb / tw, 6)) < 5e-6, dim
