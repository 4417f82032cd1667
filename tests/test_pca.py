"""PCA family (x_pca_variance / x_pca_project): numpy whole-table
replay, spectrum invariants, projection-variance == eigenvalue, a
hand-derivable known-answer fixture, shift invariance (centering), and
fixed-partitioning determinism."""

import numpy as np
import pandas as pd
import pytest

from documentai_ocr_spark.queries.simsearch import (
    _PCA_TOPK,
    x_pca_project,
    x_pca_variance,
)

SF = "/root/testdata/sf0.001"


def _np_eigs(vecs: np.ndarray) -> np.ndarray:
    x = vecs.astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)  # population, matches /n
    vals = np.linalg.eigh(cov)[0]
    return vals[::-1]


@pytest.fixture(scope="module")
def emb_np():
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    return np.stack(e["embedding"].to_numpy()).astype(np.float64)


def test_pca_variance_replays_numpy(spark, emb_np):
    rows = x_pca_variance(spark, SF).orderBy("component").collect()
    want = _np_eigs(emb_np)
    assert len(rows) == emb_np.shape[1]
    got = np.array([r["eigenvalue"] for r in rows])
    # same spectrum as the single-machine replay (float64 partial sums
    # of float32-origin values; publication rounds at 1e-9)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-9)
    # spectrum invariants: descending, non-negative, fractions sum to 1
    assert all(a >= b for a, b in zip(got, got[1:]))
    assert (got >= 0).all()
    assert abs(sum(r["evr"] for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1]["cum_evr"] - 1.0) < 1e-4
    # trace reconciliation: sum of eigenvalues == total variance
    tot = ((emb_np - emb_np.mean(axis=0)) ** 2).sum() / len(emb_np)
    assert abs(got.sum() - tot) < 1e-6 * tot
    assert rows[0]["n"] == len(emb_np)


def test_pca_variance_known_answer(spark, tmp_path):
    # four 4-d points on two axes: population covariance is
    # diag(0.5, 2, 0, 0) -> eigenvalues [2, 0.5, 0, 0], evr [.8, .2, 0, 0]
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [1.0, 0.0, 0.0, 0.0],
                [-1.0, 0.0, 0.0, 0.0],
                [0.0, 2.0, 0.0, 0.0],
                [0.0, -2.0, 0.0, 0.0],
            ],
        }
    )
    d = str(tmp_path / "ka")
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>"
    ).write.parquet(f"{d}/embeddings.parquet")
    rows = x_pca_variance(spark, d).orderBy("component").collect()
    assert [r["eigenvalue"] for r in rows] == [2.0, 0.5, 0.0, 0.0]
    assert [r["evr"] for r in rows] == [0.8, 0.2, 0.0, 0.0]
    assert [r["cum_evr"] for r in rows] == [0.8, 1.0, 1.0, 1.0]


def test_pca_variance_shift_invariant(spark, tmp_path, emb_np):
    # adding a constant vector to every embedding must not move the
    # spectrum (proves the Gram is properly centered, not raw)
    rng = np.random.default_rng(7)
    shift = rng.normal(size=emb_np.shape[1]) * 10.0
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(emb_np)),
            "embedding": [
                (row + shift).astype(np.float32).tolist() for row in emb_np
            ],
        }
    )
    d = str(tmp_path / "shift")
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>"
    ).write.parquet(f"{d}/embeddings.parquet")
    base = [
        r["eigenvalue"]
        for r in x_pca_variance(spark, SF).orderBy("component").collect()
    ]
    shifted = [
        r["eigenvalue"]
        for r in x_pca_variance(spark, d).orderBy("component").collect()
    ]
    assert np.allclose(base, shifted, rtol=1e-5, atol=1e-7)


def test_pca_variance_deterministic_rerun(spark):
    a = [
        (r["component"], r["eigenvalue"], r["evr"])
        for r in x_pca_variance(spark, SF).orderBy("component").collect()
    ]
    b = [
        (r["component"], r["eigenvalue"], r["evr"])
        for r in x_pca_variance(spark, SF).orderBy("component").collect()
    ]
    assert a == b  # bit-identical for a fixed partitioning


def test_pca_project_variance_matches_eigenvalues(spark, emb_np):
    rows = x_pca_project(spark, SF).collect()
    assert len(rows) == len(emb_np)
    proj = np.stack(
        [np.asarray(r["proj"]) for r in sorted(rows, key=lambda r: r["vec_id"])]
    )
    assert proj.shape == (len(emb_np), _PCA_TOPK)
    eigs = _np_eigs(emb_np)
    # population variance of each projected coordinate == its eigenvalue
    pv = ((proj - proj.mean(axis=0)) ** 2).mean(axis=0)
    assert np.allclose(pv, eigs[:_PCA_TOPK], rtol=1e-5)
    # coordinates are uncorrelated: off-diagonal covariance ~ 0
    cov = np.cov(proj, rowvar=False, bias=True)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6 * eigs[0]
    # reconstruction identity: per-vector error == residual spectrum
    # mass on average (total variance minus the kept eigenvalues)
    err = np.array(
        [r["recon_err"] for r in sorted(rows, key=lambda r: r["vec_id"])]
    )
    assert abs(err.mean() - eigs[_PCA_TOPK:].sum()) < 1e-6 * eigs.sum()
    assert (err >= -1e-9).all()
