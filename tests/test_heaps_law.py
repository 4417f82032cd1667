"""Heaps'-law vocabulary-growth exponent: engineered corpora pin the
two failure verdicts (saturated template vocabulary β ≈ 0, type-minting
junk β ≈ 1) plus a whole-corpus python replay at sf0.001 reproducing
the checkpoint/fit arithmetic exactly."""

import math

import pandas as pd

from documentai_ocr_spark.queries.relevance import _HEAPS_G, q_heaps_law

SF = "/root/testdata/sf0.001"


def _write(spark, tmp_path, name, pdf):
    d = str(tmp_path / name)
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    return d


def _replay(docs):
    """Exact replica of the published rule: doc rank by doc_id within
    source, G checkpoints c=max(1, g*n//G), tokens/types at each, OLS
    of ln(types) on ln(tokens)."""
    out = {}
    G = _HEAPS_G
    for src, grp in docs.groupby("source"):
        grp = grp.sort_values("doc_id")
        toks_per_doc = [
            [w for w in t.lower().split(" ") if w] for t in grp["text"]
        ]
        n = len(grp)
        pts = []
        for g in range(1, G + 1):
            c = max(1, g * n // G)
            toks = sum(len(t) for t in toks_per_doc[:c])
            types = len({w for t in toks_per_doc[:c] for w in t})
            pts.append((toks, types))
        fit = [(math.log(a), math.log(b)) for a, b in pts if a > 0 and b > 0]
        k = len(fit)
        if k == 0:
            # both engines drop a source with no usable checkpoint (the
            # fit CTE is empty) — mirror the published rule exactly
            continue
        sx = sum(x for x, _ in fit)
        sy = sum(y for _, y in fit)
        sxy = sum(x * y for x, y in fit)
        sxx = sum(x * x for x, _ in fit)
        den = k * sxx - sx * sx
        beta = None if den == 0.0 else round((k * sxy - sx * sy) / den, 6)
        out[src] = (n, pts[-1][0], pts[-1][1], k, beta)
    return out


def test_heaps_verdicts_discriminate(spark, tmp_path):
    """A source that repeats one template forever saturates (β ≈ 0);
    a source whose every doc mints fresh IDs keeps growing (β ≈ 1);
    natural-ish mixing sits in between."""
    rows = []
    for i in range(32):
        rows.append((i, "the same template words every single time", "tmpl"))
    for i in range(100, 132):
        rows.append((i, f"id{i}a id{i}b id{i}c id{i}d id{i}e", "junk"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    d = _write(spark, tmp_path, "heaps", pdf)
    got = {r["source"]: r for r in q_heaps_law(spark, d).collect()}
    # template: types constant after doc 1 while tokens grow → β ≈ 0
    assert abs(got["tmpl"]["beta"]) < 0.05
    assert got["tmpl"]["n_types"] == 7
    # junk: types = tokens exactly at every checkpoint → β == 1
    assert got["junk"]["beta"] == 1.0
    assert got["junk"]["n_types"] == got["junk"]["n_tokens"] == 160


def test_heaps_python_recount(spark):
    want = _replay(pd.read_parquet(f"{SF}/documents.parquet"))
    got = {r["source"]: r for r in q_heaps_law(spark, SF).collect()}
    assert set(got) == set(want)
    for src, (n, toks, types, k, beta) in want.items():
        r = got[src]
        assert (r["n_docs"], r["n_tokens"], r["n_types"], r["n_fit"]) == (
            n,
            toks,
            types,
            k,
        ), src
        if beta is None:
            assert r["beta"] is None
        else:
            assert abs(r["beta"] - beta) < 5e-6, src
