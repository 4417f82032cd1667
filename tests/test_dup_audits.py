"""Dedup threshold yield curve and degree histogram: python replays
from the (gate-proven) banded pair set, plus structural laws."""

from documentai_ocr_spark.queries.simsearch import (
    q_dedup_yield_curve,
    q_dup_degree_hist,
    q_simhash_pairs_banded,
)

SF = "/root/testdata/sf0.001"


def _pairs(spark):
    return [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_simhash_pairs_banded(spark, SF).collect()
    ]


def test_yield_curve_replay_and_laws(spark):
    pairs = _pairs(spark)
    got = {
        r["hamming_max"]: (r["n_pairs_cum"], r["n_docs_cum"])
        for r in q_dedup_yield_curve(spark, SF).collect()
    }
    assert set(got) == set(range(9))
    for h in range(9):
        sub = [(a, b) for a, b, hm in pairs if hm <= h]
        docs = {v for p in sub for v in p}
        assert got[h] == (len(sub), len(docs)), h
    # monotone, bounded, and the h=8 row covers the whole pair set
    for h in range(1, 9):
        assert got[h][0] >= got[h - 1][0] and got[h][1] >= got[h - 1][1]
        assert got[h][1] <= 2 * got[h][0]
    assert got[8][0] == len(pairs)


def test_degree_hist_replay_and_laws(spark):
    pairs = _pairs(spark)
    deg: dict[int, int] = {}
    for a, b, _ in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want: dict[int, list] = {}
    for d in deg.values():
        b = len(str(d))
        e = want.setdefault(b, [0, d, d])
        e[0] += 1
        e[1] = min(e[1], d)
        e[2] = max(e[2], d)
    got = {
        r["bucket"]: (r["n_docs"], r["min_deg"], r["max_deg"])
        for r in q_dup_degree_hist(spark, SF).collect()
    }
    assert got == {b: tuple(v) for b, v in want.items()}
    assert sum(v[0] for v in got.values()) == len(deg)
