"""k-core decomposition: closed-form kernel graphs where coreness is
known exactly, the order-independence law, and a whole-corpus python
peeling replay of x_kcore at sf0.001."""

import pandas as pd

from documentai_ocr_spark.queries.simsearch import (
    kcore_vertices,
    q_simhash_pairs_banded,
    x_kcore,
)

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    pdf = pd.DataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs],
        columns=["doc_a", "doc_b"],
    )
    return spark.createDataFrame(pdf)


def _core(spark, pairs, k):
    return {r["v"] for r in kcore_vertices(_edges(spark, pairs), k).collect()}


def test_kcore_closed_forms(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _core(spark, k4, 3) == {1, 2, 3, 4}
    assert _core(spark, k4, 2) == {1, 2, 3, 4}
    assert _core(spark, k4, 5) == set()

    star = [(0, i) for i in range(1, 6)]
    assert _core(spark, star, 2) == set()  # spokes peel, then the hub

    tri_pendant = [(1, 2), (2, 3), (1, 3), (3, 4)]
    assert _core(spark, tri_pendant, 2) == {1, 2, 3}
    assert _core(spark, tri_pendant, 3) == set()

    # wheel W6: hub 0 + 6-cycle rim — rim degree 3, a 3-core
    rim = [(i, i % 6 + 1) for i in range(1, 7)]
    wheel = rim + [(0, i) for i in range(1, 7)]
    assert _core(spark, wheel, 3) == {0, 1, 2, 3, 4, 5, 6}
    assert _core(spark, wheel, 4) == set()

    # 20-chain: the worst case for round count — peels 2 per end per
    # round, must still converge (to empty) under the cap
    chain = [(i, i + 1) for i in range(20)]
    assert _core(spark, chain, 2) == set()

    # two K4s joined by a bridge: the bridge adds degree but no core
    k4b = [(a + 10, b + 10) for a, b in k4]
    assert _core(spark, k4 + k4b + [(4, 11)], 3) == {
        1, 2, 3, 4, 11, 12, 13, 14,
    }


def _py_peel(pairs, k):
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            return alive
        alive -= drop


def test_kcore_order_independence(spark):
    """Simultaneous peeling (engine) equals sequential min-degree
    peeling (python) — the uniqueness of the maximal k-core."""
    pairs = [
        (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 4),
        (6, 7), (7, 8),
    ]
    for k in (2, 3):
        assert _core(spark, pairs, k) == _py_peel(pairs, k)


def test_x_kcore_replay(spark):
    """sf0.001: x_kcore's levels equal python peeling of the real
    banded near-dup edge set, level laws hold (3-core ⊆ 2-core ⊆
    vertex set)."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_simhash_pairs_banded(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    ]
    verts = {v for p in pairs for v in p}
    c2, c3 = _py_peel(pairs, 2), _py_peel(pairs, 3)
    want = {v: 1 + (v in c2) + (v in c3) for v in verts}
    got = {r["doc_id"]: r["core_level"] for r in x_kcore(spark, SF).collect()}
    assert got == want
    assert c3 <= c2 <= verts


def test_kcore_random_graphs(spark):
    """Seeded random graphs: simultaneous peeling equals sequential
    python peeling for k in {2, 3} — order-independence on graphs with
    no hand-chosen structure."""
    import random

    for seed in (7, 99, 1234):
        rng = random.Random(seed)
        n = 24
        pairs = sorted(
            {
                (a, b)
                for _ in range(40)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        for k in (2, 3):
            assert _core(spark, pairs, k) == _py_peel(pairs, k), (seed, k)
