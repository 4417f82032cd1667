"""ANN quality gates: LSH top-k recall vs the brute-force baseline, and
the banded simhash prefilter vs the all-pairs baseline."""

import pytest

from documentai_ocr_spark.queries.dedup import (
    _SIMHASH_HAMMING_MAX,
    _simhash_df,
    q_simhash_pairs,
)
from documentai_ocr_spark.queries.simsearch import (
    q_knn_cosine,
    simhash_pairs_banded,
    x_knn_ivf,
    x_knn_lsh,
)
from documentai_ocr_spark.queries.util import load

SF = "/root/testdata/sf0.001"


def test_lsh_recall_vs_bruteforce(spark):
    exact = {
        (r.query_id, r.neighbor_id) for r in q_knn_cosine(spark, SF).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in x_knn_lsh(spark, SF).collect()}
    assert approx, "LSH returned nothing"
    recall = len(exact & approx) / len(exact)
    # 8 tables × 4 planes with 1-bit multi-probe measure 1.00 top-5
    # recall on this fixture; gate at 0.85 — a regression (broken
    # probing/bucketing) lands far below, seed jitter does not
    assert recall >= 0.85, recall
    for r in x_knn_lsh(spark, SF).collect():
        assert -1.0 <= r.cos_sim <= 1.0


def test_ivf_recall_vs_bruteforce(spark):
    """IVF (k-means inverted lists, nprobe probing) is the second ANN
    scale path: same recall discipline as LSH. 0.91 measured at the
    nprobe=10 operating point (0.84 at 8, 0.96 at 12); gated at the
    LSH path's 0.85 bar."""
    exact = {
        (r.query_id, r.neighbor_id) for r in q_knn_cosine(spark, SF).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in x_knn_ivf(spark, SF).collect()}
    assert approx, "IVF returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, recall
    # determinism: a second run returns the identical pair set
    again = {(r.query_id, r.neighbor_id) for r in x_knn_ivf(spark, SF).collect()}
    assert again == approx


def test_wide_banded_simhash_complete(spark):
    """120-bit banded pairing must equal a brute-force all-pairs scan of
    the collected fingerprints (pigeonhole: hamming ≤ 10 < 12 bands)."""
    from documentai_ocr_spark.queries.dedup import (
        _SIMHASH_W_HAMMING_MAX,
        _simhash_wide_df,
        q_simhash_wide_banded,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    fps = {r.doc_id: (r.h1, r.h2) for r in _simhash_wide_df(docs).collect()}
    ids = sorted(fps)
    base = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            h = bin(fps[da][0] ^ fps[db][0]).count("1") + bin(
                fps[da][1] ^ fps[db][1]
            ).count("1")
            if h <= _SIMHASH_W_HAMMING_MAX:
                base.add((da, db, h))
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in q_simhash_wide_banded(spark, SF).collect()
    }
    assert banded == base
    assert base, "fixture produced no wide near-dup pairs — vacuous"


def test_banded_simhash_equals_allpairs(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    fp = _simhash_df(docs).cache()
    base = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in q_simhash_pairs(spark, SF).collect()
    }
    assert base, "fixture produced no near-dup pairs — test is vacuous"
    # default banding = hamming_max + 1 segments: the pigeonhole argument
    # covers the FULL threshold, so banded must equal all-pairs EXACTLY
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_banded(fp, _SIMHASH_HAMMING_MAX).collect()
    }
    assert banded == base
    # under-banded variant (4 segments) only guarantees hamming < 4; it
    # must still be sound (subset) and complete below its own bound
    under = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_banded(fp, _SIMHASH_HAMMING_MAX, 4).collect()
    }
    assert {t for t in base if t[2] < 4} <= under <= base
    fp.unpersist()


def test_semdedup_recall_and_keep_policy(spark):
    """x_semdedup is the scale path for q_embed_neardup: (a) its
    within-cluster candidate pairs must recover ≥0.9 of the all-pairs
    anchor's near-dup pairs on this fixture (measured 0.95 at m=3),
    and (b) the keep verdict must drop exactly the vectors that have a
    smaller-id detected neighbor — never both members of a pair."""
    from documentai_ocr_spark.queries.simsearch import (
        _IVF_ITERS,
        _IVF_K,
        _NEARDUP_TAU,
        _SEMDEDUP_PROBE,
        _emb_double,
        _ivf_centroids,
        q_embed_neardup,
        semdedup_pairs,
        x_semdedup,
    )

    anchor = {(r.vec_a, r.vec_b) for r in q_embed_neardup(spark, SF).collect()}
    e = _emb_double(spark, SF)
    cents = _ivf_centroids(e, _IVF_K, _IVF_ITERS)
    found = {
        (r.vec_a, r.vec_b)
        for r in semdedup_pairs(
            e, cents, _SEMDEDUP_PROBE, _NEARDUP_TAU
        ).collect()
    }
    assert found <= anchor, "semdedup emitted a pair the exact anchor lacks"
    recall = len(found & anchor) / len(anchor)
    assert recall >= 0.9, recall

    verdicts = {r.vec_id: r.keep for r in x_semdedup(spark, SF).collect()}
    assert len(verdicts) == e.count()
    dropped = {v for v, k in verdicts.items() if not k}
    # exactly the larger-id members of detected pairs are dropped —
    # this also implies no detected pair survives with both kept
    assert dropped == {b for _, b in found}


def test_incremental_neardup_flags_exact_replays(spark):
    """Every exact replay in the synthetic batch (odd doc_id % 3 == 0,
    text identical to its corpus neighbor) must flag is_neardup — the
    hamming-0 case the band join can never miss."""
    from documentai_ocr_spark.queries.simsearch import q_incremental_neardup

    out = {
        r.doc_id: r.is_neardup
        for r in q_incremental_neardup(spark, SF).collect()
    }
    replays = [i for i in out if i % 3 == 0]
    assert replays and all(out[i] for i in replays)
    # fresh-content docs exist and at least one is correctly non-dup
    fresh = [i for i in out if i % 3 == 2]
    assert fresh and not all(out[i] for i in fresh)


def test_embed_quantize_matches_numpy_spec_and_keeps_recall(spark):
    """Two properties of the int8 scalar quantizer: (1) the Spark codes
    equal an independently-written numpy quantizer exactly; (2) kNN on
    midpoint-decoded codes preserves float-kNN top-5 neighbors (mean
    recall >= 0.85) — the property that makes a 4x-smaller index usable."""
    import numpy as np

    from documentai_ocr_spark.queries.simsearch import q_embed_quantize

    sf = "/root/testdata/sf0.001"
    rows = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    lo, hi = X.min(axis=0), X.max(axis=0)
    codes_np = np.minimum(
        np.floor((X - lo) / (hi - lo) * 256.0), 255.0
    ).astype(np.int64)

    got = q_embed_quantize(spark, sf).collect()
    by_vec = {}
    for r in got:
        by_vec.setdefault(r.vec_id, {})[r.dim] = r.code
    for i, vid in enumerate(ids):
        want = codes_np[i]
        have = np.array([by_vec[vid][d] for d in range(X.shape[1])])
        assert (want == have).all(), vid

    # recall: midpoint decode, cosine top-5 (excluding self) vs float
    D = lo + (codes_np + 0.5) * (hi - lo) / 256.0

    def top5(M, q_idx):
        sims = (M @ M[q_idx]) / (
            np.linalg.norm(M, axis=1) * np.linalg.norm(M[q_idx]) + 1e-12
        )
        order = np.argsort(-sims)
        return [j for j in order if j != q_idx][:5]

    qs = range(0, len(ids), max(1, len(ids) // 40))
    recalls = [
        len(set(top5(X, q)) & set(top5(D, q))) / 5.0 for q in qs
    ]
    assert float(np.mean(recalls)) >= 0.85, float(np.mean(recalls))


def test_pagerank_matches_numpy_power_iteration(spark):
    """The DataFrame PageRank must equal an independent numpy power
    iteration on the same edge list (same damping, same iteration
    count) to float tolerance, and total mass must stay ~1."""
    import numpy as np

    from documentai_ocr_spark.queries.simsearch import (
        _PR_DAMPING,
        _PR_ITERS,
        pagerank,
    )

    # star (0 center of 1..3) + pair (4,5) + isolate (6): irregular, so
    # ranks genuinely move (a union of regular components would keep the
    # uniform start vector stationary and test nothing)
    edges_py = [(0, 1), (0, 2), (0, 3), (4, 5)]
    edges = spark.createDataFrame(edges_py, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = {r.doc_id: r.rank for r in pagerank(edges, nodes).collect()}

    n = 7
    adj = np.zeros((n, n))
    for a, b in edges_py:
        adj[a][b] = adj[b][a] = 1
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        contrib = np.zeros(n)
        for i in range(n):
            if deg[i]:
                contrib += adj[i] * (r[i] / deg[i])
        r = (1 - _PR_DAMPING) / n + _PR_DAMPING * contrib
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # hub outranks leaves, leaves outrank the teleport-only isolate
    assert got[0] > got[1] > got[6]


def test_canonical_election_one_keeper_per_cluster(spark):
    """Exactly one canonical per component, canonical rank is the
    component max (tie broken to min doc_id), singletons elect
    themselves."""
    from documentai_ocr_spark.queries.simsearch import x_canonical_election

    rows = x_canonical_election(spark, "/root/testdata/sf0.001").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    assert by_comp
    for comp, members in by_comp.items():
        cans = [m for m in members if m.canonical]
        assert len(cans) == 1, comp
        best = max(members, key=lambda m: (m.rank, -m.doc_id))
        assert cans[0].doc_id == best.doc_id
        if len(members) == 1:
            assert members[0].canonical


def test_ivf_sq8_recall_vs_exact(spark):
    """The memory-bounded ANN composition (IVF coarse pruning + int8
    data vectors) must keep top-5 recall >= 0.7 against the exact kNN —
    quantization on top of IVF (recall-gated 0.7 alone) should cost
    little, since midpoint decode perturbs cosines by < one cell."""
    from documentai_ocr_spark.queries.simsearch import (
        _KNN_K,
        x_knn_ivf_sq8,
    )
    from documentai_ocr_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {}
    for r in QUERIES["q_knn_cosine"](spark, sf).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in x_knn_ivf_sq8(spark, sf).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx) == set(exact)
    recalls = [
        len(exact[q] & approx[q]) / _KNN_K for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.7, sum(recalls) / len(recalls)


def test_ann_rerank_recovers_sq8_loss(spark):
    """Two-stage retrieval must (a) clear the SQ8-only recall gate and
    (b) never do WORSE than SQ8-only on the same probe — the exact
    rerank can only fix orderings inside the shortlist, and with a
    5×-deep shortlist the true neighbors are in it."""
    from documentai_ocr_spark.queries import QUERIES
    from documentai_ocr_spark.queries.simsearch import (
        _KNN_K,
        x_ann_rerank,
        x_knn_ivf_sq8,
    )

    sf = "/root/testdata/sf0.001"
    exact = {}
    for r in QUERIES["q_knn_cosine"](spark, sf).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert set(got) == set(exact)
        return sum(
            len(exact[q] & got[q]) / _KNN_K for q in exact
        ) / len(exact)

    r_sq8 = recall(x_knn_ivf_sq8(spark, sf))
    r_rr = recall(x_ann_rerank(spark, sf))
    assert r_rr >= 0.7
    assert r_rr >= r_sq8, (r_rr, r_sq8)


def test_embed_outliers_structure_and_numpy_distance(spark):
    """Exactly top-k rows per label with contiguous ranks and
    non-increasing distances; distances match a numpy recompute of the
    same rounded-centroid rule to within one milli."""
    import numpy as np

    from documentai_ocr_spark.queries.simsearch import (
        _OUTLIER_TOPK,
        q_embed_outliers,
    )
    from documentai_ocr_spark.queries.util import load

    sf = "/root/testdata/sf0.001"
    rows = q_embed_outliers(spark, sf).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    emb = load(spark, sf, "embeddings").collect()
    vecs = {}
    for e in emb:
        vecs.setdefault(e.label, []).append(
            (e.vec_id, np.array(e.embedding, dtype=np.float64))
        )
    for label, got in by_label.items():
        got.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in got] == list(range(1, _OUTLIER_TOPK + 1))
        dists = [r.dist_milli for r in got]
        assert dists == sorted(dists, reverse=True)
        mat = np.stack([v for _, v in vecs[label]])
        cent = np.round(mat.sum(axis=0) / len(mat), 6)
        want = {
            vid: round(float(np.sqrt(((v - cent) ** 2).sum())) * 1000)
            for vid, v in vecs[label]
        }
        for r in got:
            assert abs(r.dist_milli - want[r.vec_id]) <= 1


def test_neardup_hist_reconciles_with_banded_pairs(spark):
    """The radius histogram sums to the banded pair count and stays
    within the pigeonhole radius cap."""
    from documentai_ocr_spark.queries.dedup import _SIMHASH_HAMMING_MAX
    from documentai_ocr_spark.queries.simsearch import (
        q_neardup_hist,
        q_simhash_pairs_banded,
    )

    sf = "/root/testdata/sf0.001"
    hist = q_neardup_hist(spark, sf).collect()
    assert all(0 <= r.hamming <= _SIMHASH_HAMMING_MAX for r in hist)
    n_pairs = q_simhash_pairs_banded(spark, sf).count()
    assert sum(r.n_pairs for r in hist) == n_pairs


def test_embed_drift_python_recount(spark):
    """Whole-corpus replay of q_embed_drift on sf0.001: numpy
    half-centroids (rounded once at 6), ordered cross-dim fold,
    HALF_UP milli quantization — every label row must match. Also the
    i.i.d. sanity bound: parity halves of one label estimate the same
    mean, so drift is small relative to the embedding scale."""
    import math

    import pandas as pd

    from documentai_ocr_spark.queries.simsearch import q_embed_drift

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    halves = {}
    for vec_id, label, v in zip(
        emb["vec_id"], emb["label"], emb["embedding"]
    ):
        halves.setdefault((label, vec_id % 2), []).append(
            [float(x) for x in v]
        )
    want = {}
    labels = {lb for lb, _ in halves}
    for lb in labels:
        if (lb, 0) not in halves or (lb, 1) not in halves:
            continue
        va, vb = halves[(lb, 0)], halves[(lb, 1)]
        dims = len(va[0])
        ma = [round(sum(v[d] for v in va) / len(va), 6) for d in range(dims)]
        mb = [round(sum(v[d] for v in vb) / len(vb), 6) for d in range(dims)]
        acc = 0.0
        for d in range(dims):  # ordered fold, dim ascending
            acc = acc + (ma[d] - mb[d]) * (ma[d] - mb[d])
        drift = math.floor(math.sqrt(acc) * 1000 + 0.5)
        want[lb] = (len(va), len(vb), drift)

    got = {
        r["label"]: (r["n_a"], r["n_b"], r["drift_milli"])
        for r in q_embed_drift(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want
    for _, _, drift in got.values():
        assert drift < 1000  # halves of an i.i.d. label stay close


def test_ivf_pq_recall_vs_exact(spark):
    """IVF-PQ with exact re-rank (24-byte product-quantized data
    vectors, PQ top-(4k) shortlist refined against the originals)
    must keep top-5 recall >= 0.85 against the exact kNN on the
    random-gaussian fixture — PQ's structural worst case (0.65-0.77
    measured WITHOUT the refine stage at the shipped (32, 64)
    config; see the simsearch.py sweep note). 0.85 is the same bar
    the LSH and IVF-flat paths carry."""
    from documentai_ocr_spark.queries import QUERIES
    from documentai_ocr_spark.queries.simsearch import _KNN_K, x_knn_pq

    sf = "/root/testdata/sf0.001"
    exact = {}
    for r in QUERIES["q_knn_cosine"](spark, sf).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in x_knn_pq(spark, sf).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / _KNN_K for q in exact]
    assert sum(recalls) / len(recalls) >= 0.85, sum(recalls) / len(recalls)


def test_pq_codebooks_deterministic_and_shaped(spark):
    """Two training runs over differently-partitioned inputs produce
    BIT-IDENTICAL codebooks (the sorted driver-side combine), and the
    decode round-trip reconstructs every vector from codewords only
    (each sub-block of the output is one of the Ks codewords)."""
    import numpy as np

    from documentai_ocr_spark.queries.simsearch import (
        _decode_pq,
        _emb_double,
        _pq_codebooks,
    )

    sf = "/root/testdata/sf0.001"
    e = _emb_double(spark, sf)
    m, ks = 8, 16
    b1 = _pq_codebooks(e.repartition(3), m, ks, 2)
    b2 = _pq_codebooks(e.repartition(11), m, ks, 2)
    assert b1.shape == (m, ks, 64 // m)
    assert np.array_equal(b1, b2)
    dec = {
        r["vec_id"]: np.asarray(r["emb"])
        for r in _decode_pq(e, m, ks).limit(50).collect()
    }
    sd = 64 // m
    for vid, v in dec.items():
        for j in range(m):
            sub = v[j * sd : (j + 1) * sd]
            assert any(
                np.array_equal(sub, b1[j][c]) for c in range(ks)
            ), (vid, j)


def test_pq_codebooks_reject_nondividing_m(spark):
    """m that does not divide the vector dim must refuse loudly — a
    truncating sub_d would leave the dim tail unquantized and the
    decode output uninitialized."""
    import pytest as _pytest

    from documentai_ocr_spark.queries.simsearch import (
        _emb_double,
        _pq_codebooks,
    )

    e = _emb_double(spark, "/root/testdata/sf0.001")
    with _pytest.raises(ValueError, match="must divide"):
        _pq_codebooks(e, 24, 16, 1)
