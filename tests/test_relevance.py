"""Relevance / mixture-statistics operators: invariants that the DuckDB
value-hash gate cannot express — sketch-vs-exact quantile equivalence,
mixture-weight normalization, and BM25 ordering sanity."""

import pyspark.sql.functions as F
import pytest

from documentai_ocr_spark.queries.relevance import (
    _MIX_ALPHA,
    _QUANTILE_PS,
    q_bm25,
    q_domain_mix,
    q_length_quantiles,
    q_tfidf_topterms,
)

SF = "/root/testdata/sf0.001"


def test_quantile_sketch_brackets_exact(spark):
    """percentile_approx (the mergeable single-pass sketch — the 100-TB
    path) returns an actual data value; the exact operator interpolates.
    At full accuracy the sketch value must be one of the two order
    statistics bracketing the interpolation point — i.e. within one
    discrete step of the exact quantile, the tightest claim a
    value-returning sketch can satisfy."""
    exact = {
        (r.source, r.qi): r.quantile
        for r in q_length_quantiles(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_source = {
        r.source: sorted(r.xs)
        for r in docs.groupBy("source")
        .agg(F.collect_list("n_chars").alias("xs"))
        .collect()
    }
    from documentai_ocr_spark.queries.relevance import (
        x_length_quantiles_approx,
    )

    rows = [
        type("R", (), {"source": r.source, "qi": r.qi, "q": r.quantile})
        for r in x_length_quantiles_approx(spark, SF).collect()
    ]
    assert len(rows) == len(exact)
    import math

    for r in rows:
        xs = per_source[r.source]
        pos = _QUANTILE_PS[r.qi] * (len(xs) - 1)
        lo, hi = xs[math.floor(pos)], xs[math.ceil(pos)]
        assert lo <= r.q <= hi, (r.source, r.qi, r.q, lo, hi)
        # and the interpolated exact lies in the same bracket
        assert lo <= exact[(r.source, r.qi)] <= hi


def test_domain_mix_weights_normalize_and_flatten(spark):
    rows = q_domain_mix(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # alpha<1 flattens the mixture: the biggest source loses share,
    # the smallest gains
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.weight < big.share or big.n_tokens == small.n_tokens
    assert small.weight > small.share or big.n_tokens == small.n_tokens
    assert 0 < _MIX_ALPHA < 1


def test_tfidf_rank_contract(spark):
    df = q_tfidf_topterms(spark, SF)
    per_doc = df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rank").alias("maxr"),
        F.min("tfidf").alias("lo"),
    )
    bad = per_doc.where((F.col("n") > 3) | (F.col("maxr") > 3)).count()
    assert bad == 0
    # rank 1 score >= rank 3 score within every doc
    r1 = df.where(F.col("rank") == 1).select("doc_id", F.col("tfidf").alias("s1"))
    r3 = df.where(F.col("rank") == 3).select("doc_id", F.col("tfidf").alias("s3"))
    assert r1.join(r3, "doc_id").where(F.col("s1") < F.col("s3")).count() == 0


def test_bm25_rewards_term_density(spark):
    """A synthetic doc saturated with the query terms must outscore a
    same-length doc with a single hit."""
    docs = spark.createDataFrame(
        [
            (1, "vector merge stream window vector merge stream window"),
            (2, "vector aa bb cc dd ee ff gg"),
            (3, "aa bb cc dd ee ff gg hh"),
        ],
        "doc_id long, text string",
    )
    import documentai_ocr_spark.queries.relevance as rel

    saved = rel.load
    rel.load = lambda spark, sf_dir, name: docs
    try:
        out = {r.doc_id: r for r in q_bm25(spark, "ignored").collect()}
    finally:
        rel.load = saved
    assert 3 not in out  # no hits -> no row
    assert out[1].n_hits == 4 and out[2].n_hits == 1
    assert out[1].bm25 > out[2].bm25 > 0


@pytest.mark.parametrize("q", [q_length_quantiles, q_domain_mix])
def test_mixture_queries_tiny_group_count(spark, q):
    """Both mixture queries must reduce to one row per (source[, p]) —
    the shuffle output is group-sized, never corpus-sized."""
    n_sources = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    n = q(spark, SF).count()
    assert n in (n_sources, n_sources * len(_QUANTILE_PS))


def test_dsir_weights_favor_target_domain(spark):
    """Documents from the target domain ('src0') must score a higher
    mean importance weight than the rest of the corpus — the defining
    property of the likelihood-ratio selector (target docs' features
    are by construction more probable under the target model)."""
    from documentai_ocr_spark.queries.relevance import q_dsir_weights
    from documentai_ocr_spark.queries.util import load

    w = q_dsir_weights(spark, SF)
    src = load(spark, SF, "documents").select("doc_id", "source")
    j = {
        (r.source,): r.m
        for r in w.join(src, "doc_id")
        .groupBy("source")
        .agg(F.avg(F.col("dsir_weight") / F.col("n_toks")).alias("m"))
        .collect()
    }
    tgt = j[("src0",)]
    others = [v for k, v in j.items() if k != ("src0",)]
    assert others and all(tgt > o for o in others)


def test_bigram_logprob_prefers_predictable_text(spark):
    """A document whose bigrams repeat (predictable under the corpus
    LM) must outscore one of all-distinct never-repeated bigrams."""
    import os
    import tempfile

    import pandas as pd

    from documentai_ocr_spark.queries.textstats import q_bigram_logprob

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b " * 20, " ".join(f"z{i}" for i in range(40))],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [80, 160],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r.doc_id: r.avg_logprob
               for r in q_bigram_logprob(spark, d).collect()}
    assert out[1] > out[2]


def test_weighted_sample_matches_python_spec(spark):
    """The Spark top-K must equal a pure-Python re-derivation of the
    A-ES race keys (md5-seeded u, key = ln(u)/w) — determinism and
    exact key arithmetic in one check."""
    import hashlib
    import math

    from documentai_ocr_spark.queries.corpusops import (
        _WSAMPLE_K,
        q_weighted_sample,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()

    def key(doc_id, w):
        h = int(hashlib.md5(f"rs:{doc_id}".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 4294967296.0) / w

    want = sorted(
        ((key(r.doc_id, r.n_chars), r.doc_id) for r in docs),
        key=lambda t: (-t[0], t[1]),
    )[:_WSAMPLE_K]
    got = q_weighted_sample(spark, SF).collect()
    assert [r.doc_id for r in got] == [d for _, d in want]
    for r, (k, _) in zip(got, want):
        assert r.race_key == round(k, 9)


def test_score_drift_psi_terms_nonneg_and_counts_reconcile(spark):
    """Every PSI contribution is ≥0 by construction ((pa-pb) and
    ln(pa/pb) share sign), the bin grid's counts reconcile with the raw
    halves, and the fixture actually drifts somewhere."""
    from documentai_ocr_spark.queries.relevance import q_score_drift
    from documentai_ocr_spark.queries.util import load

    out = q_score_drift(spark, SF).cache()
    assert out.where(F.col("psi_term") < 0).count() == 0
    assert out.where(F.col("psi_term") > 0).count() > 0
    tot = out.agg(F.sum("ca"), F.sum("cb")).collect()[0]
    docs = load(spark, SF, "documents")
    assert tot[0] == docs.where(F.col("doc_id") % 2 == 0).count()
    assert tot[1] == docs.where(F.col("doc_id") % 2 == 1).count()
    out.unpersist()


def test_embed_audit_detects_each_injected_fault(spark):
    """The audit must see every injected fault class (nulls, zero
    vectors, truncated dims) and report a sane nonzero-norm range."""
    from documentai_ocr_spark.queries.relevance import q_embed_audit

    out = q_embed_audit(spark, SF).cache()
    agg = out.agg(
        F.sum("n_null"), F.sum("n_bad_dim"), F.sum("n_zero"),
        F.sum("n_vecs"),
    ).collect()[0]
    assert agg[0] > 0 and agg[1] > 0 and agg[2] > 0
    assert agg[0] + agg[1] + agg[2] < agg[3]
    assert out.where(
        (F.col("min_norm") <= 0) | (F.col("min_norm") > F.col("max_norm"))
    ).count() == 0
    out.unpersist()


def test_langid_eval_confusion_laws(spark):
    """Scorecard laws: supports and predictions both partition the
    corpus, tp never exceeds either side, zh is structurally
    unreachable (no zh stopword rows → tp=0, predicted=0) while 'unk'
    is prediction-only (support=0, recall NULL) — the two asymmetric
    classes the full-outer join must both surface."""
    from documentai_ocr_spark.queries.textstats import q_langid_eval
    from documentai_ocr_spark.queries.util import load

    out = q_langid_eval(spark, SF).cache()
    n_docs = load(spark, SF, "documents").count()
    agg = out.agg(
        F.sum("support"), F.sum("predicted"), F.sum("tp")
    ).collect()[0]
    assert agg[0] == n_docs and agg[1] == n_docs
    assert agg[2] <= n_docs
    assert out.where(
        (F.col("tp") > F.col("support")) | (F.col("tp") > F.col("predicted"))
    ).count() == 0
    rows = {r["cls"]: r for r in out.collect()}
    assert rows["zh"]["tp"] == 0 and rows["zh"]["predicted"] == 0
    assert rows["zh"]["precision"] is None
    assert rows["unk"]["support"] == 0 and rows["unk"]["recall"] is None
    # the classifier is genuinely right somewhere
    assert any(
        r["tp"] > 0 for r in rows.values()
    )
    out.unpersist()


def test_bpe_encode_spec_and_corpus_recount(spark):
    """bpe_encode_len hand fixtures (overlap, rank priority, no-merge)
    plus x_bpe_encode against a full pure-Python recount at sf0.001 —
    the encode path, the word split, and the distinct-word cache all
    verified end-to-end."""
    from documentai_ocr_spark.queries import QUERIES
    from documentai_ocr_spark.queries.textstats import bpe_encode_len

    # hand fixtures: ranks {'aa': 0, 'ab': 1}
    r = {"aa": 0, "ab": 1}
    assert bpe_encode_len("aaaa", r) == 2      # (aa)(aa)
    assert bpe_encode_len("aaa", r) == 2       # (aa)a — greedy L-to-R
    assert bpe_encode_len("aab", r) == 2       # aa wins rank over ab
    assert bpe_encode_len("ab", r) == 1
    assert bpe_encode_len("ba", r) == 2        # no merge applies
    assert bpe_encode_len("", r) == 0
    # after (aa) merges, the 2-char symbol can't merge again
    assert bpe_encode_len("aaab", r) == 2      # (aa)(ab)

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["q_bpe_merge_candidates"](spark, sf).collect()
    ranks = {row.pair: i for i, row in enumerate(rows)}
    got = {
        row.doc_id: (
            row.n_words,
            row.n_chars,
            row.n_bpe_tokens,
            row.compress_milli,
        )
        for row in QUERIES["x_bpe_encode"](spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    assert len(got) == len(docs)
    changed = 0
    for d in docs:
        words = [w for w in (d.text or "").split(" ") if w]
        nc = sum(len(w) for w in words)
        nt = sum(bpe_encode_len(w, ranks) for w in words)
        exp = (len(words), nc, nt, (nt * 1000) // nc if nc else 0)
        assert got[d.doc_id] == exp, (d.doc_id, got[d.doc_id], exp)
        if nt < nc:
            changed += 1
    assert changed > 0  # the merge table actually compresses something


def test_oov_gate_python_recount(spark):
    """Whole-corpus replay on sf0.001: rebuild the reference-slice
    bigram vocabulary and every per-doc OOV verdict in pure Python —
    all columns of all rows must match."""
    import pandas as pd

    from documentai_ocr_spark.queries.relevance import (
        _OOV_DROP_MILLI,
        _OOV_MIN_CNT,
        _OOV_REF_MOD,
        q_oov_gate,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def bigrams(text):
        w = [x for x in text.split(" ") if x != ""]
        return [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]

    cnt = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if doc_id % _OOV_REF_MOD == 0:
            for bg in bigrams(text):
                cnt[bg] = cnt.get(bg, 0) + 1
    vocab = {bg for bg, c in cnt.items() if c >= _OOV_MIN_CNT}

    got = {
        r["doc_id"]: r
        for r in q_oov_gate(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(got) == len(docs)
    for doc_id, source, text in zip(
        docs["doc_id"], docs["source"], docs["text"]
    ):
        bgs = bigrams(text)
        n_oov = sum(1 for bg in bgs if bg not in vocab)
        if not bgs:
            milli, kept = 1000, False
        else:
            milli = 1000 * n_oov // len(bgs)
            kept = milli < _OOV_DROP_MILLI
        g = got[doc_id]
        assert (
            g["source"],
            g["n_toks"],
            g["n_bg"],
            g["n_oov"],
            g["oov_milli"],
            g["kept"],
        ) == (
            source,
            sum(1 for w in text.split(" ") if w != ""),
            len(bgs),
            n_oov,
            milli,
            kept,
        ), doc_id


def test_oov_gate_engineered_verdicts(spark, tmp_path):
    """Edge corpus through the real Spark path AND the registered
    oracle: in-vocab text kept, all-unseen text dropped at 1000,
    sub-bigram and empty docs pinned to the 1000/dropped sentinel."""
    import duckdb
    import pandas as pd

    from documentai_ocr_spark.queries import ORACLES
    from documentai_ocr_spark.queries.relevance import q_oov_gate

    ref = " ".join(["a b"] * 8)  # bigrams 'a b' x8, 'b a' x7 in slice
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 7, 1, 2, 3, 4],
            "source": ["s"] * 6,
            "text": [ref, ref, "a b a b a", "zz qq ww zz qq", "solo", ""],
        }
    )
    d = str(tmp_path / "oov")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in q_oov_gate(spark, d).collect()}
    assert rows[1]["oov_milli"] == 0 and rows[1]["kept"]
    assert rows[2]["oov_milli"] == 1000 and not rows[2]["kept"]
    assert rows[3]["n_bg"] == 0 and rows[3]["oov_milli"] == 1000
    assert not rows[3]["kept"] and not rows[4]["kept"]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    ora = {
        r[0]: r
        for r in con.sql(ORACLES["q_oov_gate"]).fetchall()
    }
    for doc_id, r in rows.items():
        assert tuple(ora[doc_id]) == (
            r["doc_id"],
            r["source"],
            r["n_toks"],
            r["n_bg"],
            r["n_oov"],
            r["oov_milli"],
            r["kept"],
        ), doc_id


def test_source_kl_python_recount_and_gibbs(spark):
    """Whole-corpus replay of the KL estimator in pure Python over
    sf0.001 (agreement to the 6-decimal published precision) plus the
    Gibbs inequality: every per-source KL to the corpus marginal is
    >= 0, and a single-source corpus is exactly 0."""
    import math

    import pandas as pd

    from documentai_ocr_spark.queries.relevance import q_source_kl

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    sw, st, cw = {}, {}, {}
    for source, text in zip(docs["source"], docs["text"]):
        for w in text.split(" "):
            if w == "":
                continue
            sw[(source, w)] = sw.get((source, w), 0) + 1
            st[source] = st.get(source, 0) + 1
            cw[w] = cw.get(w, 0) + 1
    tc = sum(cw.values())
    kl = {}
    nw = {}
    for (source, w), c in sw.items():
        t = st[source]
        kl[source] = kl.get(source, 0.0) + (c / t) * math.log(
            (c * tc) / (t * cw[w])
        )
        nw[source] = nw.get(source, 0) + 1

    got = {r["source"]: r for r in q_source_kl(spark, sf).collect()}
    assert set(got) == set(kl)
    for src in kl:
        g = got[src]
        assert (g["n_words"], g["n_toks"]) == (nw[src], st[src])
        assert abs(g["kl"] - round(kl[src], 6)) <= 2e-6, src
        assert g["kl"] >= 0.0, src  # Gibbs: KL to the marginal

    one = docs[docs["source"] == docs["source"].iloc[0]]
    # single-source corpus: source marginal IS the corpus marginal
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        one.to_parquet(os.path.join(d, "documents.parquet"))
        solo = q_source_kl(spark, d).collect()
        assert len(solo) == 1 and solo[0]["kl"] == 0.0
