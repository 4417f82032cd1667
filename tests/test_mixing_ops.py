"""Invariants for the mixing / pair-mining / supersession operators
beyond the DuckDB value gate: preference-pair margin & tie laws,
waterfilling budget feasibility, threshold-yield monotonicity,
template rediscovery, and prefix-supersession's constructed truth
table (which groups must / must not be superseded)."""

import pyspark.sql.functions as F

from documentai_ocr_spark.queries.corpusops import (
    _CONV_PER_GROUP,
    _PSUP_EDIT_MOD,
    _TEMPLATE_MIN_CONVS,
    _TEMPLATES,
    q_prefix_supersede,
    q_template_turns,
)
from documentai_ocr_spark.queries.relational import (
    _PREF_MARGIN_MILLI,
    q_preference_pairs,
)
from documentai_ocr_spark.queries.relevance import q_mixture_alloc
from documentai_ocr_spark.queries.textstats import q_threshold_yield
from documentai_ocr_spark.queries.util import load

SF = "/root/testdata/sf0.001"


def test_preference_pairs_margin_and_distinct_engines(spark):
    """Every kept pair clears the margin, chosen != rejected, and the
    margin is exactly chosen - rejected (integer-milli law)."""
    out = q_preference_pairs(spark, SF).cache()
    assert out.count() > 0
    assert (
        out.where(
            F.col("margin") < _PREF_MARGIN_MILLI / 1000.0
        ).count()
        == 0
    )
    assert (
        out.where(F.col("chosen_engine") == F.col("rejected_engine")).count()
        == 0
    )
    assert (
        out.where(
            F.abs(
                F.col("margin")
                - (F.col("chosen_score") - F.col("rejected_score"))
            )
            > 1e-9
        ).count()
        == 0
    )
    out.unpersist()


def test_preference_pairs_matches_python_spec(spark):
    """Re-derive chosen/rejected for a sample of doc_ids with pure
    Python md5 and the documented tie rule; the engine must agree."""
    import hashlib

    out = {
        r.doc_id: r
        for r in q_preference_pairs(spark, SF).limit(50).collect()
    }
    engines = ["beam", "greedy", "nucleus", "sampled"]
    for doc_id, row in out.items():
        cand = [
            (
                int(
                    hashlib.md5(f"{doc_id}@{e}".encode()).hexdigest()[:8],
                    16,
                )
                % 1000,
                e,
            )
            for e in engines
        ]
        b = max(cand)
        w = min(cand)
        assert b[0] - w[0] >= _PREF_MARGIN_MILLI
        assert (row.chosen_engine, row.rejected_engine) == (b[1], w[1])
        assert abs(row.margin - (b[0] - w[0]) / 1000.0) < 1e-12


def test_mixture_alloc_budget_feasibility(spark):
    """Grants are feasible (0 <= alloc <= avail, capped means
    alloc == avail) and the total hits the budget up to the per-source
    floor slack; when nothing is capped-short the sum never exceeds
    B."""
    rows = q_mixture_alloc(spark, SF).collect()
    assert rows
    total = sum(r.avail_tokens for r in rows)
    budget = total // 2
    got = sum(r.alloc_tokens for r in rows)
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.avail_tokens
        if r.capped:
            assert r.alloc_tokens == r.avail_tokens
    n_uncapped = sum(1 for r in rows if not r.capped)
    if n_uncapped:
        # floors lose < 1 token per uncapped source
        assert budget - n_uncapped < got <= budget
    else:
        assert got == total  # budget >= corpus: everything granted


def test_threshold_yield_monotone_and_anchored(spark):
    """Retention is non-increasing in the threshold, the 0-threshold
    row retains every non-empty doc, and token_frac is retained /
    total at every row."""
    rows = sorted(
        q_threshold_yield(spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 20 and rows[0].threshold == 0.0
    docs = load(spark, SF, "documents")
    n_nonempty = docs.where(F.length("text") > 0).count()
    assert rows[0].docs_retained == n_nonempty
    for a, b in zip(rows, rows[1:]):
        assert b.docs_retained <= a.docs_retained
        assert b.tokens_retained <= a.tokens_retained
    tot = rows[0].tokens_retained
    for r in rows:
        assert abs(r.token_frac - round(r.tokens_retained / tot, 6)) < 1e-9


def test_template_turns_rediscovers_injected_set(spark):
    """The detector finds EXACTLY the injected canned turns: one row
    per template, each with conversation support >= the gate."""
    import hashlib

    rows = q_template_turns(spark, SF).collect()
    want = {
        hashlib.md5(
            " ".join(t.lower().split()).encode()
        ).hexdigest()
        for t in _TEMPLATES
    }
    assert {r.th for r in rows} == want
    for r in rows:
        assert r.n_convs >= _TEMPLATE_MIN_CONVS
        assert r.n_uses >= r.n_convs


def test_prefix_supersede_constructed_truth_table(spark):
    """The fixture's ground truth: a part-session is superseded by its
    full session exactly when it is strictly shorter and NOT edited
    (g % _PSUP_EDIT_MOD != 0); full sessions are never superseded."""
    rows = q_prefix_supersede(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    m = max(n_docs // _CONV_PER_GROUP, 1)
    by_id = {r.sess_id: r for r in rows}
    assert len(rows) == 2 * m
    checked_pos = checked_neg = 0
    for g in range(m):
        full = by_id[f"s-{g:08d}-full"]
        part = by_id[f"s-{g:08d}-part"]
        assert not full.is_superseded and full.superseded_by is None
        strictly_shorter = part.n_turns < full.n_turns
        edited = g % _PSUP_EDIT_MOD == 0
        if strictly_shorter and not edited:
            assert part.is_superseded
            assert part.superseded_by == full.sess_id
            checked_pos += 1
        else:
            assert not part.is_superseded
            checked_neg += (1 if edited and strictly_shorter else 0)
    # the fixture must exercise BOTH branches for the test to mean much
    assert checked_pos > 0 and checked_neg > 0


def test_engine_winrate_accounting(spark):
    """6 unordered pairs, wins + ties <= prompts, win_rate = wins /
    prompts, and every pair saw every prompt."""
    from documentai_ocr_spark.queries.relational import q_engine_winrate

    rows = q_engine_winrate(spark, SF).collect()
    assert len(rows) == 6
    n_prompts = {r.n_prompts for r in rows}
    assert len(n_prompts) == 1  # every pair scored every prompt
    for r in rows:
        assert r.engine_a < r.engine_b
        assert 0 <= r.n_wins + r.n_ties <= r.n_prompts
        assert abs(r.win_rate - round(r.n_wins / r.n_prompts, 6)) < 1e-9


def test_bpe_merge_candidates_against_python(spark):
    """The top pair table equals a pure-Python recount on the same
    corpus (weighted by word frequency, char-grain pairs)."""
    from collections import Counter

    from documentai_ocr_spark.queries.textstats import (
        _BPE_TOPK,
        q_bpe_merge_candidates,
    )

    got = [(r.pair, r.n) for r in q_bpe_merge_candidates(spark, SF).collect()]
    texts = [
        r.text for r in load(spark, SF, "documents").select("text").collect()
    ]
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    pc = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += f
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOPK]
    assert got == want


def test_rare_token_docs_rule_and_bounds(spark):
    """Rarity is the documented relative rule; every emitted doc has
    n_rare >= 1 and ratios in (0, 1]."""
    from collections import Counter

    from documentai_ocr_spark.queries.textstats import (
        _RARE_DIV,
        q_rare_token_docs,
    )

    rows = q_rare_token_docs(spark, SF).collect()
    assert rows  # the fixture corpus has a rare tail
    texts = [
        (r.doc_id, r.text)
        for r in load(spark, SF, "documents").collect()
    ]
    vocab = Counter(w for _, t in texts for w in t.split(" ") if w)
    total = sum(vocab.values())
    rare = {w for w, c in vocab.items() if c * len(vocab) * _RARE_DIV <= total}
    want = {}
    for doc_id, t in texts:
        toks = [w for w in t.split(" ") if w]
        n_rare = sum(1 for w in toks if w in rare)
        if n_rare:
            want[doc_id] = (len(toks), n_rare)
    got = {r.doc_id: (r.n_toks, r.n_rare) for r in rows}
    assert got == want
    for r in rows:
        assert 0 < r.rare_ratio <= 1
        assert r.n_distinct_rare <= r.n_rare


def _waterfill_closed(avails, weights, budget):
    """The documented closed form: sort by avail/weight asc, pivot =
    first position where the remaining budget spread over remaining
    weights no longer exceeds the ratio; integer grants."""
    order = sorted(
        range(len(avails)),
        key=lambda i: (avails[i] / weights[i], i),
    )
    a_prev, w_from = 0, sum(weights)
    pivot, lnum, lden = None, None, None
    for j in order:
        if (budget - a_prev) * weights[j] <= avails[j] * w_from:
            pivot, lnum, lden = j, budget - a_prev, w_from
            break
        a_prev += avails[j]
        w_from -= weights[j]
    grants = {}
    passed_pivot = False
    for j in order:
        if pivot is None:
            grants[j] = avails[j]
            continue
        if j == pivot:
            passed_pivot = True
        grants[j] = (
            lnum * weights[j] // lden if passed_pivot else avails[j]
        )
    return grants


def _waterfill_iterative(avails, weights, budget):
    """Independent reference: repeatedly cap any source whose avail is
    below its tentative share, until stable; grants by the final
    level."""
    n = len(avails)
    capped = set()
    while True:
        rem_b = budget - sum(avails[i] for i in capped)
        rem_w = sum(weights[i] for i in range(n) if i not in capped)
        if rem_w == 0:
            break
        # cap when the source CANNOT absorb its tentative share:
        # avail < level*weight  <=>  avail*rem_w < rem_b*weight
        newly = {
            i
            for i in range(n)
            if i not in capped and avails[i] * rem_w < rem_b * weights[i]
        }
        if not newly:
            break
        capped |= newly
    rem_b = budget - sum(avails[i] for i in capped)
    rem_w = sum(weights[i] for i in range(n) if i not in capped)
    return {
        i: (
            avails[i]
            if i in capped or rem_w == 0
            else rem_b * weights[i] // rem_w
        )
        for i in range(n)
    }


def test_waterfill_closed_form_matches_iterative_reference():
    """200 random cases: the single-pass pivot form (what the SQL and
    the Spark plan compute) equals the classic iterate-until-stable
    waterfilling, grant for grant."""
    import random

    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 8)
        avails = [rng.randint(1, 500) for _ in range(n)]
        weights = [rng.randint(1, 3) for _ in range(n)]
        budget = sum(avails) // 2
        got = _waterfill_closed(avails, weights, budget)
        want = _waterfill_iterative(avails, weights, budget)
        assert got == want, (avails, weights, budget, got, want)


def test_mixture_alloc_handcrafted_corpus(spark, tmp_path):
    """A hand-built corpus with one dominant source: the small sources
    must be capped at their full avail, the big one takes the rest of
    the budget; grants equal the closed form computed with the same
    md5 weights."""
    import hashlib

    import pandas as pd

    d = tmp_path / "wf"
    d.mkdir()
    rows = []
    texts = {
        "tiny": "alpha beta",                      # 2 tokens
        "small": "one two three four",             # 4 tokens
        "big": " ".join(f"w{i}" for i in range(100)),  # 100 tokens
    }
    for i, (src, txt) in enumerate(sorted(texts.items())):
        rows.append({"doc_id": i, "source": src, "text": txt})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")

    out = {r.source: r for r in q_mixture_alloc(spark, str(d)).collect()}
    avails = {s: len(t.split()) for s, t in texts.items()}
    weights = {
        s: 1 + int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 3
        for s in texts
    }
    srcs = sorted(texts)
    grants = _waterfill_closed(
        [avails[s] for s in srcs],
        [weights[s] for s in srcs],
        sum(avails.values()) // 2,
    )
    for j, s in enumerate(srcs):
        assert out[s].avail_tokens == avails[s]
        assert out[s].weight == weights[s]
        assert out[s].alloc_tokens == grants[j], (s, out[s], grants)
    # the two small sources cannot absorb a weighted half-budget share:
    # they must be capped, and the big one must not be
    assert out["tiny"].capped and out["small"].capped
    assert not out["big"].capped


def test_mixing_plan_reconciles_with_component_operators(spark):
    """The composed plan's accounting reconciles with the standalone
    operators it shares renderings with: template drops sum to
    q_template_turns' total uses, per-source docs add up, grants obey
    the waterfilling feasibility laws on the SURVIVING pool."""
    from documentai_ocr_spark.queries.corpusops import q_mixing_plan

    rows = q_mixing_plan(spark, SF).collect()
    assert rows
    # template drops across sources == total uses of detected templates
    tmpl_uses = sum(
        r.n_uses for r in q_template_turns(spark, SF).collect()
    )
    assert sum(r.n_dropped_template for r in rows) == tmpl_uses
    n_docs = load(spark, SF, "documents").count()
    assert sum(r.n_docs_in for r in rows) == n_docs
    total = sum(r.avail_tokens for r in rows)
    budget = total // 2
    got = sum(r.alloc_tokens for r in rows)
    for r in rows:
        assert (
            r.n_dropped_template + r.n_dropped_quality <= r.n_docs_in
        )
        assert 0 <= r.alloc_tokens <= r.avail_tokens
        if r.capped:
            assert r.alloc_tokens == r.avail_tokens
    n_uncapped = sum(1 for r in rows if not r.capped)
    if n_uncapped:
        assert budget - n_uncapped < got <= budget
    else:
        assert got == total


def test_class_weights_normalization_and_monotonicity(spark):
    """Weights sum to the class count and are non-increasing in class
    size (bigger classes never get bigger weights)."""
    from documentai_ocr_spark.queries.relevance import q_class_weights

    rows = q_class_weights(spark, SF).collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - len(rows)) < 1e-3
    by_n = sorted(rows, key=lambda r: r.n)
    for a, b in zip(by_n, by_n[1:]):
        if a.n < b.n:
            assert a.weight >= b.weight


def test_prefix_supersede_separator_aliasing_rejected(spark, tmp_path):
    """Adversarial separator bytes inside turn text cannot forge a
    prefix match: a crafted 16-doc corpus where group 0's (edited, so
    not genuinely superseded) part-session raw-concat EQUALS group 1's
    depth-2 raw-concat — the pre-fix scheme would have matched them —
    must NOT mark group 0's part superseded under the hash-of-hashes
    fingerprint."""
    import pandas as pd

    from documentai_ocr_spark.queries.corpusops import q_prefix_supersede

    # m = 16 // _CONV_PER_GROUP = 2: even doc_ids -> g0, odd -> g1.
    # g0 is edited (0 % 5 == 0): its part = [doc0, doc2 + ' [edited]'].
    # Craft g1's first two turns so the RAW depth-2 concat aliases
    # g0-part's full raw concat across a shifted turn boundary.
    texts = {i: f"filler-{i}" for i in range(16)}
    texts[0] = "a\x1fb"
    texts[2] = "c"          # g0-part = ['a\x1fb', 'c [edited]']
    texts[1] = "a"
    texts[3] = "b\x1fc [edited]"  # g1 depth-2 raw = 'a\x1fb\x1fc [edited]'
    pd.DataFrame(
        [{"doc_id": i, "text": texts[i]} for i in range(16)]
    ).to_parquet(tmp_path / "documents.parquet")

    # prove the fixture really exercises the aliasing: the raw concats
    # ARE equal (the pre-fix scheme would have joined them)
    g0_part_raw = "\x1f".join(["a\x1fb", "c [edited]"])
    g1_d2_raw = "\x1f".join(["a", "b\x1fc [edited]"])
    assert g0_part_raw == g1_d2_raw

    rows = {r.sess_id: r for r in q_prefix_supersede(spark, str(tmp_path)).collect()}
    p0 = rows["s-00000000-part"]
    assert not p0.is_superseded and p0.superseded_by is None
