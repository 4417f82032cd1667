"""Webtext operators: compression-ratio proxy (pure-Python recount),
URL/domain extraction (closed-form coin recount), adjacent-turn echo
(Spark == registered oracle on an engineered temp corpus)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from documentai_ocr_spark.queries import ORACLES
from documentai_ocr_spark.queries.webtext import (
    _compress_len,
    q_echo_rate,
    q_url_domains,
    _x_compression_ratio,
)

SF = "/root/testdata/sf0.001"


def test_compression_ratio_matches_python_recount(spark):
    """Whole-corpus exactness: every (raw, comp, ratio) row equals the
    pure-Python zlib recount — the Arrow boundary changes nothing."""
    got = {
        r["doc_id"]: (r["raw_bytes"], r["comp_bytes"], r["ratio_milli"])
        for r in _x_compression_ratio(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(got) == len(docs)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        raw = len(text.encode("utf-8"))
        comp = _compress_len(text)
        ratio = 1000 if raw == 0 else comp * 1000 // raw
        assert got[doc_id] == (raw, comp, ratio), doc_id


def test_compression_ratio_separates_repetitive_from_natural(
    spark, tmp_path
):
    """The quality-proxy property the screen exists for: templated
    repetition compresses far below varied text; empty text pins the
    raw_bytes=0 guard."""
    varied = " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["spam ham " * 100, varied, ""],
        }
    )
    d = str(tmp_path / "comp")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r for r in _x_compression_ratio(spark, d).collect()
    }
    assert rows[1]["ratio_milli"] < rows[2]["ratio_milli"] // 2
    assert rows[3]["raw_bytes"] == 0 and rows[3]["ratio_milli"] == 1000


def test_url_domains_closed_form_recount(spark):
    """The injection rule is deterministic, so the whole report has a
    closed form: total links = #{(doc,t): (doc+t)%3=0} +
    #{(doc,t): (doc+t)%7=2}, and the domain set is exactly the coin's
    range. Independently recounted in pure Python."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ids = list(docs["doc_id"])
    per_domain: dict[str, set] = {}
    n_urls: dict[str, int] = {}
    for doc in ids:
        for t in range(12):
            if (doc + t) % 3 == 0:
                dom = f"d{(doc * 7 + t) % 23}.example.com"
                n_urls[dom] = n_urls.get(dom, 0) + 1
                per_domain.setdefault(dom, set()).add(doc)
            if (doc + t) % 7 == 2:
                dom = f"m{(doc * 11 + t) % 13}.test.org"
                n_urls[dom] = n_urls.get(dom, 0) + 1
                per_domain.setdefault(dom, set()).add(doc)
    got = {
        r["domain"]: (r["n_urls"], r["n_convs"])
        for r in q_url_domains(spark, SF).collect()
    }
    assert set(got) == set(n_urls)
    for dom in n_urls:
        assert got[dom] == (n_urls[dom], len(per_domain[dom])), dom


@pytest.mark.parametrize("seed_texts", [
    # 3-word doc: every 8-token slice is the whole vocab → adjacent
    # turns echo maximally; 30 distinct words: stride 29 mod 30 walks
    # the start back one word per turn, so consecutive end-clamped
    # slices overlap partially ({29} vs {28,29} → 500‰, …)
    ["echo echo echo", " ".join(f"u{i}" for i in range(30)), ""],
])
def test_echo_rate_spark_equals_oracle_on_engineered_corpus(
    spark, tmp_path, seed_texts
):
    """Engine parity where it matters: a corpus engineered for maximal
    echo (tiny vocab), partial overlap (distinct 64-word text), and the
    empty-text edge (both-empty pair → echo 1000) — the Spark query and
    its registered DuckDB oracle must agree row-for-row."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(seed_texts) + 1)),
            "text": seed_texts,
        }
    )
    d = str(tmp_path / "echo")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    got = sorted(
        tuple(r) for r in q_echo_rate(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(ORACLES["q_echo_rate"]).fetchall())
    assert got == want
    by_id = {r[0]: r for r in got}
    # tiny-vocab doc: every adjacent pair is the identical {echo} set
    assert by_id[1][2] == by_id[1][3] == 1000  # max == mean == 1000
    # empty doc: all slices empty → both-empty convention, echo 1000
    assert by_id[3][2] == 1000
    # 64-distinct-word doc: overlap exists but is never total
    assert 0 < by_id[2][3] < 1000


def test_url_blocklist_closed_form_recount(spark):
    """The blocklist report has a closed form too: replay the injection
    coins per (doc, t), apply the %5 blocklist rule in pure Python, and
    aggregate per source — every column of every row must match."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_src: dict[str, dict] = {}
    for doc, src in zip(docs["doc_id"], docs["source"]):
        links = blocked = 0
        for t in range(12):
            if (doc + t) % 3 == 0:
                links += 1
                blocked += ((doc * 7 + t) % 23) % 5 == 0
            if (doc + t) % 7 == 2:
                links += 1
                blocked += ((doc * 11 + t) % 13) % 5 == 0
        a = per_src.setdefault(
            src,
            {"n_convs": 0, "n_cited": 0, "n_dropped": 0,
             "n_links": 0, "n_blocked_links": 0},
        )
        a["n_convs"] += 1
        a["n_cited"] += links > 0
        a["n_dropped"] += blocked > 0
        a["n_links"] += links
        a["n_blocked_links"] += blocked
    from documentai_ocr_spark.queries.webtext import q_url_blocklist

    got = {r["source"]: r for r in q_url_blocklist(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, w in per_src.items():
        g = got[src]
        for k, v in w.items():
            assert g[k] == v, (src, k)
        assert g["kept_milli"] == (
            (w["n_convs"] - w["n_dropped"]) * 1000 // w["n_convs"]
        )


def test_instruction_dedup_engineered_duplicates(spark, tmp_path):
    """Two conversations sharing the same 8-word opening slice but
    different tails collapse into one prompt group (keeper = min doc);
    a distinct prompt stays its own group; empty text is out of scope.
    The Spark rows must also equal the registered DuckDB oracle."""
    shared = "how do i sort a list in python"  # 8 words
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                shared + " " + " ".join(f"a{i}" for i in range(25)),
                shared + " " + " ".join(f"b{i}" for i in range(40)),
                "completely different opening words here for this one "
                + " ".join(f"c{i}" for i in range(30)),
                "",
            ],
        }
    )
    d = str(tmp_path / "instr")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    from documentai_ocr_spark.queries.webtext import q_instruction_dedup

    rows = q_instruction_dedup(spark, d).collect()
    by_prompt = {r["prompt"]: r for r in rows}
    assert by_prompt[shared]["n_convs"] == 2
    assert by_prompt[shared]["keeper_doc"] == 1
    assert len(rows) == 2  # doc 4 (empty prompt) out of scope
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.sql(ORACLES["q_instruction_dedup"]).fetchall()
    )
    assert sorted(tuple(r) for r in rows) == want


def test_turnlen_profile_python_recount(spark):
    """Whole-corpus recount of the 12-row profile: replay the turn
    slice rule and THE token unit in pure Python over sf0.001."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = {
        t: {"n": 0, "tot": 0, "empty": 0, "mx": 0} for t in range(12)
    }
    for text in docs["text"]:
        tk = text.split(" ")
        for t in range(12):
            lo = (t * 29) % max(1, len(tk))
            base = " ".join(tk[lo : lo + 8])
            ntok = sum(1 for w in base.split(" ") if w != "")
            a = agg[t]
            a["n"] += 1
            a["tot"] += ntok
            a["empty"] += ntok == 0
            a["mx"] = max(a["mx"], ntok)
    from documentai_ocr_spark.queries.webtext import q_turnlen_profile

    got = {r["turn_idx"]: r for r in q_turnlen_profile(spark, SF).collect()}
    assert set(got) == set(range(12))
    for t, a in agg.items():
        g = got[t]
        assert (
            g["n_turns"],
            g["total_tokens"],
            g["n_empty"],
            g["max_ntok"],
        ) == (a["n"], a["tot"], a["empty"], a["mx"]), t
        assert g["mean_ntok_milli"] == a["tot"] * 1000 // a["n"]


def test_tokenizer_fertility_python_recount(spark):
    """Full independent recount: re-run the stopword-vote predictor and
    THE token/byte units in pure Python per document, aggregate per
    predicted lang — every column of every class row must match, and
    the classes must partition the corpus."""
    from documentai_ocr_spark.queries.textstats import (
        _STOPWORDS,
        q_tokenizer_fertility,
    )

    sw: dict[str, list] = {}
    for w, lang in _STOPWORDS:
        sw.setdefault(w, []).append(lang)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per: dict[str, dict] = {}
    for text in docs["text"]:
        cnt: dict[str, int] = {}
        for w in text.lower().split(" "):
            for lang in sw.get(w, ()):
                cnt[lang] = cnt.get(lang, 0) + 1
        # argmax, ties by lang asc, no hits -> unk
        pred = (
            min(cnt, key=lambda l: (-cnt[l], l)) if cnt else "unk"
        )
        a = per.setdefault(pred, {"n_docs": 0, "ntok": 0, "nbytes": 0})
        a["n_docs"] += 1
        a["ntok"] += sum(1 for w in text.split(" ") if w != "")
        a["nbytes"] += len(text.encode("utf-8"))
    got = {
        r["pred_lang"]: r for r in q_tokenizer_fertility(spark, SF).collect()
    }
    assert set(got) == set(per)
    assert sum(r["n_docs"] for r in got.values()) == len(docs)
    for lang, a in per.items():
        g = got[lang]
        assert (g["n_docs"], g["n_tokens"], g["n_bytes"]) == (
            a["n_docs"],
            a["ntok"],
            a["nbytes"],
        ), lang
        want_milli = (
            0 if a["ntok"] == 0 else a["nbytes"] * 1000 // a["ntok"]
        )
        assert g["bytes_per_token_milli"] == want_milli


def test_role_token_share_recount_and_turnlen_reconciliation(spark):
    """Replay the turn slices and the t%3 role cycle in pure Python per
    source, then reconcile across operators: the role-share token total
    must equal q_turnlen_profile's total_tokens sum — both describe the
    SAME turn stream through different rollups."""
    from documentai_ocr_spark.queries.webtext import (
        q_role_token_share,
        q_turnlen_profile,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per: dict[str, dict] = {}
    for src, text in zip(docs["source"], docs["text"]):
        tk = text.split(" ")
        a = per.setdefault(
            src, {"n_convs": 0, "user": 0, "assistant": 0, "tool": 0}
        )
        a["n_convs"] += 1
        for t in range(12):
            lo = (t * 29) % max(1, len(tk))
            base = " ".join(tk[lo : lo + 8])
            ntok = sum(1 for w in base.split(" ") if w != "")
            a[("user", "assistant", "tool")[t % 3]] += ntok
    got = {r["source"]: r for r in q_role_token_share(spark, SF).collect()}
    assert set(got) == set(per)
    for src, a in per.items():
        g = got[src]
        assert (
            g["n_convs"],
            g["user_tokens"],
            g["asst_tokens"],
            g["tool_tokens"],
        ) == (a["n_convs"], a["user"], a["assistant"], a["tool"]), src
        tot = a["user"] + a["assistant"] + a["tool"]
        assert g["asst_share_milli"] == (
            0 if tot == 0 else a["assistant"] * 1000 // tot
        )
    share_total = sum(
        r["user_tokens"] + r["asst_tokens"] + r["tool_tokens"]
        for r in got.values()
    )
    profile_total = sum(
        r["total_tokens"] for r in q_turnlen_profile(spark, SF).collect()
    )
    assert share_total == profile_total


def test_conv_retention_recount_and_monotone(spark):
    """Python recount of the first-failure funnel, plus the two laws
    that make it a funnel: monotone non-increasing in t, and the t=0
    point reconciles with q_turnlen_profile's nonempty count."""
    from documentai_ocr_spark.queries.webtext import (
        q_conv_retention,
        q_turnlen_profile,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ffs = []
    for text in docs["text"]:
        tk = text.split(" ")
        ff = 12
        for t in range(12):
            lo = (t * 29) % max(1, len(tk))
            base = " ".join(tk[lo : lo + 8])
            if sum(1 for w in base.split(" ") if w != "") == 0:
                ff = t
                break
        ffs.append(ff)
    n_total = len(ffs)
    got = {
        r["turn_idx"]: r for r in q_conv_retention(spark, SF).collect()
    }
    assert set(got) == set(range(12))
    prev = None
    for t in range(12):
        alive = sum(1 for f in ffs if f > t)
        g = got[t]
        assert g["n_alive"] == alive, t
        assert g["retention_milli"] == alive * 1000 // n_total
        if prev is not None:
            assert g["n_alive"] <= prev
        prev = g["n_alive"]
    prof = {
        r["turn_idx"]: r for r in q_turnlen_profile(spark, SF).collect()
    }
    assert got[0]["n_alive"] == prof[0]["n_turns"] - prof[0]["n_empty"]


def test_web_preflight_reconciles_with_standalone_stages(spark):
    """The composed gate's waterfall must reconcile EXACTLY with the
    standalone reports its stages share renderings with: drop_url ==
    q_url_blocklist.n_dropped per source; drop_echo == the echo-bad
    convs (q_echo_rate.max_echo_milli ≥ 500) among blocklist
    survivors; kept counts and token yield close the accounting."""
    from documentai_ocr_spark.queries.webtext import (
        _ECHO_DROP_MILLI,
        q_echo_rate,
        q_url_blocklist,
        q_web_preflight,
    )

    got = {r["source"]: r for r in q_web_preflight(spark, SF).collect()}
    ub = {r["source"]: r for r in q_url_blocklist(spark, SF).collect()}
    assert set(got) == set(ub)
    for src in got:
        assert got[src]["n_convs"] == ub[src]["n_convs"]
        assert got[src]["drop_url"] == ub[src]["n_dropped"], src

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    src_of = dict(zip(docs["doc_id"], docs["source"]))
    ntok_of = {
        d: sum(1 for w in t.split(" ") if w != "")
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    echo_bad = {
        r["doc_id"]
        for r in q_echo_rate(spark, SF).collect()
        if r["max_echo_milli"] >= _ECHO_DROP_MILLI
    }
    # url-dropped conv set from a python replay of the blocklist coins
    url_drop = set()
    for doc in docs["doc_id"]:
        for t in range(12):
            if (doc + t) % 3 == 0 and ((doc * 7 + t) % 23) % 5 == 0:
                url_drop.add(doc)
            if (doc + t) % 7 == 2 and ((doc * 11 + t) % 13) % 5 == 0:
                url_drop.add(doc)
    per: dict[str, list] = {}
    for doc in docs["doc_id"]:
        a = per.setdefault(src_of[doc], [0, 0, 0])  # echo, kept, tok
        if doc in url_drop:
            continue
        if doc in echo_bad:
            a[0] += 1
        else:
            a[1] += 1
            a[2] += ntok_of[doc]
    for src, (d_echo, n_kept, tok) in per.items():
        g = got[src]
        assert g["drop_echo"] == d_echo, src
        assert g["n_kept"] == n_kept, src
        assert g["kept_tokens"] == tok, src
        assert g["n_convs"] == g["drop_url"] + d_echo + n_kept
        assert g["kept_milli"] == n_kept * 1000 // g["n_convs"]


def _turn_words(docs):
    """Python replay of the shared turn rendering: (doc_id, t) ->
    the turn's distinct word set (the 8-word base slice, empties
    dropped) for t in 0..11."""
    out = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        tk = text.split(" ")
        for t in range(12):
            lo = (t * 29) % max(1, len(tk))
            out[(doc_id, t)] = {w for w in tk[lo : lo + 8] if w != ""}
    return out


def test_turn_novelty_python_recount(spark):
    """Whole-corpus exactness: first-occurrence novelty per position
    equals a pure-Python replay of the turn rendering, and turn 0 is
    all-new by construction (novelty_milli == 1000)."""
    from documentai_ocr_spark.queries.webtext import q_turn_novelty

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ws = _turn_words(docs)
    agg: dict[int, list] = {}  # t -> [n_turns, n_words, n_new]
    for doc_id in docs["doc_id"]:
        first: dict[str, int] = {}
        for t in range(12):
            s = ws[(doc_id, t)]
            if not s:
                continue  # empty explode -> no row, same as the query
            n_new = 0
            for w in s:
                if w not in first:
                    first[w] = t
                if first[w] == t:
                    n_new += 1
            a = agg.setdefault(t, [0, 0, 0])
            a[0] += 1
            a[1] += len(s)
            a[2] += n_new
    got = {r["turn_idx"]: r for r in q_turn_novelty(spark, SF).collect()}
    assert set(got) == set(agg)
    for t, (n_turns, n_words, n_new) in agg.items():
        g = got[t]
        assert (g["n_turns"], g["n_words"], g["n_new"]) == (
            n_turns,
            n_words,
            n_new,
        ), t
        assert g["novelty_milli"] == n_new * 1000 // n_words
    assert got[0]["n_new"] == got[0]["n_words"]
    assert got[0]["novelty_milli"] == 1000


def test_topic_drift_python_recount(spark):
    """Whole-corpus exactness: the per-position Jaccard-to-opener curve
    equals a pure-Python replay (set arithmetic over the same turn
    rendering), including the both-empty=1000 convention."""
    from documentai_ocr_spark.queries.webtext import q_topic_drift

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ws = _turn_words(docs)
    agg: dict[int, list] = {}  # t -> [n_convs, sim_sum, n_disjoint]
    for doc_id in docs["doc_id"]:
        anchor = ws[(doc_id, 0)]
        for t in range(1, 12):
            s = ws[(doc_id, t)]
            union = len(s | anchor)
            sim = 1000 if union == 0 else len(s & anchor) * 1000 // union
            a = agg.setdefault(t, [0, 0, 0])
            a[0] += 1
            a[1] += sim
            a[2] += 1 if sim == 0 else 0
    got = {r["turn_idx"]: r for r in q_topic_drift(spark, SF).collect()}
    assert set(got) == set(agg)
    for t, (n_convs, sim_sum, n_disjoint) in agg.items():
        g = got[t]
        assert g["n_convs"] == n_convs, t
        assert g["mean_sim_milli"] == sim_sum // n_convs, t
        assert g["n_disjoint"] == n_disjoint, t


def test_domain_reputation_and_gate_python_replay(spark):
    """Whole-corpus replay of the learned blocklist chain: link coins →
    per-domain support/quality → floored-milli verdict → conv drops →
    per-source yield. Also pins the gate/report reconciliation (the
    gate blocks exactly the report's 'block' domains) and that both
    verdicts actually occur, so the oracle gate never compares a
    one-class table."""
    from documentai_ocr_spark.queries.webtext import (
        _REP_MIN_CONVS,
        q_domain_reputation,
        q_reputation_gate,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    qual = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        n = len(text)
        letters = sum(1 for ch in text if ch.isascii() and ch.isalpha())
        qual[doc_id] = 0 if n == 0 else letters * 1000 // n
    # link incidences from the two deterministic coins
    links: dict[str, dict[int, int]] = {}  # domain -> doc -> n_links
    for doc in docs["doc_id"]:
        for t in range(12):
            if (doc + t) % 3 == 0:
                dom = f"d{(doc * 7 + t) % 23}.example.com"
                links.setdefault(dom, {})[doc] = (
                    links.get(dom, {}).get(doc, 0) + 1
                )
            if (doc + t) % 7 == 2:
                dom = f"m{(doc * 11 + t) % 13}.test.org"
                links.setdefault(dom, {})[doc] = (
                    links.get(dom, {}).get(doc, 0) + 1
                )
    rep = {}
    tot_q = tot_c = 0
    for dom, per in links.items():
        n_convs = len(per)
        sum_q = sum(qual[d] for d in per)
        rep[dom] = [n_convs, sum(per.values()), sum_q]
        tot_q += sum_q
        tot_c += n_convs
    anchor = tot_q // tot_c
    verdict = {
        dom: (
            "block"
            if n_convs >= _REP_MIN_CONVS and sum_q // n_convs < anchor
            else "allow"
        )
        for dom, (n_convs, _, sum_q) in rep.items()
    }
    got = {r["domain"]: r for r in q_domain_reputation(spark, SF).collect()}
    assert set(got) == set(rep)
    for dom, (n_convs, n_links, sum_q) in rep.items():
        g = got[dom]
        assert (g["n_convs"], g["n_links"]) == (n_convs, n_links), dom
        assert g["mean_qual_milli"] == sum_q // n_convs, dom
        assert g["verdict"] == verdict[dom], dom
    assert len(set(verdict.values())) == 2

    blocked = {d for d, v in verdict.items() if v == "block"}
    dropped = {
        doc for dom in blocked for doc in links[dom]
    }
    src_of = dict(zip(docs["doc_id"], docs["source"]))
    ntok_of = {
        d: sum(1 for w in t.split(" ") if w != "")
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    per_src: dict[str, list] = {}
    for doc in docs["doc_id"]:
        a = per_src.setdefault(src_of[doc], [0, 0, 0, 0])
        a[0] += 1
        if doc in dropped:
            a[1] += 1
        else:
            a[2] += 1
            a[3] += ntok_of[doc]
    gate = {r["source"]: r for r in q_reputation_gate(spark, SF).collect()}
    assert set(gate) == set(per_src)
    for src, (n_convs, n_drop, n_kept, tok) in per_src.items():
        g = gate[src]
        assert (g["n_convs"], g["n_dropped"], g["n_kept"]) == (
            n_convs,
            n_drop,
            n_kept,
        ), src
        assert g["kept_tokens"] == tok, src
        assert g["kept_milli"] == (n_convs - n_drop) * 1000 // n_convs


def test_context_budget_python_recount(spark):
    """Whole-corpus recount: replay the turn slice rule, THE token
    unit, and the suffix-budget rule in pure Python over sf0.001 —
    every per-source column must match, and per-conversation kept
    tokens can never exceed the budget."""
    from documentai_ocr_spark.queries.webtext import (
        _CTX_BUDGET,
        q_context_budget,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = {}
    for doc_id, source, text in zip(
        docs["doc_id"], docs["source"], docs["text"]
    ):
        tk = text.split(" ")
        ntoks = []
        for t in range(12):
            lo = (t * 29) % max(1, len(tk))
            base = " ".join(tk[lo : lo + 8])
            ntoks.append(sum(1 for w in base.split(" ") if w != ""))
        cum = 0
        turns_kept = tok_kept = 0
        for t in range(11, -1, -1):
            cum += ntoks[t]
            if cum <= _CTX_BUDGET:
                turns_kept += 1
                tok_kept += ntoks[t]
        assert tok_kept <= _CTX_BUDGET
        a = agg.setdefault(
            source,
            {"n": 0, "full": 0, "tk": 0, "tot": 0, "kept": 0},
        )
        a["n"] += 1
        a["full"] += turns_kept == 12
        a["tk"] += turns_kept
        a["tot"] += sum(ntoks)
        a["kept"] += tok_kept

    got = {r["source"]: r for r in q_context_budget(spark, SF).collect()}
    assert set(got) == set(agg)
    for src, a in agg.items():
        g = got[src]
        assert (
            g["n_convs"],
            g["convs_full"],
            g["sum_turns_kept"],
            g["tok_total"],
            g["tok_kept"],
            g["tok_dropped"],
        ) == (a["n"], a["full"], a["tk"], a["tot"], a["kept"], a["tot"] - a["kept"]), src
        assert g["mean_turns_kept_milli"] == a["tk"] * 1000 // a["n"]


def test_prompt_response_ratio_python_recount(spark):
    """Whole-corpus replay of the prompt/response budget per source on
    sf0.001 (turn rule + THE token unit), incl. the -1 sentinel rule."""
    from documentai_ocr_spark.queries.webtext import (
        q_prompt_response_ratio,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = {}
    for source, text in zip(docs["source"], docs["text"]):
        tk = text.split(" ")

        def slice_ntok(t):
            lo = (t * 29) % max(1, len(tk))
            base = " ".join(tk[lo : lo + 8])
            return sum(1 for w in base.split(" ") if w != "")

        a = agg.setdefault(source, {"n": 0, "p": 0, "r": 0, "nor": 0})
        p, r = slice_ntok(0), slice_ntok(11)
        a["n"] += 1
        a["p"] += p
        a["r"] += r
        a["nor"] += r == 0

    got = {
        r["source"]: r
        for r in q_prompt_response_ratio(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for src, a in agg.items():
        g = got[src]
        assert (
            g["n_convs"], g["prompt_tokens"], g["resp_tokens"],
            g["n_no_response"],
        ) == (a["n"], a["p"], a["r"], a["nor"]), src
        want = -1 if a["r"] == 0 else 1000 * a["p"] // a["r"]
        assert g["pr_ratio_milli"] == want


def test_turn_repeat_rate_catches_pingpong_echo_misses(spark, tmp_path):
    """The load-bearing difference vs adjacent echo: an A-B-A-B
    ping-pong conversation has ZERO adjacent repeats but a 50% global
    repeat rate — pinned through the real Spark path and the
    registered oracle on an engineered corpus."""
    import duckdb

    from documentai_ocr_spark.queries import ORACLES
    from documentai_ocr_spark.queries.webtext import q_turn_repeat_rate

    # doc 1: 12 turn slots alternate between two 8-word bases.
    # The slice rule is lo=(t*29)%len(tk); with len(tk)=58 the twelve
    # lo values cycle; simpler: craft text so all slices are identical
    # (a constant word) => maximal repeats; doc 2: all slices distinct.
    mono = " ".join(["loop"] * 96)
    distinct = " ".join(f"w{i}" for i in range(96))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "source": ["s", "s"],
            "text": [mono, distinct],
        }
    )
    d = str(tmp_path / "rep")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    rows = {r["source"]: r for r in q_turn_repeat_rate(spark, d).collect()}
    g = rows["s"]
    # doc 1 contributes 12 turns, 1 distinct -> 11 repeats; doc 2: 0
    assert g["n_turns"] == 24 and g["n_repeats"] == 11
    assert g["n_loopy_convs"] == 1
    assert g["repeat_milli"] == 1000 * 11 // 24

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    ora = con.sql(ORACLES["q_turn_repeat_rate"]).fetchall()
    assert len(ora) == 1
    assert tuple(ora[0]) == (
        "s", g["n_convs"], g["n_turns"], g["n_repeats"],
        g["repeat_milli"], g["n_loopy_convs"],
    )


def test_blocklist_rule_digitless_domain_parity(spark):
    """A domain with no digit (example.com) extracts '' from the
    blocklist id regex; both renderings must read NOT BLOCKED instead
    of diverging (Spark cast('' as long) -> NULL vs DuckDB CAST('')
    hard error — the reason the rule uses TRY_CAST + COALESCE(FALSE))."""
    from documentai_ocr_spark.queries.webtext import (
        _blocked_col,
        _blocked_sql,
    )

    doms = ["example.com", "d5.example.com", "d7.example.com", "m0.test.org"]
    got = (
        spark.createDataFrame([(d,) for d in doms], "dom string")
        .select("dom", _blocked_col("dom").alias("b"))
        .collect()
    )
    spark_verdicts = {r["dom"]: r["b"] for r in got}
    con = duckdb.connect()
    ora = con.sql(
        "SELECT dom, " + _blocked_sql("dom") + " FROM (SELECT unnest("
        f"{doms!r}) AS dom)"
    ).fetchall()
    duck_verdicts = dict(ora)
    expect = {
        "example.com": False,  # digitless: explicit allow, no crash
        "d5.example.com": True,
        "d7.example.com": False,
        "m0.test.org": True,
    }
    assert spark_verdicts == expect
    assert duck_verdicts == expect
