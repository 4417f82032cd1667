"""Property fuzz for exact substring dedup: the registered DuckDB
oracle SQL (the gate's ground truth for q_substring_dedup) must equal
an independent pure-Python implementation of the intended semantics on
ANY corpus. The driver gate proves Spark == SQL; this proves SQL ==
spec, closing the loop without a Spark session per example.

Corpora draw tokens from a 3-word vocabulary so duplicate 8-token
windows actually occur, and some docs are literal copies of others
(whole-doc duplication is the common real-world case)."""

from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from documentai_ocr_spark.queries.corpusops import (
    _BOILER,
    _DUP_K,
    ORACLES,
)

_SQL = ORACLES["q_substring_dedup"]
_VOCAB = ["a", "bb", "ccc"]

_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=8)
_copy_mask = st.lists(st.booleans(), min_size=8, max_size=8)


def py_substring_dedup(docs: dict[int, str], k: int = _DUP_K):
    """Reference semantics: decorate (doc_id%5==0 gets the boilerplate
    suffix), tokenize on single spaces dropping empties, count k-token
    windows corpus-wide, remove every position covered by a >1-count
    window, report merged span count / removed count / cleaned text."""
    tok = {}
    for i, t in docs.items():
        raw = t + " " + _BOILER if i % 5 == 0 else t
        tok[i] = [w for w in raw.lower().split(" ") if w]
    cnt: Counter = Counter()
    wins = {}
    for i, t in tok.items():
        ws = [" ".join(t[j : j + k]) for j in range(len(t) - k + 1)]
        wins[i] = ws
        cnt.update(ws)
    out = {}
    for i, t in tok.items():
        cover: set = set()
        for j, w in enumerate(wins[i]):
            if cnt[w] > 1:
                cover.update(range(j, j + k))
        n_spans = sum(
            1 for p in cover if p - 1 not in cover
        )  # island starts
        clean = " ".join(t[p] for p in range(len(t)) if p not in cover)
        out[i] = (n_spans, len(cover), clean)
    return out


@settings(max_examples=60, deadline=None)
@given(_corpus, _copy_mask)
def test_oracle_sql_matches_python_spec(corpus, copies):
    docs = {}
    for i, toks in enumerate(corpus):
        docs[i] = " ".join(toks)
    # duplicate some docs verbatim under fresh ids (forces cross-doc
    # duplicate windows beyond vocabulary collisions)
    nxt = len(corpus)
    for i, toks in enumerate(corpus):
        if copies[i % len(copies)] and len(toks) >= _DUP_K:
            docs[nxt] = " ".join(toks)
            nxt += 1

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(docs.items())
    )
    got = {
        r[0]: (r[1], r[2], r[3]) for r in con.sql(_SQL).fetchall()
    }
    con.close()
    want = py_substring_dedup(docs)
    assert got == want
