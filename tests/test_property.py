"""Property fuzzing: for ANY text payload, the batch kernel must equal
the per-turn oracle byte-for-byte (text, spans, n_spans, kind). Runs the
kernels directly — no Spark session — so hypothesis can afford many
examples."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from documentai_ocr_spark.extract.core import extract_batch
from documentai_ocr_spark.oracle import extract_turn

# building blocks that steer generation toward the interesting branches
_words = st.text(
    alphabet="abcdefghijklmnop qrstuvwxyz0123456789.,!-一二三文档引擎",
    min_size=0,
    max_size=60,
)
_tagged = st.builds(
    lambda w, t: f"<{t}>{w}</{t}>",
    _words,
    st.sampled_from(["p", "div", "li", "nav", "a", "script", "td"]),
)
_boxline = st.builds(
    lambda c, x, y, p: '{"c":"%s","x":%d,"y":%d,"w":8,"h":10,"page":%s}'
    % (c, x, y, p),
    st.sampled_from("abcXYZ文"),
    st.integers(0, 200),
    st.integers(0, 40),
    # fractional and null pages: the kernel must keep the raw numeric
    # value (float64), matching the oracle — int coercion would merge
    # page 0.5 into page 0 and join lines the oracle keeps apart
    st.sampled_from(["0", "1", "0.5", "1.5", "null"]),
)
_junk = st.sampled_from(
    ["", " ", "\n", "{", "<", "</", "\x00\x01", "....", "nav: x | y",
     "Copyright 2024 Example Corp. All rights reserved.",
     # sniff-prefix hostiles: ASCII \x0b and Unicode spaces before a
     # payload marker — the engines' regex \s classes differ, so the
     # sniff patterns use an explicit ASCII class; these lock that in
     "\x0b<p>hello wonderful world of text</p>",
     "　<div>unicode-space prefixed</div>",
     '\xa0{"c":"a","x":1,"y":1,"w":8,"h":10,"page":0}',
     '\t{"c":"b","x":2,"y":1,"w":8,"h":10,"page":0}']
)
_line = st.one_of(_words, _tagged, _boxline, _junk)
_payload = st.lists(_line, min_size=0, max_size=12).map("\n".join)


def _norm_spans(spans):
    return [
        (s["beg"], s["end"], s["kind"], round(float(s["score"]), 6))
        for s in spans
    ]


@settings(max_examples=150, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=8))
def test_word_spans_equal_oracle(payloads):
    """For ANY payload (incl. malformed/non-pdfish), the word-box kernel
    must agree with oracle.word_boxes — non-box inputs yield nothing on
    both sides, box inputs yield identical refined spans."""
    from documentai_ocr_spark.extract.textops import word_spans_batch
    from documentai_ocr_spark.oracle import word_boxes

    out = word_spans_batch(pd.Series(payloads))
    got: dict[int, list] = {i: [] for i in range(len(payloads))}
    for r, l, wn, b, e in zip(
        out["row"], out["line_no"], out["word_no"], out["beg_px"], out["end_px"]
    ):
        got[int(r)].append((int(l), int(wn), float(b), float(e)))
    for i, text in enumerate(payloads):
        assert got[i] == word_boxes(text), repr(text)


@settings(max_examples=300, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=16))
def test_batch_equals_oracle(payloads):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * len(payloads),
            "turn_idx": np.arange(len(payloads)),
            "role": ["u"] * len(payloads),
            "text": payloads,
        }
    )
    out = extract_batch(pdf)
    for i, text in enumerate(payloads):
        want = extract_turn(text)
        assert out["payload_kind"].iloc[i] == want["payload_kind"], repr(text)
        assert out["text"].iloc[i] == want["text"], repr(text)
        assert _norm_spans(out["spans"].iloc[i]) == _norm_spans(
            want["spans"]
        ), repr(text)
        assert int(out["n_spans"].iloc[i]) == want["n_spans"]


def test_simhash_lane_guard_fires(spark):
    """A doc whose total token weight reaches 2^21 must fail LOUDLY —
    the structural guard, not the statistical bigint-overflow check
    (which unset high-lane bits can dodge while a low lane silently
    carries into its neighbor)."""
    import pytest
    from pyspark.sql import functions as F

    from documentai_ocr_spark.queries.dedup import (
        _LANE_BITS,
        _simhash_packed,
    )

    h = spark.createDataFrame(
        [(1, 1 << _LANE_BITS, 0x5A5A5A5A5A5A5A)],
        "doc_id bigint, w bigint, hv bigint",
    )
    with pytest.raises(Exception, match="lane guard"):
        _simhash_packed(h, "hv", "simhash").collect()

    # just under the bound: no error
    ok = spark.createDataFrame(
        [(1, (1 << _LANE_BITS) - 1, 0x5A5A5A5A5A5A5A)],
        "doc_id bigint, w bigint, hv bigint",
    )
    assert _simhash_packed(ok, "hv", "simhash").count() == 1
