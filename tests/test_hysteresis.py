"""Two-threshold hysteresis island decoder: dip fixtures pin the
enter/exit/bridge semantics; kernel == oracle byte-for-byte."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from documentai_ocr_spark.extract.textops import extract_plain_hysteresis_batch
from documentai_ocr_spark.oracle import extract_plain_hysteresis

STRONG = "alpha beta gamma delta content line"   # dens ≈ 0.83 ≥ enter
MID = "abcd ---- efgh ---- ij"                   # dens ≈ 0.45: exit..enter
NOISE = "*** !!! *** ???"                        # dens 0 < exit
SHORT = "ok"                                     # fails the length gate
BOILER = "Copyright words and more dense text"   # dense but boiler-listed


def run_kernel(text):
    out = extract_plain_hysteresis_batch(pd.Series([text]))
    spans = [
        (s["beg"], s["end"], s["kind"], s["score"]) for s in out["spans"].iloc[0]
    ]
    return out["text"].iloc[0], spans


def both(text):
    got_text, got_spans = run_kernel(text)
    want_text, want_spans = extract_plain_hysteresis(text)
    assert got_text == want_text
    assert got_spans == [
        (s["beg"], s["end"], s["kind"], s["score"]) for s in want_spans
    ]
    return want_text


def test_single_dip_is_bridged():
    t = both("\n".join([STRONG, NOISE, STRONG]))
    assert t == "\n".join([STRONG, NOISE, STRONG])  # dip kept inside region


def test_double_dip_splits():
    t = both("\n".join([STRONG, NOISE, NOISE, STRONG]))
    assert t == "\n".join([STRONG, STRONG])  # two regions, dips excluded


def test_mid_density_cannot_open():
    assert both("\n".join([MID, MID, MID])) == ""


def test_mid_density_extends_an_open_region():
    t = both("\n".join([STRONG, MID, MID]))
    assert t == "\n".join([STRONG, MID, MID])


def test_edges_trimmed_to_weak_lines():
    t = both("\n".join([NOISE, STRONG, MID, NOISE]))
    assert t == "\n".join([STRONG, MID])


def test_short_line_is_a_gap():
    # SHORT fails the length gate → acts as a dip; one dip bridges
    t = both("\n".join([STRONG, SHORT, STRONG]))
    assert t == "\n".join([STRONG, SHORT, STRONG])


def test_boiler_is_never_weak():
    t = both("\n".join([BOILER, BOILER, STRONG]))
    assert t == STRONG


def test_extract_turns_hysteresis_variant(spark):
    """End-to-end: the Spark operator with plain_variant='hysteresis'
    equals the per-turn oracle for every turn (html/pdfish unaffected)."""
    from documentai_ocr_spark.extract import extract_turns
    from documentai_ocr_spark.oracle import extract_turn
    from documentai_ocr_spark.synth import synth_transcripts

    pdf = synth_transcripts(n_convs=8, seed=11, skew_factor=2)
    tr = spark.createDataFrame(pdf)
    got = {
        (r.conv_id, r.turn_idx): (r.payload_kind, r.text, r.n_spans)
        for r in extract_turns(tr, plain_variant="hysteresis").collect()
    }
    for _, r in pdf.iterrows():
        want = extract_turn(r["text"], plain_variant="hysteresis")
        assert got[(r["conv_id"], r["turn_idx"])] == (
            want["payload_kind"],
            want["text"],
            want["n_spans"],
        )


_line = st.one_of(
    st.sampled_from([STRONG, MID, NOISE, SHORT, BOILER, "", "   "]),
    st.text(alphabet="abc -.!一二三", min_size=0, max_size=30),
)
_payload = st.lists(_line, min_size=0, max_size=14).map("\n".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=8))
def test_kernel_equals_oracle_fuzz(payloads):
    out = extract_plain_hysteresis_batch(pd.Series(payloads))
    for i, text in enumerate(payloads):
        want_text, want_spans = extract_plain_hysteresis(text)
        assert out["text"].iloc[i] == want_text, repr(text)
        got = [
            (s["beg"], s["end"], s["kind"], s["score"])
            for s in out["spans"].iloc[i]
        ]
        assert got == [
            (s["beg"], s["end"], s["kind"], s["score"]) for s in want_spans
        ], repr(text)
        assert int(out["n_spans"].iloc[i]) == len(want_spans)
