"""Golden test for the multi-engine fusion pipeline: Spark output must
equal the per-turn fusion oracle exactly (text and fused score)."""

import pytest

from documentai_ocr_spark.fusion import extract_fused
from documentai_ocr_spark.oracle import fuse_turn
from documentai_ocr_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def fixture_pdf():
    return synth_transcripts(n_convs=15, seed=11, skew_factor=6)


def test_fused_equals_oracle(spark, fixture_pdf):
    got = {
        (r.conv_id, r.turn_idx): (r.best_text, r.fused_score)
        for r in extract_fused(
            spark.createDataFrame(fixture_pdf).repartition(6)
        ).collect()
    }
    n_checked = 0
    for _, src in fixture_pdf.iterrows():
        key = (src["conv_id"], src["turn_idx"])
        want = fuse_turn(src["text"])
        if want is None:
            assert key not in got, key
        else:
            assert key in got, key
            assert got[key][0] == want[0], key
            assert abs(got[key][1] - want[1]) < 1e-9, key
            n_checked += 1
    assert n_checked > 30  # the fixture must actually exercise fusion


def test_vote_equals_oracle(spark, fixture_pdf):
    """×4 self-consistency vote: the Spark operator must keep exactly the
    turns oracle.vote_turn accepts, with the agreed text — and the vote
    must actually filter (some turns rejected, some kept)."""
    from documentai_ocr_spark.fusion import extract_vote
    from documentai_ocr_spark.oracle import vote_turn

    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in extract_vote(
            spark.createDataFrame(fixture_pdf).repartition(6)
        ).collect()
    }
    kept = rejected = 0
    for _, src in fixture_pdf.iterrows():
        key = (src["conv_id"], src["turn_idx"])
        want = vote_turn(src["text"])
        if want is None:
            assert key not in got, key
            rejected += 1
        else:
            assert got.get(key) == want, key
            kept += 1
    assert kept > 10 and rejected > 10  # a real filter, not a constant


def test_variants_disagree_somewhere(fixture_pdf):
    """The rule variants must be genuinely different operating points —
    otherwise fusion degenerates to a copy of rule_a."""
    from documentai_ocr_spark.oracle import extract_plain
    from documentai_ocr_spark.rules import RULE_VARIANTS, detect_payload

    diff = 0
    for _, src in fixture_pdf.iterrows():
        if detect_payload(src["text"]) != "plain":
            continue
        outs = {
            extract_plain(src["text"], ml, dt)[0]
            for ml, dt in RULE_VARIANTS.values()
        }
        if len(outs) > 1:
            diff += 1
    assert diff > 10


def test_np_round_matches_round6():
    """The vectorized candidate score (np.round(ssum/cnt, 6)) must equal
    the oracle's round6 spec elementwise. Note builtin round(x, 6) is
    NOT the spec: it is decimal-aware and diverges from np.round on
    exact midpoints (e.g. 2.5e-06), so both sides of the golden gate
    use the scaled form round(x*1e6)/1e6 == np.round(x, 6)."""
    import numpy as np

    from documentai_ocr_spark.oracle import round6

    # exact decimal midpoints at the 6th place — the HALF_EVEN tie cases
    mids = np.array(
        [i / 2e6 for i in range(1, 40001, 2)]
        + [0.1234565, 0.9999995, 0.5000005, 0.0000015]
    )
    assert np.array_equal(
        np.round(mids, 6), np.array([round6(float(x)) for x in mids])
    )

    # kernel-shaped inputs: span-score sums / span counts
    rng = np.random.RandomState(7)
    cnt = rng.randint(1, 40, size=20000).astype("int64")
    ssum = rng.uniform(0, 1, size=20000) * cnt
    got = np.round(ssum / cnt, 6)
    exp = np.array([round6(s / c) for s, c in zip(ssum.tolist(), cnt.tolist())])
    assert np.array_equal(got, exp)

    # broad magnitude fuzz
    vals = rng.uniform(-1000, 1000, size=20000)
    assert np.array_equal(
        np.round(vals, 6), np.array([round6(float(x)) for x in vals])
    )
