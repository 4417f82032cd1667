"""Word-span fixup pass (merge-narrow / split-wide / glue): hand-computed
ragged fixtures pin the reference semantics
(/root/reference/font/project_rec.py:104-127,216-223); the batch kernel,
the per-turn oracle, and the Spark operator must all agree exactly."""

import json

import pandas as pd

from documentai_ocr_spark.extract.textops import word_spans_batch
from documentai_ocr_spark.oracle import word_boxes
from documentai_ocr_spark.synth import make_pdfish, synth_transcripts


def _line(boxes, y=10.0, page=0):
    return "\n".join(
        json.dumps(
            {"c": "a", "x": x, "y": y, "w": w, "h": 10.0, "page": page},
            separators=(",", ":"),
        )
        for x, w in boxes
    )


# five narrow words (w=20) + one wide (w=80), gaps 15 (> half prev width
# → separate words). mean=30, σ=22.36, hi=74.72:
#   w0+w1 merge (40 < hi), w2+w3 merge, w4 can't merge into the wide one
#   (100 > hi) → DROPPED, w5 (80 > hi) → bisected at its midpoint.
RAGGED = _line([(0, 20), (35, 20), (70, 20), (105, 20), (140, 20), (175, 80)])
RAGGED_WANT = [(0, 0, 0.0, 55.0), (0, 1, 70.0, 125.0),
               (0, 2, 175.0, 215.0), (0, 3, 215.0, 255.0)]

# three equal words (w=8) with 4.5 px gaps: the gap splits words
# (4.5 > w/2) AND triggers glue (< 5 px, width < 20 px): each span
# extends back to its predecessor's ORIGINAL start.
GLUE = _line([(0.0, 8.0), (12.5, 8.0), (25.0, 8.0)])
GLUE_WANT = [(0, 0, 0.0, 8.0), (0, 1, 0.0, 20.5), (0, 2, 12.5, 33.0)]

# merge + keep: box at x=80 has gap 7 < half of the 40-wide predecessor,
# so it joins that word → intervals [0,10],[20,28],[33,90]; the narrow
# first two merge, the long one stays.
MIXED = _line([(0, 10), (20, 8), (33, 40), (80, 10)])
MIXED_WANT = [(0, 0, 0.0, 28.0), (0, 1, 33.0, 90.0)]


def _kernel_spans(text):
    out = word_spans_batch(pd.Series([text]))
    return [
        (int(l), int(wn), float(b), float(e))
        for l, wn, b, e in zip(
            out["line_no"], out["word_no"], out["beg_px"], out["end_px"]
        )
    ]


def test_hand_computed_fixtures():
    for text, want in [(RAGGED, RAGGED_WANT), (GLUE, GLUE_WANT),
                       (MIXED, MIXED_WANT)]:
        assert _kernel_spans(text) == want
        assert word_boxes(text) == want


def test_kernel_equals_oracle_on_synth():
    texts = [make_pdfish(s) for s in range(40)]
    # multi-line and multi-page payloads included
    pdf = pd.Series(texts)
    out = word_spans_batch(pdf)
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    for r, l, wn, b, e in zip(
        out["row"], out["line_no"], out["word_no"], out["beg_px"], out["end_px"]
    ):
        got[int(r)].append((int(l), int(wn), float(b), float(e)))
    for i, t in enumerate(texts):
        assert got[i] == word_boxes(t), t


def test_spark_operator(spark):
    from documentai_ocr_spark.extract import extract_word_boxes

    pdf = synth_transcripts(n_convs=10, seed=7, skew_factor=2)
    tr = spark.createDataFrame(pdf)
    rows = extract_word_boxes(tr).collect()
    assert rows, "no pdfish turns in fixture?"
    got: dict[tuple, list] = {}
    for r in rows:
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.line_no, r.word_no, r.beg_px, r.end_px)
        )
    by_key = {
        (r["conv_id"], r["turn_idx"]): r["text"] for _, r in pdf.iterrows()
    }
    for key, spans in got.items():
        want = word_boxes(by_key[key])
        assert sorted(spans) == sorted(
            [(l, wn, b, e) for l, wn, b, e in want]
        ), key
    # every pdfish turn with boxes must appear
    n_pdfish_with_words = sum(
        1 for t in by_key.values() if word_boxes(t)
    )
    assert len(got) == n_pdfish_with_words
