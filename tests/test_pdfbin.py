"""PDF-binary front door: SPDF container round-trip, binaryFile scan →
box rows → pdfish extraction parity with the oracle, malformed-drop, and
the honest real-PDF stub boundary."""

import json

import numpy as np
import pytest

from documentai_ocr_spark.oracle import extract_pdfish
from documentai_ocr_spark.pdfbin import (
    boxes_to_ndjson,
    decode_binary,
    make_spdf,
    parse_spdf,
    pdf_boxes,
    pdf_extract,
)
from documentai_ocr_spark.synth import make_pdfish


def _pages(salt):
    """Deterministic page→boxes fixture derived from the pdfish payload
    generator (same char/coord distribution as the golden corpus)."""
    boxes = [json.loads(l) for l in make_pdfish(salt).split("\n")]
    n_pages = max(b["page"] for b in boxes) + 1
    return [[b for b in boxes if b["page"] == p] for p in range(n_pages)]


def test_roundtrip():
    pages = _pages(7)
    blob = make_spdf(pages)
    parsed = parse_spdf(blob)
    flat = [b for pg in pages for b in pg]
    assert len(parsed) == len(flat)
    for got, want in zip(parsed, flat):
        assert got["c"] == want["c"]
        assert got["page"] == want["page"]
        for k in ("x", "y", "w", "h"):
            assert got[k] == float(np.float32(want[k]))  # exact f32→f64


def test_malformed_dropped():
    assert decode_binary(b"garbage bytes") is None
    assert decode_binary(None) is None
    blob = make_spdf(_pages(3))
    assert decode_binary(blob[:10]) is None          # truncated
    assert decode_binary(blob + b"xx") is None       # trailing bytes


def test_real_pdf_is_an_honest_stub():
    with pytest.raises(NotImplementedError):
        decode_binary(b"%PDF-1.7\n...")


def test_binaryfile_scan_to_spans(spark, tmp_path):
    """Lifecycle §3.1 end-to-end: .spdf files on disk → binaryFile scan →
    char boxes → the pdfish kernel → per-doc text+spans equal to the
    oracle run on the SAME (f32-promoted) boxes."""
    d = tmp_path / "pdfs"
    d.mkdir()
    want = {}
    for salt in range(12):
        doc = f"doc-{salt:04d}"
        blob = make_spdf(_pages(salt))
        (d / f"{doc}.spdf").write_bytes(blob)
        want[doc] = extract_pdfish(boxes_to_ndjson(parse_spdf(blob)))
    # one junk file the scan must survive and drop
    (d / "junk.spdf").write_bytes(b"not a container")

    import pyspark.sql.functions as F

    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.spdf")
        .load(str(d))
        .select(
            F.element_at(
                F.split(F.element_at(F.split("path", "/"), -1), "\\."), 1
            ).alias("doc_id"),
            "content",
        )
    )
    n_boxes = pdf_boxes(bins).count()
    assert n_boxes == sum(
        len(parse_spdf(make_spdf(_pages(s)))) for s in range(12)
    )

    got = {r.doc_id: (r.text, r.n_spans) for r in pdf_extract(bins).collect()}
    assert set(got) == set(want)
    for doc, (text, spans) in want.items():
        assert got[doc] == (text, len(spans)), doc
