"""Three-way parity for the pdfish line decoder: the Arrow kernel
(extract_pdfish_batch), the pure-Catalyst q_pdfish_line_decode, and its
DuckDB oracle (covered by the correctness gate) must agree on the same
char-box layout.

The payload builder here reproduces q_pdfish_line_decode's SQL synthesis
exactly (90 chars, 30-char lines, 9/13-px advances, 8-px boxes), feeds it
to the kernel as ndjson char boxes, and compares against both the naive
expectation (per-line whitespace collapse) and the Spark query output.
"""

import json

import pandas as pd
import pyarrow.parquet as pq

from documentai_ocr_spark.extract.textops import extract_pdfish_batch
from documentai_ocr_spark.queries.relational import (
    _PDF_ADV,
    _PDF_CHARS,
    _PDF_LINE_CHARS,
    _PDF_SP_ADV,
    _PDF_W,
    _PDF_X0,
    q_pdfish_line_decode,
)

SF = "/root/testdata/sf0.001"
N_DOCS = 8


def _payload(text: str) -> str:
    """ndjson char boxes for q_pdfish_line_decode's synthetic layout."""
    out = []
    for i, c in enumerate(text[:_PDF_CHARS]):
        li = i // _PDF_LINE_CHARS
        if i % _PDF_LINE_CHARS == 0:
            x = _PDF_X0
        if c == " ":
            x += _PDF_SP_ADV
            continue
        out.append(
            json.dumps(
                {"c": c, "x": x, "y": 20.0 * li + 10.0, "w": _PDF_W,
                 "h": 10.0, "page": li // 2},
                separators=(",", ":"),
            )
        )
        x += _PDF_ADV
    return "\n".join(out)


def _expected_lines(text: str) -> list:
    """Whitespace collapse per 30-char line — what losing the space boxes
    and re-deriving them from gaps must reconstruct."""
    s = text[:_PDF_CHARS]
    chunks = [
        s[i : i + _PDF_LINE_CHARS] for i in range(0, len(s), _PDF_LINE_CHARS)
    ]
    return [" ".join(c.split()) for c in chunks if c.split()]


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    df = t.to_pandas().sort_values("doc_id").head(N_DOCS)
    return list(zip(df["doc_id"], df["text"]))


def test_kernel_matches_expected_collapse():
    docs = _docs()
    res = extract_pdfish_batch(pd.Series([_payload(t) for _, t in docs]))
    for k, (_, text) in enumerate(docs):
        assert res["text"][k] == "\n".join(_expected_lines(text))


def test_catalyst_query_matches_kernel(spark):
    docs = dict(_docs())
    rows = (
        q_pdfish_line_decode(spark, SF)
        .where(f"doc_id < {N_DOCS}")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["line_no"]] = r["line_text"]
    res = extract_pdfish_batch(
        pd.Series([_payload(docs[d]) for d in sorted(docs)])
    )
    for k, d in enumerate(sorted(docs)):
        lines = [got[d][i] for i in sorted(got[d])]
        assert "\n".join(lines) == res["text"][k]
