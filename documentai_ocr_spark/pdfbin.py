"""PDF-binary ingestion front door: ``binary`` column → char-box rows →
the existing pdfish line-assembly path (lifecycle §3.1 steps 1-2).

The reference rasterizes real PDFs with poppler and pulls text+boxes with
pdfminer (/root/reference/pdf/tools.py:23-36). Real PDF codecs are not in
this sandbox, so the operator has two dispatch arms:

  * ``%PDF-`` payloads → :func:`parse_real_pdf`, an HONEST stub boundary
    that names the production dependency (pdfminer char boxes) and
    raises ``NotImplementedError`` when it is absent — the same
    discipline as the media codec boundary in multimodal.py;
  * ``SPDF`` payloads → :func:`parse_spdf`, a deterministic synthetic
    container (length-prefixed char boxes per page) that exercises ALL
    of the Spark-side plumbing for real: binaryFile scan, per-batch
    decode, box-row schema, and the hand-off into extract_pdfish_batch.

Anything else is dropped (the reference's skip-malformed discipline,
/root/reference/spiltTools.py:21-22).

Scale notes: decode is a narrow mapInPandas over the binaryFile scan —
per-file parallelism, no shuffle; box rows never leave their partition
before line assembly (assembly is per-document inside the same batch).
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SPDF_MAGIC = b"SPDF"
PDF_MAGIC = b"%PDF-"

BOX_SCHEMA = (
    "doc_id string, page int, x double, y double, w double, h double, c string"
)


# ----------------------------------------------------------------- container
def make_spdf(pages: list[list[dict]]) -> bytes:
    """Serialize char boxes into the synthetic SPDF container:
    magic, u16 page count; per page: u16 box count; per box: u8-length
    utf-8 char, 4×f32 (x, y, w, h). Little-endian throughout;
    deterministic byte-for-byte."""
    out = [SPDF_MAGIC, struct.pack("<H", len(pages))]
    for boxes in pages:
        out.append(struct.pack("<H", len(boxes)))
        for b in boxes:
            cb = str(b["c"]).encode("utf-8")
            out.append(struct.pack("<B", len(cb)))
            out.append(cb)
            out.append(
                struct.pack(
                    "<ffff",
                    float(b["x"]),
                    float(b["y"]),
                    float(b["w"]),
                    float(b["h"]),
                )
            )
    return b"".join(out)


def parse_spdf(data: bytes) -> list[dict]:
    """Inverse of :func:`make_spdf`: bytes → box dicts with float64
    coords (f32 → f64 promotion is exact) and the page index attached.
    Truncated/corrupt payloads raise ValueError (caller drops them)."""
    if data[:4] != SPDF_MAGIC:
        raise ValueError("not an SPDF container")
    off = 4
    (n_pages,) = struct.unpack_from("<H", data, off)
    off += 2
    boxes: list[dict] = []
    for page in range(n_pages):
        (n_boxes,) = struct.unpack_from("<H", data, off)
        off += 2
        for _ in range(n_boxes):
            (clen,) = struct.unpack_from("<B", data, off)
            off += 1
            c = data[off : off + clen].decode("utf-8")
            off += clen
            x, y, w, h = struct.unpack_from("<ffff", data, off)
            off += 16
            boxes.append(
                {"c": c, "x": float(x), "y": float(y), "w": float(w),
                 "h": float(h), "page": page}
            )
    if off != len(data):
        raise ValueError("trailing bytes in SPDF container")
    return boxes


def parse_real_pdf(data: bytes) -> list[dict]:
    """Production boundary for real PDFs: pdfminer layout parse → char
    boxes (the reference's extract_text_to_fp call site,
    /root/reference/pdf/tools.py:28-36). The import is gated so the
    synthetic path stays testable where pdfminer is absent."""
    try:
        from pdfminer.high_level import extract_pages  # noqa: F401
    except ImportError as e:  # pragma: no cover - sandbox has no pdfminer
        raise NotImplementedError(
            "real-PDF char-box extraction requires pdfminer.six "
            "(LTChar bbox walk); this environment ships no PDF codec — "
            "use SPDF containers or install pdfminer"
        ) from e
    raise NotImplementedError(
        "pdfminer LTChar walk not wired in this sandbox"
    )  # pragma: no cover


def decode_binary(data) -> list[dict] | None:
    """Dispatch one binary payload to its parser; None = drop."""
    if data is None:
        return None
    b = bytes(data)
    try:
        if b[:4] == SPDF_MAGIC:
            return parse_spdf(b)
        if b[:5] == PDF_MAGIC:
            return parse_real_pdf(b)
    except (ValueError, struct.error, UnicodeDecodeError):
        return None
    return None


# ----------------------------------------------------------------- operators
def pdf_boxes(binaries: DataFrame, id_col: str = "doc_id",
              content_col: str = "content") -> DataFrame:
    """binary column → one row per char box. Narrow mapInPandas over the
    (binaryFile or table) scan; malformed payloads drop silently."""
    src = binaries.select(
        binaries[id_col].alias("doc_id"), binaries[content_col].alias("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "page", "x", "y", "w", "h", "c")}
            for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
                boxes = decode_binary(data)
                if not boxes:
                    continue
                for b in boxes:
                    rows["doc_id"].append(doc_id)
                    rows["page"].append(b["page"])
                    rows["x"].append(b["x"])
                    rows["y"].append(b["y"])
                    rows["w"].append(b["w"])
                    rows["h"].append(b["h"])
                    rows["c"].append(b["c"])
            out = pd.DataFrame(rows)
            out["page"] = out["page"].astype("int32")
            yield out

    return src.mapInPandas(run, schema=BOX_SCHEMA)


def boxes_to_ndjson(boxes: list[dict]) -> str:
    """Char boxes → the pdfish ndjson payload the extraction kernel
    consumes (one JSON object per line, keys c,x,y,w,h,page)."""
    return "\n".join(
        json.dumps(
            {"c": b["c"], "x": b["x"], "y": b["y"], "w": b["w"],
             "h": b["h"], "page": b["page"]},
            separators=(",", ":"),
        )
        for b in boxes
    )


def pdf_extract(binaries: DataFrame, id_col: str = "doc_id",
                content_col: str = "content") -> DataFrame:
    """End-to-end front door: binary → boxes → the EXISTING pdfish
    line-assembly kernel (extract_pdfish_batch) → per-document extracted
    text + spans. One narrow stage: decode and assembly share the batch,
    so box rows never shuttle through a shuffle."""
    from .extract.core import SPANS_TYPE
    from .extract.textops import extract_pdfish_batch, pin_arrow_pools

    src = binaries.select(
        binaries[id_col].alias("doc_id"), binaries[content_col].alias("content")
    )
    schema = f"doc_id string, text string, spans {SPANS_TYPE}, n_spans int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pin_arrow_pools()
        for pdf in batches:
            ids: list = []
            payloads: list[str] = []
            for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
                boxes = decode_binary(data)
                if not boxes:
                    continue
                ids.append(doc_id)
                payloads.append(boxes_to_ndjson(boxes))
            if not ids:
                continue
            res = extract_pdfish_batch(pd.Series(payloads))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": res["text"],
                    "spans": res["spans"],
                    "n_spans": res["n_spans"].astype("int32"),
                }
            )

    return src.mapInPandas(run, schema=schema)
