"""Vectorized batch extraction kernels — the Arrow hot path.

These run inside ``mapInPandas`` Arrow batches. All string classification
and joining is **pyarrow compute** (contiguous buffers, C++ kernels, RE2
regex) and all sequence logic is numpy — Python objects materialize only
for the final per-row output column and the small spans structs. The
contiguous-buffer design matters twice: ~3× single-core over
pandas-object ops, and far less allocator/bandwidth pressure per turn,
which is what preserves multi-core scaling (BASELINE.json's ≥0.8
efficiency criterion).

Reference semantics re-expressed (not ported):
  * line density profile  — /root/reference/font/project_rec.py:16-54
    (O(h·w) pixel loops → one count_substring_regex over the batch)
  * run-length span decode — /root/reference/mocov1/app.py:88-111
    (gaps-and-islands: boolean flag → shifted compare → cumsum run ids)
  * char-box line grouping — /root/reference/font/project_rec.py:140-183
    (sorted (page, y, x) scan → vectorized lag conditions)

Regex parity note: pyarrow uses RE2, the oracle uses Python ``re``. The
rule patterns (a char class and a literal-phrase alternation) behave
identically under both engines; the golden tests enforce it.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_ARROW_PINNED = False


def pin_arrow_pools() -> None:
    """Inside a Spark Python worker, pyarrow's internal pools default to
    nproc threads — 32 workers × 32 threads thrashes the box. One thread
    per worker process is the right shape (+20% aggregate at 32 cores)."""
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:
            pass
        _ARROW_PINNED = True

from ..rules import (
    BOILER_RE,
    DENSE_CHAR_RE,
    DENSITY_THRESH,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_LEN,
    HTML_MIN_DENSITY,
    MIN_LINE_LEN,
    PDF_LINE_Y_TOL,
    PDF_SPACE_GAP,
    SPAN_KIND_BLOCK,
    SPAN_KIND_CONTENT,
    SPAN_KIND_LINE,
)
from .htmlparse import html_blocks


def _empty_result(n_rows: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "text": [""] * n_rows,
            "spans": [[] for _ in range(n_rows)],
            "n_spans": np.zeros(n_rows, dtype=np.int64),
            "score_sum": np.zeros(n_rows, dtype=np.float64),
        }
    )


def _assemble_rows(
    row: np.ndarray,
    texts: pa.Array,
    score: np.ndarray,
    kind,
    n_rows: int,
) -> pd.DataFrame:
    """Shared final assembly: per-row ordered *units* (content runs / DOM
    blocks / pdf lines) → per-row extracted text (units joined by '\\n')
    + span offsets into it. ``row`` must be sorted ascending; ``kind`` is
    a scalar str or per-unit array. Offsets are char (codepoint) indexed."""
    if len(row) == 0:
        return _empty_result(n_rows)
    tl = pc.utf8_length(texts).to_numpy().astype(np.int64)
    lenp1 = tl + 1
    cs = np.cumsum(lenp1)
    first_idx = np.flatnonzero(np.concatenate(([True], row[1:] != row[:-1])))
    base = np.zeros(len(row), dtype=np.int64)
    base[first_idx[1:]] = cs[first_idx[1:] - 1]
    base = np.maximum.accumulate(base)
    beg = (cs - lenp1 - base).astype(np.int64)
    end = beg + tl

    bounds = np.concatenate((first_idx, [len(row)]))
    # one C++ join per row-group
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds, type=pa.int32()), texts), "\n"
    ).to_pylist()

    kinds = (
        np.full(len(row), kind, dtype=object)
        if isinstance(kind, str)
        else np.asarray(kind, dtype=object)
    )
    # per-row left-fold sum of unit scores (consumers like fusion need
    # sum(span scores) with the oracle's exact accumulation order — doing
    # it here is one vectorized pass instead of per-row Python later)
    score_arr = np.asarray(score, dtype=np.float64)
    ssum = _segment_leftfold_sum(score_arr, bounds)
    texts_out: list[str] = [""] * n_rows
    spans_out: list[list] = [[] for _ in range(n_rows)]
    n_spans = np.zeros(n_rows, dtype=np.int64)
    score_sum = np.zeros(n_rows, dtype=np.float64)
    for k in range(len(first_idx)):
        a, b = bounds[k], bounds[k + 1]
        r = row[a]
        texts_out[r] = joined[k]
        spans_out[r] = [
            {"beg": int(bg), "end": int(en), "kind": kd, "score": float(sc)}
            for bg, en, kd, sc in zip(beg[a:b], end[a:b], kinds[a:b], score_arr[a:b])
        ]
        n_spans[r] = b - a
        score_sum[r] = ssum[k]
    return pd.DataFrame(
        {
            "text": texts_out,
            "spans": spans_out,
            "n_spans": n_spans,
            "score_sum": score_sum,
        }
    )


def _segment_leftfold_sum(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Per-segment sum with STRICT left-fold IEEE order (values[a] +
    values[a+1] + … one at a time). np.add.reduceat/sum use pairwise
    accumulation whose last-ulp results differ from the SQL path's
    aggregate() and the oracle's sum() — bit-parity requires the same
    fold. Vectorized across segments: one fused add per line-position."""
    starts = bounds[:-1]
    seg_len = np.diff(bounds)
    out = np.zeros(len(starts), dtype=np.float64)
    if len(starts) == 0:
        return out
    for j in range(int(seg_len.max())):
        m = seg_len > j
        out[m] += values[starts[m] + j]
    return out


def _flat_lines(texts: pd.Series) -> tuple[np.ndarray, pa.Array]:
    """texts → (row id per line, stripped line array) via arrow splits."""
    arr = pa.array(texts.fillna(""), type=pa.string())
    lines = pc.split_pattern(arr, "\n")
    offsets = lines.offsets.to_numpy()
    counts = np.diff(offsets)
    row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    stripped = pc.utf8_trim_whitespace(lines.flatten())
    return row, stripped


# --------------------------------------------------------------------- plain
def extract_plain_batch(
    texts: pd.Series,
    min_line_len: int = MIN_LINE_LEN,
    density_thresh: float = DENSITY_THRESH,
) -> pd.DataFrame:
    """Batch plain-text extraction: density classify + island run decode.
    The two thresholds parameterize the rule variant (fusion engines,
    rules.RULE_VARIANTS); defaults are the production rules."""
    n_rows = len(texts)
    if n_rows == 0:
        return _empty_result(0)
    row, stripped = _flat_lines(texts)
    length = pc.utf8_length(stripped).to_numpy().astype(np.int64)
    # staged classification: each regex scans only the survivors of the
    # cheaper predicates (half the lines never see a regex at all)
    n_lines = len(length)
    cand_idx = np.flatnonzero(length >= min_line_len)
    dens = np.zeros(n_lines, dtype=np.float64)
    flag = np.zeros(n_lines, dtype=bool)
    if len(cand_idx):
        cand_lines = stripped.take(pa.array(cand_idx))
        n_dense = (
            pc.count_substring_regex(cand_lines, DENSE_CHAR_RE.pattern)
            .to_numpy()
            .astype(np.int64)
        )
        dens_c = n_dense / length[cand_idx]
        dens[cand_idx] = dens_c
        pass2 = np.flatnonzero(dens_c >= density_thresh)
        if len(pass2):
            boiler = pc.match_substring_regex(
                cand_lines.take(pa.array(pass2)),
                BOILER_RE.pattern,
                ignore_case=True,
            ).to_numpy(zero_copy_only=False)
            flag[cand_idx[pass2[~boiler]]] = True

    # gaps-and-islands: a run starts where flag is set but the previous
    # line (same row) wasn't content
    prev_flag = np.concatenate(([False], flag[:-1]))
    prev_row = np.concatenate(([-1], row[:-1]))
    run_start = flag & ~(prev_flag & (prev_row == row))
    run_id = np.cumsum(run_start)

    content = np.flatnonzero(flag)
    if len(content) == 0:
        return _empty_result(n_rows)
    runs = run_id[content]
    starts = np.flatnonzero(np.concatenate(([True], runs[1:] != runs[:-1])))
    bounds = np.concatenate((starts, [len(content)]))
    dsum = _segment_leftfold_sum(dens[content], bounds)
    run_texts = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(bounds, type=pa.int32()),
            stripped.take(pa.array(content)),
        ),
        "\n",
    )
    # UNROUNDED mean: the SQL path, this kernel, and the oracle all use
    # the same left-fold sum order, so the doubles are bit-identical
    return _assemble_rows(
        row[content][starts],
        run_texts,
        dsum / np.diff(bounds),
        SPAN_KIND_CONTENT,
        n_rows,
    )


# ---------------------------------------------------------------------- html
def extract_html_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch DOM boilerplate strip: scan per doc (regex tokenizer — see
    htmlparse), then classify ALL blocks of the batch in one vectorized
    pass."""
    n_rows = len(texts)
    rows: list[int] = []
    btexts: list[str] = []
    blinks: list[int] = []
    for i, t in enumerate(texts.fillna("")):
        for bt, lc in html_blocks(t):
            rows.append(i)
            btexts.append(bt)
            blinks.append(lc)
    if not rows:
        return _empty_result(n_rows)
    barr = pa.array(btexts, type=pa.string())
    n = pc.utf8_length(barr).to_numpy().astype(np.int64)
    links = np.asarray(blinks, dtype=np.int64)
    link_density = np.where(n > 0, links / np.maximum(n, 1), 1.0)
    n_dense = (
        pc.count_substring_regex(barr, DENSE_CHAR_RE.pattern)
        .to_numpy()
        .astype(np.int64)
    )
    dens = np.where(n > 0, n_dense / np.maximum(n, 1), 0.0)
    keep = (
        (n >= HTML_MIN_BLOCK_LEN)
        & (link_density <= HTML_MAX_LINK_DENSITY)
        & (dens >= HTML_MIN_DENSITY)
    )
    kept = np.flatnonzero(keep)
    return _assemble_rows(
        np.asarray(rows, dtype=np.int64)[kept],
        barr.take(pa.array(kept)),
        np.round(1.0 - link_density[kept], 6),
        SPAN_KIND_BLOCK,
        n_rows,
    )


# -------------------------------------------------------------------- pdfish
_BOX_SCHEMA = pa.schema(
    [
        ("c", pa.string()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("w", pa.float64()),
        ("h", pa.float64()),
        # float64, NOT int64: the oracle keeps the raw JSON value, so a
        # fractional page like {"page":0.5} must group lines the same way
        # in both implementations (int coercion would merge 0.5 into 0)
        ("page", pa.float64()),
    ]
)


def _parse_boxes_fast(texts: pd.Series) -> dict | None:
    """Whole-batch ndjson parse via pyarrow's C++ reader. Returns None
    when any line deviates from the box schema — caller falls back to the
    line-skipping loop (identical output for the clean-input common case)."""
    from pyarrow import json as pa_json

    row, stripped = _flat_lines(texts)
    keep = pc.utf8_length(stripped).to_numpy().astype(np.int64) > 0
    if not keep.any():
        return {}
    row = row[keep]
    kept_lines = stripped.take(pa.array(np.flatnonzero(keep)))
    payload = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array([0, len(kept_lines)], type=pa.int32()), kept_lines
        ),
        "\n",
    )[0].as_py()
    try:
        table = pa_json.read_json(
            pa.BufferReader(payload.encode("utf-8")),
            parse_options=pa_json.ParseOptions(
                explicit_schema=_BOX_SCHEMA, unexpected_field_behavior="ignore"
            ),
        )
    except pa.ArrowInvalid:
        return None
    if table.num_rows != len(row):
        return None
    c = table.column("c").combine_chunks()
    valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(valid)

    def col(name, default):
        arr = pc.fill_null(table.column(name), default).combine_chunks()
        return arr.to_numpy(zero_copy_only=False)[idx]

    return {
        "row": row[idx],
        "page": col("page", 0.0),
        "y": col("y", 0.0),
        "x": col("x", 0.0),
        "w": col("w", 0.0),
        "h": col("h", 0.0),
        "c": np.asarray(c.to_pylist(), dtype=object)[idx],
    }


def _parse_boxes_loop(texts: pd.Series) -> dict:
    """Reference parse: per-line json.loads, silently skipping malformed
    lines and non-box records (the reference's drop-malformed TSV
    semantics, /root/reference/spiltTools.py:21-22)."""
    rows: list[int] = []
    recs: list[dict] = []
    for i, t in enumerate(texts.fillna("")):
        for raw in t.split("\n"):
            raw = raw.strip()
            if not raw:
                continue
            try:
                b = json.loads(raw)
            except (ValueError, TypeError):
                continue
            if isinstance(b, dict) and "c" in b and b["c"] is not None:
                rows.append(i)
                recs.append(b)
    if not recs:
        return {}
    return {
        "row": np.asarray(rows, dtype=np.int64),
        "page": np.asarray([r.get("page", 0) or 0 for r in recs], dtype=np.float64),
        "y": np.asarray([r.get("y", 0.0) or 0.0 for r in recs], dtype=np.float64),
        "x": np.asarray([r.get("x", 0.0) or 0.0 for r in recs], dtype=np.float64),
        "w": np.asarray([r.get("w", 0.0) or 0.0 for r in recs], dtype=np.float64),
        "h": np.asarray([r.get("h", 0.0) or 0.0 for r in recs], dtype=np.float64),
        "c": np.asarray([str(r["c"]) for r in recs], dtype=object),
    }


def extract_pdfish_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch char-box line assembly: whole-batch ndjson parse (C++
    reader, loop fallback for malformed input), then line grouping /
    x-sort / space insertion vectorized over the whole batch's boxes."""
    n_rows = len(texts)
    boxes = _parse_boxes_fast(texts)
    if boxes is None:
        boxes = _parse_boxes_loop(texts)
    if not boxes:
        return _empty_result(n_rows)

    row, page, y, x, w, h, c = (
        boxes["row"], boxes["page"], boxes["y"], boxes["x"],
        boxes["w"], boxes["h"], boxes["c"],
    )
    # stable sort by (row, page, y, x): lexsort takes keys last-first
    order = np.lexsort((x, y, page, row))
    row, page, y, x, w, h, c = (
        a[order] for a in (row, page, y, x, w, h, c)
    )
    prev_row = np.concatenate(([-1], row[:-1]))
    prev_page = np.concatenate(([-1], page[:-1]))
    prev_y = np.concatenate(([np.inf], y[:-1]))
    new_line = (row != prev_row) | (page != prev_page) | (
        np.abs(y - prev_y) > PDF_LINE_Y_TOL * h
    )
    line = np.cumsum(new_line)

    # reading order within a line is by x
    order2 = np.lexsort((x, line))
    row, x, w, line, c = (a[order2] for a in (row, x, w, line, c))
    prev_line = np.concatenate(([-1], line[:-1]))
    prev_x = np.concatenate(([0.0], x[:-1]))
    prev_w = np.concatenate(([0.0], w[:-1]))
    gap = x - (prev_x + prev_w)
    space = (line == prev_line) & (gap > PDF_SPACE_GAP * prev_w)

    c_arr = pa.array(c, type=pa.string())
    prefix = pa.array(np.where(space, " ", ""), type=pa.string())
    contrib = pc.binary_join_element_wise(prefix, c_arr, "")

    starts = np.flatnonzero(np.concatenate(([True], line[1:] != line[:-1])))
    bounds = np.concatenate((starts, [len(line)]))
    line_texts = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds, type=pa.int32()), contrib), ""
    )
    nonempty = pc.utf8_length(line_texts).to_numpy().astype(np.int64) > 0
    kept = np.flatnonzero(nonempty)
    return _assemble_rows(
        row[starts][kept],
        line_texts.take(pa.array(kept)),
        np.ones(len(kept), dtype=np.float64),
        SPAN_KIND_LINE,
        n_rows,
    )
