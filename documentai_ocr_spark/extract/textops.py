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
    pdfish_box_valid,
    pdfish_coord,
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
    SPAN_KIND_REGION,
    WORD_GLUE_MAX_GAP,
    WORD_GLUE_MAX_W,
    WORD_SPLIT_SIGMA,
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
    fold. Common case (short segments): vectorized across segments, one
    fused add per position. A skewed batch (one huge segment) would make
    that O(max_len × n_segments), so long segments fall back to
    ``np.add.accumulate`` — which IS a sequential left fold (verified
    bit-equal to the Python loop), keeping the whole thing O(total)."""
    starts = bounds[:-1]
    seg_len = np.diff(bounds)
    out = np.zeros(len(starts), dtype=np.float64)
    if len(starts) == 0:
        return out
    max_len = int(seg_len.max())
    cap = 256
    for j in range(min(max_len, cap)):
        m = seg_len > j
        out[m] += values[starts[m] + j]
    if max_len > cap:
        # the rare skewed segments: finish each tail with accumulate
        # SEEDED by the running sum — [out_k, v_cap, v_cap+1, …] folds as
        # (((out_k + v_cap) + v_cap+1) + …), the exact same order, in C
        for k in np.flatnonzero(seg_len > cap):
            a = starts[k] + cap
            b = starts[k] + seg_len[k]
            seeded = np.concatenate(([out[k]], values[a:b]))
            out[k] = np.add.accumulate(seeded)[-1]
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


# --------------------------------------------------------------- hysteresis
def extract_plain_hysteresis_batch(texts: pd.Series) -> pd.DataFrame:
    """Two-threshold island decode (rules.HYST_*): a region OPENS at a
    line whose density reaches HYST_ENTER, lines at HYST_EXIT keep it
    alive, and up to HYST_BRIDGE consecutive sub-exit lines are bridged —
    runs survive a brief dip, the semantics of the reference's stateful
    column scanner (/root/reference/font/characterSegment.py:20-96).
    Region text spans first..last qualifying line INCLUSIVE of bridged
    lines (the reference's crop includes interior blanks); score is the
    left-fold mean density over that whole range."""
    from ..rules import HYST_BRIDGE, HYST_ENTER, HYST_EXIT

    n_rows = len(texts)
    if n_rows == 0:
        return _empty_result(0)
    row, stripped = _flat_lines(texts)
    length = pc.utf8_length(stripped).to_numpy().astype(np.int64)
    n_lines = len(length)
    dens = np.zeros(n_lines, dtype=np.float64)
    weak = np.zeros(n_lines, dtype=bool)
    strong = np.zeros(n_lines, dtype=bool)
    cand_idx = np.flatnonzero(length >= MIN_LINE_LEN)
    if len(cand_idx):
        cand_lines = stripped.take(pa.array(cand_idx))
        n_dense = (
            pc.count_substring_regex(cand_lines, DENSE_CHAR_RE.pattern)
            .to_numpy()
            .astype(np.int64)
        )
        dens_c = n_dense / length[cand_idx]
        dens[cand_idx] = dens_c
        pass2 = np.flatnonzero(dens_c >= HYST_EXIT)
        if len(pass2):
            boiler = pc.match_substring_regex(
                cand_lines.take(pa.array(pass2)),
                BOILER_RE.pattern,
                ignore_case=True,
            ).to_numpy(zero_copy_only=False)
            ok = cand_idx[pass2[~boiler]]
            weak[ok] = True
            strong[ok] = dens[ok] >= HYST_ENTER

    wpos = np.flatnonzero(weak)
    if len(wpos) == 0:
        return _empty_result(n_rows)
    # line index within each row (for gap math across rows' boundaries)
    row_first = np.flatnonzero(np.concatenate(([True], row[1:] != row[:-1])))
    base = np.zeros(n_lines, dtype=np.int64)
    base[row_first] = row_first
    base = np.maximum.accumulate(base)
    li = np.arange(n_lines, dtype=np.int64) - base

    wrow = row[wpos]
    wli = li[wpos]
    new_region = np.concatenate(
        ([True], (wrow[1:] != wrow[:-1]) | (wli[1:] - wli[:-1] > HYST_BRIDGE + 1))
    )
    rstart = np.flatnonzero(new_region)
    rbounds = np.concatenate((rstart, [len(wpos)]))
    has_strong = np.logical_or.reduceat(strong[wpos], rstart)
    keep = np.flatnonzero(has_strong)
    if len(keep) == 0:
        return _empty_result(n_rows)

    reg_row = wrow[rstart[keep]]
    beg_abs = wpos[rstart[keep]]
    end_abs = wpos[rbounds[1:][keep] - 1]
    # gather every line (incl. bridged) per kept region
    idx_parts = [np.arange(b, e + 1) for b, e in zip(beg_abs, end_abs)]
    lens = np.array([len(p) for p in idx_parts], dtype=np.int64)
    idx = (
        np.concatenate(idx_parts)
        if idx_parts
        else np.array([], dtype=np.int64)
    )
    offsets = np.concatenate(([0], np.cumsum(lens)))
    gathered = stripped.take(pa.array(idx))
    region_texts = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), gathered),
        "\n",
    )
    dsum = _segment_leftfold_sum(dens[idx], offsets)
    return _assemble_rows(
        reg_row, region_texts, dsum / lens, SPAN_KIND_REGION, n_rows
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
    # Python round(), not np.round: the oracle rounds each block score
    # with Python round and the two differ in the last ulp at some
    # midpoints (e.g. 1 - 1/640) — same discipline as fusion.py
    scores = np.array(
        [round(float(1.0 - ld), 6) for ld in link_density[kept]],
        dtype=np.float64,
    )
    return _assemble_rows(
        np.asarray(rows, dtype=np.int64)[kept],
        barr.take(pa.array(kept)),
        scores,
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
        v = arr.to_numpy(zero_copy_only=False)[idx]
        # same rule as pdfish_coord: a JSON literal like 1e309 overflows
        # to inf; non-finite coordinates default to 0.0 on both the
        # kernel and oracle sides so geometry math never sees NaN/inf
        if not np.isfinite(v).all():
            v = np.where(np.isfinite(v), v, 0.0)
        return v

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
            if pdfish_box_valid(b):
                rows.append(i)
                recs.append(b)
    if not recs:
        return {}
    return {
        "row": np.asarray(rows, dtype=np.int64),
        "page": np.asarray([pdfish_coord(r.get("page")) for r in recs], dtype=np.float64),
        "y": np.asarray([pdfish_coord(r.get("y")) for r in recs], dtype=np.float64),
        "x": np.asarray([pdfish_coord(r.get("x")) for r in recs], dtype=np.float64),
        "w": np.asarray([pdfish_coord(r.get("w")) for r in recs], dtype=np.float64),
        "h": np.asarray([pdfish_coord(r.get("h")) for r in recs], dtype=np.float64),
        "c": np.asarray([str(r["c"]) for r in recs], dtype=object),
    }


def _line_sorted_boxes(texts: pd.Series) -> dict | None:
    """Shared pdfish front half: parse char boxes, assign text-line ids
    by (page, y-cluster), establish x reading order, flag word gaps.
    Returns None when the batch has no boxes; otherwise arrays sorted in
    (line, x) order: row, x, w, line (global ids), c, space."""
    boxes = _parse_boxes_fast(texts)
    if boxes is None:
        boxes = _parse_boxes_loop(texts)
    if not boxes:
        return None

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
    prev_page = np.concatenate(([-1.0], page[:-1]))
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
    return {"row": row, "x": x, "w": w, "line": line, "c": c, "space": space}


def extract_pdfish_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch char-box line assembly: whole-batch ndjson parse (C++
    reader, loop fallback for malformed input), then line grouping /
    x-sort / space insertion vectorized over the whole batch's boxes."""
    n_rows = len(texts)
    lb = _line_sorted_boxes(texts)
    if lb is None:
        return _empty_result(n_rows)
    row, x, w, line, c, space = (
        lb["row"], lb["x"], lb["w"], lb["line"], lb["c"], lb["space"]
    )

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


# ------------------------------------------------------- word-span fixups
def _leftfold_mean_std(widths: list[float]) -> tuple[float, float]:
    """Mean and population σ with strict left-fold accumulation (parity
    with the oracle's straight-line loops; np.mean/np.std are pairwise)."""
    n = len(widths)
    acc = 0.0
    for v in widths:
        acc += v
    mean = acc / n
    acc2 = 0.0
    for v in widths:
        d = v - mean
        acc2 += d * d
    return mean, (acc2 / n) ** 0.5


def refine_word_spans(
    begs: list[float], ends: list[float]
) -> list[tuple[float, float]]:
    """The reference's merge-narrow / split-wide / glue fixup over one
    line's word intervals (/root/reference/font/project_rec.py:104-127 and
    :216-223 — semantics re-derived, incl. its quirks: a narrow run that
    cannot merge is DROPPED; a merge consumes the next run; glue extends
    a late-starting narrow run back to the previous run's ORIGINAL start).
    Inherently sequential per line — lines are short, so this stays a
    scalar loop inside the Arrow batch (SURVEY.md §7 hard-part (c))."""
    n = len(begs)
    if n == 0:
        return []
    widths = [ends[i] - begs[i] for i in range(n)]
    mean, sigma = _leftfold_mean_std(widths)
    hi = WORD_SPLIT_SIGMA * sigma + mean
    merged: list[tuple[float, float]] = []
    i = 0
    while i < n:
        width = widths[i]
        if width == 0:
            i += 1
            continue
        if width < mean:
            if i + 1 < n and (width + widths[i + 1]) < hi:
                merged.append((begs[i], ends[i + 1]))
                i += 1  # the merge consumes the next run
            # else: dropped (the reference appends nothing on this path)
        elif width > hi:
            mid = begs[i] + width / 2.0
            merged.append((begs[i], mid))
            merged.append((mid, ends[i]))
        else:
            merged.append((begs[i], ends[i]))
        i += 1
    # glue pass over the merged list
    out: list[tuple[float, float]] = []
    for k, (s, e) in enumerate(merged):
        if (
            k > 0
            and s - merged[k - 1][1] < WORD_GLUE_MAX_GAP
            and e - s < WORD_GLUE_MAX_W
        ):
            s = merged[k - 1][0]
        out.append((s, e))
    return out


def word_spans_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch pdfish word-box extraction: the line-assembly front half
    (vectorized), word candidate intervals from the gap rule (vectorized
    reduceat), then the reference's sequential merge/split/glue fixup per
    line. Output: one row per refined word span
    (row, line_no, word_no, beg_px, end_px)."""
    lb = _line_sorted_boxes(texts)
    empty = pd.DataFrame(
        {
            "row": np.array([], dtype=np.int64),
            "line_no": np.array([], dtype=np.int64),
            "word_no": np.array([], dtype=np.int64),
            "beg_px": np.array([], dtype=np.float64),
            "end_px": np.array([], dtype=np.float64),
        }
    )
    if lb is None:
        return empty
    row, x, w, line, space = lb["row"], lb["x"], lb["w"], lb["line"], lb["space"]

    # word candidates: a new word starts at a line start or a space gap
    new_line = np.concatenate(([True], line[1:] != line[:-1]))
    word_start = new_line | space
    wstarts = np.flatnonzero(word_start)
    beg = x[wstarts]
    end = np.maximum.reduceat(x + w, wstarts)
    wline = line[wstarts]
    wrow = row[wstarts]

    # per-line fixup (sequential within a line, vectorized batch outside)
    lstarts = np.flatnonzero(np.concatenate(([True], wline[1:] != wline[:-1])))
    lbounds = np.concatenate((lstarts, [len(wline)]))
    # per-row line ordinal: reset the running line number at each new row
    line_rows = wrow[lstarts]
    first_of_row = np.concatenate(([True], line_rows[1:] != line_rows[:-1]))
    lineno_base = np.arange(len(lstarts))
    row_base = np.zeros(len(lstarts), dtype=np.int64)
    row_base[first_of_row] = lineno_base[first_of_row]
    row_base = np.maximum.accumulate(row_base)
    line_nos = lineno_base - row_base

    out_row: list[int] = []
    out_line: list[int] = []
    out_word: list[int] = []
    out_beg: list[float] = []
    out_end: list[float] = []
    for k in range(len(lstarts)):
        a, b = lbounds[k], lbounds[k + 1]
        spans = refine_word_spans(list(beg[a:b]), list(end[a:b]))
        r = int(line_rows[k])
        ln = int(line_nos[k])
        for j, (s, e) in enumerate(spans):
            out_row.append(r)
            out_line.append(ln)
            out_word.append(j)
            out_beg.append(s)
            out_end.append(e)
    return pd.DataFrame(
        {
            "row": np.asarray(out_row, dtype=np.int64),
            "line_no": np.asarray(out_line, dtype=np.int64),
            "word_no": np.asarray(out_word, dtype=np.int64),
            "beg_px": np.asarray(out_beg, dtype=np.float64),
            "end_px": np.asarray(out_end, dtype=np.float64),
        }
    )
