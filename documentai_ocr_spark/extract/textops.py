"""Vectorized batch extraction kernels (numpy/pandas — the Arrow hot path).

These run inside ``mapInPandas`` Arrow batches: every classify/decode step
is a whole-batch numpy/pandas operation — zero per-row Python in the hot
path. This is the engine-side counterpart of the per-turn loops in
``oracle.py`` (two independent implementations of the rules in
``rules.py``).

Reference semantics re-expressed (not ported):
  * line density profile  — /root/reference/font/project_rec.py:16-54
    (the reference's O(h·w) pixel loops become one ``str.count`` over the
    batch — the headline vectorization win noted in SURVEY.md §4)
  * run-length span decode — /root/reference/mocov1/app.py:88-111
    (gaps-and-islands: boolean flag → lag-style shift → cumulative run ids)
  * char-box line grouping — /root/reference/font/project_rec.py:140-183
    (sorted (page, y, x) scan → vectorized lag conditions)
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

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

_EMPTY = {"text": "", "spans": [], "n_spans": 0}


def _assemble_rows(
    units: pd.DataFrame, n_rows: int, kind_col: str = "kind"
) -> pd.DataFrame:
    """Shared final-assembly step: per-row ordered *units* (content runs /
    DOM blocks / pdf lines, columns ``row, text, score, kind``) → per-row
    extracted text (units joined by '\\n') + span offsets into it.

    Offsets are computed with a grouped cumulative sum (each unit
    contributes len+1 — its text plus the joining newline), not a scan.
    """
    if units.empty:
        return pd.DataFrame(
            {"text": [""] * n_rows, "spans": [[] for _ in range(n_rows)],
             "n_spans": np.zeros(n_rows, dtype=np.int64)}
        )
    # units arrive sorted by row (each producer emits in (row, unit) order)
    row = units["row"].to_numpy(dtype=np.int64)
    tl = units["text"].str.len().to_numpy(dtype=np.int64)
    lenp1 = tl + 1
    cs = np.cumsum(lenp1)
    # first unit index of each row-group; base = chars consumed before it
    first_idx = np.flatnonzero(np.concatenate(([True], row[1:] != row[:-1])))
    base = np.zeros(len(row), dtype=np.int64)
    base[first_idx[1:]] = cs[first_idx[1:] - 1]
    base = np.maximum.accumulate(base)
    beg = (cs - lenp1 - base).astype(np.int32)
    end = (beg + tl).astype(np.int32)

    txt = units["text"].to_numpy()
    kind = units[kind_col].to_numpy()
    score = units["score"].to_numpy()
    bounds = np.concatenate((first_idx, [len(row)]))
    texts_out: list[str] = [""] * n_rows
    spans_out: list[list] = [[] for _ in range(n_rows)]
    n_spans = np.zeros(n_rows, dtype=np.int64)
    # batch loop over row-groups (not per input row): builds the Arrow
    # struct payload; all offset math above is vectorized
    for k in range(len(first_idx)):
        a, b = bounds[k], bounds[k + 1]
        r = row[a]
        texts_out[r] = "\n".join(txt[a:b])
        spans_out[r] = [
            {"beg": int(bg), "end": int(en), "kind": kd, "score": float(sc)}
            for bg, en, kd, sc in zip(beg[a:b], end[a:b], kind[a:b], score[a:b])
        ]
        n_spans[r] = b - a
    return pd.DataFrame({"text": texts_out, "spans": spans_out, "n_spans": n_spans})


# --------------------------------------------------------------------- plain
def extract_plain_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch plain-text extraction: density classify + island run decode."""
    n_rows = len(texts)
    if n_rows == 0:
        return _assemble_rows(pd.DataFrame(), 0)
    lists = texts.fillna("").str.split("\n")
    counts = lists.str.len().to_numpy(dtype=np.int64)
    row = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    flat = pd.Series(
        [ln for sub in lists for ln in sub], dtype="object"
    ).astype("string")

    stripped = flat.str.strip()
    length = stripped.str.len().to_numpy(dtype=np.int64)
    n_dense = stripped.str.count(DENSE_CHAR_RE.pattern).to_numpy(dtype=np.int64)
    dens = np.where(length > 0, n_dense / np.maximum(length, 1), 0.0)
    boiler = (
        stripped.str.contains(BOILER_RE.pattern, case=False, regex=True)
        .fillna(False)
        .to_numpy(dtype=bool)
    )
    flag = (length >= MIN_LINE_LEN) & (dens >= DENSITY_THRESH) & ~boiler

    # gaps-and-islands: a run starts where flag is set but the previous
    # line (same row) wasn't content
    prev_flag = np.concatenate(([False], flag[:-1]))
    prev_row = np.concatenate(([-1], row[:-1]))
    run_start = flag & ~(prev_flag & (prev_row == row))
    run_id = np.cumsum(run_start)  # global, monotone in (row, line) order

    content = flag
    runs_src = pd.DataFrame(
        {
            "row": row[content],
            "run": run_id[content],
            "line": stripped.to_numpy()[content],
            "dens": dens[content],
        }
    )
    if runs_src.empty:
        return _assemble_rows(pd.DataFrame(), n_rows)
    # runs are monotone in (row, line) order → boundary arithmetic, no groupby
    runs = runs_src["run"].to_numpy()
    starts = np.flatnonzero(np.concatenate(([True], runs[1:] != runs[:-1])))
    bounds = np.concatenate((starts, [len(runs)]))
    counts = np.diff(bounds)
    dsum = np.add.reduceat(runs_src["dens"].to_numpy(), starts)
    lines_arr = runs_src["line"].to_numpy()
    units = pd.DataFrame(
        {
            "row": runs_src["row"].to_numpy()[starts],
            "text": [
                "\n".join(lines_arr[a:b]) for a, b in zip(bounds[:-1], bounds[1:])
            ],
            "score": np.round(dsum / counts, 6),
        }
    )
    units["kind"] = SPAN_KIND_CONTENT
    return _assemble_rows(units, n_rows)


# ---------------------------------------------------------------------- html
def extract_html_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch DOM boilerplate strip: parse per doc (stdlib HTMLParser — the
    scan), then classify ALL blocks of the batch in one vectorized pass."""
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
        return _assemble_rows(pd.DataFrame(), n_rows)
    bdf = pd.DataFrame({"row": rows, "text": pd.array(btexts, dtype="string"),
                        "links": blinks})
    n = bdf["text"].str.len().to_numpy(dtype=np.int64)
    link_density = np.where(n > 0, bdf["links"].to_numpy() / np.maximum(n, 1), 1.0)
    n_dense = bdf["text"].str.count(DENSE_CHAR_RE.pattern).to_numpy(dtype=np.int64)
    dens = np.where(n > 0, n_dense / np.maximum(n, 1), 0.0)
    keep = (
        (n >= HTML_MIN_BLOCK_LEN)
        & (link_density <= HTML_MAX_LINK_DENSITY)
        & (dens >= HTML_MIN_DENSITY)
    )
    units = pd.DataFrame(
        {
            "row": bdf["row"].to_numpy()[keep],
            "text": bdf["text"].to_numpy()[keep],
            "score": np.round(1.0 - link_density[keep], 6),
        }
    )
    units["kind"] = SPAN_KIND_BLOCK
    return _assemble_rows(units, n_rows)


# -------------------------------------------------------------------- pdfish
def _parse_boxes_fast(texts: pd.Series) -> pd.DataFrame | None:
    """Whole-batch ndjson parse via pandas' C reader. Returns None when
    any line is malformed — caller falls back to the line-skipping loop
    (identical output; the fast path only exists for clean input)."""
    import io

    lists = texts.fillna("").str.split("\n")
    counts = lists.str.len().to_numpy(dtype=np.int64)
    row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    flat = pd.Series([ln for sub in lists for ln in sub], dtype="object")
    stripped = flat.str.strip()
    keep = (stripped.str.len() > 0).to_numpy(dtype=bool)
    if not keep.any():
        return pd.DataFrame()
    row = row[keep]
    try:
        parsed = pd.read_json(
            io.StringIO("\n".join(stripped.to_numpy()[keep])), lines=True
        )
    except ValueError:
        return None
    if "c" not in parsed.columns or len(parsed) != len(row):
        return None
    parsed["row"] = row
    valid = parsed["c"].notna().to_numpy(dtype=bool)
    parsed = parsed[valid]
    out = pd.DataFrame({"row": parsed["row"].to_numpy(dtype=np.int64)})
    for col, dt, default in (
        ("page", np.int64, 0),
        ("y", np.float64, 0.0),
        ("x", np.float64, 0.0),
        ("w", np.float64, 0.0),
        ("h", np.float64, 0.0),
    ):
        if col in parsed.columns:
            out[col] = parsed[col].fillna(default).to_numpy(dtype=dt)
        else:
            out[col] = np.full(len(parsed), default, dtype=dt)
    out["c"] = parsed["c"].astype(str).to_numpy()
    return out


def _parse_boxes_loop(texts: pd.Series) -> pd.DataFrame:
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
        return pd.DataFrame()
    return pd.DataFrame(
        {
            "row": np.asarray(rows, dtype=np.int64),
            "page": np.asarray([r.get("page", 0) for r in recs], dtype=np.int64),
            "y": np.asarray([r.get("y", 0.0) for r in recs], dtype=np.float64),
            "x": np.asarray([r.get("x", 0.0) for r in recs], dtype=np.float64),
            "w": np.asarray([r.get("w", 0.0) for r in recs], dtype=np.float64),
            "h": np.asarray([r.get("h", 0.0) for r in recs], dtype=np.float64),
            "c": pd.array([str(r["c"]) for r in recs], dtype="object"),
        }
    )


def extract_pdfish_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch char-box line assembly: whole-batch ndjson parse (C reader,
    loop fallback for malformed input), then line grouping / x-sort /
    space insertion vectorized over the whole batch's boxes."""
    n_rows = len(texts)
    boxes = _parse_boxes_fast(texts)
    if boxes is None:
        boxes = _parse_boxes_loop(texts)
    if boxes.empty:
        return _assemble_rows(pd.DataFrame(), n_rows)
    boxes = boxes.sort_values(["row", "page", "y", "x"], kind="stable").reset_index(
        drop=True
    )
    row = boxes["row"].to_numpy()
    page = boxes["page"].to_numpy()
    y = boxes["y"].to_numpy()
    h = boxes["h"].to_numpy()
    prev_row = np.concatenate(([-1], row[:-1]))
    prev_page = np.concatenate(([-1], page[:-1]))
    prev_y = np.concatenate(([np.inf], y[:-1]))
    new_line = (row != prev_row) | (page != prev_page) | (
        np.abs(y - prev_y) > PDF_LINE_Y_TOL * h
    )
    boxes["line"] = np.cumsum(new_line)

    # reading order within a line is by x
    boxes = boxes.sort_values(["line", "x"], kind="stable").reset_index(drop=True)
    x = boxes["x"].to_numpy()
    w = boxes["w"].to_numpy()
    line = boxes["line"].to_numpy()
    prev_line = np.concatenate(([-1], line[:-1]))
    prev_x = np.concatenate(([0.0], x[:-1]))
    prev_w = np.concatenate(([0.0], w[:-1]))
    gap = x - (prev_x + prev_w)
    space = (line == prev_line) & (gap > PDF_SPACE_GAP * prev_w)
    contrib = np.where(space, " " + boxes["c"].astype(str), boxes["c"].astype(str))
    boxes["contrib"] = contrib

    contrib_arr = boxes["contrib"].to_numpy()
    starts = np.flatnonzero(np.concatenate(([True], line[1:] != line[:-1])))
    bounds = np.concatenate((starts, [len(line)]))
    units = pd.DataFrame(
        {
            "row": boxes["row"].to_numpy()[starts],
            "text": [
                "".join(contrib_arr[a:b]) for a, b in zip(bounds[:-1], bounds[1:])
            ],
        }
    )
    units = units[units["text"].str.len() > 0].reset_index(drop=True)
    units["score"] = 1.0
    units["kind"] = SPAN_KIND_LINE
    return _assemble_rows(units, n_rows)
