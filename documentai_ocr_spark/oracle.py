"""Pure-Python per-turn oracle — the golden reference implementation.

Plays the role of the reference repo's human-verified ``labels.txt``
fixtures (/root/reference/Data/1954-01-02/labels.txt, README "校验完毕"):
an *independent*, deliberately simple per-turn implementation of the
extraction rules in ``rules.py``, written as straight-line Python loops
(the style of the reference scripts). The Spark engine must match this
byte-for-byte per turn — the BASELINE.json per-turn text-equality
invariant.

Semantics implemented (reference provenance in rules.py):
  plain  — line density classify + gaps-and-islands run decode
           (run semantics of /root/reference/mocov1/app.py:88-111, density
           profile of /root/reference/font/project_rec.py:16-54)
  html   — DOM-block text-density / link-density boilerplate strip
           (SURVEY.md §2.10 jusText-shaped generalization)
  pdfish — char-box line grouping by (page, y-cluster, x) reading order
           with gap-based space insertion
           (/root/reference/font/project_rec.py:140-183 semantics)
"""

from __future__ import annotations

import json
from typing import Any

from .extract.htmlparse import html_blocks
from .rules import (
    pdfish_box_valid,
    pdfish_normalize_box,
    BOILER_RE,
    DENSE_CHAR_RE,
    DENSITY_THRESH,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_LEN,
    HTML_MIN_DENSITY,
    MIN_LINE_LEN,
    PAYLOAD_HTML,
    PAYLOAD_PDFISH,
    PAYLOAD_PLAIN,
    PDF_LINE_Y_TOL,
    PDF_SPACE_GAP,
    SPAN_KIND_BLOCK,
    SPAN_KIND_CONTENT,
    SPAN_KIND_LINE,
    detect_payload,
)

Span = dict[str, Any]  # {"beg": int, "end": int, "kind": str, "score": float}


def _density(s: str) -> float:
    if not s:
        return 0.0
    return len(DENSE_CHAR_RE.findall(s)) / len(s)


# --------------------------------------------------------------------- plain
def extract_plain(
    text: str,
    min_line_len: int = MIN_LINE_LEN,
    density_thresh: float = DENSITY_THRESH,
) -> tuple[str, list[Span]]:
    lines = text.split("\n")
    flags: list[bool] = []
    stripped: list[str] = []
    dens: list[float] = []
    for line in lines:
        s = line.strip()
        d = _density(s)
        stripped.append(s)
        dens.append(d)
        flags.append(
            len(s) >= min_line_len
            and d >= density_thresh
            and not BOILER_RE.search(s)
        )

    # gaps-and-islands over the content flags (mocov1/app.py:88-111 shape)
    out_parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    i, n = 0, len(lines)
    while i < n:
        if not flags[i]:
            i += 1
            continue
        j = i
        while j < n and flags[j]:
            j += 1
        run_text = "\n".join(stripped[i:j])
        score = sum(dens[i:j]) / (j - i)  # unrounded — see textops note
        if out_parts:
            offset += 1  # the '\n' joining this run to the previous one
        spans.append(
            {"beg": offset, "end": offset + len(run_text),
             "kind": SPAN_KIND_CONTENT, "score": score}
        )
        out_parts.append(run_text)
        offset += len(run_text)
        i = j
    return "\n".join(out_parts), spans


# --------------------------------------------------------------- hysteresis
def extract_plain_hysteresis(text: str) -> tuple[str, list[Span]]:
    """Per-turn oracle for the two-threshold island decoder (rules.HYST_*;
    reference /root/reference/font/characterSegment.py:20-96 semantics):
    strong lines (dens ≥ ENTER) open a region, weak lines (dens ≥ EXIT)
    keep it open, ≤ HYST_BRIDGE consecutive sub-exit lines are bridged; a
    region without a strong line is dropped. Region text covers first..
    last weak line inclusive of bridged lines."""
    from .rules import HYST_BRIDGE, HYST_ENTER, HYST_EXIT, SPAN_KIND_REGION

    lines = text.split("\n")
    stripped = [ln.strip() for ln in lines]
    # a line below the length gate can never be content: its density is 0
    # by rule (the kernel's staged classification computes density only
    # for length-qualified candidates) — bridged short lines contribute 0
    dens = [
        _density(s) if len(s) >= MIN_LINE_LEN else 0.0 for s in stripped
    ]
    weak = []
    strong = []
    for s, d in zip(stripped, dens):
        ok = len(s) >= MIN_LINE_LEN and d >= HYST_EXIT and not BOILER_RE.search(s)
        weak.append(ok)
        strong.append(ok and d >= HYST_ENTER)

    # group weak lines into regions, bridging short gaps
    regions: list[list[int]] = []
    prev_weak_idx = None
    for i, wk in enumerate(weak):
        if not wk:
            continue
        if prev_weak_idx is not None and i - prev_weak_idx <= HYST_BRIDGE + 1:
            regions[-1].append(i)
        else:
            regions.append([i])
        prev_weak_idx = i

    out_parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for reg in regions:
        if not any(strong[i] for i in reg):
            continue
        beg, end = reg[0], reg[-1]
        covered = list(range(beg, end + 1))
        region_text = "\n".join(stripped[i] for i in covered)
        acc = 0.0
        for i in covered:
            acc += dens[i]
        score = acc / len(covered)
        if out_parts:
            offset += 1
        spans.append(
            {"beg": offset, "end": offset + len(region_text),
             "kind": SPAN_KIND_REGION, "score": score}
        )
        out_parts.append(region_text)
        offset += len(region_text)
    return "\n".join(out_parts), spans


# ---------------------------------------------------------------------- html
def extract_html(text: str) -> tuple[str, list[Span]]:
    blocks = html_blocks(text)
    out_parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for block_text, link_chars in blocks:
        n = len(block_text)
        link_density = link_chars / n if n else 1.0
        if (
            n >= HTML_MIN_BLOCK_LEN
            and link_density <= HTML_MAX_LINK_DENSITY
            and _density(block_text) >= HTML_MIN_DENSITY
        ):
            if out_parts:
                offset += 1
            spans.append(
                {"beg": offset, "end": offset + n,
                 "kind": SPAN_KIND_BLOCK, "score": round(1.0 - link_density, 6)}
            )
            out_parts.append(block_text)
            offset += n
    return "\n".join(out_parts), spans


# -------------------------------------------------------------------- pdfish
def extract_pdfish(text: str) -> tuple[str, list[Span]]:
    boxes = []
    for raw in text.split("\n"):
        raw = raw.strip()
        if not raw:
            continue
        try:
            b = json.loads(raw)
        except (ValueError, TypeError):
            continue
        if pdfish_box_valid(b):
            boxes.append(pdfish_normalize_box(b))

    boxes.sort(key=lambda b: (b.get("page", 0), b.get("y", 0.0), b.get("x", 0.0)))

    # group into text lines (chain rule): a box extends the current line iff
    # same page and its y is within tolerance of the previous box's y in the
    # (page, y, x) sort order — deterministic and identical to the engine's
    # vectorized lag-based formulation
    line_groups: list[list[dict]] = []
    for b in boxes:
        if line_groups:
            prev = line_groups[-1][-1]
            if (
                b.get("page", 0) == prev.get("page", 0)
                and abs(b.get("y", 0.0) - prev.get("y", 0.0))
                <= PDF_LINE_Y_TOL * b.get("h", 0.0)
            ):
                line_groups[-1].append(b)
                continue
        line_groups.append([b])

    out_parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for group in line_groups:
        group.sort(key=lambda b: b.get("x", 0.0))
        chars: list[str] = []
        prev = None
        for b in group:
            if prev is not None:
                gap = b.get("x", 0.0) - (prev.get("x", 0.0) + prev.get("w", 0.0))
                if gap > PDF_SPACE_GAP * prev.get("w", 0.0):
                    chars.append(" ")
            chars.append(str(b["c"]))
            prev = b
        line_text = "".join(chars)
        if not line_text:
            continue
        if out_parts:
            offset += 1
        spans.append(
            {"beg": offset, "end": offset + len(line_text),
             "kind": SPAN_KIND_LINE, "score": 1.0}
        )
        out_parts.append(line_text)
        offset += len(line_text)
    return "\n".join(out_parts), spans


# --------------------------------------------------------------- word boxes
def word_boxes(text: str) -> list[tuple[int, int, float, float]]:
    """Per-turn oracle for the pdfish word-span fixup pass
    (/root/reference/font/project_rec.py:104-127 merge/split, :216-223
    glue — constants in rules.py). Returns (line_no, word_no, beg, end)
    per refined word span. Straight-line reimplementation: parse boxes
    (as extract_pdfish), group lines, split words at the space-gap rule,
    then the reference's sequential loop with left-fold width stats."""
    from .rules import WORD_GLUE_MAX_GAP, WORD_GLUE_MAX_W, WORD_SPLIT_SIGMA

    boxes = []
    for raw in text.split("\n"):
        raw = raw.strip()
        if not raw:
            continue
        try:
            b = json.loads(raw)
        except (ValueError, TypeError):
            continue
        if pdfish_box_valid(b):
            boxes.append(pdfish_normalize_box(b))
    boxes.sort(key=lambda b: (b.get("page") or 0, b.get("y") or 0.0,
                              b.get("x") or 0.0))

    line_groups: list[list[dict]] = []
    for b in boxes:
        if line_groups:
            prev = line_groups[-1][-1]
            if (
                (b.get("page") or 0) == (prev.get("page") or 0)
                and abs((b.get("y") or 0.0) - (prev.get("y") or 0.0))
                <= PDF_LINE_Y_TOL * (b.get("h") or 0.0)
            ):
                line_groups[-1].append(b)
                continue
        line_groups.append([b])

    out: list[tuple[int, int, float, float]] = []
    for line_no, group in enumerate(line_groups):
        group.sort(key=lambda b: b.get("x") or 0.0)
        # word candidate intervals: break at the space-gap rule
        begs: list[float] = []
        ends: list[float] = []
        prev = None
        for b in group:
            bx = b.get("x") or 0.0
            bw = b.get("w") or 0.0
            if prev is not None and not (
                bx - ((prev.get("x") or 0.0) + (prev.get("w") or 0.0))
                > PDF_SPACE_GAP * (prev.get("w") or 0.0)
            ):
                ends[-1] = max(ends[-1], bx + bw)
            else:
                begs.append(bx)
                ends.append(bx + bw)
            prev = b
        if not begs:
            continue
        # width stats: left-fold mean + population sigma
        n = len(begs)
        acc = 0.0
        for i in range(n):
            acc += ends[i] - begs[i]
        mean = acc / n
        acc2 = 0.0
        for i in range(n):
            d = (ends[i] - begs[i]) - mean
            acc2 += d * d
        hi = WORD_SPLIT_SIGMA * (acc2 / n) ** 0.5 + mean
        merged: list[tuple[float, float]] = []
        i = 0
        while i < n:
            width = ends[i] - begs[i]
            if width == 0:
                i += 1
                continue
            if width < mean:
                if i + 1 < n and (width + (ends[i + 1] - begs[i + 1])) < hi:
                    merged.append((begs[i], ends[i + 1]))
                    i += 1
                # else dropped — the reference's silent narrow-drop path
            elif width > hi:
                mid = begs[i] + width / 2.0
                merged.append((begs[i], mid))
                merged.append((mid, ends[i]))
            else:
                merged.append((begs[i], ends[i]))
            i += 1
        for k, (s, e) in enumerate(merged):
            if (
                k > 0
                and s - merged[k - 1][1] < WORD_GLUE_MAX_GAP
                and e - s < WORD_GLUE_MAX_W
            ):
                s = merged[k - 1][0]
            out.append((line_no, k, s, e))
    return out


# ------------------------------------------------------------------ dispatch
def extract_turn(
    text: str | None, plain_variant: str = "density"
) -> dict[str, Any]:
    """Per-turn oracle: text payload → extracted main content + spans.
    ``plain_variant``: 'density' (default single-threshold rule) or
    'hysteresis' (two-threshold island decoder)."""
    if text is None:
        text = ""
    kind = detect_payload(text)
    if kind == PAYLOAD_PDFISH:
        extracted, spans = extract_pdfish(text)
    elif kind == PAYLOAD_HTML:
        extracted, spans = extract_html(text)
    elif plain_variant == "hysteresis":
        kind = PAYLOAD_PLAIN
        extracted, spans = extract_plain_hysteresis(text)
    else:
        kind = PAYLOAD_PLAIN
        extracted, spans = extract_plain(text)
    return {
        "payload_kind": kind,
        "text": extracted,
        "spans": spans,
        "n_spans": len(spans),
    }


# --------------------------------------------------------------------- vote
def vote_turn(text: str | None) -> str | None:
    """Per-turn oracle for the ×4 self-consistency vote
    (/root/reference/font/rec.py:41-87 semantics): run the four plain
    recognizers (3 rule operating points + hysteresis); accept iff all
    four produce the same non-empty text, else None."""
    from .rules import RULE_VARIANTS

    if detect_payload(text or "") != PAYLOAD_PLAIN:
        return None
    outs: list[str] = []
    for min_len, dens_t in RULE_VARIANTS.values():
        etext, _ = extract_plain(text or "", min_len, dens_t)
        if etext:
            outs.append(etext)
    etext, _ = extract_plain_hysteresis(text or "")
    if etext:
        outs.append(etext)
    if len(outs) == 4 and len(set(outs)) == 1:
        return outs[0]
    return None


# ------------------------------------------------------------------- fusion
def round6(x: float) -> float:
    """Scaled HALF_EVEN rounding to 6 decimals: round(x*1e6)/1e6 — the
    pure-Python twin of np.round(x, 6) (same double ops, bit-identical;
    pinned by tests/test_fusion.py::test_np_round_matches_round6 over
    exact decimal midpoints). Builtin round(x, 6) is decimal-aware and
    DIVERGES from np.round on midpoints, so the fusion spec uses this
    form on both sides of the golden gate."""
    return round(x * 1e6) / 1e6


def fuse_turn(text: str | None) -> tuple[str, float] | None:
    """Per-turn oracle for the multi-engine fusion pipeline (reference
    /root/reference/ocrclient/redisdata.py:59-64,253-322 semantics):
    run each rule variant, weight-sum scores per distinct candidate
    text, return the argmax above the floor — None when no candidate
    qualifies or the payload is not plain."""
    from .rules import FUSION_SCORE_FLOOR, FUSION_WEIGHTS, RULE_VARIANTS

    if detect_payload(text or "") != PAYLOAD_PLAIN:
        return None
    fused: dict[str, float] = {}
    for engine, (min_len, dens_t) in RULE_VARIANTS.items():
        etext, spans = extract_plain(text or "", min_len, dens_t)
        if not etext:
            continue
        score = round6(sum(s["score"] for s in spans) / len(spans))
        fused[etext] = fused.get(etext, 0.0) + FUSION_WEIGHTS[engine] * score
    cands = [(t, s) for t, s in fused.items() if s >= FUSION_SCORE_FLOOR]
    if not cands:
        return None
    cands.sort(key=lambda x: (-x[1], x[0]))
    return cands[0]
