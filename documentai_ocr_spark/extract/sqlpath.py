"""Pure-Catalyst plain-path extraction — ZERO Python anywhere.

The plain-text rules (line trim → density classify → gaps-and-islands →
span assembly) are fully expressible with Spark higher-order functions,
so the dominant payload kind can run entirely inside WholeStageCodegen:
no Arrow transfer, no Python workers, and the whole stage pipelines with
the scan. The begin/end run formulation below IS the reference's
``slide_window_beg_eng`` (/root/reference/font/project_rec.py:36-54):
run starts where flag[i] and not flag[i-1]; run ends where flag[i] and
not flag[i+1]; zip pairwise.

``extract_turns_hybrid`` routes payloads: plain → this SQL path,
html/pdfish → the Arrow kernels; outputs are byte-identical to
``extract_turns`` and the Python oracle (golden-tested). At ingest scale
the payload kind would be a stored column so each branch's filter prunes
at the scan.

Parity notes: Java ``\\s`` misses some Python-whitespace codepoints even
with (?U), so the trim uses the explicit char class from rules.WS_CLASS;
scores are UNROUNDED means (identical left-fold arithmetic in SQL
aggregate / numpy reduceat / the oracle's sum loop → bit-equal doubles).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rules import (
    BOILER_PHRASES,
    DENSE_CHAR_RE,
    DENSITY_THRESH,
    HTML_SNIFF_RE,
    MIN_LINE_LEN,
    PAYLOAD_HTML,
    PAYLOAD_PDFISH,
    PAYLOAD_PLAIN,
    PDFISH_SNIFF_RE,
    SPAN_KIND_CONTENT,
    WS_CLASS,
)
from .core import EXTRACT_SCHEMA, extract_turns  # noqa: F401  (schema parity)

_BOILER_ALT = "|".join(re.escape(p) for p in BOILER_PHRASES)
_TRIM_RE = f"^{WS_CLASS}+|{WS_CLASS}+$"


def _plain_exprs(min_line_len: int, density_thresh: float) -> dict[str, str]:
    """SQL expression strings computing (out_text, spans, n_spans) from a
    ``text`` column. Built once; every step is a higher-order function."""
    dense = DENSE_CHAR_RE.pattern
    lines = (
        f"transform(split(text, '\\n'), l -> regexp_replace(l, '{_TRIM_RE}', ''))"
    )
    # density computed ONCE per line; the boiler regex is gated behind the
    # cheap predicates via lazy IF (same staging as the Arrow kernel).
    # The length gate is the KERNEL's (>= min_line_len, not just > 0):
    # sub-threshold lines can never flag, so their density is never
    # read — skipping the regex on them matches the Arrow staging
    # where half the lines never see a regex at all.
    dens_of = (
        f"CASE WHEN length(l) >= {min_line_len} THEN "
        f"cast(regexp_count(l, '{dense}') as double) / length(l) "
        "ELSE cast(0.0 as double) END"
    )
    return {
        "lines": lines,
        "dens": f"transform(lines, l -> {dens_of})",
        "flags": (
            "zip_with(lines, dens, (l, d) -> "
            f"IF(length(l) >= {min_line_len} AND d >= {density_thresh}, "
            f"NOT l rlike '(?i)({_BOILER_ALT})', false))"
        ),
        "idxs": "sequence(0, size(lines) - 1)",
        # IF() is lazy — flags[i-1] at i=0 would trip ANSI array bounds
        "starts": "filter(idxs, i -> flags[i] AND IF(i = 0, true, NOT flags[i-1]))",
        "ends": (
            "filter(idxs, i -> flags[i] AND "
            "IF(i = size(flags) - 1, true, NOT flags[i+1]))"
        ),
        "runs": (
            "zip_with(starts, ends, (a, b) -> named_struct("
            "  't', array_join(slice(lines, a + 1, b - a + 1), '\\n'),"
            "  'score', aggregate(slice(dens, a + 1, b - a + 1),"
            "           cast(0.0 as double), (acc, x) -> acc + x) / (b - a + 1)))"
        ),
        "out_text": "array_join(transform(runs, r -> r.t), '\\n')",
        "spans": (
            "aggregate(runs, "
            " named_struct('arr',"
            "   cast(array() as array<struct<beg:int,end:int,kind:string,score:double>>),"
            "   'off', 0),"
            " (acc, r) -> named_struct("
            "   'arr', concat(acc.arr, array(named_struct("
            "     'beg', acc.off + IF(size(acc.arr) > 0, 1, 0),"
            "     'end', acc.off + IF(size(acc.arr) > 0, 1, 0) + length(r.t),"
            f"    'kind', '{SPAN_KIND_CONTENT}',"
            "     'score', r.score))),"
            "   'off', acc.off + IF(size(acc.arr) > 0, 1, 0) + length(r.t)),"
            " acc -> acc.arr)"
        ),
    }


def extract_plain_sql(
    df: DataFrame,
    min_line_len: int = MIN_LINE_LEN,
    density_thresh: float = DENSITY_THRESH,
) -> DataFrame:
    """(…, text) → (…, text=extracted, spans, n_spans) for PLAIN
    payloads, entirely in Catalyst expressions."""
    e = _plain_exprs(min_line_len, density_thresh)
    out = (
        # NULL text must behave as '' (kernel + oracle semantics: empty
        # extraction, not NULL-propagation through every expression)
        df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .withColumn("lines", F.expr(e["lines"]))
        .withColumn("dens", F.expr(e["dens"]))
        .withColumn("flags", F.expr(e["flags"]))
        .withColumn("idxs", F.expr(e["idxs"]))
        .withColumn("starts", F.expr(e["starts"]))
        .withColumn("ends", F.expr(e["ends"]))
        .withColumn("runs", F.expr(e["runs"]))
    )
    return (
        out.withColumn("text", F.expr(e["out_text"]))
        .withColumn("spans", F.expr(e["spans"]))
        .withColumn("n_spans", F.size("spans").cast("int"))
        .drop("lines", "dens", "flags", "idxs", "starts", "ends", "runs")
    )


def payload_kind_col() -> Column:
    """JVM-side payload sniff, same patterns as classify_payload_batch."""
    t = F.coalesce(F.col("text"), F.lit(""))
    is_pdfish = t.rlike(PDFISH_SNIFF_RE.pattern)
    is_html = t.rlike(HTML_SNIFF_RE.pattern) & t.contains("</")
    return (
        F.when(is_pdfish, F.lit(PAYLOAD_PDFISH))
        .when(is_html, F.lit(PAYLOAD_HTML))
        .otherwise(F.lit(PAYLOAD_PLAIN))
    )


def extract_turns_hybrid(transcripts: DataFrame) -> DataFrame:
    """Per-turn extraction with the plain path in pure Catalyst and the
    html/pdfish paths in the Arrow kernels. Output == extract_turns
    byte-for-byte (golden-tested). Both branches stay narrow."""
    src = transcripts.select("conv_id", "turn_idx", "role", "text").withColumn(
        "payload_kind", payload_kind_col()
    )
    plain = extract_plain_sql(
        src.where(F.col("payload_kind") == PAYLOAD_PLAIN)
    ).select(
        "conv_id", "turn_idx", "role", "payload_kind", "text", "spans", "n_spans"
    )
    rest = extract_turns(
        src.where(F.col("payload_kind") != PAYLOAD_PLAIN).drop("payload_kind")
    )
    return plain.unionByName(rest)
