"""Deterministic synthetic transcripts — the fixture generator.

Produces the BASELINE.json input_hint shape exactly:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Two generators:
  * :func:`synth_transcripts` — small, self-contained pandas frame for
    golden tests (seeded, covers every payload class in FIXTURES.md §1:
    plain-with-boilerplate, html, pdfish char boxes, cjk mix, edge cases,
    plus skewed conversations).
  * :func:`transcripts_from_documents` — scales the same turn decorator
    over the driver's ``documents`` parquet (deterministic function of
    (doc_id, text) — no randomness, no external data) for ``entry()``
    and the benchmark. Runs as ``mapInPandas`` so generation itself is
    distributed.

Everything is a pure function of integer salts — rerunning yields
byte-identical tables (the reference's fixture discipline:
/root/reference/Data/*/labels.txt are frozen golden files).
"""

from __future__ import annotations

import datetime as dt
import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)
# doc_id → hour offset wraps at this modulus: pandas materializes ts as
# datetime64[ns], whose int64 range ends at year 2262 — an UNwrapped
# hours=doc_id would overflow at doc_id ≈ 2.09M (and datetime.max at
# 69.9M). 2M hours ≈ 228 years keeps every ts in range at any corpus
# size while leaving all current SFs (doc_id < 2M) bit-identical.
# The DuckDB twins of this rule (relational._TS_BASE_MS sites) apply
# the SAME modulus — one rendering per engine.
TS_HOUR_MOD = 2_000_000

_WORDS = (
    "analysis engine pipeline extraction content density threshold span "
    "window partition shuffle broadcast column parquet schema lineage "
    "snapshot checkpoint transcript conversation assistant message token "
    "classifier boilerplate heuristic vector batch arrow kernel"
).split()

_BOILER_LINES = (
    "Copyright 2024 Example Corp. All rights reserved.",
    "Subscribe to our newsletter today!",
    "nav: home | products | pricing | contact",
    "footer: privacy policy | terms of service",
    "Click here for a free trial offer now!",
    "Follow us on social media channels",
)

_NOISE_LINES = ("___ --- ___", "*** !!! ***", ">>>>>>>>", "....", "#@!$%^&*()")

_CJK = "文档提取引擎按行计算密度并解码连续内容区间输出主要正文与跨度偏移"

_TOOLS = ("search", "browser", "calculator", "code_exec")
_ROLES = ("user", "assistant", "tool")


def _md5_mod(key: str, n: int) -> int:
    """First 8 md5 hex chars mod n — the cross-engine-reproducible coin
    (DuckDB: ('0x'||substr(md5(key),1,8))::bigint % n)."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def _sentence(salt: int, n_words: int) -> str:
    return " ".join(_WORDS[(salt * 7 + i * 13) % len(_WORDS)] for i in range(n_words))


def make_plain(salt: int) -> str:
    """3-9 lines mixing content, boilerplate and low-density noise."""
    n_lines = 3 + salt % 7
    lines: list[str] = []
    for i in range(n_lines):
        h = (salt * 31 + i * 17) % 10
        if h < 5:
            lines.append(_sentence(salt + i, 8 + (salt + i) % 9) + ".")
        elif h < 7:
            lines.append(_BOILER_LINES[(salt + i) % len(_BOILER_LINES)])
        elif h < 8:
            lines.append(_NOISE_LINES[(salt + i) % len(_NOISE_LINES)])
        elif h < 9:
            start = (salt + i) % (len(_CJK) - 12)
            lines.append(_CJK[start : start + 12])
        else:
            lines.append("ok")  # short, sub-threshold
    return "\n".join(lines)


def make_html(salt: int) -> str:
    paras = "".join(
        f"<p>{_sentence(salt + i, 10 + (salt + i) % 6)}.</p>" for i in range(2 + salt % 3)
    )
    links = "".join(
        f'<a href="/{i}">{_WORDS[(salt + i) % len(_WORDS)]}</a> ' for i in range(6)
    )
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav>home | about | contact</nav>"
        f"<div class=\"menu\">{links}</div>"
        f"<article>{paras}</article>"
        f"<div>{_sentence(salt + 99, 4)} {links}</div>"
        "<footer>Copyright 2024 Example Corp. All rights reserved.</footer>"
        "</body></html>"
    )


def make_pdfish(salt: int) -> str:
    """Char-box JSON lines for two short text lines (FIXTURES.md pdfish)."""
    out: list[str] = []
    for line_no in range(2 + salt % 2):
        text = _sentence(salt + line_no, 4 + (salt + line_no) % 3)
        x = 5.0 + (salt % 3)
        y = 20.0 * line_no + 10.0
        page = line_no // 2
        for ch in text:
            w = 8.0 if ch != " " else 0.0
            if ch == " ":
                x += 8.0  # gap > PDF_SPACE_GAP * prev_w → decoded as a space
                continue
            out.append(
                json.dumps(
                    {"c": ch, "x": round(x, 1), "y": y, "w": w, "h": 10.0,
                     "page": page},
                    separators=(",", ":"),
                )
            )
            x += w + 1.0
    return "\n".join(out)


def make_edge(salt: int) -> str:
    edges = ("", "   ", "x", "a" * 500, "\n\n\n", "short\nok\nno")
    return edges[salt % len(edges)]


def turn_text(salt: int) -> str:
    """Deterministic payload for one turn: ~60% plain / 20% html /
    15% pdfish / 5% edge."""
    h = salt % 20
    if h < 12:
        return make_plain(salt)
    if h < 16:
        return make_html(salt)
    if h < 19:
        return make_pdfish(salt)
    return make_edge(salt)


# ------------------------------------------------------------------ fixtures
def synth_transcripts(
    n_convs: int = 20, seed: int = 42, skew_factor: int = 20
) -> pd.DataFrame:
    """Small golden-test table. Conversation 0 gets ``skew_factor``× the
    median turn count (exercises salting); rows are emitted SHUFFLED
    (seeded) so tests prove the engine re-establishes (conv_id, turn_idx)
    order rather than relying on input order."""
    rows = []
    for c in range(n_convs):
        n_turns = 4 + (c * 3) % 6
        if c == 0:
            n_turns *= skew_factor
        for t in range(n_turns):
            salt = c * 1009 + t * 31 + seed
            role = _ROLES[t % len(_ROLES)]
            rows.append(
                {
                    "conv_id": f"conv-{c:06d}",
                    "turn_idx": t,
                    "role": role,
                    "text": turn_text(salt),
                    "tool": _TOOLS[salt % len(_TOOLS)] if role == "tool" else None,
                    "ts": _BASE_TS
                    + dt.timedelta(hours=c % TS_HOUR_MOD, minutes=t),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    rng = np.random.RandomState(seed)
    return pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)


# ----------------------------------------------------- documents → transcripts
def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, turns_per_doc: int = 12
) -> DataFrame:
    """Derive a transcripts table deterministically from the driver's
    ``documents`` parquet: each document becomes one conversation; its
    word stream is chunked into turns and each turn is decorated with a
    payload class chosen by (doc_id, turn_idx) hash. Distributed
    generation via mapInPandas."""
    # documents.parquet is a single file → one split; spread generation
    # across all workers before the Python stage
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n_parts)
    )

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = (text or "").split()
                conv = f"conv-{int(doc_id):08d}"
                for t in range(turns_per_doc):
                    salt = int(doc_id) * 131 + t * 31
                    base = turn_text(salt)
                    # weave in actual document words so payload size tracks sf
                    lo = (t * 29) % max(1, len(words))
                    extra = " ".join(words[lo : lo + 14])
                    if extra and salt % 20 < 12:  # plain payloads get a doc line
                        base = base + "\n" + extra + " appended from source text."
                    role = _ROLES[t % len(_ROLES)]
                    out["conv_id"].append(conv)
                    out["turn_idx"].append(t)
                    out["role"].append(role)
                    out["text"].append(base)
                    # md5 coin, not the linear salt: (doc*131 + t*31) % 4
                    # collapses to 4 transition patterns; the hash gives a
                    # full tool-transition matrix (and DuckDB reproduces it
                    # exactly — see q_tool_transitions' oracle)
                    out["tool"].append(
                        _TOOLS[_md5_mod(f"{int(doc_id)}:{t}", len(_TOOLS))]
                        if role == "tool"
                        else None
                    )
                    out["ts"].append(
                        _BASE_TS
                        + dt.timedelta(
                            hours=int(doc_id) % TS_HOUR_MOD, minutes=t
                        )
                    )
            res = pd.DataFrame(out)
            res["turn_idx"] = res["turn_idx"].astype("int32")
            yield res

    return docs.mapInPandas(gen, schema=schema)
