"""Adversarial extraction fuzz (round-4 verdict item 5): hostile
payloads — malformed/deeply-nested HTML, zero-width and bidi control
characters, mixed-script runs, megabyte single-line turns — must never
raise, and the batch kernel must equal the pure-Python per-turn oracle
byte-for-byte (text AND spans) on every one of them.

Reference anchor: the per-unit decode contract of
/root/reference/mocov1/app.py:88-111 (every uploaded unit is decoded
independently; one malformed unit must not poison the batch).

The generator is seeded (no hypothesis shrink-time budget): ≥1000
deterministic adversarial cases run kernel-direct (no Spark), plus a
Spark mapInPandas end-to-end pass over a stratified sample so the
Arrow boundary (string truncation, null handling, batch splits) is
exercised on the same hostiles.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from documentai_ocr_spark.extract.core import extract_batch
from documentai_ocr_spark.oracle import extract_turn

# ---------------------------------------------------------- builders

ZERO_WIDTH = ["​", "‌", "‍", "﻿", "⁠"]
BIDI = ["‪", "‫", "‭", "‮", "‬", "⁦", "⁩"]
SCRIPTS = [
    "abcdefg hij",
    "一二三四五文档引擎",
    "αβγδ εζη",
    "абвгд еж",
    "אבגד הו",          # RTL
    "مرحبا بالعالم",     # RTL joined
    "🎉🚀💡",            # astral plane
    "ﬁﬂﬀ",              # ligatures
]
TAGS = ["p", "div", "li", "nav", "a", "script", "style", "td", "span", "h1"]


def _mixed_word(rng: random.Random) -> str:
    parts = [rng.choice(SCRIPTS) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.4:
        parts.insert(1, rng.choice(ZERO_WIDTH + BIDI))
    return "".join(parts)


def _malformed_html(rng: random.Random) -> str:
    """Unclosed / misnested / deeply nested tag soup."""
    out = []
    depth = 0
    for _ in range(rng.randint(1, 25)):
        r = rng.random()
        if r < 0.35:
            t = rng.choice(TAGS)
            out.append(f"<{t}>")
            depth += 1
        elif r < 0.55 and depth:
            t = rng.choice(TAGS)  # WRONG tag on purpose (misnesting)
            out.append(f"</{t}>")
            depth -= 1
        elif r < 0.65:
            out.append(rng.choice([
                "<", "</", "<>", "< p >", "<p", "<!---->", "<!--",
                "<![CDATA[", "&amp;", "&nosuch;", "&#x41;", "&#",
            ]))
        else:
            out.append(_mixed_word(rng))
    # ~half the cases leave tags unclosed
    if rng.random() < 0.5:
        out.extend(f"</{rng.choice(TAGS)}>" for _ in range(depth))
    return "".join(out)


def _nested_html(rng: random.Random) -> str:
    """Pathological nesting depth (stack-recursion hostile)."""
    depth = rng.randint(30, 120)
    t = rng.choice(TAGS)
    return ("<%s>" % t) * depth + _mixed_word(rng) + ("</%s>" % t) * depth


def _corrupt_pdfish(rng: random.Random) -> str:
    """Box-JSON lines with corruption injected mid-stream."""
    lines = []
    for i in range(rng.randint(1, 12)):
        if rng.random() < 0.3:
            lines.append(rng.choice([
                '{"c":"a","x":}', '{"c":', "not json at all", "{}",
                '{"c":"a"}', '{"x":1,"y":2}',
                '{"c":"a","x":1e309,"y":0,"w":8,"h":10,"page":0}',
                '{"c":null,"x":1,"y":1,"w":8,"h":10,"page":0}',
                '{"c":"a","x":Infinity,"y":-Infinity,"w":8,"h":10,"page":0}',
                '{"c":"a","x":NaN,"y":NaN,"w":NaN,"h":NaN,"page":NaN}',
                '{"c":"a","x":5,"y":1e309,"w":-1e309,"h":10,"page":0}',
            ]))
        else:
            lines.append(
                '{"c":"%s","x":%d,"y":%d,"w":8,"h":10,"page":%d}'
                % (rng.choice("ab文"), rng.randint(0, 300),
                   rng.randint(0, 50), rng.randint(0, 2))
            )
    return "\n".join(lines)


def _control_soup(rng: random.Random) -> str:
    """Plain text laced with C0/C1 controls, zero-width, bidi."""
    chars = []
    for _ in range(rng.randint(5, 400)):
        r = rng.random()
        if r < 0.1:
            chars.append(chr(rng.randint(0, 8)))
        elif r < 0.2:
            chars.append(rng.choice(ZERO_WIDTH))
        elif r < 0.3:
            chars.append(rng.choice(BIDI))
        elif r < 0.4:
            chars.append(rng.choice("\n\r\t\x0b\x0c  　"))
        else:
            chars.append(rng.choice(rng.choice(SCRIPTS)))
    return "".join(chars)


def _long_single_line(rng: random.Random) -> str:
    """One line, tens-of-KB..1MB, no newline until (maybe) the end."""
    unit = _mixed_word(rng) + " "
    reps = rng.choice([2_000, 20_000, 60_000])
    return (unit * reps)[: rng.choice([65_536, 262_144, 1_048_576])]


BUILDERS = [
    _malformed_html,
    _nested_html,
    _corrupt_pdfish,
    _control_soup,
    _mixed_word,
]


def _norm(spans):
    return [
        (s["beg"], s["end"], s["kind"], round(float(s["score"]), 6))
        for s in spans
    ]


def _assert_batch_equals_oracle(payloads):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * len(payloads),
            "turn_idx": np.arange(len(payloads)),
            "role": ["u"] * len(payloads),
            "text": payloads,
        }
    )
    out = extract_batch(pdf)
    for i, text in enumerate(payloads):
        want = extract_turn(text)
        assert out["payload_kind"].iloc[i] == want["payload_kind"], repr(
            text[:120]
        )
        assert out["text"].iloc[i] == want["text"], repr(text[:120])
        assert _norm(out["spans"].iloc[i]) == _norm(want["spans"]), repr(
            text[:120]
        )


# ------------------------------------------------------------- tests


def test_adversarial_1k_kernel_equals_oracle():
    """≥1000 deterministic hostile payloads, kernel == oracle on all."""
    rng = random.Random(0x5EED)
    n_total = 0
    batch: list[str] = []
    for i in range(1040):
        builder = BUILDERS[i % len(BUILDERS)]
        batch.append(builder(rng))
        if len(batch) == 64:
            _assert_batch_equals_oracle(batch)
            n_total += len(batch)
            batch = []
    if batch:
        _assert_batch_equals_oracle(batch)
        n_total += len(batch)
    assert n_total >= 1000


def test_megabyte_single_line_turns():
    """1 MB single-line turns (every payload family) neither raise nor
    diverge from the oracle; includes a 1 MB unclosed-tag HTML line
    and a 1 MB corrupt-tail pdfish blob."""
    rng = random.Random(1234)
    mb = 1_048_576
    payloads = [
        ("A" * mb),                                    # pure run
        (_mixed_word(rng) * 40_000)[:mb],              # mixed-script
        ("<div>" + "word " * 250_000)[:mb],            # unclosed HTML
        ('{"c":"a","x":1,"y":1,"w":8,"h":10,"page":0}\n' * 25_000
         + '{"c":truncat')[:mb],                       # pdfish corrupt tail
        ("​‮" + "ab " * 400_000)[:mb],       # bidi-prefixed
    ]
    _assert_batch_equals_oracle(payloads)


def test_nonfinite_coordinate_boxes():
    """Round-5 verdict item 7: hostile non-finite coordinates (json's
    Infinity/NaN literals, 1e309 overflow) must produce zero numpy
    RuntimeWarnings in the kernel (run the suite under
    ``-W error::RuntimeWarning``) and stay kernel==oracle — the shared
    pdfish_coord rule defaults them to 0.0 at parse time on BOTH
    sides, so NaN never reaches the geometry arithmetic where numpy
    and pure-Python comparison semantics could diverge."""
    all_nan = "\n".join(
        '{"c":"%s","x":NaN,"y":NaN,"w":NaN,"h":NaN,"page":NaN}' % ch
        for ch in "abc文档x"
    )
    payloads = [
        all_nan,
        # inf x after a finite box: gap arithmetic site
        '{"c":"a","x":1,"y":1,"w":8,"h":10,"page":0}\n'
        '{"c":"b","x":Infinity,"y":1,"w":8,"h":10,"page":0}\n'
        '{"c":"c","x":30,"y":1,"w":8,"h":10,"page":0}',
        # inf y adjacent to inf y: the inf-inf line-grouping site
        '{"c":"a","x":1,"y":1e309,"w":8,"h":10,"page":0}\n'
        '{"c":"b","x":9,"y":1e309,"w":8,"h":10,"page":0}',
        # mixed: -inf w (prev_x + prev_w site), NaN h (y-tol site)
        '{"c":"a","x":1,"y":1,"w":-1e309,"h":10,"page":0}\n'
        '{"c":"b","x":9,"y":1,"w":8,"h":NaN,"page":0}\n'
        '{"c":"c","x":17,"y":1,"w":8,"h":10,"page":Infinity}',
    ]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        _assert_batch_equals_oracle(payloads)


def test_null_and_empty_rows_interleaved():
    """None / empty / whitespace-only rows inside a hostile batch must
    keep row alignment (one output row per input row, same order)."""
    rng = random.Random(77)
    payloads = [
        "", None, " ", "\n\n\n", _malformed_html(rng), None,
        _corrupt_pdfish(rng), "​", _control_soup(rng), "",
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * len(payloads),
            "turn_idx": np.arange(len(payloads)),
            "role": ["u"] * len(payloads),
            "text": payloads,
        }
    )
    out = extract_batch(pdf)
    assert list(out["turn_idx"]) == list(range(len(payloads)))
    for i, text in enumerate(payloads):
        want = extract_turn(text)
        assert out["text"].iloc[i] == want["text"]
        assert _norm(out["spans"].iloc[i]) == _norm(want["spans"])


def test_spark_e2e_on_hostile_sample(spark):
    """A stratified hostile sample through the REAL mapInPandas path —
    the Arrow boundary (utf-8 round-trip, nulls, batch splits) must
    preserve kernel==oracle equality."""
    from documentai_ocr_spark.extract import extract_turns

    rng = random.Random(0xA11CE)
    payloads = []
    for builder in BUILDERS:
        payloads.extend(builder(rng) for _ in range(8))
    payloads.append(("B" * 1_048_576))
    payloads.append("<p>" * 80 + "x" + "</p>" * 80)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 4}" for i in range(len(payloads))],
            "turn_idx": list(range(len(payloads))),
            "role": ["user"] * len(payloads),
            "text": payloads,
            "tool": [None] * len(payloads),
            "ts": [pd.Timestamp("2026-01-01")] * len(payloads),
        }
    )
    out = extract_turns(spark.createDataFrame(pdf)).collect()
    assert len(out) == len(payloads)
    for r in out:
        want = extract_turn(payloads[r["turn_idx"]])
        assert r["text"] == want["text"], r["turn_idx"]
        got = [(s["beg"], s["end"], s["kind"], round(float(s["score"]), 6))
               for s in r["spans"]]
        assert got == _norm(want["spans"]), r["turn_idx"]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
