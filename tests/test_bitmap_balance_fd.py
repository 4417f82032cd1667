"""q_activity_bitmap + q_floor_balance + q_fd_audit: pure-Python
replays over the full sf0.001 tables plus engineered fixtures — the
bitmap's 64-day horizon edge (day 63 uses the sign bit; day ≥ 64
contributes nothing), the floor balance's reflection identity on a
hand sequence where the floor binds twice, and the FD audit's
majority tie-break."""

from __future__ import annotations

import pandas as pd
import pytest

from documentai_ocr_spark.queries.relational import (
    q_activity_bitmap,
    q_floor_balance,
)
from documentai_ocr_spark.queries.webtext import q_fd_audit

SF = "/root/testdata/sf0.001"

_DELTAS = {"view": 2, "purchase": -5, "signup": 1}


def _events_pdf(rows, tmp_path):
    """rows: (event_id, user_id, event_type, ms)."""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": pd.Series(
                [pd.Timestamp(r[3], unit="ms") for r in rows],
                dtype="datetime64[ms]",
            ),
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ----------------------------------------------------- floor balance


def _balance_python(ev: pd.DataFrame):
    out = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ms", "event_id"])
        bal = 0
        for _, r in g.iterrows():
            bal = max(0, bal + _DELTAS.get(r["event_type"], -1))
            out[int(r["event_id"])] = bal
    return out


def test_floor_balance_replay_sf0001(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_millis(cast(ts as timestamp)) as ms",
        )
        .toPandas()
    )
    want = _balance_python(ev)
    got = {
        int(r.event_id): int(r.balance)
        for r in q_floor_balance(spark, SF).collect()
    }
    assert got == want
    # the floor must actually bind somewhere, or the gate proves
    # nothing about the clamp
    ev2 = ev.assign(
        d=ev["event_type"].map(_DELTAS).fillna(-1).astype(int)
    )
    assert (ev2.groupby("user_id")["d"].cumsum() < 0).any()


def test_floor_balance_fixture(spark, tmp_path):
    """One user, deltas +2 −5 −1 +1 +2: recurrence 2,0,0,1,3 — the
    floor binds at steps 2 AND 3 (plain cumsum would read 2,−3,−4,
    −3,−1)."""
    rows = [
        (0, 1, "view", 0),
        (1, 1, "purchase", 10),
        (2, 1, "other", 20),
        (3, 1, "signup", 30),
        (4, 1, "view", 40),
    ]
    sf = _events_pdf(rows, tmp_path)
    got = {
        int(r.event_id): int(r.balance)
        for r in q_floor_balance(spark, sf).collect()
    }
    assert got == {0: 2, 1: 0, 2: 0, 3: 1, 4: 3}


# --------------------------------------------------- activity bitmap


def _bitmap_python(ev: pd.DataFrame):
    from collections import defaultdict

    masks = {}
    days = defaultdict(set)
    for _, r in ev.iterrows():
        days[r["user_id"]].add(int(r["ms"]) // 86400000)
    for u, ds in days.items():
        base = min(ds)
        m = 0
        for d in ds:
            if d - base < 64:
                m |= 1 << (d - base)
        masks[u] = m & (2**64 - 1)
    hist = defaultdict(lambda: [0, 0])
    for m in masks.values():
        h = hist[bin(m).count("1")]
        h[0] += 1
        h[1] += (m >> 7) & 1
    return sorted((k, v[0], v[1]) for k, v in hist.items())


def test_activity_bitmap_replay_sf0001(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id", "unix_millis(cast(ts as timestamp)) as ms"
        )
        .toPandas()
    )
    want = _bitmap_python(ev)
    got = sorted(
        (int(r.n_active_64), int(r.n_users), int(r.n_d7_active))
        for r in q_activity_bitmap(spark, SF).collect()
    )
    assert got == want


def test_activity_bitmap_horizon_edges(spark, tmp_path):
    """One user active on days 0, 7, 63 and 64: day 63 sets the SIGN
    bit, day 64 contributes nothing → 3 active days, d7 retained.
    A second user active only on day 0 → 1 active day, not d7."""
    day = 86400000
    rows = [
        (0, 1, "view", 0),
        (1, 1, "view", 7 * day),
        (2, 1, "view", 63 * day),
        (3, 1, "view", 64 * day),
        (4, 2, "view", 5 * day),
    ]
    sf = _events_pdf(rows, tmp_path)
    got = {
        int(r.n_active_64): (int(r.n_users), int(r.n_d7_active))
        for r in q_activity_bitmap(spark, sf).collect()
    }
    assert got == {3: (1, 1), 1: (1, 0)}


# --------------------------------------------------------- FD audit


def test_fd_audit_replay_sf0001(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "lang")
        .toPandas()
    )
    want = {}
    for src, g in docs.groupby("source"):
        counts = g.groupby("lang").size().sort_index()
        top_n = int(counts.max())
        top_lang = min(l for l, n in counts.items() if n == top_n)
        want[src] = (
            len(g),
            g["lang"].nunique(),
            top_lang,
            top_n,
            1000 * top_n // len(g),
        )
    got = {
        r.source: (
            int(r.n_docs),
            int(r.n_langs),
            r.top_lang,
            int(r.top_n),
            int(r.fd_milli),
        )
        for r in q_fd_audit(spark, SF).collect()
    }
    assert got == want


def test_fd_audit_tiebreak_and_exact_fd(spark, tmp_path):
    """Source A: 2×en / 2×de → tie broken to 'de' (lexicographic);
    source B monolingual → fd_milli exactly 1000."""
    rows = [("A", "en")] * 2 + [("A", "de")] * 2 + [("B", "fr")] * 3
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x"] * len(rows),
            "lang": [l for _, l in rows],
            "source": [s for s, _ in rows],
            "n_chars": [1] * len(rows),
        }
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: (r.n_langs, r.top_lang, r.fd_milli)
        for r in q_fd_audit(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (2, "de", 500), "B": (1, "fr", 1000)}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# ----------------------------------------------------- split scan


def test_split_scan_replay_sf0001(spark):
    """Exact stump-scan table vs a pure-pandas replay, plus the
    invariants every row must satisfy: n_left + n_right == N, and at
    the max threshold the right side is empty with sumsq_left ==
    sum of squared class totals."""
    from documentai_ocr_spark.queries.textstats import q_split_scan

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("n_chars", "lang")
        .toPandas()
    )
    want = {}
    thresholds = sorted(docs["n_chars"].unique())
    class_tot = docs.groupby("lang").size()
    for t in thresholds:
        left = docs[docs["n_chars"] <= t].groupby("lang").size()
        right = class_tot.sub(left, fill_value=0)
        want[int(t)] = (
            int(left.sum()),
            int(right.sum()),
            int((left**2).sum()),
            int((right**2).sum()),
        )
    got = {
        int(r.threshold): (
            int(r.n_left),
            int(r.n_right),
            int(r.sumsq_left),
            int(r.sumsq_right),
        )
        for r in q_split_scan(spark, SF).collect()
    }
    assert got == want
    n = len(docs)
    for t, (nl, nr, sl, sr) in got.items():
        assert nl + nr == n
    tmax = max(got)
    assert got[tmax][1] == 0
    assert got[tmax][2] == int((class_tot**2).sum())


# ---------------------------------------------- rolling distinct 90


def test_rolling_distinct_90_replay_sf0001(spark):
    """Difference-array rolling distinct vs a brute-force python
    replay over the full sf0.001 events, plus the structural
    invariants: monotone ≤ total users, and a window fully inside a
    gap longer than 90 days would read 0 (vacuous on this data; the
    fixture below forces it)."""
    from documentai_ocr_spark.queries.relational import (
        q_rolling_distinct_90,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id", "unix_millis(cast(ts as timestamp)) as ms"
        )
        .toPandas()
    )
    ev["day"] = ev["ms"] // 86400000
    ud = ev[["user_id", "day"]].drop_duplicates()
    lo, hi = int(ud["day"].min()), int(ud["day"].max())
    want = {}
    for d in range(lo, hi + 1):
        w = ud[(ud["day"] >= d - 89) & (ud["day"] <= d)]
        want[d] = w["user_id"].nunique()
    got = {
        int(r.day): int(r.n_active_90)
        for r in q_rolling_distinct_90(spark, SF).collect()
    }
    assert got == want
    assert max(got.values()) <= ud["user_id"].nunique()


def test_rolling_distinct_90_gap_fixture(spark, tmp_path):
    """Two users active on day 0; one returns on day 200. The count
    must fall to 0 for days 90..199 (the >90-day silence), then read
    1 — the interval-endpoint algebra's decay edge, which the
    fan-out method gets for free but a buggy difference array (e.g.
    a missing −1 endpoint) would corrupt forever after."""
    rows = [
        (0, 1, "view", 0),
        (1, 2, "view", 3600_000),             # same day 0
        (2, 1, "view", 200 * 86400000),       # day 200
    ]
    sf = _events_pdf(rows, tmp_path)
    from documentai_ocr_spark.queries.relational import (
        q_rolling_distinct_90,
    )

    got = {
        int(r.day): int(r.n_active_90)
        for r in q_rolling_distinct_90(spark, sf).collect()
    }
    assert got[0] == 2
    assert got[89] == 2
    assert got[90] == 0
    assert got[199] == 0
    assert got[200] == 1
    assert len(got) == 201


# -------------------------------------------------- rate window (1h)


def test_rate_window_range_vs_rows_fixture(spark, tmp_path):
    """Events at minutes 0, 30, 59.999, 90, 200: the trailing-hour
    RANGE frame reads 1,2,3,2,1 — at minute 90 the minute-30 event
    sits exactly 3,600,000 ms back, ONE millisecond outside the
    3,599,999-PRECEDING frame (the inclusive-bound edge), and a
    ROWS frame would instead count a fixed number of events
    regardless of age (reading 3 at minute 200). Also pins peer
    inclusion: two events in the SAME millisecond must see each
    other."""
    from documentai_ocr_spark.queries.relational import q_rate_window

    m = 60_000
    rows = [
        (0, 1, "view", 0),
        (1, 1, "view", 30 * m),
        (2, 1, "view", 60 * m - 1),
        (3, 1, "view", 90 * m),
        (4, 1, "view", 200 * m),
        # user 2: same-ms peers
        (5, 2, "view", 1000),
        (6, 2, "view", 1000),
    ]
    sf = _events_pdf(rows, tmp_path)
    got = {
        int(r.event_id): int(r.n_1h)
        for r in q_rate_window(spark, sf).collect()
    }
    assert got[0] == 1
    assert got[1] == 2
    assert got[2] == 3          # 0, 30m, 59.999m all inside the hour
    assert got[3] == 2          # minute-30 is 1 ms outside the frame
    assert got[4] == 1          # everything aged out
    assert got[5] == 2 and got[6] == 2  # same-ms peers see each other
