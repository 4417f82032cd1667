"""Event-stream analytics: tz-free hour histogram and per-user
activity-span rate — both recounted in pure Python from the physical
epoch milliseconds the parquet file stores."""

import pandas as pd

from documentai_ocr_spark.queries.relational import (
    q_activity_span,
    q_hour_mix,
)

SF = "/root/testdata/sf0.001"


def _epoch_ms(series):
    # datetime64[us] → physical epoch milliseconds (the int64 the
    # parquet stores, divided down) — no timezone interpretation.
    return series.astype("int64") // 1000


def test_hour_mix_python_recount(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ms = _epoch_ms(ev["ts"])
    want: dict[tuple, list] = {}
    for m, et, uid in zip(ms, ev["event_type"], ev["user_id"]):
        k = (int((m // 3600000) % 24), et)
        a = want.setdefault(k, [0, set()])
        a[0] += 1
        a[1].add(uid)
    got = {
        (r["hour_utc"], r["event_type"]): (r["n_events"], r["n_users"])
        for r in q_hour_mix(spark, SF).collect()
    }
    assert got == {k: (a[0], len(a[1])) for k, a in want.items()}
    # every hour of the synthetic day is populated
    assert {h for h, _ in got} == set(range(24))


def test_activity_span_python_recount(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ms = _epoch_ms(ev["ts"])
    per: dict[int, list] = {}
    for m, uid in zip(ms, ev["user_id"]):
        a = per.setdefault(uid, [0, m, m])
        a[0] += 1
        a[1] = min(a[1], m)
        a[2] = max(a[2], m)
    got = {r["user_id"]: r for r in q_activity_span(spark, SF).collect()}
    assert set(got) == set(per)
    for uid, (n, lo, hi) in per.items():
        g = got[uid]
        span = hi - lo
        rate = 0 if span == 0 else n * 86400000 * 1000 // span
        assert (g["n_events"], g["span_ms"], g["rate_per_day_milli"]) == (
            n,
            int(span),
            rate,
        ), uid


def test_event_overlap_python_recount(spark):
    """Whole-corpus set-algebra replay of q_event_overlap on sf0.001:
    exact user-set Jaccard per co-observed type pair, canonical pair
    orientation, and the subset bound n_both <= min(n_a, n_b)."""
    import pandas as pd

    from documentai_ocr_spark.queries.relational import q_event_overlap

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    users = {}
    for t, u in zip(ev["event_type"], ev["user_id"]):
        users.setdefault(t, set()).add(u)
    types = sorted(users)
    want = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = len(users[ta] & users[tb])
            if both == 0:
                continue
            union = len(users[ta] | users[tb])
            want[(ta, tb)] = (
                both,
                len(users[ta]),
                len(users[tb]),
                1000 * both // union,
            )

    rows = q_event_overlap(spark, "/root/testdata/sf0.001").collect()
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_both"],
            r["n_a"],
            r["n_b"],
            r["jaccard_milli"],
        )
        for r in rows
    }
    assert got == want
    for (ta, tb), (both, na, nb, _) in got.items():
        assert ta < tb
        assert both <= min(na, nb)


def test_gini_activity_python_recount_and_bounds(spark):
    """Whole-corpus replay of the exact rank-formula Gini on sf0.001
    plus the degenerate bound: an engineered uniform corpus reads
    exactly 0, a one-whale corpus reads near 1000."""
    from documentai_ocr_spark.queries.relational import q_gini_activity

    ev = pd.read_parquet(f"{SF}/events.parquet")
    cnt = {}
    for t, u in zip(ev["event_type"], ev["user_id"]):
        cnt[(t, u)] = cnt.get((t, u), 0) + 1
    per_type = {}
    for (t, u), x in cnt.items():
        per_type.setdefault(t, []).append((x, u))
    want = {}
    for t, xs in per_type.items():
        xs.sort()
        n = len(xs)
        tot = sum(x for x, _ in xs)
        srx = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        want[t] = (n, tot, (1000 * (2 * srx - (n + 1) * tot)) // (n * tot))

    got = {
        r["event_type"]: (r["n_users"], r["n_events"], r["gini_milli"])
        for r in q_gini_activity(spark, SF).collect()
    }
    assert got == want
    for _, _, g in got.values():
        assert 0 <= g < 1000


def test_gini_activity_degenerate_corpora(spark, tmp_path):
    """Uniform usage pins gini_milli == 0 exactly; a single whale among
    minimal users drives it high — through the real two-phase path."""
    import datetime as dt

    from documentai_ocr_spark.queries.relational import q_gini_activity

    rows = []
    ts = dt.datetime(2024, 1, 1)
    eid = 0
    for u in range(10):  # uniform: 10 users x 3 events
        for _ in range(3):
            rows.append((eid, ts, u, "uni", 0.0, "{}")); eid += 1
    for u in range(9):   # whale type: 9 users x 1 + 1 user x 91
        rows.append((eid, ts, 100 + u, "whale", 0.0, "{}")); eid += 1
    for _ in range(91):
        rows.append((eid, ts, 999, "whale", 0.0, "{}")); eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = str(tmp_path / "gini")
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    got = {r["event_type"]: r for r in q_gini_activity(spark, d).collect()}
    assert got["uni"]["gini_milli"] == 0
    # whale: n=10, tot=100, sorted x = [1]*9 + [91]
    srx = sum((i + 1) * 1 for i in range(9)) + 10 * 91
    expect = (1000 * (2 * srx - 11 * 100)) // (10 * 100)
    assert got["whale"]["gini_milli"] == expect and expect > 700
