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


def test_dau_wau_recount_and_pins(spark, tmp_path):
    """Whole-corpus replay at sf0.001 from the physical epoch ms, plus
    engineered pins: an every-day user scores stickiness 1000; a
    once-a-week user pulls the shared window's ratio down to the exact
    closed form."""
    from documentai_ocr_spark.queries.relational import q_dau_wau

    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = _epoch_ms(ev["ts"]) // 86400000
    pairs = set(zip(day, ev["user_id"]))
    dau: dict = {}
    for d, u in pairs:
        dau.setdefault(d, set()).add(u)
    wau: dict = {}
    for d, u in pairs:
        for t in range(d, d + 7):
            wau.setdefault(t, set()).add(u)
    got = {r["day"]: r for r in q_dau_wau(spark, SF).collect()}
    assert set(got) == set(dau)
    for d in dau:
        r = got[d]
        assert (r["dau"], r["wau"]) == (len(dau[d]), len(wau[d]))
        assert r["stickiness_milli"] == 1000 * len(dau[d]) // len(wau[d])

    # engineered: user 1 fires daily for 14 days; user 2 only on day 7
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for d in range(14):
        rows.append(
            (eid, base + datetime.timedelta(days=d), 1, "click", 0.0, "{}")
        )
        eid += 1
    rows.append(
        (eid, base + datetime.timedelta(days=7), 2, "click", 0.0, "{}")
    )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    dd = str(tmp_path / "dau")
    spark.createDataFrame(pdf).write.parquet(f"{dd}/events.parquet")
    g2 = {r["day"]: r for r in q_dau_wau(spark, dd).collect()}
    days = sorted(g2)
    # day 0..6: only user 1 in the window → stickiness 1000
    assert g2[days[0]]["stickiness_milli"] == 1000
    # days 7..13: user 2 is in the trailing week → dau 1, wau 2 → 500
    assert g2[days[7]]["dau"] == 2  # both fired on day 7 itself
    assert g2[days[8]]["dau"] == 1 and g2[days[8]]["wau"] == 2
    assert g2[days[8]]["stickiness_milli"] == 500


def test_rfm_segments_recount(spark):
    """Whole-corpus python replay at sf0.001: metrics from the parquet's
    physical values, quintiles from the exact rank formula with the
    (metric, custkey) tiebreak."""
    from documentai_ocr_spark.queries.relational import q_rfm_segments

    o = pd.read_parquet(f"{SF}/orders.parquet")
    ms = _epoch_ms(o["o_orderdate"])
    mx = int(ms.max())
    agg: dict = {}
    for ck, m, tp in zip(o["o_custkey"], ms, o["o_totalprice"]):
        a = agg.setdefault(int(ck), {"last": -1, "n": 0, "cents": 0})
        a["last"] = max(a["last"], int(m))
        a["n"] += 1
        import math as _math

        a["cents"] += int(_math.floor(tp * 100))
    met = {
        ck: (
            (mx - a["last"]) // 86400000,
            a["n"],
            a["cents"],
        )
        for ck, a in agg.items()
    }
    n = len(met)

    def quint(ranks):
        return {
            ck: min(5, 1 + (5 * (r - 1)) // n) for ck, r in ranks.items()
        }

    rr = {
        ck: i + 1
        for i, (ck, _) in enumerate(
            sorted(met.items(), key=lambda kv: (-kv[1][0], kv[0]))
        )
    }
    rf = {
        ck: i + 1
        for i, (ck, _) in enumerate(
            sorted(met.items(), key=lambda kv: (kv[1][1], kv[0]))
        )
    }
    rm = {
        ck: i + 1
        for i, (ck, _) in enumerate(
            sorted(met.items(), key=lambda kv: (kv[1][2], kv[0]))
        )
    }
    qr, qf, qm = quint(rr), quint(rf), quint(rm)
    got = {r["o_custkey"]: r for r in q_rfm_segments(spark, SF).collect()}
    assert set(got) == set(met)
    for ck, (days, freq, cents) in met.items():
        r = got[ck]
        assert (
            r["recency_days"],
            r["frequency"],
            r["monetary_cents"],
            r["r_q"],
            r["f_q"],
            r["m_q"],
        ) == (days, freq, cents, qr[ck], qf[ck], qm[ck]), ck


def test_basket_pairs_recount_and_lift_pin(spark, tmp_path):
    """sf0.001 replay from scratch (distinct per-order part sets, pair
    counts, lift formula), plus an engineered pin: two parts that
    always co-occur in every basket have lift exactly n_orders / (n_a ·
    n_b) · n_ab = n (perfect attraction); a never-co-occurring pair
    emits no row."""
    from documentai_ocr_spark.queries.relational import (
        _BASKET_MIN,
        q_basket_pairs,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    baskets: dict = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(ok), set()).add(int(pk))
    n_orders = len(baskets)
    from collections import Counter

    marg: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        marg.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    want = {
        k: v for k, v in pair.items() if v >= _BASKET_MIN
    }
    got = {
        (r["part_a"], r["part_b"]): r
        for r in q_basket_pairs(spark, SF).collect()
    }
    assert set(got) == set(want)
    for (a, b), n_ab in want.items():
        r = got[(a, b)]
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (n_ab, marg[a], marg[b])
        assert abs(
            r["lift"] - round(n_ab * n_orders / (marg[a] * marg[b]), 6)
        ) < 1e-9

    # engineered: parts 1+2 always together (4 baskets), part 3 alone
    rows = []
    ln = 0
    for ok in range(4):
        for pk in (1, 2):
            rows.append((ok, pk, ln := ln + 1))
    rows.append((9, 3, ln := ln + 1))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_linenumber"])
    d = str(tmp_path / "basket")
    spark.createDataFrame(pdf).write.parquet(f"{d}/lineitem.parquet")
    g2 = {
        (r["part_a"], r["part_b"]): r
        for r in q_basket_pairs(spark, d).collect()
    }
    assert set(g2) == {(1, 2)}
    r = g2[(1, 2)]
    # lift = n_ab·n_orders/(n_a·n_b) = 4·5/(4·4) = 1.25
    assert r["n_ab"] == 4 and r["lift"] == 1.25


def test_top_supplier_recount_and_tie_pin(spark, tmp_path):
    """sf0.001 replay (rounded per-supplier revenue, max, tie set) plus
    an engineered fixture where TWO suppliers achieve the identical
    rounded maximum — both rows must come back (a LIMIT-1 formulation
    would drop one)."""
    from documentai_ocr_spark.queries.relational import q_top_supplier

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    rev: dict[int, float] = {}
    for sk, ep, dc in zip(
        li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        rev[int(sk)] = rev.get(int(sk), 0.0) + float(ep) * (1.0 - float(dc))
    rounded = {k: round(v, 2) for k, v in rev.items()}
    m = max(rounded.values())
    want = {k for k, v in rounded.items() if v == m}
    got = {r["s_suppkey"]: r for r in q_top_supplier(spark, SF).collect()}
    assert set(got) == want
    for k in want:
        assert abs(got[k]["revenue"] - m) < 1e-9

    # engineered tie: suppliers 1 and 2 each bill exactly 100.00;
    # supplier 3 bills 50.00 — exactly {1, 2} must be returned.
    li2 = pd.DataFrame(
        [
            (1, 100.0, 0.0),
            (2, 200.0, 0.5),
            (3, 50.0, 0.0),
        ],
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    sup = pd.DataFrame(
        [(1, "a"), (2, "b"), (3, "c")], columns=["s_suppkey", "s_name"]
    )
    d = str(tmp_path / "ties")
    spark.createDataFrame(li2).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(sup).write.parquet(f"{d}/supplier.parquet")
    g2 = {r["s_suppkey"]: r["revenue"] for r in q_top_supplier(spark, d).collect()}
    assert g2 == {1: 100.0, 2: 100.0}
