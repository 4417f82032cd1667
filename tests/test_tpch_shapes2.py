"""TPC-H-shaped anchors, second wave: local-supplier volume (Q5),
no-join forecast revenue (Q6), two-nation trade (Q7), market share
(Q8), part profit (Q9), returned-item top-K (Q10), small-quantity
revenue with the exact 20%-of-average threshold (Q17), and the
OR-of-ANDs banded revenue (Q19). Every exact-integer column is
replayed in pure Python over the full sf0.001 tables; every rounded
double is bracket-checked against the unrounded Python sum; and each
query pins an engineered boundary row (date/quantity/threshold edges,
ties, excluded arms) that the strict comparisons must not straddle."""

import math
from collections import Counter, defaultdict

import pandas as pd

from documentai_ocr_spark.queries.relational import (
    q_band_revenue,
    q_forecast_revenue,
    q_local_supplier_volume,
    q_market_share,
    q_part_profit,
    q_returned_customers,
    q_small_qty_revenue,
    q_two_nation_volume,
)

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return math.floor(x * 100)


def _e4(price: float, disc: float) -> int:
    return _cents(price) * (100 - _cents(disc))


def test_forecast_revenue_replay_and_boundaries(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    keep = li[
        (li["l_shipdate"] >= lo)
        & (li["l_shipdate"] < hi)
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    want_e4 = sum(
        _cents(p) * _cents(d)
        for p, d in zip(keep["l_extendedprice"], keep["l_discount"])
    )
    r = q_forecast_revenue(spark, SF).collect()[0]
    assert (r["revenue_e4"], r["n_lines"]) == (want_e4, len(keep))
    assert len(keep) > 0

    # engineered: qty 24 out (strict <), 23 in; shipdate 1998-01-01
    # out (strict <), 1997-01-01 in; discount 0.04/0.08 out.
    rows = [
        # (shipdate, qty, price, disc, kept?)
        ("1997-06-01", 23.0, 100.00, 0.05, True),
        ("1997-06-01", 24.0, 100.00, 0.05, False),
        ("1998-01-01", 10.0, 100.00, 0.06, False),
        ("1997-01-01", 10.0, 200.00, 0.07, True),
        ("1997-06-01", 10.0, 100.00, 0.04, False),
        ("1997-06-01", 10.0, 100.00, 0.08, False),
    ]
    pdf = pd.DataFrame(
        [
            (i + 1, pd.Timestamp(sd), q, p, d)
            for i, (sd, q, p, d, _) in enumerate(rows)
        ],
        columns=[
            "l_orderkey", "l_shipdate", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )
    d = str(tmp_path / "fcr")
    spark.createDataFrame(pdf).write.parquet(f"{d}/lineitem.parquet")
    g = q_forecast_revenue(spark, d).collect()[0]
    want = sum(
        _cents(p) * _cents(dc) for _, _, p, dc, k in rows if k
    )
    assert (g["revenue_e4"], g["n_lines"]) == (want, 2)


def test_local_supplier_volume_replay_and_fixture(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    eur = set(n[n["n_regionkey"] == 3]["n_nationkey"].astype(int))
    nname = dict(zip(n["n_nationkey"].astype(int), n["n_name"]))
    cnat = dict(zip(c["c_custkey"].astype(int), c["c_nationkey"].astype(int)))
    snat = dict(zip(s["s_suppkey"].astype(int), s["s_nationkey"].astype(int)))
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    ow = o[(o["o_orderdate"] >= lo) & (o["o_orderdate"] < hi)]
    onat = {
        int(k): cnat[int(ck)]
        for k, ck in zip(ow["o_orderkey"], ow["o_custkey"])
        if cnat[int(ck)] in eur
    }
    cnt: Counter = Counter()
    rev: defaultdict = defaultdict(float)
    for ok, sk, p, dc in zip(
        li["l_orderkey"], li["l_suppkey"],
        li["l_extendedprice"], li["l_discount"],
    ):
        sn = snat[int(sk)]
        if sn in eur and onat.get(int(ok)) == sn:
            cnt[nname[sn]] += 1
            rev[nname[sn]] += p * (1 - dc)
    got = {
        r["n_name"]: (r["n_lines"], r["revenue"])
        for r in q_local_supplier_volume(spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(cnt) and cnt
    for k, (_, rv) in got.items():
        assert abs(rv - rev[k]) < 0.01

    # engineered: same-nation line kept; cross-nation (both in the
    # region) dropped; out-of-region nation dropped; order outside
    # the window dropped.
    nat = pd.DataFrame(
        [(3, "N3", 3), (8, "N8", 3), (4, "N4", 4)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    sup = pd.DataFrame(
        [(1, 3), (2, 8), (3, 4)], columns=["s_suppkey", "s_nationkey"]
    )
    cust = pd.DataFrame(
        [(1, 3), (2, 8), (3, 4)], columns=["c_custkey", "c_nationkey"]
    )
    orders = pd.DataFrame(
        [
            (10, 1, pd.Timestamp("1996-05-01")),  # nation 3, in window
            (11, 2, pd.Timestamp("1996-05-01")),  # nation 8, in window
            (12, 1, pd.Timestamp("1997-05-01")),  # out of window
            (13, 3, pd.Timestamp("1996-05-01")),  # out-of-region cust
        ],
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lit = pd.DataFrame(
        [
            (10, 1, 100.0, 0.0),  # supp N3 == cust N3 -> kept
            (10, 2, 100.0, 0.0),  # supp N8 != cust N3 -> dropped
            (11, 2, 50.0, 0.0),   # supp N8 == cust N8 -> kept
            (12, 1, 70.0, 0.0),   # out-of-window order -> dropped
            (13, 3, 70.0, 0.0),   # out-of-region -> dropped
        ],
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    d = str(tmp_path / "lsv")
    for name, pdf in (
        ("nation", nat), ("supplier", sup), ("customer", cust),
        ("orders", orders), ("lineitem", lit),
    ):
        spark.createDataFrame(pdf).write.parquet(f"{d}/{name}.parquet")
    g = {
        r["n_name"]: (r["n_lines"], r["revenue"])
        for r in q_local_supplier_volume(spark, d).collect()
    }
    assert g == {"N3": (1, 100.0), "N8": (1, 50.0)}


def test_two_nation_volume_replay_and_fixture(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    nname = dict(zip(n["n_nationkey"].astype(int), n["n_name"]))
    cnat = dict(zip(c["c_custkey"].astype(int), c["c_nationkey"].astype(int)))
    snat = dict(zip(s["s_suppkey"].astype(int), s["s_nationkey"].astype(int)))
    ocust = dict(zip(o["o_orderkey"].astype(int), o["o_custkey"].astype(int)))
    cnt: Counter = Counter()
    for ok, sk, sd in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_shipdate"]
    ):
        sn, cn = snat[int(sk)], cnat[ocust[int(ok)]]
        if sn in (3, 8) and cn in (3, 8) and sn != cn:
            cnt[(nname[sn], nname[cn], sd.year)] += 1
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["n_lines"]
        for r in q_two_nation_volume(spark, SF).collect()
    }
    assert got == dict(cnt) and cnt

    # engineered: same-nation pair excluded; both directions are
    # separate rows; year comes from the SHIP date, not the order.
    nat = pd.DataFrame(
        [(3, "N3", 3), (8, "N8", 3)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    sup = pd.DataFrame([(1, 3), (2, 8)], columns=["s_suppkey", "s_nationkey"])
    cust = pd.DataFrame([(1, 3), (2, 8)], columns=["c_custkey", "c_nationkey"])
    orders = pd.DataFrame(
        [(10, 1, pd.Timestamp("1999-12-30")), (11, 2, pd.Timestamp("1999-12-30"))],
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lit = pd.DataFrame(
        [
            # supp N8 -> cust N3, shipped in 2000 (order was 1999)
            (10, 2, pd.Timestamp("2000-01-02"), 40.0, 0.0),
            # supp N3 -> cust N8
            (11, 1, pd.Timestamp("2000-01-02"), 60.0, 0.0),
            # supp N3 -> cust N3: same nation, excluded
            (10, 1, pd.Timestamp("2000-01-02"), 99.0, 0.0),
        ],
        columns=[
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        ],
    )
    d = str(tmp_path / "tnv")
    for name, pdf in (
        ("nation", nat), ("supplier", sup), ("customer", cust),
        ("orders", orders), ("lineitem", lit),
    ):
        spark.createDataFrame(pdf).write.parquet(f"{d}/{name}.parquet")
    g = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]):
        (r["n_lines"], r["revenue"])
        for r in q_two_nation_volume(spark, d).collect()
    }
    assert g == {("N8", "N3", 2000): (1, 40.0), ("N3", "N8", 2000): (1, 60.0)}


def test_market_share_replay_and_zero_one_pins(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    amer = set(n[n["n_regionkey"] == 1]["n_nationkey"].astype(int))
    mkt_cust = {
        int(k)
        for k, nk in zip(c["c_custkey"], c["c_nationkey"])
        if int(nk) in amer
    }
    oyear = {
        int(k): ts.year
        for k, ck, ts in zip(
            o["o_orderkey"], o["o_custkey"], o["o_orderdate"]
        )
        if int(ck) in mkt_cust
    }
    econ = {int(k) for k, t in zip(p["p_partkey"], p["p_type"]) if t == "ECONOMY"}
    snat = dict(zip(s["s_suppkey"].astype(int), s["s_nationkey"].astype(int)))
    tot: Counter = Counter()
    nat: Counter = Counter()
    for ok, pk, sk, pr, dc in zip(
        li["l_orderkey"], li["l_partkey"], li["l_suppkey"],
        li["l_extendedprice"], li["l_discount"],
    ):
        y = oyear.get(int(ok))
        if y is None or int(pk) not in econ:
            continue
        e4 = _e4(pr, dc)
        tot[y] += e4
        if snat[int(sk)] == 3:
            nat[y] += e4
    got = {
        r["o_year"]: (r["total_e4"], r["nation_e4"], r["share"])
        for r in q_market_share(spark, SF).collect()
    }
    assert {y: v[0] for y, v in got.items()} == dict(tot) and tot
    assert {y: v[1] for y, v in got.items()} == {y: nat.get(y, 0) for y in tot}
    for y, (t, nv, sh) in got.items():
        assert abs(sh - nv / t) < 1e-6

    # engineered: year 1998 only a NATION_3 supplier line -> share
    # exactly 1.0; year 1999 only an outside supplier -> exactly 0.0.
    natdf = pd.DataFrame(
        [(1, "N1", 1), (3, "N3", 3)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    sup = pd.DataFrame([(1, 3), (2, 1)], columns=["s_suppkey", "s_nationkey"])
    cust = pd.DataFrame([(1, 1)], columns=["c_custkey", "c_nationkey"])
    part = pd.DataFrame(
        [(100, "ECONOMY"), (200, "PROMO")], columns=["p_partkey", "p_type"]
    )
    orders = pd.DataFrame(
        [
            (10, 1, pd.Timestamp("1998-03-01")),
            (11, 1, pd.Timestamp("1999-03-01")),
        ],
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lit = pd.DataFrame(
        [
            (10, 100, 1, 100.0, 0.0),   # 1998, nation-3 supplier
            (11, 100, 2, 100.0, 0.0),   # 1999, outside supplier
            (11, 200, 1, 999.0, 0.0),   # non-ECONOMY part: excluded
        ],
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    )
    d = str(tmp_path / "mks")
    for name, pdf in (
        ("nation", natdf), ("supplier", sup), ("customer", cust),
        ("part", part), ("orders", orders), ("lineitem", lit),
    ):
        spark.createDataFrame(pdf).write.parquet(f"{d}/{name}.parquet")
    g = {
        r["o_year"]: (r["nation_e4"], r["total_e4"], r["share"])
        for r in q_market_share(spark, d).collect()
    }
    e4 = 10000 * 100
    assert g == {1998: (e4, e4, 1.0), 1999: (0, e4, 0.0)}


def test_part_profit_replay_and_negative_profit_pin(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    wid = {
        int(k): _cents(rp)
        for k, nm, rp in zip(p["p_partkey"], p["p_name"], p["p_retailprice"])
        if "widget" in nm
    }
    nname = dict(zip(n["n_nationkey"].astype(int), n["n_name"]))
    snat = dict(zip(s["s_suppkey"].astype(int), s["s_nationkey"].astype(int)))
    oyear = {
        int(k): ts.year for k, ts in zip(o["o_orderkey"], o["o_orderdate"])
    }
    prof: Counter = Counter()
    cnt: Counter = Counter()
    for ok, pk, sk, q, pr, dc in zip(
        li["l_orderkey"], li["l_partkey"], li["l_suppkey"],
        li["l_quantity"], li["l_extendedprice"], li["l_discount"],
    ):
        rc = wid.get(int(pk))
        if rc is None:
            continue
        key = (nname[snat[int(sk)]], oyear[int(ok)])
        prof[key] += _e4(pr, dc) - rc * int(q) * 10
        cnt[key] += 1
    got = {
        (r["n_name"], r["o_year"]): (r["profit_e4"], r["n_lines"])
        for r in q_part_profit(spark, SF).collect()
    }
    assert got == {k: (prof[k], cnt[k]) for k in cnt} and cnt

    # engineered: non-widget part excluded; hand-pinned arithmetic
    # incl. a NEGATIVE profit line (cost above discounted price).
    natdf = pd.DataFrame(
        [(0, "N0", 0)], columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    sup = pd.DataFrame([(1, 0)], columns=["s_suppkey", "s_nationkey"])
    part = pd.DataFrame(
        [(100, "red widget", 50.00), (200, "red bolt", 1.00)],
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    orders = pd.DataFrame(
        [(10, pd.Timestamp("1997-06-01"))],
        columns=["o_orderkey", "o_orderdate"],
    )
    lit = pd.DataFrame(
        [
            # revenue e4 = 10000*90 = 900000; cost e4 = 5000*2*10 =
            # 100000 -> +800000
            (10, 100, 1, 2.0, 100.0, 0.1),
            # revenue e4 = 1000*100 = 100000; cost e4 = 5000*10*10 =
            # 500000 -> -400000 (negative profit)
            (10, 100, 1, 10.0, 10.0, 0.0),
            # non-widget part: excluded entirely
            (10, 200, 1, 1.0, 1000.0, 0.0),
        ],
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        ],
    )
    d = str(tmp_path / "ppf")
    for name, pdf in (
        ("nation", natdf), ("supplier", sup), ("part", part),
        ("orders", orders), ("lineitem", lit),
    ):
        spark.createDataFrame(pdf).write.parquet(f"{d}/{name}.parquet")
    g = [
        (r["n_name"], r["o_year"], r["profit_e4"], r["n_lines"])
        for r in q_part_profit(spark, d).collect()
    ]
    assert g == [("N0", 1997, 400000, 2)]


def test_returned_customers_replay_and_tie_fixture(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")
    ow = o[(o["o_orderdate"] >= lo) & (o["o_orderdate"] < hi)]
    ocust = dict(zip(ow["o_orderkey"].astype(int), ow["o_custkey"].astype(int)))
    cnt: Counter = Counter()
    rev: defaultdict = defaultdict(float)
    for ok, fl, pr, dc in zip(
        li["l_orderkey"], li["l_returnflag"],
        li["l_extendedprice"], li["l_discount"],
    ):
        ck = ocust.get(int(ok))
        if ck is None or fl != "R":
            continue
        cnt[ck] += 1
        rev[ck] += pr * (1 - dc)
    rows = q_returned_customers(spark, SF).collect()
    assert len(rows) == 20
    floor20 = sorted(rev.values(), reverse=True)[19]
    for r in rows:
        assert cnt[r["c_custkey"]] == r["n_lines"]
        assert abs(rev[r["c_custkey"]] - r["revenue"]) < 0.011
        # every returned row's revenue sits at or above the python
        # 20th-largest, modulo the cent-rounding bracket
        assert r["revenue"] >= floor20 - 0.011
    # descending revenue, custkey-ascending tiebreak
    keys = [(-r["revenue"], r["c_custkey"]) for r in rows]
    assert keys == sorted(keys)

    # engineered: revenue tie between custkeys 2 and 1 -> custkey
    # ascending; 'N' flag excluded; order outside the window excluded.
    natdf = pd.DataFrame(
        [(0, "N0", 0)], columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    cust = pd.DataFrame(
        [(1, "alice", 0), (2, "bob", 0), (3, "carol", 0)],
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    orders = pd.DataFrame(
        [
            (10, 1, pd.Timestamp("1996-08-01")),
            (11, 2, pd.Timestamp("1996-08-01")),
            (12, 3, pd.Timestamp("1996-11-01")),  # outside window
        ],
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lit = pd.DataFrame(
        [
            (10, "R", 100.0, 0.0),
            (11, "R", 100.0, 0.0),   # exact tie with custkey 1
            (10, "N", 999.0, 0.0),   # not returned: excluded
            (12, "R", 999.0, 0.0),   # outside window: excluded
        ],
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    d = str(tmp_path / "rtc")
    for name, pdf in (
        ("nation", natdf), ("customer", cust),
        ("orders", orders), ("lineitem", lit),
    ):
        spark.createDataFrame(pdf).write.parquet(f"{d}/{name}.parquet")
    g = [
        (r["c_custkey"], r["c_name"], r["revenue"], r["n_lines"])
        for r in q_returned_customers(spark, d).collect()
    ]
    assert g == [(1, "alice", 100.0, 1), (2, "bob", 100.0, 1)]


def test_small_qty_revenue_replay_and_exact_boundary(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    b1 = {int(k) for k, b in zip(p["p_partkey"], p["p_brand"]) if b == "Brand#1"}
    per: defaultdict = defaultdict(list)
    for pk, q, pr in zip(
        li["l_partkey"], li["l_quantity"], li["l_extendedprice"]
    ):
        if int(pk) in b1:
            per[int(pk)].append((int(q), pr))
    n_small, cents = 0, 0
    for lines in per.values():
        s = sum(q for q, _ in lines)
        n = len(lines)
        for q, pr in lines:
            if 5 * q * n < s:
                n_small += 1
                cents += _cents(pr)
    r = q_small_qty_revenue(spark, SF).collect()[0]
    assert (r["n_small_lines"], r["revenue_cents"]) == (n_small, cents)
    assert n_small > 0
    assert abs(r["avg_yearly"] - cents / 700.0) < 0.006

    # engineered: part A quantities (5, 45): 5·5·2 == 50 — the exact
    # 20%-of-average boundary is EXCLUDED (strict <). Part B (4, 46):
    # 4 is below threshold, kept. Non-Brand#1 part excluded.
    part = pd.DataFrame(
        [(1, "Brand#1"), (2, "Brand#1"), (3, "Brand#9")],
        columns=["p_partkey", "p_brand"],
    )
    lit = pd.DataFrame(
        [
            (1, 5.0, 100.00),
            (1, 45.0, 100.00),
            (2, 4.0, 123.00),
            (2, 46.0, 100.00),
            (3, 1.0, 999.00),  # tiny qty but wrong brand
        ],
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    d = str(tmp_path / "sqr")
    spark.createDataFrame(part).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(lit).write.parquet(f"{d}/lineitem.parquet")
    g = q_small_qty_revenue(spark, d).collect()[0]
    assert (g["n_small_lines"], g["revenue_cents"]) == (1, 12300)


def test_band_revenue_replay_and_arm_boundaries(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    meta = {
        int(k): (b, int(sz))
        for k, b, sz in zip(p["p_partkey"], p["p_brand"], p["p_size"])
    }
    arms = [
        ("Brand#1", 5, 1, 11),
        ("Brand#2", 10, 10, 20),
        ("Brand#3", 15, 20, 30),
    ]
    cnt: Counter = Counter()
    rev: Counter = Counter()
    for pk, q, pr, dc in zip(
        li["l_partkey"], li["l_quantity"],
        li["l_extendedprice"], li["l_discount"],
    ):
        b, sz = meta[int(pk)]
        for i, (ab, asz, qlo, qhi) in enumerate(arms):
            if b == ab and 1 <= sz <= asz and qlo <= q <= qhi:
                cnt[i + 1] += 1
                rev[i + 1] += _e4(pr, dc)
                break
    got = {
        r["arm"]: (r["n_lines"], r["revenue_e4"])
        for r in q_band_revenue(spark, SF).collect()
    }
    assert got == {a: (cnt[a], rev[a]) for a in cnt} and len(cnt) == 3

    # engineered: arm-1 qty 11 kept (inclusive upper), 12 dropped;
    # arm-1 brand at size 6 dropped; arm-2 qty 10 kept (inclusive
    # lower); unknown brand dropped.
    part = pd.DataFrame(
        [
            (1, "Brand#1", 5),
            (2, "Brand#1", 6),
            (3, "Brand#2", 10),
            (4, "Brand#7", 1),
        ],
        columns=["p_partkey", "p_brand", "p_size"],
    )
    lit = pd.DataFrame(
        [
            (1, 11.0, 100.0, 0.0),  # arm 1, boundary qty kept
            (1, 12.0, 999.0, 0.0),  # qty above arm-1 band
            (2, 5.0, 999.0, 0.0),   # size above arm-1 band
            (3, 10.0, 50.0, 0.1),   # arm 2, boundary qty kept
            (4, 5.0, 999.0, 0.0),   # unknown brand
        ],
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    d = str(tmp_path / "band")
    spark.createDataFrame(part).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(lit).write.parquet(f"{d}/lineitem.parquet")
    g = {
        r["arm"]: (r["n_lines"], r["revenue_e4"])
        for r in q_band_revenue(spark, d).collect()
    }
    assert g == {1: (1, 10000 * 100), 2: (1, 5000 * 90)}
