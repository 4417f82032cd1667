"""TPC-H-shaped anchors added in round 3: fraction-of-global HAVING
(Q11), distribution-of-counts with a zero bucket (Q13), scalar-average
+ anti-join filter (Q22), and excluded-supplier distinct counts (Q16).
Every test replays the full sf0.001 answer in pure Python AND pins an
engineered boundary case the strict comparisons must not straddle."""

from collections import Counter

import pandas as pd

from documentai_ocr_spark.queries.relational import (
    q_brand_suppliers,
    q_cust_order_dist,
    q_idle_customers,
    q_part_value_share,
)

SF = "/root/testdata/sf0.001"


def test_part_value_share_recount_and_boundary(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    qty: Counter = Counter()
    for pk, q in zip(li["l_partkey"], li["l_quantity"]):
        qty[int(pk)] += int(q)
    total = sum(qty.values())
    n_parts = len(qty)
    want = {
        pk: (q, 1_000_000 * q // total)
        for pk, q in qty.items()
        if 10 * q * n_parts > 12 * total
    }
    got = {
        r["p_partkey"]: (r["qty"], r["share_micro"])
        for r in q_part_value_share(spark, SF).collect()
    }
    assert got == want and len(want) > 0

    # engineered boundary: 4 parts, total 100; threshold share is
    # exactly 1.2x average = 30 units. A part holding EXACTLY 30 sits
    # on the strict > boundary and must be excluded; 31 is kept.
    rows = []
    ln = 0
    for pk, amounts in ((1, [31]), (2, [30]), (3, [20]), (4, [19])):
        for q in amounts:
            rows.append((ln := ln + 1, pk, float(q)))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_quantity"])
    d = str(tmp_path / "pvs")
    spark.createDataFrame(pdf).write.parquet(f"{d}/lineitem.parquet")
    g2 = {r["p_partkey"]: r["qty"] for r in q_part_value_share(spark, d).collect()}
    assert g2 == {1: 31}


def test_cust_order_dist_recount_and_zero_bucket(spark, tmp_path):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    per = Counter(
        int(k)
        for k in o[o["o_orderpriority"] != "1-URGENT"]["o_custkey"]
    )
    hist = Counter(per.get(int(ck), 0) for ck in c["c_custkey"])
    got = {
        r["n_orders"]: r["n_customers"]
        for r in q_cust_order_dist(spark, SF).collect()
    }
    assert got == dict(hist)

    # engineered: customer 3 has ONLY urgent orders -> lands in the
    # zero bucket (the LEFT join's raison d'etre); customer 4 has none.
    cust = pd.DataFrame({"c_custkey": [1, 2, 3, 4]})
    orders = pd.DataFrame(
        [
            (10, 1, "5-LOW"),
            (11, 1, "5-LOW"),
            (12, 2, "5-LOW"),
            (13, 3, "1-URGENT"),
        ],
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = str(tmp_path / "cod")
    spark.createDataFrame(cust).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(orders).write.parquet(f"{d}/orders.parquet")
    g2 = {
        r["n_orders"]: r["n_customers"]
        for r in q_cust_order_dist(spark, d).collect()
    }
    assert g2 == {0: 2, 1: 1, 2: 1}


def test_idle_customers_recount_and_avg_boundary(spark, tmp_path):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    urgent = {
        int(k) for k in o[o["o_orderpriority"] == "1-URGENT"]["o_custkey"]
    }
    pos = c[c["c_acctbal"] > 0.0]
    cents = {
        int(ck): int(round(b * 100))
        for ck, b in zip(pos["c_custkey"], pos["c_acctbal"])
    }
    s, n = sum(cents.values()), len(cents)
    agg: dict = {}
    for ck, seg in zip(pos["c_custkey"], pos["c_mktsegment"]):
        ck = int(ck)
        if cents[ck] * n > s and ck not in urgent:
            a = agg.setdefault(seg, [0, 0])
            a[0] += 1
            a[1] += cents[ck]
    got = {
        r["c_mktsegment"]: (r["n_cust"], r["bal_cents_sum"])
        for r in q_idle_customers(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()} and got

    # engineered: balances 10/20/30/40 -> avg 25.00 exactly in cents;
    # 10 and 20 fall below, 30 is above BUT has an urgent order
    # (anti-joined away), so exactly the 40.00 customer survives.
    cust = pd.DataFrame(
        [
            (1, 10.0, "A"),
            (2, 20.0, "A"),
            (3, 30.0, "A"),
            (4, 40.0, "B"),
        ],
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )
    # avg = 25.00; cust 3 (30.00 > avg) urgent -> dropped; cust 4 kept
    orders = pd.DataFrame(
        [(10, 3, "1-URGENT")],
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = str(tmp_path / "idle")
    spark.createDataFrame(cust).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(orders).write.parquet(f"{d}/orders.parquet")
    g2 = {
        r["c_mktsegment"]: (r["n_cust"], r["bal_cents_sum"])
        for r in q_idle_customers(spark, d).collect()
    }
    assert g2 == {"B": (1, 4000)}


def test_brand_suppliers_recount_and_blocklist(spark, tmp_path):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    bad = {int(k) for k in s[s["s_acctbal"] < 1000.0]["s_suppkey"]}
    brand = dict(zip(p["p_partkey"].astype(int), p["p_brand"]))
    seen: dict = {}
    for pk, sk in zip(li["l_partkey"], li["l_suppkey"]):
        sk = int(sk)
        if sk not in bad:
            seen.setdefault(brand[int(pk)], set()).add(sk)
    got = {
        r["p_brand"]: r["n_suppliers"]
        for r in q_brand_suppliers(spark, SF).collect()
    }
    assert got == {b: len(v) for b, v in seen.items()} and got
    assert len(bad) > 0, "fixture must actually exercise the blocklist"

    # engineered: supplier 2 (below the 1000.00 cut) serves brand X on
    # two lines - excluded entirely; brand X counts only supplier 1.
    # Supplier 3 sits EXACTLY at 1000.00: strict < keeps it.
    lit = pd.DataFrame(
        [(1, 100, 1), (2, 100, 2), (3, 100, 2), (4, 200, 3)],
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )
    part = pd.DataFrame(
        [(100, "X"), (200, "Y")], columns=["p_partkey", "p_brand"]
    )
    sup = pd.DataFrame(
        [(1, 5000.0), (2, 999.99), (3, 1000.0)],
        columns=["s_suppkey", "s_acctbal"],
    )
    d = str(tmp_path / "bs")
    spark.createDataFrame(lit).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(part).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(sup).write.parquet(f"{d}/supplier.parquet")
    g2 = {
        r["p_brand"]: r["n_suppliers"]
        for r in q_brand_suppliers(spark, d).collect()
    }
    assert g2 == {"X": 1, "Y": 1}
