"""TPC-H-shaped anchors, third wave: the Q21 double correlated
EXISTS / NOT EXISTS (sole-blame supplier) rewritten as a two-level
per-order aggregate, and the Q12 conditional-sum priority matrix with
a both-sided range join residual. Each is replayed in pure Python over
the full sf0.001 tables AND pinned on an engineered fixture that hits
every branch the rewrite must preserve: the multi-supplier EXISTS, the
two-late-suppliers NOT EXISTS, the order-status prune, distinct-ORDER
(not line) counting, and the strict/inclusive day-band edges."""

from collections import Counter, defaultdict

import pandas as pd

from documentai_ocr_spark.queries.relational import (
    _BLAME_DAYS,
    _BLAME_STATUS,
    _BLAME_TOPK,
    _SHIPCLASS_HI,
    _SHIPCLASS_HIGH,
    _SHIPCLASS_LO,
    q_blame_supplier,
    q_priority_shipclass,
)

SF = "/root/testdata/sf0.001"


def _blame_python(li: pd.DataFrame, o: pd.DataFrame, s: pd.DataFrame):
    """Literal-semantics replay: per qualifying order, the unique sole
    late supplier; count DISTINCT orders per supplier; top-K by
    (n_orders DESC, s_suppkey ASC)."""
    odate = {
        int(k): d
        for k, d, st in zip(
            o["o_orderkey"], o["o_orderdate"], o["o_orderstatus"]
        )
        if st == _BLAME_STATUS
    }
    supps = defaultdict(set)
    lates = defaultdict(set)
    for ok, sk, sd in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_shipdate"]
    ):
        ok, sk = int(ok), int(sk)
        if ok not in odate:
            continue
        supps[ok].add(sk)
        if sd > odate[ok] + pd.Timedelta(days=_BLAME_DAYS):
            lates[ok].add(sk)
    blame = Counter()
    for ok, ss in supps.items():
        ls = lates.get(ok, set())
        if len(ss) > 1 and len(ls) == 1:
            blame[next(iter(ls))] += 1
    name = dict(zip(s["s_suppkey"].astype(int), s["s_name"]))
    rows = sorted(
        ((sk, name[sk], n) for sk, n in blame.items()),
        key=lambda r: (-r[2], r[0]),
    )
    return rows[:_BLAME_TOPK]


def test_blame_supplier_replay_sf0001(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    want = _blame_python(li, o, s)
    assert len(want) > 0
    got = [
        (r["s_suppkey"], r["s_name"], r["n_orders"])
        for r in q_blame_supplier(spark, SF).collect()
    ]
    assert got == want


def test_blame_supplier_fixture_branches(spark, tmp_path):
    """Engineered orders, one per rewrite branch:
      1 (F): supp1 late, supp2 on-time        -> supp1 blamed
      2 (F): supp1 late, supp2 late           -> nobody (NOT EXISTS)
      3 (F): supp1 alone, late                -> nobody (EXISTS fails)
      4 (O): supp1 late, supp2 on-time        -> nobody (status prune)
      5 (F): supp2 late TWICE, supp3 on-time  -> supp2 blamed ONCE
      6 (F): supp1 late, supp3 at EXACTLY +{d}d (strict >, not late)
             -> supp1 blamed; the boundary line must not become a
             second late supplier."""
    d0 = pd.Timestamp("1995-01-01")
    late = d0 + pd.Timedelta(days=_BLAME_DAYS + 1)
    exact = d0 + pd.Timedelta(days=_BLAME_DAYS)
    ontime = d0 + pd.Timedelta(days=1)
    lines = [
        (1, 1, late), (1, 2, ontime),
        (2, 1, late), (2, 2, late),
        (3, 1, late),
        (4, 1, late), (4, 2, ontime),
        (5, 2, late), (5, 2, late), (5, 3, ontime),
        (6, 1, late), (6, 3, exact),
    ]
    li = pd.DataFrame(
        lines, columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    o = pd.DataFrame(
        [(k, d0, "O" if k == 4 else _BLAME_STATUS) for k in range(1, 7)],
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )
    s = pd.DataFrame(
        [(k, f"S{k}") for k in (1, 2, 3)],
        columns=["s_suppkey", "s_name"],
    )
    d = str(tmp_path / "blame")
    spark.createDataFrame(li).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(o).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(s).write.parquet(f"{d}/supplier.parquet")
    got = [
        (r["s_suppkey"], r["s_name"], r["n_orders"])
        for r in q_blame_supplier(spark, d).collect()
    ]
    assert got == [(1, "S1", 2), (2, "S2", 1)]


def test_blame_supplier_no_expand_two_level_agg(spark):
    """The scale property the rewrite exists for: no Expand node (the
    multi-countDistinct plan shape that doubles fact rows) — the
    distinct semantics come from the (orderkey, suppkey) pre-aggregate
    — and the top-K is TakeOrderedAndProject, never a global sort."""
    from planutil import plan

    p = plan(q_blame_supplier(spark, SF))
    assert "Expand" not in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def _shipclass_python(li: pd.DataFrame, o: pd.DataFrame):
    odate = dict(zip(o["o_orderkey"].astype(int), o["o_orderdate"]))
    oprio = dict(zip(o["o_orderkey"].astype(int), o["o_orderpriority"]))
    hi = Counter()
    lo = Counter()
    for ok, rf, sd in zip(
        li["l_orderkey"], li["l_returnflag"], li["l_shipdate"]
    ):
        ok = int(ok)
        if ok not in odate:
            continue
        base = odate[ok]
        if not (
            sd > base + pd.Timedelta(days=_SHIPCLASS_LO)
            and sd <= base + pd.Timedelta(days=_SHIPCLASS_HI)
        ):
            continue
        (hi if oprio[ok] in _SHIPCLASS_HIGH else lo)[rf] += 1
    return {
        rf: (hi.get(rf, 0), lo.get(rf, 0)) for rf in set(hi) | set(lo)
    }


def test_priority_shipclass_replay_sf0001(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    want = _shipclass_python(li, o)
    assert want
    got = {
        r["shipclass"]: (r["high_line_count"], r["low_line_count"])
        for r in q_priority_shipclass(spark, SF).collect()
    }
    assert got == want


def test_priority_shipclass_band_edges(spark, tmp_path):
    """Day-band boundary pins: exactly +LO days is OUT (strict >),
    +LO+1 in, exactly +HI in (<=), +HI+1 out; one line per priority
    class so both CASE arms are exercised."""
    d0 = pd.Timestamp("1995-01-01")

    def sd(days):
        return d0 + pd.Timedelta(days=days)

    lines = [
        # (orderkey, returnflag, shipdate, kept?)
        (1, "A", sd(_SHIPCLASS_LO), False),
        (1, "A", sd(_SHIPCLASS_LO + 1), True),
        (2, "A", sd(_SHIPCLASS_HI), True),
        (2, "A", sd(_SHIPCLASS_HI + 1), False),
        (3, "N", sd(90), True),
    ]
    li = pd.DataFrame(
        [(k, rf, s) for k, rf, s, _ in lines],
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )
    o = pd.DataFrame(
        [
            (1, d0, _SHIPCLASS_HIGH[0]),
            (2, d0, "5-LOW"),
            (3, d0, _SHIPCLASS_HIGH[1]),
        ],
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    d = str(tmp_path / "shipclass")
    spark.createDataFrame(li).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(o).write.parquet(f"{d}/orders.parquet")
    got = {
        r["shipclass"]: (r["high_line_count"], r["low_line_count"])
        for r in q_priority_shipclass(spark, d).collect()
    }
    # order 1 is URGENT (high): 1 kept line; order 2 LOW: 1 kept line;
    # order 3 HIGH: 1 kept line under flag N.
    assert got == {"A": (1, 1), "N": (1, 0)}


# ----------------------------------------- min-cost supplier (Q2 shape)
def _mcs_python(li, s, n):
    from documentai_ocr_spark.queries.relational import _MCS_REGION

    region_sup = {
        int(sk): nm
        for sk, nk, nm in zip(s["s_suppkey"], s["s_nationkey"], s["s_name"])
        if int(
            n.loc[n["n_nationkey"] == nk, "n_regionkey"].iloc[0]
        ) == _MCS_REGION
    }
    pc: dict[tuple, int] = {}
    for pk, sk, ep, dc in zip(
        li["l_partkey"], li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        if int(sk) not in region_sup:
            continue
        import math

        c = int(math.floor(float(ep) * 100)) * (
            100 - int(math.floor(float(dc) * 100))
        )
        k = (int(pk), int(sk))
        pc[k] = min(pc.get(k, c), c)
    want = {}
    for pk in {k[0] for k in pc}:
        quotes = {sk: c for (p, sk), c in pc.items() if p == pk}
        best = min(quotes.values())
        sk = min(s for s, c in quotes.items() if c == best)
        want[pk] = (sk, region_sup[sk], best, len(quotes))
    return want


def test_min_cost_supplier_replay_sf0001(spark):
    """Full sf0.001 replay in exact integers: the per-part argmin, the
    smallest-suppkey tie-break, the region prune and the quote count."""
    from documentai_ocr_spark.queries.relational import q_min_cost_supplier

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    want = _mcs_python(li, s, n)
    got = {
        r["p_partkey"]: (
            r["s_suppkey"],
            r["s_name"],
            r["cost_e4"],
            r["n_suppliers"],
        )
        for r in q_min_cost_supplier(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_min_cost_supplier_fixture_branches(spark, tmp_path):
    """Every rewrite branch on an engineered fixture: an OUT-OF-REGION
    supplier quoting 100× cheaper is invisible (region prune before the
    fact); two in-region suppliers with the IDENTICAL exact-e4 cost tie
    to the smaller suppkey; n_suppliers counts region quotes only; a
    supplier's cost is the MIN over its own lines (s2's 50.00 line
    beats its 80.00 line on part 200)."""
    from documentai_ocr_spark.queries.relational import q_min_cost_supplier

    n = pd.DataFrame(
        [(30, "inreg", 3), (31, "outreg", 0)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    s = pd.DataFrame(
        [(1, "s1", 30, 0.0), (2, "s2", 30, 0.0), (9, "s9", 31, 0.0)],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    li = pd.DataFrame(
        [
            # part 100: s1 and s2 tie at exactly 100.00 / 0% = 1_000_000
            (100, 1, 100.0, 0.0),
            (100, 2, 100.0, 0.0),
            # out-of-region s9 is 100x cheaper — must be invisible
            (100, 9, 1.0, 0.0),
            # part 200: s2 only; min over its own two lines, 5% discount
            (200, 2, 80.0, 0.0),
            (200, 2, 50.0, 0.05),
        ],
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    d = str(tmp_path / "mcs")
    spark.createDataFrame(n).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(s).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(li).write.parquet(f"{d}/lineitem.parquet")
    got = {
        r["p_partkey"]: (
            r["s_suppkey"],
            r["s_name"],
            r["cost_e4"],
            r["n_suppliers"],
        )
        for r in q_min_cost_supplier(spark, d).collect()
    }
    assert got == {
        100: (1, "s1", 100_00 * 100, 2),
        200: (2, "s2", 50_00 * 95, 1),
    }


def test_min_cost_supplier_plan(spark):
    """One fact exchange ((part, supp) rollup) + one aggregate-sized
    exchange (per-part argmin); every join is broadcast — no
    SortMergeJoin, no correlated-subquery self-join materializes."""
    from documentai_ocr_spark.queries.relational import q_min_cost_supplier
    from planutil import n_exchanges, plan

    p = plan(q_min_cost_supplier(spark, SF))
    assert n_exchanges(p) == 2, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p


# ---------------------------------------- dominant suppliers (Q20 shape)
def test_dominant_suppliers_replay_sf0001(spark):
    """Full sf0.001 replay: windowed exact-integer qty rollup, strict
    cross-multiplied majority cut, count + max integer-milli share."""
    from documentai_ocr_spark.queries.relational import (
        _DOM_HI,
        _DOM_LO,
        q_dominant_suppliers,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    lo, hi = pd.Timestamp(_DOM_LO), pd.Timestamp(_DOM_HI)
    w = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)]
    ps: dict[tuple, int] = {}
    for pk, sk, q in zip(w["l_partkey"], w["l_suppkey"], w["l_quantity"]):
        k = (int(pk), int(sk))
        ps[k] = ps.get(k, 0) + int(q)
    tot: dict[int, int] = {}
    for (pk, _), q in ps.items():
        tot[pk] = tot.get(pk, 0) + q
    per: dict[int, list] = {}
    for (pk, sk), q in ps.items():
        if 2 * q > tot[pk]:
            a = per.setdefault(sk, [0, 0])
            a[0] += 1
            a[1] = max(a[1], 1000 * q // tot[pk])
    names = dict(zip(s["s_suppkey"].astype(int), s["s_name"]))
    want = {sk: (names[sk], a[0], a[1]) for sk, a in per.items()}
    got = {
        r["s_suppkey"]: (r["s_name"], r["n_dominated"], r["max_share_milli"])
        for r in q_dominant_suppliers(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_dominant_suppliers_fixture_branches(spark, tmp_path):
    """The strict boundary and the window prune, hand-pinned: a perfect
    50/50 part dominates NOBODY (2·3 > 6 is false); a 4-vs-3 part makes
    s1 dominant at exactly 571 milli; a single-supplier part is a
    1000-milli domination; s1's enormous OUT-OF-WINDOW shipment for the
    50/50 part must not flip it."""
    from documentai_ocr_spark.queries.relational import q_dominant_suppliers

    IN, OUT = pd.Timestamp("1996-06-01"), pd.Timestamp("1995-06-01")
    li = pd.DataFrame(
        [
            # part 1: s1=4, s2=3 -> s1 dominates, 1000*4//7 = 571
            (1, 1, 4.0, IN),
            (1, 2, 3.0, IN),
            # part 2: exact 50/50 -> nobody (strict >)
            (2, 1, 3.0, IN),
            (2, 2, 3.0, IN),
            # ... and s1's out-of-window 100 units must not flip it
            (2, 1, 100.0, OUT),
            # part 3: single supplier -> 1000 milli
            (3, 3, 5.0, IN),
        ],
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    s = pd.DataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    d = str(tmp_path / "dom")
    spark.createDataFrame(li).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(s).write.parquet(f"{d}/supplier.parquet")
    got = {
        r["s_suppkey"]: (r["n_dominated"], r["max_share_milli"])
        for r in q_dominant_suppliers(spark, d).collect()
    }
    assert got == {1: (1, 571), 3: (1, 1000)}


def test_dominant_suppliers_window_pushdown(spark):
    """The ship-date window reaches the parquet scan as pushed filters
    (the fact is pruned BEFORE the rollup, not after)."""
    from documentai_ocr_spark.queries.relational import q_dominant_suppliers
    from planutil import plan

    p = plan(q_dominant_suppliers(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p, p
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "CartesianProduct" not in p, p
