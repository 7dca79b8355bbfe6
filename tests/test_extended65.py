"""Semantic property tests for extension pack 65 (extended65.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended65 import (
    INV_MISSING_MOD,
    INV_OVER_MOD,
    SHORT_SHIP_MOD,
    SPLIT_DATE,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (engine DIV / DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def test_three_way_match_verdicts_match_python_rules(spark):
    rows = {(r.status, r.verdict): r for r in QUERIES["audit_three_way_match"].fn(spark, SF_DIR).collect()}
    orders = {o.o_orderkey: o for o in load(spark, SF_DIR, "orders").collect()}
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity").collect()
    qty = defaultdict(int)
    for r in li:
        qty[r.l_orderkey] += int(r.l_quantity)
    agg = defaultdict(lambda: [0, 0])
    overlap_seen = False
    for k, o in orders.items():
        if k not in qty:
            continue  # orders with no lineitems have no receipt leg
        po_cents = round(o.o_totalprice * 100)
        recv = qty[k] - 1 if k % SHORT_SHIP_MOD == 0 else qty[k]
        if k % INV_MISSING_MOD == 0:
            inv = None
        elif k % INV_OVER_MOD == 0:
            inv = po_cents + 5
        else:
            inv = po_cents
        if inv is None:
            v = "missing_invoice"
        elif recv != qty[k] and inv != po_cents:
            v = "both_mismatch"
        elif recv != qty[k]:
            v = "qty_mismatch"
        elif inv != po_cents:
            v = "price_mismatch"
        else:
            v = "matched"
        if k % SHORT_SHIP_MOD == 0 and k % INV_MISSING_MOD == 0:
            overlap_seen = True  # precedence genuinely exercised
        agg[(o.o_orderstatus, v)][0] += 1
        agg[(o.o_orderstatus, v)][1] += po_cents
    assert overlap_seen
    assert set(rows) == set(agg)
    for key, (n, cents) in agg.items():
        assert (rows[key].n_orders, rows[key].po_cents) == (n, cents)
    verdicts = {v for _, v in rows}
    assert verdicts == {
        "matched", "qty_mismatch", "price_mismatch", "both_mismatch",
        "missing_invoice",
    }


def test_arc_elasticity_matches_python_crossmul(spark):
    rows = {r.part: r for r in QUERIES["agg_arc_price_elasticity"].fn(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    import datetime as dt

    split = dt.datetime.fromisoformat(SPLIT_DATE)
    per = defaultdict(lambda: [[0, 0], [0, 0]])  # part -> [p1(q,c), p2(q,c)]
    for r in li:
        idx = 0 if r.l_shipdate < split else 1
        per[r.l_partkey][idx][0] += int(r.l_quantity)
        per[r.l_partkey][idx][1] += round(r.l_extendedprice * 100)
    expected = {}
    for part, ((q1, c1), (q2, c2)) in per.items():
        if q1 == 0 or q2 == 0:
            continue  # no pair without both periods
        up1 = 10000 * c1 // q1
        up2 = 10000 * c2 // q2
        if up1 == up2:
            e = None
        else:
            e = _tdiv(1_000_000 * (q2 - q1) * (up1 + up2), (q1 + q2) * (up2 - up1))
        expected[part] = (q1, q2, up1, up2, e)
    assert set(rows) == set(expected)
    n_null = n_neg = 0
    for part, (q1, q2, up1, up2, e) in expected.items():
        r = rows[part]
        assert (r.q1, r.q2) == (q1, q2)
        assert (r.unit_price1_microcent, r.unit_price2_microcent) == (up1, up2)
        assert r.arc_elasticity_micro == e
        n_null += e is None
        n_neg += e is not None and e < 0
    # negative elasticities occur (the truncation-vs-floor trap is exercised)
    assert n_neg > 0
