"""Semantic property tests for extension pack 100 (extended100.py)."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended100 import (
    FISHER_SPLIT,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_accumulating_snapshot_matches_python_milestones(spark):
    rows = {r.priority: r for r in QUERIES["join_accumulating_snapshot"].fn(spark, SF_DIR).collect()}
    orders = {o.o_orderkey: o for o in load(spark, SF_DIR, "orders").collect()}
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate").collect()
    ships = defaultdict(list)
    for r in li:
        ships[r.l_orderkey].append(r.l_shipdate.date())
    agg = defaultdict(lambda: [0, 0, 0, 0, -(10**9), 0])
    for k, ds in ships.items():
        o = orders[k]
        placed = o.o_orderdate.date()
        first, last = min(ds), max(ds)
        a = agg[o.o_orderpriority]
        a[0] += 1
        a[1] += len(ds)
        a[2] += (first - placed).days
        a[3] += (last - first).days
        a[4] = max(a[4], (last - placed).days)
        a[5] += 1 if first == last else 0
    assert set(rows) == set(agg)
    for pr, (n, nl, pf, fl, worst, single) in agg.items():
        r = rows[pr]
        assert (r.n_orders, r.n_lines) == (n, nl)
        assert (r.placed_to_first_days, r.first_to_last_days) == (pf, fl)
        assert (r.worst_cycle_days, r.n_single_shipment) == (worst, single)
        # structural identities of the milestone algebra
        assert r.first_to_last_days >= 0  # min <= max always
        assert 0 <= r.n_single_shipment <= r.n_orders
    assert any(r.n_single_shipment < r.n_orders for r in rows.values())


def test_fisher_brackets_between_laspeyres_and_paasche(spark):
    row = QUERIES["agg_fisher_ideal_index"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    split = dt.datetime.fromisoformat(FISHER_SPLIT)
    pq = defaultdict(lambda: [[0, 0], [0, 0]])
    for r in li:
        per = 0 if r.l_shipdate < split else 1
        pq[r.l_partkey][per][0] += int(r.l_quantity)
        pq[r.l_partkey][per][1] += round(r.l_extendedprice * 100)
    p1q0 = p0q0 = p1q1 = p0q1 = n = 0
    for part, ((q0, c0), (q1, c1)) in pq.items():
        if q0 == 0 or q1 == 0:
            continue
        up0 = 10000 * c0 // q0
        up1 = 10000 * c1 // q1
        n += 1
        p1q0 += up1 * q0
        p0q0 += up0 * q0
        p1q1 += up1 * q1
        p0q1 += up0 * q1
    assert row.n_parts == n
    lasp = p1q0 / p0q0
    paas = p1q1 / p0q1
    assert abs(row.laspeyres - lasp) < 1e-5
    assert abs(row.paasche - paas) < 1e-5
    assert abs(row.fisher - math.sqrt(lasp * paas)) < 1e-5
    # the ideal index brackets (geometric mean property)
    lo, hi = sorted((row.laspeyres, row.paasche))
    assert lo - 1e-9 <= row.fisher <= hi + 1e-9
    # stable synthetic prices: the index sits near 1
    assert 0.8 < row.fisher < 1.25
