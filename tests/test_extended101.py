"""Semantic property tests for extension pack 101 (extended101.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_borda_count_matches_python_ballots(spark):
    rows = {r.event_type: r for r in QUERIES["agg_borda_count_ranking"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("user_id", "event_type", "value").collect()
    spend = defaultdict(lambda: defaultdict(int))
    for e in ev:
        spend[e.user_id][e.event_type] += math.floor(e.value * 100 + 0.5)
    points = defaultdict(lambda: [0, 0, 0])
    for uid, per_type in spend.items():
        order = sorted(per_type.items(), key=lambda kv: (-kv[1], kv[0]))
        k = len(order)
        for rnk, (typ, _) in enumerate(order, start=1):
            a = points[typ]
            a[0] += k - rnk
            a[1] += 1
            a[2] += 1 if rnk == 1 else 0
    assert set(rows) == set(points)
    for typ, (pts, ballots, firsts) in points.items():
        r = rows[typ]
        assert (r.borda_points, r.n_ballots, r.n_first_places) == (
            pts, ballots, firsts,
        )
    ranked = sorted(rows.values(), key=lambda r: r.borda_rank)
    assert [r.borda_points for r in ranked] == sorted(
        (r.borda_points for r in ranked), reverse=True
    )
    # total points conserve: Σ ballots' k(k−1)/2
    total_pts = sum(
        len(p) * (len(p) - 1) // 2 for p in spend.values()
    )
    assert sum(r.borda_points for r in rows.values()) == total_pts


def test_price_endings_census_matches_python(spark):
    rows = {r.ending_class: r for r in QUERIES["agg_price_endings_census"].fn(spark, SF_DIR).collect()}
    orders = load(spark, SF_DIR, "orders").collect()
    agg = defaultdict(lambda: [0, 0])
    n = len(orders)
    for o in orders:
        c = round(o.o_totalprice * 100)
        e = c % 100
        cls = (
            "charm_99" if e == 99
            else "round_00" if e == 0
            else "other_9" if e % 10 == 9
            else "other_0" if e % 10 == 0
            else "plain"
        )
        agg[cls][0] += 1
        agg[cls][1] += c
    assert set(rows) == set(agg)
    for cls, (cnt, cents) in agg.items():
        r = rows[cls]
        assert (r.n_orders, r.cents) == (cnt, cents)
        assert r.share_micro == 1_000_000 * cnt // n
    # computed (synthetic) prices: endings near-uniform — charm pricing
    # absent (each of the 100 endings ≈ 1%; the 9-ending class ≈ 10%)
    assert rows["charm_99"].share_micro < 30_000
    assert 60_000 < rows["other_9"].share_micro < 140_000
    assert sum(r.n_orders for r in rows.values()) == n
