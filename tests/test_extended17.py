"""Semantic property tests for extension pack 17 (extended17.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE

load_all_modules()


def test_skyline_matches_bruteforce(spark):
    rows = QUERIES["join_skyline_pareto"].fn(spark, SF_DIR_SMOKE).collect()
    pts = [
        (r.o_orderkey, int(round(r.price * 100)), r.d.toordinal())
        for r in load(spark, SF_DIR_SMOKE, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
        )
        .collect()
    ]
    want = set()
    for k, c, d in pts:
        dominated = any(
            (c2 >= c and d2 >= d and (c2 > c or d2 > d))
            for _, c2, d2 in pts
        )
        if not dominated:
            want.add(k)
    assert {r.o_orderkey for r in rows} == want


def test_skyline_is_a_true_frontier(spark):
    rows = QUERIES["join_skyline_pareto"].fn(spark, SF_DIR).collect()
    assert rows
    # sorted by price desc, dates must strictly increase (2-D frontier)
    dates = [r.d for r in rows]
    assert all(b > a for a, b in zip(dates, dates[1:])), dates


def test_lorenz_curve_shape(spark):
    rows = QUERIES["agg_lorenz_decile_shares"].fn(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # cumulative shares strictly increase and end at exactly 1e6
    shares = [r.cum_share_micro for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1_000_000
    # convexity: decile sums are non-decreasing (sorted by value)
    sums = [r.sum_cents for r in rows]
    assert all(b >= a for a, b in zip(sums, sums[1:]))
    # decile counts differ by at most 1 (ntile contract)
    ns = [r.n for r in rows]
    assert max(ns) - min(ns) <= 1
