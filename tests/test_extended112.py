"""Semantic property tests for extension pack 112 (extended112.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()

LN2 = 0.6931471805599453


def test_parkinson_matches_python_fold(spark):
    row = QUERIES["window_parkinson_volatility"].fn(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").select("ts", "value").collect()
    daily = defaultdict(lambda: (1 << 62, -(1 << 62)))
    for r in ev:
        day = r.ts.date()
        cents = round(r.value * 100)
        lo, hi = daily[day]
        daily[day] = (min(lo, cents), max(hi, cents))
    terms = [
        round(1_000_000 * math.log(hi / lo) ** 2)
        for lo, hi in daily.values()
        if lo > 0
    ]
    n = len(terms)
    s = sum(terms)
    assert row.n_days == n
    assert row.sum_sq_micro == s
    assert row.parkinson_vol_micro == round(
        1_000_000 * math.sqrt(s / (1_000_000.0 * 4 * n * LN2))
    )
    # the estimator is positive and below the raw range ratio bound
    assert 0 < row.parkinson_vol_micro < 10_000_000


def test_atkinson_matches_python_fold_and_bounds(spark):
    rows = QUERIES["agg_atkinson_index"].fn(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    ).collect()
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in load(spark, SF_DIR, "supplier").collect()
    }
    rev = defaultdict(int)
    for r in li:
        rev[(sup[r.l_suppkey], r.l_suppkey)] += round(
            r.l_extendedprice * (1 - r.l_discount) * 10000
        )
    per_nation = defaultdict(list)
    for (nk, _sk), u4 in rev.items():
        if u4 > 0:
            per_nation[nk].append(u4)
    assert {r.nationkey for r in rows} == set(per_nation)
    for r in rows:
        vals = per_nation[r.nationkey]
        n = len(vals)
        s = sum(vals)
        ln_sum = sum(round(1_000_000 * math.log(v)) for v in vals)
        assert r.n_suppliers == n
        assert r.total_u4 == s
        assert r.sum_ln_micro == ln_sum
        expected = round(
            1_000_000 * (1 - math.exp(ln_sum / n / 1_000_000) / (s / n))
        )
        assert r.atkinson_micro == expected
        # Atkinson(eps=1) lives in [0, 1): geomean <= mean (AM-GM)
        assert 0 <= r.atkinson_micro < 1_000_000
