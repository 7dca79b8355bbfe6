"""Semantic property tests for extension pack 104 (extended104.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _per_type_cents(spark):
    ev = load(spark, SF_DIR, "events").select("event_type", "event_id", "value").collect()
    per = defaultdict(list)
    for e in ev:
        per[e.event_type].append((math.floor(e.value * 100 + 0.5), e.event_id))
    for v in per.values():
        v.sort()
    return per


def test_feature_scaling_parameters_match_python(spark):
    rows = {r.event_type: r for r in QUERIES["ml_feature_scaling_suite"].fn(spark, SF_DIR).collect()}
    per = _per_type_cents(spark)
    assert set(rows) == set(per)
    for typ, vals in per.items():
        cs = [c for c, _ in vals]
        n = len(cs)
        r = rows[typ]
        assert r.n == n
        assert (r.min_c, r.max_c) == (min(cs), max(cs))
        assert r.median_c == cs[(n + 1) // 2 - 1]
        q1 = cs[(n + 3) // 4 - 1]
        q3 = cs[(3 * n + 1) // 4 - 1]
        assert r.iqr_c == q3 - q1
        mean = sum(cs) / n
        sd = math.sqrt((sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1))
        assert abs(r.mean_c - mean) < 1e-4
        assert abs(r.sd_c - sd) < 1e-4
        # scaler sanity: robust center inside the range, below the mean
        # on this right-skewed data
        assert r.min_c <= r.median_c <= r.max_c
        assert r.median_c < r.mean_c


def test_mean_excess_matches_python_pot(spark):
    rows = {r.event_type: r for r in QUERIES["agg_mean_excess_pot"].fn(spark, SF_DIR).collect()}
    per = _per_type_cents(spark)
    assert set(rows) == set(per)
    for typ, vals in per.items():
        cs = [c for c, _ in vals]
        n = len(cs)
        u = cs[(9 * n + 1) // 10 - 1]
        exceed = [c - u for c in cs if c > u]
        r = rows[typ]
        assert r.threshold_cents == u
        assert r.n_exceedances == len(exceed)
        assert r.total_excess_cents == sum(exceed)
        assert r.mean_excess_cents == sum(exceed) // len(exceed)
        assert r.max_excess_cents == max(exceed)
        # POT structure: ~10% of mass exceeds the p90 threshold
        assert abs(r.n_exceedances - n // 10) < n // 20
        assert r.mean_excess_cents > 0
