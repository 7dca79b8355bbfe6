"""Semantic property tests for extension pack 52 (extended52.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended52 import (
    REL_LIFT,
    VALUE_GATE,
    Z_ALPHA,
    Z_POWER,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_ratio_delta_method_matches_python_replay(spark):
    rows = {r.event_type: r for r in QUERIES["agg_ratio_delta_method"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "user_id", "value").collect()
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for e in ev:
        u = per[e.event_type][e.user_id]
        u[0] += math.floor(e.value * 100 + 0.5)
        u[1] += 1
    assert set(rows) == set(per)
    for typ, users in per.items():
        xs = [v[0] for v in users.values()]
        ys = [v[1] for v in users.values()]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        r = rows[typ]
        assert (r.n_users, r.total_cents, r.total_events) == (n, sx, sy)
        assert abs(r.ratio - sx / sy / 100.0) < 1e-6
        ratio = sx / sy
        sxx = (sum(x * x for x in xs) - sx * sx / n) / (n - 1)
        syy = (sum(y * y for y in ys) - sy * sy / n) / (n - 1)
        sxy = (sum(x * y for x, y in zip(xs, ys)) - sx * sy / n) / (n - 1)
        var_r = (sxx - 2 * ratio * sxy + ratio * ratio * syy) / n
        se = math.sqrt(var_r) / (sy / n) / 100.0
        assert abs(r.se_ratio - se) < 1e-5
        assert r.se_ratio > 0
        # the SE is small relative to the ratio at this n (sanity of scale)
        assert r.se_ratio < r.ratio


def test_power_analysis_matches_python_formulas(spark):
    rows = {r.event_type: r for r in QUERIES["agg_power_analysis_mde"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "value").collect()
    agg = defaultdict(lambda: [0, 0])
    for e in ev:
        agg[e.event_type][0] += 1
        agg[e.event_type][1] += 1 if e.value > VALUE_GATE else 0
    z = Z_ALPHA + Z_POWER
    assert set(rows) == set(agg)
    for typ, (n, hits) in agg.items():
        r = rows[typ]
        p = hits / n
        assert (r.n, r.hits) == (n, hits)
        assert abs(r.p_hat - p) < 1e-6
        assert abs(r.mde_abs - z * math.sqrt(2 * p * (1 - p) / n)) < 1e-5
        n_req = math.ceil(2 * p * (1 - p) * z * z / ((REL_LIFT * p) ** 2))
        assert abs(r.n_required_per_arm - n_req) <= 1  # ceil boundary fp noise
        # detecting a smaller relative effect than the current MDE needs
        # more samples than we have (the sizing query's raison d'être)
        if REL_LIFT * p < r.mde_abs:
            assert r.n_required_per_arm > n
