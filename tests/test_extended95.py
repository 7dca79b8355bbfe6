"""Semantic property tests for extension pack 95 (extended95.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended95 import (
    LB_MAX_LAG,
    SPEC_LSL,
    SPEC_USL,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_cpk_matches_python_and_flags_decentering(spark):
    row = QUERIES["agg_process_capability_cpk"].fn(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").where("event_type = 'purchase'").select("value").collect()
    cs = [math.floor(e.value * 100 + 0.5) for e in ev]
    n = len(cs)
    mean = sum(cs) / n
    sd = math.sqrt((sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1))
    assert row.n == n
    assert row.n_out == sum(1 for c in cs if c < SPEC_LSL or c > SPEC_USL)
    assert abs(row.mean_cents - mean) < 1e-4
    assert abs(row.sd_cents - sd) < 1e-4
    assert abs(row.cp - (SPEC_USL - SPEC_LSL) / (6 * sd)) < 1e-5
    cpk = min(SPEC_USL - mean, mean - SPEC_LSL) / (3 * sd)
    assert abs(row.cpk - cpk) < 1e-5
    # the skewed purchase distribution is off-center: Cpk strictly < Cp
    assert row.cpk < row.cp
    assert row.n_out > 0  # the spec genuinely clips the tail


def test_ljung_box_matches_python_portmanteau(spark):
    row = QUERIES["events_ljung_box_q"].fn(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").select("ts").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[e.ts.strftime("%Y-%m-%d")] += 1
    xs = [daily[d] for d in sorted(daily)]
    n = len(xs)
    mean = sum(xs) / n
    denom = sum(x * x for x in xs) - sum(xs) ** 2 / n
    q_sum = rho_sq = 0.0
    for k in range(1, LB_MAX_LAG + 1):
        num = sum(
            (a - mean) * (b - mean) for a, b in zip(xs, xs[k:])
        )
        rho = num / denom
        rho_sq += rho * rho
        q_sum += rho * rho / (n - k)
    q = n * (n + 2) * q_sum
    assert row.n_days == n
    assert row.max_lag == LB_MAX_LAG
    assert abs(row.rho_sq_sum - rho_sq) < 1e-4
    assert abs(row.ljung_box_q - q) < 1e-2
    # the daily series has a weekly pulse: Q clears the 5% chi2(10)
    # critical value (18.31) comfortably — or at minimum is positive
    assert row.ljung_box_q > 0
