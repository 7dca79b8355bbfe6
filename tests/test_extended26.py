"""Semantic property tests for extension pack 26 (extended26.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.operators.extended26 import (
    B_REPLICATES,
    _POISSON_CDF_MICRO,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_bootstrap_ci_brackets_the_point(spark):
    rows = QUERIES["agg_bootstrap_ci_revenue"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.b_replicates == B_REPLICATES
    o = load(spark, SF_DIR, "orders")
    assert r.n_rows == o.count()
    folded = o.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10000").alias("u")
    ).agg(F.sum("u").alias("s"), F.count("*").alias("n")).collect()[0]
    assert r.point_micro == 1_000_000 * folded.s // folded.n
    assert r.ci_lo_micro < r.ci_hi_micro
    assert r.ci_lo_micro <= r.point_micro <= r.ci_hi_micro
    # a mean-of-~15k CI is tight: width well under 10% of the point
    assert (r.ci_hi_micro - r.ci_lo_micro) < r.point_micro // 10


def test_poisson_weight_table_is_a_cdf():
    assert list(_POISSON_CDF_MICRO) == sorted(_POISSON_CDF_MICRO)
    assert 0 < _POISSON_CDF_MICRO[0] < 1_000_000
    assert _POISSON_CDF_MICRO[-1] < 1_000_000
    # the weights average ~1: E[w] within 2% of 1.0 under the table
    probs = []
    prev = 0
    for t in _POISSON_CDF_MICRO:
        probs.append((t - prev) / 1e6)
        prev = t
    probs.append(1 - prev / 1e6)  # weight 8 tail
    ew = sum(k * p for k, p in enumerate(probs))
    assert abs(ew - 1.0) < 0.02


def test_jackknife_identities(spark):
    rows = QUERIES["agg_jackknife_loo_nation"].fn(spark, SF_DIR).collect()
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("g"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10000").alias("u"),
        )
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("u").alias("s"))
        .collect()
    )
    k = len(per)
    assert len(rows) == k
    N = sum(p.n for p in per)
    S = sum(p.s for p in per)
    theta = 1_000_000 * S // N
    by = {p.g: p for p in per}
    for r in rows:
        p = by[r.nationkey]
        assert r.n_group == p.n
        loo = 1_000_000 * (S - p.s) // (N - p.n)
        assert r.loo_mean_micro == loo
        assert r.pseudo_value_micro == k * theta - (k - 1) * loo


def test_capture_recapture_estimates_the_universe(spark):
    rows = QUERIES["agg_capture_recapture_ngrams"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.n_ab <= min(r.n_a, r.n_b)
    assert r.n_hat == (r.n_a * r.n_b) // r.n_ab
    assert r.n_hat >= max(r.n_a, r.n_b)
    # Lincoln-Petersen with ~10% captures lands within 25% of truth here
    assert abs(r.n_hat - r.true_distinct) < r.true_distinct // 4
    # independent salts: expected overlap is 1% of truth, not a fixed 5%
    assert r.n_ab < (r.true_distinct * 3) // 100
