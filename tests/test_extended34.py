"""Semantic property tests for extension pack 34 (extended34.py)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_did_cell_identities_and_placebo(spark):
    rows = QUERIES["events_diff_in_diff"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.did_micro == (r.treat_post_micro - r.treat_pre_micro) - (
        r.ctrl_post_micro - r.ctrl_pre_micro
    )
    # hash-random treatment: the placebo effect is small relative to the
    # cell rates (no systematic difference between parity cohorts)
    scale = max(r.treat_post_micro, r.ctrl_post_micro)
    assert abs(r.did_micro) < scale // 2
    for v in (
        r.treat_pre_micro,
        r.treat_post_micro,
        r.ctrl_pre_micro,
        r.ctrl_post_micro,
    ):
        assert v > 0


def test_stratified_ate_weighting(spark):
    rows = QUERIES["events_stratified_ate"].fn(spark, SF_DIR).collect()
    assert rows
    wsum = sum((r.n_t + r.n_c) * r.effect_micro for r in rows)
    wtot = sum(r.n_t + r.n_c for r in rows)
    for r in rows:
        assert r.n_t > 0 and r.n_c > 0  # common support enforced
        assert 0 <= r.conv_t <= r.n_t and 0 <= r.conv_c <= r.n_c
        assert (
            r.effect_micro
            == 1_000_000 * r.conv_t // r.n_t - 1_000_000 * r.conv_c // r.n_c
        )
        assert r.ate_micro == rows[0].ate_micro
    # python // floors; replicate both engines' trunc-toward-zero
    q = abs(wsum) // wtot
    trunc = q if wsum >= 0 else -q
    assert rows[0].ate_micro == trunc
    # placebo: random treatment keeps |ATE| well under the base rate
    assert abs(rows[0].ate_micro) < 250_000


def test_txn_log_replay_excludes_removed_segment(spark):
    rows = QUERIES["source_txn_log_replay"].fn(spark, SF_DIR).collect()
    types = {r.event_type for r in rows}
    assert types == {"click", "purchase"}  # 'view' was removed by commit 3
    e = load(spark, SF_DIR, "events")
    expect = {
        r.event_type: (r.n, r.u)
        for r in e.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for r in rows:
        assert (r.n_events, r.n_users) == expect[r.event_type]


def test_md5_parity_cohorts_are_balanced(spark):
    e = load(spark, SF_DIR, "events")
    users = [r.user_id for r in e.select("user_id").distinct().collect()]
    treat = sum(
        1
        for u in users
        if int(hashlib.md5(f"did_{u}".encode()).hexdigest()[:15], 16) % 2 == 1
    )
    # parity split is near-balanced on this population
    assert abs(treat - len(users) / 2) < len(users) * 0.2
