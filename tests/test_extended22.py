"""Semantic property tests for extension pack 22 (extended22.py)."""

from __future__ import annotations

from classification_problem_with_pyspark_spark.operators.extended22 import ALLOWED
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_conformance_transition_flags_match_model(spark):
    rows = QUERIES["events_conformance_transitions"].fn(spark, SF_DIR).collect()
    allowed = set(ALLOWED)
    assert rows
    for r in rows:
        assert r.is_allowed == (1 if (r.cur, r.nxt) in allowed else 0), r
        assert r.n_transitions > 0
    # a 5-state random walk observes every transition type
    assert len(rows) == 25


def test_conformance_levels_agree(spark):
    # transition-level violations and trace-level conforming counts must
    # describe the same pair multiset
    trans = QUERIES["events_conformance_transitions"].fn(spark, SF_DIR).collect()
    fit = QUERIES["events_conformance_fitness"].fn(spark, SF_DIR).collect()
    total_ok_trans = sum(r.n_transitions for r in trans if r.is_allowed)
    total_ok_fit = sum(r.n_conforming for r in fit)
    assert total_ok_trans == total_ok_fit
    assert sum(r.n_transitions for r in trans) == sum(r.n_transitions for r in fit)


def test_fitness_bounds_and_distribution(spark):
    rows = QUERIES["events_conformance_fitness"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    assert len(rows) == e.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r.n_conforming <= r.n_transitions
        assert r.fitness_micro == 1_000_000 * r.n_conforming // r.n_transitions
    # random-walk traces against a 10/25 model: mean fitness ~0.4
    mean_fit = sum(r.fitness_micro for r in rows) / len(rows)
    assert 300_000 < mean_fit < 500_000
