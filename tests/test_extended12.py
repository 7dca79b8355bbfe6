"""Semantic property tests for extension pack 12 (extended12.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.explain import formatted_plan
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_pipe_syntax_plans_like_ansi(spark):
    # the pipe form must parse to the same physical shape as ANSI: one
    # join, partial aggregation, and the quantity filter pushed to scan
    df = QUERIES["relational_pipe_syntax"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "Join" in plan and "CartesianProduct" not in plan, plan
    assert "l_quantity" in plan.split("PushedFilters")[-1][:400] or "25" in plan, plan


def test_pipe_postagg_where_acts_as_having(spark):
    rows = QUERIES["relational_pipe_syntax"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.n_items > 100 for r in rows)
    keys = [(r.l_returnflag, r.o_orderpriority) for r in rows]
    assert keys == sorted(keys)


def test_markov_model_trained_on_prefix_only(spark):
    rows = QUERIES["events_markov_prediction"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per current state
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test, r
        assert r.accuracy_micro == 1_000_000 * r.n_correct // r.n_test, r
        assert r.predicted in {"click", "error", "purchase", "signup", "view"}
    # temporal split: test volume is ~the tail week of a 30-day corpus
    total_test = sum(r.n_test for r in rows)
    e = load(spark, SF_DIR, "events")
    n_events = e.count()
    assert 0 < total_test < n_events // 2


def test_dataset_diff_partitions_the_corpus(spark):
    rows = QUERIES["audit_dataset_diff"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    d = load(spark, SF_DIR, "documents")
    per_lang = {
        r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        # every v1 doc is classified exactly once; v2 adds nothing
        assert r.n_added == 0
        assert r.n_removed + r.n_changed + r.n_unchanged == per_lang[r.lang], r
        assert r.n_removed > 0 and r.n_changed > 0  # the fixture guarantees both
