"""Semantic property tests for extension pack 19 (extended19.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_ltv_curve_laws(spark):
    rows = QUERIES["events_cohort_ltv_curve"].fn(spark, SF_DIR).collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    e = load(spark, SF_DIR, "events")
    total = (
        e.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    grand = 0
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_week)
        # no activity before the cohort's own week (first-purchase def)
        assert rs[0].age_week >= cohort
        # cumulative is a running sum of the per-week cents
        run = 0
        for r in rs:
            run += r.cents
            assert r.cum_cents == run, r
            assert r.active_users > 0
        grand += run
    # every purchase lands in exactly one cohort
    assert grand == total


def test_outage_runs_are_real_silences(spark):
    rows = QUERIES["events_outage_runs"].fn(spark, SF_DIR).collect()
    assert rows
    e = load(spark, SF_DIR, "events")
    for r in rows[:10]:
        assert r.gap_us > 5_400_000_000
        # no event of that type strictly inside the reported silence
        inside = (
            e.where(F.col("event_type") == r.event_type)
            .where((F.col("ts") > r.gap_start) & (F.col("ts") < r.gap_end))
            .count()
        )
        assert inside == 0, r


def test_schema_validation_partitions_and_rates(spark):
    rows = QUERIES["audit_props_schema_validation"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    per_type = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    seen: dict[str, int] = {}
    classes = set()
    for r in rows:
        seen[r.event_type] = seen.get(r.event_type, 0) + r.n
        classes.add(r.cls)
    assert seen == per_type  # every event classified exactly once
    assert classes == {"valid", "truncated", "wrong_type"}
    # injection rates: ~1/7 truncated, ~1/7 wrong type, rest valid
    total = sum(per_type.values())
    bad = sum(r.n for r in rows if r.cls != "valid")
    assert 0.2 < bad / total < 0.35
