"""Source/sink tests (SURVEY.md §2.1): CSV loader (the reference's canonical
entry point) with pinned-schema and inferSchema paths, parquet sink, and the
scale-posture assertion that a hive-partitioned write gives readers static
partition pruning.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.explain import formatted_plan
from classification_problem_with_pyspark_spark.sources.catalog import (
    SCHEMAS,
    load,
    read_csv,
    write_parquet,
)
from tests.conftest import SF_DIR_SMOKE

_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture()
def scratch():
    d = os.path.join(_TMP, f"sources_{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip_pinned_schema(spark, scratch):
    ref = load(spark, SF_DIR_SMOKE, "customer")
    csv_dir = os.path.join(scratch, "customer_csv")
    ref.write.mode("overwrite").option("header", "true").csv(csv_dir)

    back = read_csv(spark, csv_dir, table="customer")
    assert back.schema == SCHEMAS["customer"]
    assert back.count() == ref.count()
    assert back.agg(F.sum("c_custkey")).first()[0] == ref.agg(F.sum("c_custkey")).first()[0]


def test_csv_infer_schema_matches_notebook_behavior(spark, scratch):
    ref = load(spark, SF_DIR_SMOKE, "region")
    csv_dir = os.path.join(scratch, "region_csv")
    ref.write.mode("overwrite").option("header", "true").csv(csv_dir)

    inferred = read_csv(spark, csv_dir, infer_schema=True)
    assert inferred.count() == ref.count()
    # inferSchema lands on integer for the key column, as the notebook relies on
    assert dict(inferred.dtypes)["r_regionkey"] == "int"


def test_partitioned_write_prunes_on_read(spark, scratch):
    events = load(spark, SF_DIR_SMOKE, "events")
    out = os.path.join(scratch, "events_by_type")
    write_parquet(events, out, partition_by=("event_type",))

    # hive layout on disk: one directory per partition value
    parts = [p for p in os.listdir(out) if p.startswith("event_type=")]
    assert len(parts) >= 2, parts

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = formatted_plan(back)
    # static partition pruning: the scan's PartitionFilters carry the
    # predicate, so non-matching directories are never opened.
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan
    assert back.count() == events.where(F.col("event_type") == "click").count()


def test_compaction_produces_exact_file_count(spark, scratch):
    from classification_problem_with_pyspark_spark.sources.catalog import compact_parquet

    src = os.path.join(scratch, "fragmented")
    load(spark, SF_DIR_SMOKE, "events").repartition(37).write.parquet(src)
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 37

    dst = os.path.join(scratch, "compacted")
    compact_parquet(spark, src, dst, num_files=4)
    assert len([f for f in os.listdir(dst) if f.endswith(".parquet")]) == 4
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()
