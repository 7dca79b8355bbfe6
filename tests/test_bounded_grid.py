"""The shared bounded-grid cumsum helper (plans/bounded_grid.py, round 8):
the one place the distinct-value-grid family spells its single-partition
ordered window, with the boundedness argument enforced as a plan-shape
assertion instead of a ratchet-allowlist prose note."""

import pytest
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum


def test_grid_cumsum_running_total(spark):
    grid = (
        spark.range(6)
        .select((F.col("id") % 3).alias("k"), F.lit(1).alias("c"))
        .groupBy("k")
        .agg(F.sum("c").alias("n"))
    )
    rows = {
        r["k"]: r["cum"]
        for r in grid_cumsum(grid, ["k"], [("cum", "n")], keep=["k"]).collect()
    }
    assert rows == {0: 2, 1: 4, 2: 6}


def test_grid_cumsum_exclusive_frame_coalesces_first_row_to_zero(spark):
    grid = spark.range(4).groupBy("id").agg(F.count("*").alias("c"))
    rows = {
        r["id"]: r["before"]
        for r in grid_cumsum(
            grid, ["id"], [("before", "c")], keep=["id"], frame_end=-1
        ).collect()
    }
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3}


def test_grid_cumsum_rejects_unaggregated_relation(spark):
    fact = spark.range(10).select(F.col("id").alias("score"))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(fact, ["score"], [("cum", "score")], keep=["score"])


def test_grid_cumsum_accepts_distinct(spark):
    grid = spark.range(8).select((F.col("id") % 4).alias("v")).distinct()
    out = grid_cumsum(grid, [F.desc("v")], [("cum", "v")], keep=["v"])
    assert {r["v"]: r["cum"] for r in out.collect()} == {3: 3, 2: 5, 1: 6, 0: 6}
