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


def test_grid_rank_row_number_and_ntile(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank

    grid = spark.range(4).groupBy("id").agg(F.count("*").alias("c"))
    rn = {r["id"]: r["rk"] for r in grid_rank(grid, [F.desc("id")], "rk").collect()}
    assert rn == {3: 1, 2: 2, 1: 3, 0: 4}
    nt = {
        r["id"]: r["half"]
        for r in grid_rank(grid, ["id"], "half", fn=F.ntile(2)).collect()
    }
    assert nt == {0: 1, 1: 1, 2: 2, 3: 2}


def test_grid_rank_rejects_unaggregated_relation(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank

    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_rank(spark.range(5), ["id"], "rk")


def test_grid_shift_lag_and_lead(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_shift

    grid = spark.range(3).groupBy("id").agg((F.first("id") * 10).alias("v"))
    out = {
        r["id"]: (r["prev"], r["next"])
        for r in grid_shift(
            grid, ["id"], [("prev", "v", -1), ("next", "v", 1)]
        ).collect()
    }
    assert out == {0: (None, 10), 1: (0, 20), 2: (10, None)}


def test_grid_cumsum_rolling_frame_and_column_aggregates(spark):
    grid = (
        spark.range(5)
        .groupBy("id")
        .agg((F.first("id") + 1).alias("v"))
    )
    out = {
        r["id"]: (r["n"], r["mx"], r["s"])
        for r in grid_cumsum(
            grid,
            ["id"],
            [("n", F.count("*")), ("mx", F.max("v")), ("s", "v")],
            keep=["id"],
            frame_start=-1,
        ).collect()
    }
    # 2-row rolling frame: count, max(v), sum(v) over {prev, current}
    assert out == {
        0: (1, 1, 1),
        1: (2, 2, 3),
        2: (2, 3, 5),
        3: (2, 4, 7),
        4: (2, 5, 9),
    }


def test_grid_cumsum_running_max(spark):
    grid = (
        spark.range(4)
        .groupBy("id")
        .agg((F.first("id") * 7 % 5).alias("v"))  # 0,2,4,1
    )
    out = {
        r["id"]: r["mx"]
        for r in grid_cumsum(
            grid, ["id"], [("mx", F.max("v"))], keep=["id"]
        ).collect()
    }
    assert out == {0: 0, 1: 2, 2: 4, 3: 4}


def test_grid_cumsum_accepts_distinct(spark):
    grid = spark.range(8).select((F.col("id") % 4).alias("v")).distinct()
    out = grid_cumsum(grid, [F.desc("v")], [("cum", "v")], keep=["v"])
    assert {r["v"]: r["cum"] for r in out.collect()} == {3: 3, 2: 5, 1: 6, 0: 6}


def test_grid_cumsum_rejects_fact_crossjoin_broadcast_aggregate(spark):
    """The r8 substring check's loophole (ADVICE r8 medium): a raw
    fact-scale relation cross-joined with a tiny broadcast aggregate
    total contains an Aggregate node SOMEWHERE in the plan, but the
    fact branch still funnels every row through one WindowExec task.
    The r9 lineage walk requires ALL join branches bounded."""
    fact = spark.range(10).select(F.col("id").alias("score"))
    tot = fact.agg(F.count("*").alias("n"))
    leaky = fact.crossJoin(F.broadcast(tot))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(leaky, ["score"], [("cum", "score")], keep=["score"])


def test_grid_cumsum_rejects_union_with_unbounded_branch(spark):
    agg = spark.range(6).groupBy((F.col("id") % 2).alias("v")).agg(
        F.count("*").alias("c")
    )
    mixed = agg.select("v").unionAll(spark.range(3).select(F.col("id").alias("v")))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(mixed, ["v"], [("cum", "v")], keep=["v"])


def test_grid_cumsum_accepts_join_of_two_aggregates_and_literals(spark):
    a = spark.range(6).groupBy((F.col("id") % 3).alias("k")).agg(
        F.count("*").alias("ca")
    )
    b = spark.range(6).groupBy((F.col("id") % 3).alias("k")).agg(
        F.sum("id").alias("sb")
    )
    lit = spark.createDataFrame([(0, 10), (1, 20), (2, 30)], ["k", "w"])
    grid = a.join(b, "k").join(lit, "k")
    out = grid_cumsum(grid, ["k"], [("cum", "ca")], keep=["k", "sb", "w"])
    assert {r["k"]: r["cum"] for r in out.collect()} == {0: 2, 1: 4, 2: 6}
