"""The distributed global-rank helpers (plans/global_rank.py, round 9):
bucket-stitch exact row_number / top-k / closed-form NTILE over
entity-scale relations, verified against Spark's own global window
functions on small data (where the single-task reference is safe)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.global_rank import (
    bucketed_global_cumsum,
    bucketed_global_rank,
    bucketed_global_topk,
    closed_form_ntile,
)


def _entity_df(spark, n=97):
    # non-uniform values with heavy ties + negatives; id completes the order
    return (
        spark.range(n)
        .groupBy("id")
        .agg(((F.first("id") * 37 % 11) * 13 - 26).cast("long").alias("v"))
    )


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("bits", [0, 3])
def test_bucketed_global_rank_matches_global_window(spark, descending, bits):
    df = _entity_df(spark)
    val = F.desc("v") if descending else F.asc("v")
    w = Window.orderBy(val, F.asc("id"))
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in bucketed_global_rank(
            df, "v", [F.asc("id")], descending=descending, bucket_bits=bits
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("k", [1, 7, 500])
def test_bucketed_global_topk_matches_filtered_rank(spark, k):
    df = _entity_df(spark)
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    expect = {
        (r["id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }
    got = {
        (r["id"], r["rn"])
        for r in bucketed_global_topk(
            df, "v", [F.asc("id")], k, bucket_bits=2
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (10, 4), (97, 10), (5, 5)])
def test_closed_form_ntile_matches_spark_ntile(spark, n, k):
    df = spark.range(n).groupBy("id").agg(F.first("id").alias("v"))
    w = Window.orderBy("v")
    expect = {
        r["id"]: r["t"] for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    ranked = bucketed_global_rank(df, "v", [], descending=False)
    got = {
        r["id"]: r["t"]
        for r in ranked.withColumn(
            "t", closed_form_ntile(F.col("rn"), F.lit(n).cast("long"), k)
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("frame_end", [0, -1])
@pytest.mark.parametrize("bits", [0, 3])
def test_bucketed_global_cumsum_matches_global_window(
    spark, descending, frame_end, bits
):
    df = _entity_df(spark).withColumn("wgt", (F.col("id") % 5 + 1).cast("long"))
    val = F.desc("v") if descending else F.asc("v")
    w = Window.orderBy(val, F.asc("id")).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    expect = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("wgt").over(w), F.lit(0))
        ).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in bucketed_global_cumsum(
            df,
            "v",
            [F.asc("id")],
            [("cum", "wgt")],
            descending=descending,
            bucket_bits=bits,
            frame_end=frame_end,
        ).collect()
    }
    assert got == expect


def test_rank_plan_has_no_whole_relation_window(spark):
    """The only unpartitioned window in the helper's plan is the bucket-
    grid cumsum; the per-row ranking window must be hash-partitioned."""
    df = _entity_df(spark)
    plan = bucketed_global_rank(
        df, "v", [F.asc("id")], bucket_bits=3
    )._jdf.queryExecution().executedPlan().toString()
    # the in-bucket window carries the bucket key in its partition spec
    assert "__gr_bkt" in plan
