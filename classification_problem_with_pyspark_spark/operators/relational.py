"""Projections, filters, predicates, null handling, CASE WHEN (SURVEY.md §2.2).

These are the canonical EDA/cleaning steps of the reference workflow
(select/withColumn/where/na.drop/na.fill — SURVEY.md §2.2 marks all of
them "R"). Each query is declarative DataFrame API: Catalyst pushes the
filters into the parquet scan and prunes columns, so at 100 TB the scan
reads only the referenced row-groups/columns (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "project_rename",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS customer_name,
           c_mktsegment AS segment,
           c_acctbal AS acctbal
    FROM customer
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select + rename — pure projection, no shuffle, full pruning."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )


@register(
    "computed_column",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumn-style computed expressions (reference: feature derivation).

    Rounding rule (SURVEY.md §7.5): round AT or beyond the exact decimal
    precision of the value — a product of two 2-decimal operands is exact
    at 4 decimals, so round(·,4) never sits on a rounding boundary and
    both engines produce bit-identical doubles. Rounding below the exact
    precision (e.g. 2) lands on .xx5 boundaries where HALF_UP vs
    float-representation differences diverge.
    """
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc, 4).alias("disc_price"),
        F.round(disc * (1 + F.col("l_tax")), 6).alias("charge"),
    )


@register(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R' AND l_discount >= 0.05
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean-AND predicates; all pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 1000 AND 8000
      AND c_name LIKE '%5%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + LIKE predicates (SURVEY.md §2.2)."""
    c = load(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(1000, 8000)
        & F.col("c_name").like("%5%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "null_handling",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           (NULLIF(o_orderstatus, 'P') IS NULL) AS was_pending,
           GREATEST(o_totalprice, 100000.0) AS floored_price,
           LEAST(o_totalprice, 100000.0) AS capped_price
    FROM orders
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL predicates + coalesce/nullif/greatest/least (SURVEY.md §2.2).

    The testdata carries no physical NULLs, so nulls are manufactured with
    NULLIF — same cleaning surface (na.fill ≡ coalesce) as the reference's
    canonical null-handling step, but oracle-checkable.
    """
    o = load(spark, sf_dir, "orders")
    status_nulled = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.coalesce(status_nulled, F.lit("PENDING")).alias("status_norm"),
        status_nulled.isNull().alias("was_pending"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored_price"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
    )


@register(
    "case_when_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           o_orderstatus,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY 1, 2
    """,
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + groupBy (reference: binning a numeric feature)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"), F.col("o_orderstatus"))
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "relational_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_linenumber <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_linenumber <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def relational_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide measure columns to long (id, measure, val) rows
    — the inverse of agg_pivot and the standard reshape before per-measure
    aggregation or plotting.

    Spark's native `unpivot` plans an Expand node: one scan emits k rows
    per input row with NO join or shuffle — at 100 TB this beats the
    UNION-of-selects formulation (which scans the fact table k times;
    that formulation is kept as the oracle precisely because it is the
    semantic definition).
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal_or_null,
           ROW_NUMBER() OVER (
               ORDER BY (CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END)
                        DESC NULLS LAST,
                        s_suppkey
           ) AS pos
    FROM supplier
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST/LAST ordering semantics made hash-observable: negative
    balances become NULL, then rows are ranked DESC NULLS LAST with a key
    tie-break. The driver's comparison is order-insensitive, so the sort
    is materialized as a rank column — if either engine ordered nulls
    differently the rank VALUES would diverge.
    """
    s = load(spark, sf_dir, "supplier")
    bal = F.when(F.col("s_acctbal") < 0, None).otherwise(F.col("s_acctbal"))
    # De-globalized (r8; bucket-stitched r10): the r8 distinct-balance
    # histogram tracked the supplier count (near-unique balances — caught
    # by the grid cardinality tripwire). DESC NULLS LAST decomposes: rank
    # the non-null rows bucket-stitched on the balance (16-unit buckets
    # bound the only single-task window by the BALANCE RANGE), then rank
    # the NULL cell's rows by key with the non-null count as the offset —
    # the nulls-ordering semantics stay hash-observable with no
    # whole-relation (or entity-scale-grid) sort task anywhere.
    from classification_problem_with_pyspark_spark.plans.global_rank import (
        bucketed_global_rank,
    )

    rows = s.select("s_suppkey", bal.alias("bal_or_null"))
    nn = rows.where(F.col("bal_or_null").isNotNull())
    ranked_nn = bucketed_global_rank(
        nn,
        "bal_or_null",
        [F.asc("s_suppkey")],
        descending=True,
        bucket_bits=4,
        out="pos",
    ).select("s_suppkey", "bal_or_null", F.col("pos").cast("long").alias("pos"))
    n_nn = nn.agg(F.count("*").cast("long").alias("__n_nn"))
    ranked_null = (
        bucketed_global_rank(
            rows.where(F.col("bal_or_null").isNull()).crossJoin(F.broadcast(n_nn)),
            "s_suppkey",
            [],
            descending=False,
            # r11: suppkey is an ENTITY id — fixed 2^8 buckets would grow
            # the grid with the supplier count; range-normalized fixed-K
            # buckets cap it at ≤1k rows at any scale.
            value_range_k=1024,
            out="__rn",
        )
        .select(
            "s_suppkey",
            "bal_or_null",
            (F.col("__n_nn") + F.col("__rn")).cast("long").alias("pos"),
        )
    )
    return ranked_nn.unionAll(ranked_null)
