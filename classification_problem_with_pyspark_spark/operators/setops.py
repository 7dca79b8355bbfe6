"""Set operations + deterministic dedup (SURVEY.md §2.7).

UNION ALL is shuffle-free; UNION DISTINCT / INTERSECT / EXCEPT each cost
one shuffle on the full row — at scale prefer pre-aggregated or key-only
inputs (as these queries model: the inputs are key projections).

dedup_exact uses the window-min formulation, NOT dropDuplicates:
dropDuplicates keeps an arbitrary row per key (nondeterministic under
partition scheduling), which can never hash-match an oracle. The window
pick is also the scalable pattern — one shuffle by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register(
    "setop_union_all",
    oracle="""
    SELECT o_orderkey, 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (orders both finished AND urgent appear
    twice, distinguished by src)."""
    o = load(spark, sf_dir, "orders")
    fin = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("finished").alias("src")
    )
    urg = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    return fin.unionByName(urg)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): set semantics over the same two branches."""
    o = load(spark, sf_dir, "orders")
    fin = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    urg = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return fin.unionByName(urg).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 1997."""
    o = load(spark, sf_dir, "orders")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.where(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


@register(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who ordered but never finished one."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_custkey").subtract(
        o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup-by-key: first event per (user, type) by time.

    The reference's canonical cleaning step is dropDuplicates
    (SURVEY.md §2.7); this is its deterministic, scale-safe equivalent.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", TS_FMT).alias("ts_str"),
        )
    )
