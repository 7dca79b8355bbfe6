"""Window functions (SURVEY.md §2.5): ranking, lag/lead, running and
range frames, ntile/percent_rank/cume_dist.

Scale posture: every window partitions by a real key (custkey/user_id) so
work distributes; the only unpartitioned window (window_ntile) runs over a
bounded dimension-sized input — a global-ORDER window over a fact table
would serialize onto one task and is forbidden (SURVEY.md §7.6).
All orderings carry a unique tie-break key so rank/lag results are
deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey,
               o_orderkey,
               o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
               DENSE_RANK() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS drnk
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number/rank/dense_rank."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id,
           user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           date_diff('second',
                     LAG(ts) OVER w,
                     ts) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each user's event timeline (SURVEY.md §2.5)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts_str"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("secs_since_prev"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS orders_so_far
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame aggregate per customer.

    Both engines accumulate in identical frame order, and o_totalprice has
    2 exact decimals, so the running sum is on the 2-decimal grid —
    round(·,2) is boundary-safe.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).alias("orders_so_far"),
    )


@register(
    "window_sliding_value",
    oracle="""
    SELECT event_id,
           user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
                 2) AS value_1h,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS events_1h
    FROM events
    """,
)
def window_sliding_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing 1-hour sum per user (SURVEY.md §2.5).

    The ORDER BY key is epoch seconds (long) on both engines so the range
    arithmetic is integral and identical.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("value_1h"),
        F.count("*").over(w).alias("events_1h"),
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS acctbal_quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over account balance.

    De-globalized (r8; bucket-stitched r10): the (c_acctbal, c_custkey)
    ordering is a total order, so rank == row_number == the exact
    BUCKET-STITCH global rank (plans/global_rank.py — the r8
    distinct-acctbal histogram tracked the customer count since balances
    are near-unique; 16-unit balance buckets bound the only single-task
    window by the BALANCE RANGE, ~690 buckets at any SF), and all three
    window functions are closed forms of (rn, n): ntile(4) via the
    first-n%k-buckets rule, percent_rank = (rn-1)/(n-1), cume_dist =
    rn/n. No customer row — and no customer-scale grid — ever funnels
    through a single-task sort.
    """
    from classification_problem_with_pyspark_spark.plans.global_rank import (
        bucketed_global_rank,
        closed_form_ntile,
    )

    c = load(spark, sf_dir, "customer")
    tot = c.agg(F.count("*").cast("long").alias("n"))
    ranked = bucketed_global_rank(
        c.select("c_custkey", "c_acctbal").crossJoin(F.broadcast(tot)),
        "c_acctbal",
        [F.asc("c_custkey")],
        descending=False,
        bucket_bits=4,
        out="rn",
    )
    return ranked.select(
        "c_custkey",
        closed_form_ntile(F.col("rn"), F.col("n"), 4).alias("acctbal_quartile"),
        # greatest(1, n-1): percent_rank() returns 0.0 (not NULL) for a
        # 1-row relation — guard the closed form the same way as ntile.
        F.round((F.col("rn") - 1) / F.greatest(F.lit(1), F.col("n") - 1), 9).alias(
            "pct_rank"
        ),
        F.round(F.col("rn") / F.col("n"), 9).alias("cume"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           o_totalprice,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-partition
    frame (SURVEY.md §2.5). The UNBOUNDED...UNBOUNDED frame is spelled out
    because last_value's DEFAULT frame ends at CURRENT ROW — the classic
    silent-wrong-answer; both engines get the same explicit frame.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )
