"""Round-3 extension pack #100: the accumulating-snapshot fact and the
Fisher ideal index.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the accumulating-snapshot fact table (Kimball's third fact
type: one row per long-lived process instance whose milestone columns
fill in as the process advances — order placed → first shipment → last
shipment — with the lags between milestones as the process-health
measures) and the Fisher ideal price index (the geometric mean of
Laspeyres and Paasche, Fisher 1922 — the "ideal" that passes the
time-reversal test both one-sided indices fail, and what national
statistics actually publish) — re-expressed on the public PySpark
DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): milestones are MIN/MAX
ship dates per order with integer day lags; the snapshot census pins
per-priority milestone-lag distributions. Laspeyres and Paasche fold
exact integer cross-products of per-part period prices and
quantities; Fisher is ONE sqrt of their exact ratio product, ROUND-6
(the t-test discipline's single-close rule).

Scale posture (SURVEY.md §7.6): the snapshot is one groupBy over the
fact's natural key — the accumulating fact at 100 TB is MERGE-
maintained (the CDC key holds that leg), and this build is its
backfill; the index reduces to per-(part, period) aggregates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

FISHER_SPLIT = "1998-01-01"  # index periods: before/after


@register(
    "join_accumulating_snapshot",
    oracle="""
    WITH snap AS (
        SELECT o.o_orderkey AS k, o.o_orderpriority AS priority,
               CAST(o.o_orderdate AS DATE) AS placed_d,
               MIN(CAST(l.l_shipdate AS DATE)) AS first_ship_d,
               MAX(CAST(l.l_shipdate AS DATE)) AS last_ship_d,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, CAST(o.o_orderdate AS DATE)
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(datediff('day', placed_d, first_ship_d)) AS BIGINT)
               AS placed_to_first_days,
           CAST(SUM(datediff('day', first_ship_d, last_ship_d)) AS BIGINT)
               AS first_to_last_days,
           CAST(MAX(datediff('day', placed_d, last_ship_d)) AS BIGINT)
               AS worst_cycle_days,
           CAST(SUM(CASE WHEN first_ship_d = last_ship_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_single_shipment
    FROM snap
    GROUP BY priority
    ORDER BY priority
    """,
)
def join_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating snapshot (SURVEY.md §2.3): one row per order
    carrying its milestone dates — placed, first shipment, last
    shipment — and the lags between them, rolled up per priority.
    Kimball's THIRD fact type, completing the registry's trio: the
    transactional fact (lineitem itself), the periodic snapshot
    (`scd2_snapshot_grid`), and now the process-tracking fact whose
    milestone columns fill as the instance advances. The lag columns
    ARE the process health: placed→first measures reaction,
    first→last measures fulfillment spread, and the single-shipment
    count is the fraction of orders that never split. (Milestone
    lags here can be negative — this fixture's ship dates are
    synthetic and uncorrelated with order dates, which the snapshot
    reports honestly rather than clamping; the STRUCTURE, not the
    logistics, is the product.)

    Exactness: MIN/MAX dates, integer day lags, counts.

    Scale: one groupBy on the fact's natural key. In production the
    accumulating fact is MERGE-maintained as milestones land
    (`sink_cdc_changefeed_apply` holds the apply leg); this build is
    the backfill that bootstraps or repairs it.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("placed_d"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.to_date("l_shipdate").alias("ship_d")
    )
    snap = (
        o.join(li, "k")
        .groupBy("k", "priority", "placed_d")
        .agg(
            F.min("ship_d").alias("first_ship_d"),
            F.max("ship_d").alias("last_ship_d"),
            F.count("*").alias("n_lines"),
        )
    )
    return (
        snap.groupBy("priority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum(F.datediff("first_ship_d", "placed_d"))
            .cast("long")
            .alias("placed_to_first_days"),
            F.sum(F.datediff("last_ship_d", "first_ship_d"))
            .cast("long")
            .alias("first_to_last_days"),
            F.max(F.datediff("last_ship_d", "placed_d"))
            .cast("long")
            .alias("worst_cycle_days"),
            F.sum(
                F.when(F.col("first_ship_d") == F.col("last_ship_d"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_single_shipment"),
        )
        .orderBy("priority")
    )


@register(
    "agg_fisher_ideal_index",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey AS part,
               CASE WHEN l_shipdate < TIMESTAMP '{FISHER_SPLIT}' THEN 0
                    ELSE 1 END AS period,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS spend
        FROM lineitem
        GROUP BY l_partkey, CASE WHEN l_shipdate < TIMESTAMP '{FISHER_SPLIT}'
                                 THEN 0 ELSE 1 END
    ),
    both_t AS (  -- unit prices in micro-cents; parts present both periods
        SELECT p0.part,
               (10000 * p0.spend) // p0.q AS up0,
               (10000 * p1.spend) // p1.q AS up1,
               p0.q AS q0, p1.q AS q1
        FROM (SELECT * FROM pq WHERE period = 0) p0
        JOIN (SELECT * FROM pq WHERE period = 1) p1 ON p1.part = p0.part
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(up1 * q0) AS BIGINT) AS p1q0,
               CAST(SUM(up0 * q0) AS BIGINT) AS p0q0,
               CAST(SUM(up1 * q1) AS BIGINT) AS p1q1,
               CAST(SUM(up0 * q1) AS BIGINT) AS p0q1
        FROM both_t
    )
    SELECT n_parts,
           ROUND(CAST(p1q0 AS DOUBLE) / p0q0, 6) AS laspeyres,
           ROUND(CAST(p1q1 AS DOUBLE) / p0q1, 6) AS paasche,
           ROUND(sqrt((CAST(p1q0 AS DOUBLE) / p0q0)
                      * (CAST(p1q1 AS DOUBLE) / p0q1)), 6) AS fisher
    FROM sums
    """,
)
def agg_fisher_ideal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ideal index (SURVEY.md §2.4): the price index between the
    pre/post-{FISHER_SPLIT} periods over parts traded in BOTH —
    Laspeyres (base-period basket Σp₁q₀/Σp₀q₀), Paasche (current
    basket Σp₁q₁/Σp₀q₁), and Fisher = √(L·P), the geometric mean that
    passes the time-reversal test both one-sided indices fail (Fisher
    1922) and that statistical agencies publish. Completes
    `agg_price_index` (which holds a one-sided member) with the full
    index-number trio in one relation; L and P bracketing F is the
    structural identity the tests assert.

    Exactness: per-part unit prices as exact floor micro-cents;
    all four basket sums are exact integer cross-products; the ONLY
    float is the two ratios and one sqrt, ROUND-6 (the single-close
    discipline).

    Scale: the fact reduces to per-(part, period) aggregates first;
    the index arithmetic runs over the |parts|-row join of the two
    period relations.
    """
    li = load(spark, sf_dir, "lineitem")
    pq = (
        li.select(
            F.col("l_partkey").alias("part"),
            F.when(F.col("l_shipdate") < FISHER_SPLIT, 0).otherwise(1).alias(
                "period"
            ),
            F.col("l_quantity").cast("long").alias("q"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("part", "period")
        .agg(
            F.sum("q").cast("long").alias("q"),
            F.sum("c").cast("long").alias("spend"),
        )
    )
    p0 = pq.where(F.col("period") == 0).select(
        "part",
        F.expr("(10000 * spend) DIV q").alias("up0"),
        F.col("q").alias("q0"),
    )
    p1 = pq.where(F.col("period") == 1).select(
        "part",
        F.expr("(10000 * spend) DIV q").alias("up1"),
        F.col("q").alias("q1"),
    )
    sums = p0.join(p1, "part").agg(
        F.count("*").alias("n_parts"),
        F.sum(F.col("up1") * F.col("q0")).cast("long").alias("p1q0"),
        F.sum(F.col("up0") * F.col("q0")).cast("long").alias("p0q0"),
        F.sum(F.col("up1") * F.col("q1")).cast("long").alias("p1q1"),
        F.sum(F.col("up0") * F.col("q1")).cast("long").alias("p0q1"),
    )
    lasp = F.col("p1q0").cast("double") / F.col("p0q0")
    paas = F.col("p1q1").cast("double") / F.col("p0q1")
    return sums.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )
