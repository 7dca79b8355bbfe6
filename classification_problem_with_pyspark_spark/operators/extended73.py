"""Round-3 extension pack #73: progressive bracket pricing and the
decile migration matrix.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — progressive bracket computation (the tax-bracket /
tiered-pricing split: each slice of the amount is charged its own
tier's rate, so the marginal rate never applies to the whole — the
arithmetic every billing engine and payroll system implements) and the
migration matrix (rank-bucket transitions between two periods — the
credit-rating migration table, applied here to revenue deciles) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): bracket slices are pure
integer min/max algebra on cents with per-tier floor-percentage
charges (conservation of the base amount across slices is asserted);
deciles are ntile under (value DESC, key) total orders in BOTH
periods, so every cell of the matrix is rank-exact.

Scale posture (SURVEY.md §7.6): brackets are a per-row expression
(scan-shaped — the tier table is a literal; a data-driven tier table
broadcasts); the migration matrix is two per-period aggregates, two
ntile windows over the DIM-sized part relation, and one self-join on
the part key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.global_rank import (
    bucketed_global_rank,
    closed_form_ntile,
)
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

# tiers: [0, T1) free, [T1, T2) at 5%, [T2, ∞) at 10%  (cents, bp rates)
TIER1_CENTS = 10_000_000
TIER2_CENTS = 25_000_000
RATE1_BP = 500
RATE2_BP = 1000
MIGRATION_SPLIT = "1998-01-01"  # decile periods: before/after


@register(
    "agg_tiered_pricing_brackets",
    oracle=f"""
    WITH base AS (
        SELECT o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    sliced AS (
        SELECT status, cents,
               least(cents, {TIER1_CENTS}) AS slice0,
               least(greatest(cents - {TIER1_CENTS}, 0),
                     {TIER2_CENTS - TIER1_CENTS}) AS slice1,
               greatest(cents - {TIER2_CENTS}, 0) AS slice2
        FROM base
    ),
    charged AS (
        SELECT status, cents, slice0, slice1, slice2,
               (slice1 * {RATE1_BP}) // 10000
                   + (slice2 * {RATE2_BP}) // 10000 AS fee_cents
        FROM sliced
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS base_cents,
           CAST(SUM(slice0) AS BIGINT) AS tier0_cents,
           CAST(SUM(slice1) AS BIGINT) AS tier1_cents,
           CAST(SUM(slice2) AS BIGINT) AS tier2_cents,
           CAST(SUM(fee_cents) AS BIGINT) AS fee_cents,
           CAST(SUM(CASE WHEN cents > {TIER2_CENTS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top_tier
    FROM charged
    GROUP BY status
    ORDER BY status
    """,
)
def agg_tiered_pricing_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive bracket pricing (SURVEY.md §2.4): split each order's
    cents across three tiers (free below {TIER1_CENTS}, 5% on the
    slice to {TIER2_CENTS}, 10% above) and charge each SLICE its own
    tier's rate — the tax-bracket arithmetic where the marginal rate
    never applies to the whole amount (the universally-misunderstood
    property; a flat `rate(cents)·cents` is the bug this key pins
    against). Slices fold min/max integer algebra; slice conservation
    (slice0+slice1+slice2 = cents, per order) is the tested theorem,
    and per-tier fee floors follow the invoice convention (round the
    fee per order, not per slice aggregate).

    Exactness: integer cents, basis-point rates, floor division.

    Scale: a pure per-row expression over the scan — the tier table
    here is literal; a data-driven one (effective-dated tiers) joins
    broadcast, and the slice algebra is unchanged.
    """
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    sliced = base.select(
        "status",
        "cents",
        F.expr(f"least(cents, {TIER1_CENTS})").alias("slice0"),
        F.expr(
            f"least(greatest(cents - {TIER1_CENTS}, 0), "
            f"{TIER2_CENTS - TIER1_CENTS})"
        ).alias("slice1"),
        F.expr(f"greatest(cents - {TIER2_CENTS}, 0)").alias("slice2"),
    )
    charged = sliced.withColumn(
        "fee_cents",
        F.expr(
            f"(slice1 * {RATE1_BP}) DIV 10000 + (slice2 * {RATE2_BP}) DIV 10000"
        ),
    )
    return (
        charged.groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").cast("long").alias("base_cents"),
            F.sum("slice0").cast("long").alias("tier0_cents"),
            F.sum("slice1").cast("long").alias("tier1_cents"),
            F.sum("slice2").cast("long").alias("tier2_cents"),
            F.sum("fee_cents").cast("long").alias("fee_cents"),
            F.sum(F.when(F.col("cents") > TIER2_CENTS, 1).otherwise(0))
            .cast("long")
            .alias("n_top_tier"),
        )
        .orderBy("status")
    )


@register(
    "window_decile_migration_matrix",
    oracle=f"""
    WITH sales AS (
        SELECT l_partkey AS part,
               CASE WHEN l_shipdate < TIMESTAMP '{MIGRATION_SPLIT}'
                    THEN 1 ELSE 2 END AS period,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem
        GROUP BY l_partkey,
                 CASE WHEN l_shipdate < TIMESTAMP '{MIGRATION_SPLIT}'
                      THEN 1 ELSE 2 END
    ),
    d1 AS (
        SELECT part, NTILE(10) OVER (ORDER BY rev DESC, part) AS dec1
        FROM sales WHERE period = 1
    ),
    d2 AS (
        SELECT part, NTILE(10) OVER (ORDER BY rev DESC, part) AS dec2
        FROM sales WHERE period = 2
    )
    SELECT CAST(d1.dec1 AS BIGINT) AS decile_from,
           CAST(d2.dec2 AS BIGINT) AS decile_to,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM d1 JOIN d2 ON d2.part = d1.part
    GROUP BY d1.dec1, d2.dec2
    ORDER BY decile_from, decile_to
    """,
)
def window_decile_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile migration matrix (SURVEY.md §2.5): each part's revenue
    decile before vs after the {MIGRATION_SPLIT} split, counted per
    (from, to) cell — the credit-rating migration table applied to
    product revenue rank. Diagonal mass = rank stability; off-diagonal
    mass = churn in the merchandising order; row sums recover the
    from-decile populations (asserted). The matrix view is what a
    single-period decile table cannot show: WHO moved.

    Deciles are ntile under (revenue DESC, part) total orders in both
    periods, so every cell is rank-exact; parts present in only one
    period drop from the matrix (migration requires two
    observations — the inner join is the contract, and the tests pin
    the dropped count).

    Exactness: integer cents, ranks, counts.

    Scale: the fact reduces to per-(part, period) revenue first
    (map-side combinable); each ntile is the closed form of the
    bucket-stitch global rank (r9 — parts grow with SF, so even the
    |parts| sort must not be one task), and the matrix join is on
    the part key. No global sort anywhere.
    """
    li = load(spark, sf_dir, "lineitem")
    sales = (
        li.select(
            F.col("l_partkey").alias("part"),
            F.when(F.col("l_shipdate") < MIGRATION_SPLIT, 1)
            .otherwise(2)
            .alias("period"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("part", "period")
        .agg(F.sum("c").cast("long").alias("rev"))
    )
    # r9: the per-part revenue relation is ENTITY-scale (parts grow with
    # SF), so each period's ntile is the closed form of the bucket-stitch
    # global rank — the only single-task window is the 2^16-cents-bucket
    # grid cumsum; per-part ranking is hash-partitioned by bucket.
    def decile(df, out):
        n = df.agg(F.count("*").cast("long").alias("__n"))
        return (
            bucketed_global_rank(
                df,
                "rev",
                ["part"],
                descending=True,
                # r11 (trend gate): per-part revenue MAGNITUDE grows with
                # data volume, so fixed 2^16-cent buckets grew the grid
                # 1022→1790 / 1104→2001 per SF decade — range-normalized
                # fixed-K buckets over the broadcast min/max instead
                # (same class and fix as agg_abc_xyz_classification).
                value_range_k=1024,
                out="__rn",
            )
            .crossJoin(F.broadcast(n))
            .withColumn(out, closed_form_ntile(F.col("__rn"), F.col("__n"), 10))
            .select("part", out)
        )

    d1 = decile(sales.where(F.col("period") == 1), "decile_from")
    d2 = decile(sales.where(F.col("period") == 2), "decile_to")
    return (
        d1.join(d2, "part")
        .groupBy(
            F.col("decile_from").cast("long").alias("decile_from"),
            F.col("decile_to").cast("long").alias("decile_to"),
        )
        .agg(F.count("*").alias("n_parts"))
        .orderBy("decile_from", "decile_to")
    )
