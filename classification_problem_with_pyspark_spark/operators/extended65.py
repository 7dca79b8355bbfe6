"""Round-3 extension pack #65: three-way match audit and arc price
elasticity.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the three-way match (purchase order ↔ goods receipt ↔
invoice agreement, the core accounts-payable control every ERP
implements; a payment releases only when all three documents agree)
and arc price elasticity (the midpoint-formula elasticity
%Δq/%Δp between two observed price/quantity points, the standard
two-period estimate when a demand curve isn't identified) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): the receipt and invoice
legs are deterministic syntheses over orders/lineitem (every 13th
invoice overstates by 5 cents, every 17th receipt short-ships one
unit, every 19th invoice is missing — the control, not the ERP, is
the product); match verdicts are exact integer comparisons. Arc
elasticity is computed in CROSS-MULTIPLIED integer form
1e6·Δq·(p₁+p₂) / ((q₁+q₂)·Δp) — one floor division at the end, no
intermediate ratios, sign preserved.

Scale posture (SURVEY.md §7.6): the match is two key-joins on the
order key (co-partitioned in any sane layout) + a verdict census;
elasticity is two per-(part, period) aggregates self-joined on the
part key — all map-side-combinable counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

INV_OVER_MOD = 13  # every 13th order's invoice is 5 cents over
SHORT_SHIP_MOD = 17  # every 17th order's receipt is one unit short
INV_MISSING_MOD = 19  # every 19th order has no invoice yet
SPLIT_DATE = "1998-01-01"  # elasticity periods: before/after this date


@register(
    "audit_three_way_match",
    oracle=f"""
    WITH po AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS po_cents
        FROM orders
    ),
    receipt AS (
        SELECT l_orderkey AS k,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS recv_qty
        FROM lineitem GROUP BY l_orderkey
    ),
    ordered_qty AS (
        SELECT l_orderkey AS k,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS po_qty
        FROM lineitem GROUP BY l_orderkey
    ),
    legs AS (
        SELECT p.k, p.status, p.po_cents,
               oq.po_qty,
               CASE WHEN p.k % {SHORT_SHIP_MOD} = 0 THEN r.recv_qty - 1
                    ELSE r.recv_qty END AS recv_qty,
               CASE WHEN p.k % {INV_MISSING_MOD} = 0 THEN NULL
                    WHEN p.k % {INV_OVER_MOD} = 0 THEN p.po_cents + 5
                    ELSE p.po_cents END AS inv_cents
        FROM po p
        JOIN receipt r ON r.k = p.k
        JOIN ordered_qty oq ON oq.k = p.k
    ),
    verdicts AS (
        SELECT status,
               CASE WHEN inv_cents IS NULL THEN 'missing_invoice'
                    WHEN recv_qty <> po_qty AND inv_cents <> po_cents
                        THEN 'both_mismatch'
                    WHEN recv_qty <> po_qty THEN 'qty_mismatch'
                    WHEN inv_cents <> po_cents THEN 'price_mismatch'
                    ELSE 'matched' END AS verdict,
               po_cents
        FROM legs
    )
    SELECT status, verdict,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(po_cents) AS BIGINT) AS po_cents
    FROM verdicts
    GROUP BY status, verdict
    ORDER BY status, verdict
    """,
)
def audit_three_way_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way match (SURVEY.md §2.4): purchase order, goods receipt,
    and invoice must agree before a payment releases — the core AP
    control. The receipt and invoice legs are deterministic syntheses
    (every {SHORT_SHIP_MOD}th order short-ships a unit, every
    {INV_OVER_MOD}th invoice is 5 cents over, every
    {INV_MISSING_MOD}th invoice hasn't arrived; precedence
    missing > both > qty > price is the stated CASE order), and the
    output is the per-status verdict census with the money at stake —
    exactly the exception report an AP team works. Orders hit by
    overlapping rules (k divisible by several moduli) exercise the
    precedence, asserted in tests.

    Exactness: integer cents/quantities; verdicts are equality tests.

    Scale: two equi-joins on the order key (which any sane layout
    co-partitions) + a census — the control runs on every close
    cycle, so it is built to be one cheap pass.
    """
    po = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("po_cents"),
    )
    qty = load(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("po_qty"))
    legs = po.join(qty, "k").select(
        "k",
        "status",
        "po_cents",
        "po_qty",
        F.when(F.col("k") % SHORT_SHIP_MOD == 0, F.col("po_qty") - 1)
        .otherwise(F.col("po_qty"))
        .alias("recv_qty"),
        F.when(F.col("k") % INV_MISSING_MOD == 0, F.lit(None).cast("long"))
        .when(F.col("k") % INV_OVER_MOD == 0, F.col("po_cents") + 5)
        .otherwise(F.col("po_cents"))
        .alias("inv_cents"),
    )
    verdict = (
        F.when(F.col("inv_cents").isNull(), "missing_invoice")
        .when(
            (F.col("recv_qty") != F.col("po_qty"))
            & (F.col("inv_cents") != F.col("po_cents")),
            "both_mismatch",
        )
        .when(F.col("recv_qty") != F.col("po_qty"), "qty_mismatch")
        .when(F.col("inv_cents") != F.col("po_cents"), "price_mismatch")
        .otherwise("matched")
    )
    return (
        legs.select("status", verdict.alias("verdict"), "po_cents")
        .groupBy("status", "verdict")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("po_cents").cast("long").alias("po_cents"),
        )
        .orderBy("status", "verdict")
    )


@register(
    "agg_arc_price_elasticity",
    oracle=f"""
    WITH sales AS (
        SELECT l_partkey AS part,
               CASE WHEN l_shipdate < TIMESTAMP '{SPLIT_DATE}' THEN 1
                    ELSE 2 END AS period,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem
        GROUP BY l_partkey, CASE WHEN l_shipdate < TIMESTAMP '{SPLIT_DATE}'
                                 THEN 1 ELSE 2 END
    ),
    paired AS (
        SELECT p1.part,
               p1.qty AS q1, p2.qty AS q2,
               -- unit prices in micro-cents, exact: cents*1e4/qty
               (10000 * p1.cents) // p1.qty AS up1,
               (10000 * p2.cents) // p2.qty AS up2
        FROM sales p1 JOIN sales p2
          ON p2.part = p1.part AND p1.period = 1 AND p2.period = 2
    )
    SELECT part, q1, q2, up1 AS unit_price1_microcent,
           up2 AS unit_price2_microcent,
           CASE WHEN up2 = up1 THEN NULL
                ELSE CAST((1000000 * (q2 - q1) * (up1 + up2))
                          // ((q1 + q2) * (up2 - up1)) AS BIGINT)
           END AS arc_elasticity_micro
    FROM paired
    ORDER BY part
    """,
)
def agg_arc_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc price elasticity (SURVEY.md §2.4): the midpoint-formula
    elasticity between each part's two observed (price, quantity)
    points — average unit price and total quantity before/after the
    {SPLIT_DATE} split — ε = (Δq/q̄)/(Δp/p̄), the two-period estimate
    pricing teams compute when no demand curve is identified. Parts
    with unchanged unit price honestly emit NULL (elasticity is
    undefined, not zero — the CASE guard is the contract).

    The formula folds to ONE cross-multiplied integer expression
    1e6·Δq·(p₁+p₂) / ((q₁+q₂)·Δp): unit prices enter as exact
    floor micro-cents, no intermediate ratio is ever taken, and the
    sign (elastic demand is negative) survives because BOTH engines
    truncate signed integer division toward zero (Spark `DIV` and
    DuckDB's integer `//` — verified with -7//2 = -3, i.e. NOT a
    floor; the pack's first draft assumed floor and missed by one on
    every negative elasticity).

    Exactness: integer cross-multiplication; one truncating division.

    Scale: one (part, period) aggregate + a part-key self-join —
    both map-side combinable; |parts| rows out.
    """
    li = load(spark, sf_dir, "lineitem")
    sales = (
        li.select(
            F.col("l_partkey").alias("part"),
            F.when(F.col("l_shipdate") < SPLIT_DATE, 1).otherwise(2).alias("period"),
            F.col("l_quantity").cast("long").alias("q"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("part", "period")
        .agg(
            F.sum("q").cast("long").alias("qty"),
            F.sum("c").cast("long").alias("cents"),
        )
    )
    p1 = sales.where(F.col("period") == 1).select(
        "part",
        F.col("qty").alias("q1"),
        F.expr("(10000 * cents) DIV qty").alias("up1"),
    )
    p2 = sales.where(F.col("period") == 2).select(
        "part",
        F.col("qty").alias("q2"),
        F.expr("(10000 * cents) DIV qty").alias("up2"),
    )
    return (
        p1.join(p2, "part")
        .select(
            "part",
            "q1",
            "q2",
            F.col("up1").alias("unit_price1_microcent"),
            F.col("up2").alias("unit_price2_microcent"),
            # both engines truncate signed integer division toward zero
            # (Spark DIV and DuckDB's integer // — verified, NOT a floor),
            # and integer arithmetic keeps the ~1e18 numerator exact where
            # double math would not
            F.when(F.col("up2") == F.col("up1"), F.lit(None).cast("long"))
            .otherwise(
                F.expr(
                    "CAST((1000000 * (q2 - q1) * (up1 + up2)) DIV "
                    "((q1 + q2) * (up2 - up1)) AS BIGINT)"
                )
            )
            .alias("arc_elasticity_micro"),
        )
        .orderBy("part")
    )
