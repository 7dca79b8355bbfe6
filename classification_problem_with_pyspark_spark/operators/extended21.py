"""Round-3 extension pack #21: market-concentration and volatility-band
analytics — the Herfindahl–Hirschman index in exact integer algebra, and
Bollinger bands from exact windowed moments.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — HHI (the antitrust concentration metric: Σ share²) and
Bollinger bands (rolling mean ± 2σ envelope) — expressed on the public
PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): HHI avoids floats ENTIRELY —
the identity Σ(kᵢ/T)² = Σkᵢ²/T² over kilodollar-folded BIGINTs with one
integer floor division (see the key's docstring for the two float
formulations the driver hash killed first); Bollinger folds exact
integer window moments (Σc, Σc², n)
and spends floats only in single per-row expressions whose text
mirrors the oracle's association exactly.

Scale posture (SURVEY.md §7.6): HHI is two map-side-combinable
groupBys; Bollinger windows run over the bounded per-type daily
aggregate (≤31 rows/type), never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS market, l.l_suppkey,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) // 100000 AS kdollars
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    )
    SELECT CAST(market AS BIGINT) AS market,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(kdollars) AS BIGINT) AS market_kdollars,
           CAST((1000000 * CAST(sum(kdollars * kdollars) AS BIGINT))
                // (CAST(sum(kdollars) AS BIGINT)
                    * CAST(sum(kdollars) AS BIGINT)) AS BIGINT) AS hhi_micro
    FROM rev GROUP BY market ORDER BY market
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index (SURVEY.md §2.13) per
    supplier-nation market: Σ(revenue share)² in micro-units, with the
    supplier count and exact market size. THE antitrust metric (HHI >
    0.25 ⇒ highly concentrated — every 2-supplier market here clears
    it); complements `events_pareto_concentration` (top-k share) and
    `agg_gini` (inequality) with the squared-share lens regulators use.

    Exactness: never sum float shares — Σ(cᵢ/T)² ≡ (Σcᵢ²)/T², and here
    the WHOLE ratio is integer: revenue folds to kilodollars (so
    1e6·Σkᵢ² ≤ ~2e18 stays inside int64 through sf0.1) and hhi_micro =
    div(1e6·Σk², (Σk)²) — exact integer floor division, zero doubles.
    Two float formulations died first (both MEASURED via the driver
    hash): cents² crosses 2⁵³ where int128→double vs int64→double
    conversions round apart, and even with exact dollar products,
    1e6·Σd² ≈ 9e20 rounds differently per engine before the division —
    single-supplier markets floored to 999999 on one engine and
    1000000 on the other. Integer division has no such seam. At sf1+
    fold to megadollars (same plan, one constant).

    Scale: two map-side-combinable groupBys (supplier revenue, then
    market rollup).
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").cast("long").alias("market"), "l_suppkey")
        .agg(
            F.expr(
                "div(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT), 100000)"
            ).alias("kdollars")
        )
    )
    total = F.sum("kdollars").cast("long")
    return (
        rev.groupBy("market")
        .agg(
            F.count("*").alias("n_suppliers"),
            total.alias("market_kdollars"),
            F.expr(
                "div(1000000 * CAST(sum(kdollars * kdollars) AS BIGINT), "
                "CAST(sum(kdollars) AS BIGINT) * CAST(sum(kdollars) AS BIGINT))"
            ).alias("hhi_micro"),
        )
        .orderBy("market")
    )


@register(
    "window_bollinger_bands",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), win AS (
        SELECT event_type, day, c,
               CAST(SUM(c) OVER w AS BIGINT) AS s1,
               CAST(SUM(c * c) OVER w AS BIGINT) AS s2,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, c, n,
           CAST(floor(1000000.0 * s1 / n) AS BIGINT) AS ma_micro,
           CAST(floor(1000000.0 * (1.0 * s1 / n
                + 2 * sqrt((1.0 * s2 / n) - (1.0 * s1 / n) * (1.0 * s1 / n))))
                AS BIGINT) AS upper_micro,
           CAST(floor(1000000.0 * (1.0 * s1 / n
                - 2 * sqrt((1.0 * s2 / n) - (1.0 * s1 / n) * (1.0 * s1 / n))))
                AS BIGINT) AS lower_micro,
           CAST(CASE WHEN 1.0 * c > 1.0 * s1 / n
                + 2 * sqrt((1.0 * s2 / n) - (1.0 * s1 / n) * (1.0 * s1 / n))
                THEN 1 ELSE 0 END AS BIGINT) AS breakout_up
    FROM win WHERE n = 7 ORDER BY event_type, day
    """,
)
def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (SURVEY.md §2.13) on each type's daily volume:
    7-day rolling mean ± 2σ envelope plus a breakout flag (exactly one
    upward breakout at sf0.01 — the envelope does its job on synthetic
    noise). The volatility-band companion to `window_centered_moving_avg`
    (level) and `events_anomaly_zscore` (global σ): here σ is LOCAL to
    the window, so the band adapts to regime changes.

    Exactness: the window carries only EXACT integer moments (Σc, Σc²,
    n — population σ from the moment identity); mean/σ/band are
    per-row double expressions whose text mirrors the oracle
    association exactly (1e6·(s1/n + 2·sqrt(...)), never re-ordered),
    then floor-micro. Warm-up rows (n < 7) are excluded on both sides.

    Scale: the window runs over the bounded per-type daily aggregate —
    ≤31 rows per type regardless of corpus size.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    win = daily.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(w).cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("s2"),
        F.count("*").over(w).cast("long").alias("n"),
    )
    mean = 1.0 * F.col("s1") / F.col("n")
    sd = F.sqrt((1.0 * F.col("s2") / F.col("n")) - mean * mean)
    return (
        win.where(F.col("n") == 7)
        .select(
            "event_type",
            "day",
            "c",
            "n",
            F.floor(1000000.0 * F.col("s1") / F.col("n"))
            .cast("long")
            .alias("ma_micro"),
            F.floor(1000000.0 * (mean + 2 * sd)).cast("long").alias("upper_micro"),
            F.floor(1000000.0 * (mean - 2 * sd)).cast("long").alias("lower_micro"),
            F.when(1.0 * F.col("c") > mean + 2 * sd, 1)
            .otherwise(0)
            .cast("long")
            .alias("breakout_up"),
        )
        .orderBy("event_type", "day")
    )
