"""Round-4 extension pack #112: Parkinson high-low volatility and the
Atkinson inequality index.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the Parkinson (1980) range volatility estimator
(σ²_P = Σ ln(h/l)² / (4·n·ln2): the high-low range carries ~5× the
information of close-close returns, which is why risk desks compute it
beside classical vol) and the Atkinson index with ε = 1
(A = 1 − geomean/mean, the welfare-theoretic inequality member whose
value reads as "the share of total income society could give up if the
rest were split equally") — re-expressed on the public PySpark
DataFrame API over the driver's testdata.

Hash-parity discipline (round-4 standard): daily highs/lows and revenue
fold as exact cents BIGINTs; every per-row/per-day transcendental
(ln²(h/l), ln(cents)) is rounded to micro independently and summed as
integers (the entropy/micro-nat discipline — no float SUM crosses
engines); ln 2 enters as the double LITERAL 0.6931471805599453, never a
runtime libm call whose last ulp could differ.

Scale posture (SURVEY.md §7.6): Parkinson is one groupBy to days + one
bounded reduce; Atkinson is one groupBy to (nation) with map-side
partial integer sums — both touch the fact table once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

LN2 = "0.6931471805599453"  # double literal on both engines — no libm ln(2)


@register(
    "window_parkinson_volatility",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(max(round(value * 100)) AS BIGINT) AS hi_cents,
               CAST(min(round(value * 100)) AS BIGINT) AS lo_cents
        FROM events
        GROUP BY 1
    ),
    terms AS (
        SELECT day, hi_cents, lo_cents,
               CAST(round(1000000 * ln(CAST(hi_cents AS DOUBLE) / lo_cents)
                                   * ln(CAST(hi_cents AS DOUBLE) / lo_cents))
                    AS BIGINT) AS term_micro
        FROM daily
        WHERE lo_cents > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(SUM(term_micro) AS BIGINT) AS sum_sq_micro,
           CAST(round(1000000 * sqrt(CAST(SUM(term_micro) AS DOUBLE)
                / (1000000.0 * 4 * count(*) * {LN2}))) AS BIGINT)
               AS parkinson_vol_micro
    FROM terms
    """,
)
def window_parkinson_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson range volatility (SURVEY.md §2.4, finance family):
    σ_P = sqrt(Σ ln(hi_d/lo_d)² / (4·n·ln2)) over the daily value
    range — the high-low estimator that extracts ~5× the information
    per day of close-close returns (Parkinson 1980), sitting beside
    the registry's OHLC, Bollinger, drawdown, and OBV keys. Reported
    with the day count and the raw Σln² so the fold is auditable.

    Exactness: daily extremes are exact cents; each day's ln²(h/l) is
    rounded to micro independently and summed as BIGINT (micro-nat
    discipline); ln 2 is the double literal {LN2} on both engines —
    no runtime libm constant.

    Scale: one map-side-combinable groupBy to days, one bounded
    reduce over the day table — a single fact-table pass.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(
            F.max("cents").alias("hi_cents"),
            F.min("cents").alias("lo_cents"),
        )
    )
    terms = daily.where(F.col("lo_cents") > 0).select(
        F.expr(
            "CAST(round(1000000 * ln(CAST(hi_cents AS DOUBLE) / lo_cents)"
            " * ln(CAST(hi_cents AS DOUBLE) / lo_cents)) AS BIGINT)"
        ).alias("term_micro")
    )
    return terms.agg(
        F.count("*").alias("n_days"),
        F.sum("term_micro").cast("long").alias("sum_sq_micro"),
        F.expr(
            f"CAST(round(1000000 * sqrt(CAST(SUM(term_micro) AS DOUBLE)"
            f" / (1000000.0 * 4 * count(*) * {LN2}))) AS BIGINT)"
        ).alias("parkinson_vol_micro"),
    )


@register(
    "agg_atkinson_index",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nationkey,
               CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS u4
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ),
    lns AS (
        SELECT nationkey, u4,
               CAST(round(1000000 * ln(CAST(u4 AS DOUBLE))) AS BIGINT)
                   AS ln_micro
        FROM rev WHERE u4 > 0
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(u4) AS BIGINT) AS total_u4,
           CAST(SUM(ln_micro) AS BIGINT) AS sum_ln_micro,
           CAST(round(1000000 * (1 -
                exp(CAST(SUM(ln_micro) AS DOUBLE) / count(*) / 1000000)
                / (CAST(SUM(u4) AS DOUBLE) / count(*)))) AS BIGINT)
               AS atkinson_micro
    FROM lns
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index, ε = 1 (SURVEY.md §2.4): per nation,
    A = 1 − geomean/mean over supplier revenues — the welfare-form
    inequality measure ("the share of total revenue the nation could
    discard if the rest were spread equally") completing the
    Gini/HHI/Lorenz/Hoover/Theil-adjacent family with the one member
    that has an explicit social-welfare derivation. Reported with the
    raw integer moments so the fold is auditable.

    Exactness: supplier revenues fold as exact 1e-4-dollar integers (2-dec x 2-dec product rounds exactly at 4 decimals - the .xx5 cents boundary trap); each supplier's
    ln(cents) rounds to micro-nats independently and sums as BIGINT
    (no float SUM crosses engines); the final exp/ratio is ONE
    identical double expression, micro-rounded.

    Scale: groupBy (nation, supplier) with map-side partials, then a
    25-row close — one fact-table pass.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS BIGINT)"
            ).alias("u4")
        )
        .select(F.col("s_nationkey").alias("nationkey"), "u4")
    )
    lns = rev.where(F.col("u4") > 0).select(
        "nationkey",
        "u4",
        F.expr(
            "CAST(round(1000000 * ln(CAST(u4 AS DOUBLE))) AS BIGINT)"
        ).alias("ln_micro"),
    )
    return (
        lns.groupBy("nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("u4").cast("long").alias("total_u4"),
            F.sum("ln_micro").cast("long").alias("sum_ln_micro"),
            F.expr(
                "CAST(round(1000000 * (1 -"
                " exp(CAST(SUM(ln_micro) AS DOUBLE) / count(*) / 1000000)"
                " / (CAST(SUM(u4) AS DOUBLE) / count(*)))) AS BIGINT)"
            ).alias("atkinson_micro"),
        )
        .orderBy("nationkey")
    )
