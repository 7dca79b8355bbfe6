"""Round-3 extension pack #95: process capability (Cp/Cpk) and the
Ljung–Box portmanteau test.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — process capability indices (Cp = (USL−LSL)/6σ, Cpk =
min(USL−μ, μ−LSL)/3σ — the manufacturing-SPC pair that says whether a
process FITS its spec, complementing the p-chart's "is it stable") and
the Ljung–Box Q statistic (n(n+2)Σₖ ρ̂ₖ²/(n−k) — the portmanteau
whiteness test fitted-model residuals must pass; Ljung & Box 1978) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): spec limits are integer
cent literals and σ folds the t-test discipline (exact moments, one
ROUND-6 double close); autocorrelations come from exact integer
lag-products over the daily series (each lag an offset self-join of
the bounded series), and the 10-term Q sum is ORDER-PINNED by lag.

Scale posture (SURVEY.md §7.6): Cp/Cpk is one moment pass; Ljung–Box
reduces the fact table to the daily series FIRST and runs its lag
joins over that calendar-bounded relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

SPEC_LSL = 500  # spec limits on purchase cents
SPEC_USL = 30_000
LB_MAX_LAG = 10


@register(
    "agg_process_capability_cpk",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q,
               CAST(SUM(CASE WHEN c < {SPEC_LSL} OR c > {SPEC_USL}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        FROM cents
    )
    SELECT n, n_out,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_cents,
           ROUND(sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (n - 1)), 6) AS sd_cents,
           ROUND(({SPEC_USL} - {SPEC_LSL})
                 / (6 * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                             / (n - 1))), 6) AS cp,
           ROUND(least({SPEC_USL} - CAST(s AS DOUBLE) / n,
                       CAST(s AS DOUBLE) / n - {SPEC_LSL})
                 / (3 * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                             / (n - 1))), 6) AS cpk
    FROM mom
    """,
)
def agg_process_capability_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability (SURVEY.md §2.4): Cp and Cpk of purchase
    cents against literal spec limits [{SPEC_LSL}, {SPEC_USL}] — the
    manufacturing-SPC indices that answer "does the process FIT the
    spec" (Cp: spread vs tolerance; Cpk: the same penalized for
    off-center mean — Cpk < Cp exactly measures de-centering, and
    Cpk ≥ 1.33 is the classic capability bar). Complements the
    p-chart key: control says stable, capability says good enough.
    The out-of-spec count rides along as the empirical check the
    indices predict.

    Exactness: exact integer moments; identical ROUND-6 double
    closes (the t-test discipline); sample σ (n−1), stated.

    Scale: one map-side-combinable moment pass with the conditional
    out-of-spec count folded into the same scan.
    """
    cents = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
    mom = cents.agg(
        F.count("*").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
        F.sum(
            F.when((F.col("c") < SPEC_LSL) | (F.col("c") > SPEC_USL), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_out"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return mom.select(
        "n",
        "n_out",
        F.round(mean, 6).alias("mean_cents"),
        F.round(sd, 6).alias("sd_cents"),
        F.round((SPEC_USL - SPEC_LSL) / (6 * sd), 6).alias("cp"),
        F.round(
            F.least(SPEC_USL - mean, mean - SPEC_LSL) / (3 * sd), 6
        ).alias("cpk"),
    )


@register(
    "events_ljung_box_q",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY date_trunc('day', ts)
    ),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY d) AS i FROM daily
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q
        FROM idx
    ),
    lags AS (
        SELECT l.lag_k,
               CAST(SUM(a.x * b.x) AS BIGINT) AS cross_sum,
               CAST(SUM(a.x) AS BIGINT) AS head_sum,
               CAST(SUM(b.x) AS BIGINT) AS tail_sum,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM (SELECT unnest(range(1, {LB_MAX_LAG + 1})) AS lag_k) l
        JOIN idx a ON TRUE
        JOIN idx b ON b.i = a.i + l.lag_k
        GROUP BY l.lag_k
    ),
    rhos AS (  -- ρ̂ₖ with the standard full-series mean/variance
        SELECT lag_k,
               (CAST(cross_sum AS DOUBLE)
                - CAST(head_sum + tail_sum AS DOUBLE) * m.s / m.n
                + CAST(n_pairs AS DOUBLE) * (CAST(m.s AS DOUBLE) / m.n)
                  * (CAST(m.s AS DOUBLE) / m.n))
               / (CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                   AS rho,
               m.n AS n
        FROM lags, mom m
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST({LB_MAX_LAG} AS BIGINT) AS max_lag,
           ROUND(SUM(rho * rho ORDER BY lag_k), 6) AS rho_sq_sum,
           ROUND(MAX(n) * (MAX(n) + 2)
                 * SUM(rho * rho / (n - lag_k) ORDER BY lag_k), 6)
               AS ljung_box_q
    FROM rhos
    """,
)
def events_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box Q (SURVEY.md §2.4): the portmanteau autocorrelation
    test over the daily event-count series — Q = n(n+2)Σₖ ρ̂ₖ²/(n−k),
    lags 1..{LB_MAX_LAG} — the whiteness test every fitted
    time-series model's residuals must pass (Ljung & Box 1978), and
    on RAW counts the detector of any weekly pulse the seasonality
    keys then decompose. Q ≫ χ²₁₀ means structure remains; the
    single-lag `events_autocorrelation` key shows WHERE, this one
    says WHETHER.

    ρ̂ₖ folds from exact integer lag cross-sums (offset self-joins of
    the bounded daily series) with the full-series mean/variance
    (the standard estimator, stated); the {LB_MAX_LAG}-term Q sum is
    ORDER-PINNED by lag on both engines.

    Scale: the fact reduces to ≤|days| rows first; the lag joins and
    folds run over that calendar-bounded relation — the portmanteau
    costs nothing after the reduction.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count("*").alias("x"))
    )
    
    idx = (
        grid_rank(daily, ["d"], "i")
        .select("x", "i")
        .localCheckpoint(eager=True)
    )
    mom = idx.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    lags = spark.range(1, LB_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag_k")
    )
    a = idx.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = idx.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("ib") == F.col("ia") + F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("cross_sum"),
            F.sum("xa").cast("long").alias("head_sum"),
            F.sum("xb").cast("long").alias("tail_sum"),
            F.count("*").alias("n_pairs"),
        )
    )
    rho = (
        F.col("cross_sum").cast("double")
        - (F.col("head_sum") + F.col("tail_sum")).cast("double")
        * F.col("s")
        / F.col("n")
        + F.col("n_pairs").cast("double")
        * (F.col("s").cast("double") / F.col("n"))
        * (F.col("s").cast("double") / F.col("n"))
    ) / (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    )
    rhos = pairs.crossJoin(F.broadcast(mom)).select(
        "lag_k", rho.alias("rho"), "n"
    )
    return rhos.agg(
        F.max("n").cast("long").alias("n_days"),
        F.lit(LB_MAX_LAG).cast("long").alias("max_lag"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("lag_k", "rho"))),
                F.lit(0.0),
                lambda acc, z: acc + z["rho"] * z["rho"],
            ),
            6,
        ).alias("rho_sq_sum"),
        F.round(
            F.max("n")
            * (F.max("n") + 2)
            * F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("lag_k", "rho", "n"))
                ),
                F.lit(0.0),
                lambda acc, z: acc + z["rho"] * z["rho"] / (z["n"] - z["lag_k"]),
            ),
            6,
        ).alias("ljung_box_q"),
    )
