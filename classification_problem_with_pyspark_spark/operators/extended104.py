"""Round-3 extension pack #104: the feature-scaling suite and
peaks-over-threshold mean excess.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the three standard feature scalings (z-score, min-max,
robust median/IQR — the sklearn preprocessing trio every tabular
pipeline chooses between) and the mean-excess function of extreme
value theory (E[X−u | X>u] at a high threshold u — the
peaks-over-threshold diagnostic whose slope identifies the tail family
before a GPD is ever fitted; Davison & Smith 1990) — re-expressed on
the public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): scaling PARAMETERS per
group are the product (min/max/median/IQR as exact rank-convention
order statistics on integer cents; mean/sd from exact moments,
ROUND-6) — parameters, not scaled rows, because that is what a
preprocessing pipeline persists; thresholds for POT are rank-defined
p90s, exceedance counts and mean excess fold exact integers.

Scale posture (SURVEY.md §7.6): both are per-group aggregates —
scaling params from one moment pass + one rank window; POT from one
rank window + one conditional pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "ml_feature_scaling_suite",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    ranked AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    stats AS (
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(c) AS BIGINT) AS min_c,
               CAST(MAX(c) AS BIGINT) AS max_c,
               CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS BIGINT)
                   AS median_c,
               CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN c END) AS BIGINT)
                   AS q1_c,
               CAST(MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN c END)
                    AS BIGINT) AS q3_c,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, n, min_c, max_c, median_c,
           CAST(q3_c - q1_c AS BIGINT) AS iqr_c,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_c,
           ROUND(sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (n - 1)), 6) AS sd_c
    FROM stats
    ORDER BY event_type
    """,
)
def ml_feature_scaling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-scaling parameters (SURVEY.md §2.11): per event type,
    the fitted parameters of the three standard scalers — min/max
    (MinMaxScaler), mean/sd (StandardScaler, sample σ), and
    median/IQR (RobustScaler, with the registry's pinned rank
    conventions from `agg_boxplot_fences`) — as ONE relation. The
    PARAMETERS are the deliverable because that is what a
    preprocessing pipeline persists and serves (the scaled rows are a
    broadcast expression away); fitting them per group is the
    group-aware scaling that per-global fitting silently gets wrong
    on mixed populations.

    Exactness: integer cents; rank-convention order statistics; the
    only doubles are the mean/sd closes, ROUND-6.

    Scale: one rank window + one moment pass per group — scaler
    fitting at 100 TB is exactly this, once, persisted.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("c", "event_id")
    w_n = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "c",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    stats = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min("c").cast("long").alias("min_c"),
        F.max("c").cast("long").alias("max_c"),
        F.max(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN c END"))
        .cast("long")
        .alias("median_c"),
        F.max(F.expr("CASE WHEN rn = (n + 3) DIV 4 THEN c END"))
        .cast("long")
        .alias("q1_c"),
        F.max(F.expr("CASE WHEN rn = (3 * n + 1) DIV 4 THEN c END"))
        .cast("long")
        .alias("q3_c"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    return stats.select(
        "event_type",
        "n",
        "min_c",
        "max_c",
        "median_c",
        (F.col("q3_c") - F.col("q1_c")).cast("long").alias("iqr_c"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_c"),
        F.round(
            F.sqrt(
                (
                    F.col("q").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                / (F.col("n") - 1)
            ),
            6,
        ).alias("sd_c"),
    ).orderBy("event_type")


@register(
    "agg_mean_excess_pot",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    ranked AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    thresholds AS (  -- u = the rank-convention p90 per type
        SELECT event_type,
               CAST(MAX(CASE WHEN rn = (9 * n + 1) // 10 THEN c END)
                    AS BIGINT) AS u
        FROM ranked GROUP BY event_type
    )
    SELECT v.event_type, t.u AS threshold_cents,
           CAST(COUNT(*) AS BIGINT) AS n_exceedances,
           CAST(SUM(v.c - t.u) AS BIGINT) AS total_excess_cents,
           CAST(SUM(v.c - t.u) // COUNT(*) AS BIGINT) AS mean_excess_cents,
           CAST(MAX(v.c - t.u) AS BIGINT) AS max_excess_cents
    FROM v JOIN thresholds t ON t.event_type = v.event_type
    WHERE v.c > t.u
    GROUP BY v.event_type, t.u
    ORDER BY v.event_type
    """,
)
def agg_mean_excess_pot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean excess over threshold (SURVEY.md §2.4): per event type, set
    the threshold u at the rank-convention p90 and report the
    exceedance count, total and MEAN excess E[X−u | X>u], and the
    maximum — the peaks-over-threshold diagnostic that opens every
    extreme-value analysis (a mean excess growing in u says
    heavy/Pareto tail, flat says exponential, shrinking says bounded
    — Davison & Smith 1990), and the quantity reinsurance literally
    prices. Completes the tail family: `agg_var_cvar_exact` reads the
    tail's risk numbers, this key reads its SHAPE.

    Exactness: rank-defined threshold, exact integer excesses, one
    floor division.

    Scale: one rank window for u + one conditional pass — and at
    100 TB u comes from a quantile sketch while the excess pass
    stays exact, the standing tail-key discipline.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("c", "event_id")
    w_n = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "c",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    thresholds = ranked.groupBy("event_type").agg(
        F.max(F.expr("CASE WHEN rn = (9 * n + 1) DIV 10 THEN c END"))
        .cast("long")
        .alias("u")
    )
    return (
        v.join(thresholds, "event_type")
        .where(F.col("c") > F.col("u"))
        .groupBy("event_type", "u")
        .agg(
            F.count("*").alias("n_exceedances"),
            F.sum(F.col("c") - F.col("u"))
            .cast("long")
            .alias("total_excess_cents"),
            F.expr("CAST(SUM(c - u) DIV COUNT(*) AS BIGINT)").alias(
                "mean_excess_cents"
            ),
            F.max(F.col("c") - F.col("u")).cast("long").alias(
                "max_excess_cents"
            ),
        )
        .select(
            "event_type",
            F.col("u").alias("threshold_cents"),
            "n_exceedances",
            "total_excess_cents",
            "mean_excess_cents",
            "max_excess_cents",
        )
        .orderBy("event_type")
    )
