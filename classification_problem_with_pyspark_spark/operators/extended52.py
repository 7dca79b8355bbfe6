"""Round-3 extension pack #52: delta-method ratio-metric inference and
two-proportion power analysis / MDE.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the delta-method standard error for ratio metrics
(Fieller/delta-method treatment of revenue-per-session-style metrics,
standard in the online-experimentation literature, e.g. Deng et al.,
"Applying the Delta method in metric analytics", KDD 2018) and the
classical two-proportion power / minimum-detectable-effect sizing
formula (z_{α/2} + z_{power} over the pooled binomial variance) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): all (co)moment sums are
EXACT integers (cents / counts) aggregated engine-side; the closing
formulas are single double-precision expressions over those identical
integers, rounded to 6 decimals on both engines — the discipline the
driver already hash-verified on `agg_ab_test_ttest` / `agg_anova_f`.
The normal quantiles (1.959964, 0.841621) enter as shared literals.

Scale posture (SURVEY.md §7.6): both keys are two-level aggregations
(per-unit, then per-group) — map-side combinable, shuffle O(|groups|);
the delta method exists precisely because the naive alternative
(bootstrap over units) costs a thousand passes at 100 TB and this
costs one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

Z_ALPHA = 1.959964  # two-sided 5%
Z_POWER = 0.841621  # 80% power
REL_LIFT = 0.05  # MDE sizing target: detect a 5% relative lift
VALUE_GATE = 50  # the proportion metric: share of events with value > 50


@register(
    "agg_ratio_delta_method",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY event_type, user_id
    ),
    mom AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user GROUP BY event_type
    )
    SELECT event_type, n AS n_users, sx AS total_cents, sy AS total_events,
           ROUND(CAST(sx AS DOUBLE) / sy / 100.0, 6) AS ratio,
           ROUND(
               sqrt(
                   ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
                    - 2 * (CAST(sx AS DOUBLE) / sy)
                        * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
                    + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                        * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))
                   / n) / (CAST(sy AS DOUBLE) / n) / 100.0, 6) AS se_ratio
    FROM mom
    ORDER BY event_type
    """,
)
def agg_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method ratio-metric inference (SURVEY.md §2.4): for each
    event type, the revenue-per-event ratio metric computed over USER
    units (Σx/Σy with x = user cents, y = user events) and its
    delta-method standard error — the correct uncertainty for ratio
    metrics whose numerator and denominator co-vary per unit, which a
    naive per-row t-test gets wrong (users, not events, are the i.i.d.
    unit; Deng et al., KDD 2018). Completes the experimentation family
    (`agg_ab_test_ttest`, `agg_two_proportion_ztest`,
    `agg_bootstrap_ci_revenue`) with its most-used production member.

    SE² = (s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²) from six EXACT integer
    (co)moment sums; the closing expression is identical double math
    on both engines, ROUND(·,6) — the `agg_ab_test_ttest` discipline.

    Scale: two map-side-combinable aggregations (by (type, user), then
    by type) — the delta method's whole point: one pass where a
    bootstrap needs a thousand.
    """
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("x"),
            F.count("*").alias("y"),
        )
    )
    mom = per_user.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return mom.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("sx").alias("total_cents"),
        F.col("sy").alias("total_events"),
        F.round(F.col("sx").cast("double") / F.col("sy") / 100.0, 6).alias("ratio"),
        F.round(
            F.sqrt(
                (
                    (
                        F.col("sxx").cast("double")
                        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
                    )
                    / (F.col("n") - 1)
                    - 2
                    * (F.col("sx").cast("double") / F.col("sy"))
                    * (
                        (
                            F.col("sxy").cast("double")
                            - F.col("sx").cast("double") * F.col("sy") / F.col("n")
                        )
                        / (F.col("n") - 1)
                    )
                    + (F.col("sx").cast("double") / F.col("sy"))
                    * (F.col("sx").cast("double") / F.col("sy"))
                    * (
                        (
                            F.col("syy").cast("double")
                            - F.col("sy").cast("double") * F.col("sy") / F.col("n")
                        )
                        / (F.col("n") - 1)
                    )
                )
                / F.col("n")
            )
            / (F.col("sy").cast("double") / F.col("n"))
            / 100.0,
            6,
        ).alias("se_ratio"),
    ).orderBy("event_type")


@register(
    "agg_power_analysis_mde",
    oracle=f"""
    WITH flags AS (
        SELECT event_type,
               CASE WHEN value > {VALUE_GATE} THEN 1 ELSE 0 END AS hit
        FROM events
    ),
    rates AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(hit) AS BIGINT) AS hits
        FROM flags GROUP BY event_type
    )
    SELECT event_type, n, hits,
           ROUND(CAST(hits AS DOUBLE) / n, 6) AS p_hat,
           ROUND(({Z_ALPHA} + {Z_POWER})
                 * sqrt(2.0 * (CAST(hits AS DOUBLE) / n)
                        * (1.0 - CAST(hits AS DOUBLE) / n) / n), 6)
               AS mde_abs,
           CAST(ceil(2.0 * (CAST(hits AS DOUBLE) / n)
                     * (1.0 - CAST(hits AS DOUBLE) / n)
                     * ({Z_ALPHA} + {Z_POWER}) * ({Z_ALPHA} + {Z_POWER})
                     / (({REL_LIFT} * CAST(hits AS DOUBLE) / n)
                        * ({REL_LIFT} * CAST(hits AS DOUBLE) / n)))
                AS BIGINT) AS n_required_per_arm
    FROM rates
    ORDER BY event_type
    """,
)
def agg_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power analysis (SURVEY.md §2.4): for each event
    type's proportion metric (share of events clearing the value
    gate), the minimum detectable ABSOLUTE effect at the current
    sample size (α=5% two-sided, 80% power) and the required sample
    per arm to detect a 5% RELATIVE lift — the experiment-sizing
    arithmetic that runs BEFORE every A/B test the `agg_ab_test_ttest`
    / `agg_two_proportion_ztest` keys later judge. Shipping the sizing
    query next to the inference queries is the point: both read the
    same aggregates.

    MDE = (z_{{α/2}}+z_{{pow}})·√(2p̂(1−p̂)/n); n_req =
    2p̂(1−p̂)(z_{{α/2}}+z_{{pow}})²/δ², δ = rel·p̂ — single double
    expressions over exact integer (n, hits), ROUND(·,6) / ceil to
    BIGINT, constants shared as literals on both engines.

    Scale: one map-side-combinable aggregation, shuffle O(|types|).
    """
    rates = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.when(F.col("value") > VALUE_GATE, 1).otherwise(0).alias("hit"),
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("hit").cast("long").alias("hits"))
    )
    p = F.col("hits").cast("double") / F.col("n")
    z = Z_ALPHA + Z_POWER
    return rates.select(
        "event_type",
        "n",
        "hits",
        F.round(p, 6).alias("p_hat"),
        F.round(F.lit(z) * F.sqrt(2.0 * p * (1.0 - p) / F.col("n")), 6).alias(
            "mde_abs"
        ),
        F.ceil(
            2.0 * p * (1.0 - p) * z * z / ((REL_LIFT * p) * (REL_LIFT * p))
        )
        .cast("long")
        .alias("n_required_per_arm"),
    ).orderBy("event_type")
