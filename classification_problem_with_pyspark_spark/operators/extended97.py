"""Round-3 extension pack #97: survivorship-bias audit and drawdown
recovery time.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — survivorship bias measurement (compute the metric over ALL
historical entities AND over the currently-surviving subset; the delta
is the bias every backtest and "average customer" report silently
inherits — Elton/Gruber/Blake quantified it for mutual funds) and
drawdown recovery time (how LONG a series stayed below its running
peak — the duration axis of risk that max-drawdown magnitude alone
misses) — re-expressed on the public PySpark DataFrame API over the
driver's testdata.

Hash-parity discipline (round-3 standard): "survivor" is a pure
predicate (active in the final week); both weekly averages fold
floor-micro integer division and the bias is their exact difference.
Below-peak runs use the gaps-and-islands cummax discipline over the
daily series with pinned orders; durations are integer day counts.

Scale posture (SURVEY.md §7.6): the audit is two conditional
aggregates over one scan (the survivor flag joins broadcast);
recovery analysis runs on the calendar-bounded daily series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

SURVIVOR_MIN_DAY = 24  # "survivors": users active on day >= 24


@register(
    "events_survivorship_bias_audit",
    oracle=f"""
    WITH weekly AS (
        SELECT user_id,
               (EXTRACT(day FROM ts) - 1) // 7 AS wk,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY user_id, (EXTRACT(day FROM ts) - 1) // 7
    ),
    survivors AS (
        SELECT DISTINCT user_id FROM events
        WHERE EXTRACT(day FROM ts) >= {SURVIVOR_MIN_DAY}
    )
    SELECT CAST(w.wk AS BIGINT) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_user_weeks,
           CAST(SUM(CASE WHEN s.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivor_weeks,
           CAST(SUM(w.cents) // COUNT(*) AS BIGINT) AS all_avg_cents,
           CAST(SUM(CASE WHEN s.user_id IS NOT NULL THEN w.cents ELSE 0 END)
                // SUM(CASE WHEN s.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS survivor_avg_cents,
           CAST(SUM(CASE WHEN s.user_id IS NOT NULL THEN w.cents ELSE 0 END)
                // SUM(CASE WHEN s.user_id IS NOT NULL THEN 1 ELSE 0 END)
                - SUM(w.cents) // COUNT(*) AS BIGINT) AS bias_cents
    FROM weekly w
    LEFT JOIN survivors s ON s.user_id = w.user_id
    GROUP BY w.wk
    ORDER BY week
    """,
)
def events_survivorship_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-bias audit (SURVEY.md §2.4): per week, the average
    user spend computed over ALL users active that week NEXT TO the
    same average restricted to users still active at the period's end
    (day ≥ {SURVIVOR_MIN_DAY}) — the delta IS the bias a
    survivors-only backtest bakes into every earlier week (Elton,
    Gruber & Blake's mutual-fund result, as a queryable column). The
    bias column exists so dashboards can show it instead of silently
    absorbing it; whether it is positive here is an empirical fact
    the tests record, not an assumption.

    Exactness: integer weekly cents; floor-micro averages; exact
    difference.

    Scale: one weekly aggregate + a broadcast survivor set + one
    conditional pass. Auditing the bias costs one extra conditional
    sum over the report you were already running.
    """
    weekly = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            (((F.dayofmonth("ts") - 1) / 7).cast("long")).alias("wk"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    survivors = (
        load(spark, sf_dir, "events")
        .where(F.dayofmonth("ts") >= SURVIVOR_MIN_DAY)
        .select("user_id")
        .distinct()
        .withColumn("is_survivor", F.lit(1))
    )
    joined = weekly.join(F.broadcast(survivors), "user_id", "left")
    return (
        joined.groupBy(F.col("wk").alias("week"))
        .agg(
            F.count("*").alias("n_user_weeks"),
            F.sum(F.coalesce("is_survivor", F.lit(0)))
            .cast("long")
            .alias("n_survivor_weeks"),
            F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias(
                "all_avg_cents"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN is_survivor = 1 THEN cents ELSE 0 END) "
                "DIV SUM(CASE WHEN is_survivor = 1 THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("survivor_avg_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN is_survivor = 1 THEN cents ELSE 0 END) "
                "DIV SUM(CASE WHEN is_survivor = 1 THEN 1 ELSE 0 END) "
                "- SUM(cents) DIV COUNT(*) AS BIGINT)"
            ).alias("bias_cents"),
        )
        .orderBy("week")
    )


@register(
    "window_record_recovery_days",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    cum AS (
        SELECT event_type, d, cents AS equity,
               CAST(MAX(cents) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS peak
        FROM daily
    ),
    flagged AS (
        SELECT event_type, d,
               CASE WHEN equity < peak THEN 1 ELSE 0 END AS under,
               CASE WHEN equity < peak
                     AND COALESCE(LAG(CASE WHEN equity < peak THEN 1
                                      ELSE 0 END) OVER (
                         PARTITION BY event_type ORDER BY d), 0) = 0
                    THEN 1 ELSE 0 END AS run_start
        FROM cum
    ),
    runs AS (
        SELECT event_type, d, under,
               SUM(run_start) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
        FROM flagged
    ),
    spans AS (
        SELECT event_type, run_id, CAST(COUNT(*) AS BIGINT) AS days_under
        FROM runs WHERE under = 1
        GROUP BY event_type, run_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_drawdowns,
           CAST(MAX(days_under) AS BIGINT) AS worst_recovery_days,
           CAST(SUM(days_under) AS BIGINT) AS total_days_under,
           CAST(SUM(days_under) // COUNT(*) AS BIGINT) AS mean_recovery_days
    FROM spans
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def window_record_recovery_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-recovery time (SURVEY.md §2.5): how LONG each type's
    DAILY revenue stayed below its running all-time-high — below-record
    runs found with the gaps-and-islands discipline, reported as run
    count, worst and mean days-to-new-record, and total days under the
    record. The DURATION axis that `window_drawdown`'s magnitude
    misses ("how long since the best day?" is what the growth review
    actually asks); the cumulative-equity formulation is deliberately
    NOT used — cumulative positive revenue can never draw down, a
    vacuity the first draft hit and this docstring preserves as the
    lesson. A trailing unrecovered run counts its days so far — the
    honest right-censoring, stated.

    Exactness: integer cents, cummax/flag/island integer algebra,
    integer day counts.

    Scale: runs entirely on the calendar-bounded per-type daily
    series; two windows inside the per-type partitioning.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "event_type",
        "d",
        F.col("cents").alias("equity"),
    ).withColumn("peak", F.max("equity").over(w))
    w_lag = Window.partitionBy("event_type").orderBy("d")
    flagged = cum.select(
        "event_type",
        "d",
        F.when(F.col("equity") < F.col("peak"), 1).otherwise(0).alias("under"),
    ).withColumn(
        "run_start",
        F.when(
            (F.col("under") == 1)
            & (F.coalesce(F.lag("under").over(w_lag), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("run_start").over(w)
    )
    spans = (
        runs.where(F.col("under") == 1)
        .groupBy("event_type", "run_id")
        .agg(F.count("*").alias("days_under"))
    )
    return (
        spans.groupBy("event_type")
        .agg(
            F.count("*").alias("n_drawdowns"),
            F.max("days_under").cast("long").alias("worst_recovery_days"),
            F.sum("days_under").cast("long").alias("total_days_under"),
            F.expr("CAST(SUM(days_under) DIV COUNT(*) AS BIGINT)").alias(
                "mean_recovery_days"
            ),
        )
        .orderBy("event_type")
    )
