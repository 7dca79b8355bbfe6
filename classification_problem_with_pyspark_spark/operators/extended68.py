"""Round-3 extension pack #68: time-interval RANGE window frames and
boxplot fences with outlier census.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — SQL RANGE frames bounded by time intervals (`RANGE BETWEEN
INTERVAL '1' HOUR PRECEDING AND CURRENT ROW`, the value-based frame
that row-count frames silently get wrong on irregular event spacing)
and Tukey's boxplot fences (Q1/Q3 ± 1.5·IQR, the exploratory-analysis
outlier rule every BI box-and-whisker plot draws) — re-expressed on
the public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): the interval frame runs
over exact epoch seconds with a numeric RANGE bound (identical frame
semantics spelled numerically on both engines — Spark's SQL interval
frames and DuckDB's differ in type plumbing, epoch seconds do not);
quartiles are exact lower-interpolation order statistics on integer
cents (rank = one-based ceil(q·n) — no midpoint averaging, so no
floats), fences fold integer arithmetic with the 1.5 factor as ×3/2.

Scale posture (SURVEY.md §7.6): the interval frame is one window
inside the per-user shuffle (state bounded by the hour span, not row
count); the boxplot is two rank windows + a census per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

FRAME_S = 3600  # trailing 1-hour value frame


@register(
    "window_range_interval_frame",
    oracle=f"""
    WITH v AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS t,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    framed AS (
        SELECT user_id, event_id, t, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS hour_cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS hour_events
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY t
                     RANGE BETWEEN {FRAME_S} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(MAX(hour_cents) AS BIGINT) AS peak_hour_cents,
           CAST(MAX(hour_events) AS BIGINT) AS peak_hour_events,
           CAST(SUM(hour_cents) AS BIGINT) AS frame_cents_sum
    FROM framed
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (SURVEY.md §2.5): each event's
    trailing-hour spend and event count via `RANGE BETWEEN 3600
    PRECEDING AND CURRENT ROW` over epoch seconds — the VALUE-based
    frame whose semantics a ROWS frame cannot imitate on irregular
    spacing (a quiet hour contributes few rows; ROWS N PRECEDING
    would reach back days), and whose tied-timestamp behavior differs
    too (RANGE includes ALL peers of the current value — both engines
    agree by definition, no tie-break needed, which is exactly why
    the frame is specified on the raw epoch rather than a rownum).
    Reported per user as the peak trailing-hour load and the frame-sum
    aggregate — the rate-limiter / surge-pricing view.

    The interval bound is spelled as NUMERIC epoch seconds on both
    engines: Spark's `INTERVAL` RANGE frames and DuckDB's differ in
    type plumbing, but integers do not — the portable form of a
    time-interval frame, and the reason the key exists.

    Exactness: integer epochs and cents throughout.

    Scale: one window inside the per-user shuffle; RANGE frame state
    is bounded by the hour's events, not a row count — the streaming
    twin is the sliding window, and both size state by TIME.
    """
    v = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("t"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-FRAME_S, 0)
    )
    framed = v.select(
        "user_id",
        F.sum("cents").over(w).alias("hour_cents"),
        F.count("*").over(w).alias("hour_events"),
    )
    return (
        framed.groupBy("user_id")
        .agg(
            F.max("hour_cents").cast("long").alias("peak_hour_cents"),
            F.max("hour_events").cast("long").alias("peak_hour_events"),
            F.sum("hour_cents").cast("long").alias("frame_cents_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_boxplot_fences",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    ranked AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    quartiles AS (
        SELECT event_type,
               MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med,
               MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN cents END) AS q3
        FROM ranked GROUP BY event_type
    ),
    fenced AS (
        SELECT q.event_type, q.q1, q.med, q.q3,
               q.q1 - (3 * (q.q3 - q.q1)) // 2 AS lo_fence,
               q.q3 + (3 * (q.q3 - q.q1)) // 2 AS hi_fence
        FROM quartiles q
    )
    SELECT f.event_type,
           CAST(f.q1 AS BIGINT) AS q1_cents,
           CAST(f.med AS BIGINT) AS median_cents,
           CAST(f.q3 AS BIGINT) AS q3_cents,
           CAST(f.lo_fence AS BIGINT) AS lo_fence_cents,
           CAST(f.hi_fence AS BIGINT) AS hi_fence_cents,
           CAST(SUM(CASE WHEN v.cents < f.lo_fence
                         OR v.cents > f.hi_fence THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM fenced f JOIN v ON v.event_type = f.event_type
    GROUP BY f.event_type, f.q1, f.med, f.q3, f.lo_fence, f.hi_fence
    ORDER BY f.event_type
    """,
)
def agg_boxplot_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot fences (SURVEY.md §2.4): Tukey's five-number outlier
    rule per event type — Q1/median/Q3 as EXACT one-based order
    statistics (rank ceil(q·(n−?)) spelled as integer (n+3)//4,
    (n+1)//2, (3n+1)//4 — lower-interpolation, so no midpoint floats
    ever appear), fences at Q1−1.5·IQR and Q3+1.5·IQR with the 1.5
    folded as ×3//2, and the count of points outside the fences. The
    rule behind every box-and-whisker; pinning the RANK convention is
    the point — quartile definitions differ across tools, and a hash
    check forces one to be stated.

    Exactness: integer cents, integer ranks, integer fences.

    Scale: one rank window per group + one broadcast-fence recount —
    at 100 TB the quartiles come from approx_percentile and only the
    fence recount stays exact (one conditional scan), same answer
    shape at a fraction of the sort.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("cents", "event_id")
    w_n = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "cents",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    quartiles = ranked.groupBy("event_type").agg(
        F.max(F.expr("CASE WHEN rn = (n + 3) DIV 4 THEN cents END")).alias("q1"),
        F.max(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN cents END")).alias("med"),
        F.max(F.expr("CASE WHEN rn = (3 * n + 1) DIV 4 THEN cents END")).alias(
            "q3"
        ),
    )
    fenced = quartiles.select(
        "event_type",
        "q1",
        "med",
        "q3",
        F.expr("q1 - (3 * (q3 - q1)) DIV 2").alias("lo_fence"),
        F.expr("q3 + (3 * (q3 - q1)) DIV 2").alias("hi_fence"),
    )
    return (
        v.join(fenced, "event_type")
        .groupBy("event_type", "q1", "med", "q3", "lo_fence", "hi_fence")
        .agg(
            F.sum(
                F.when(
                    (F.col("cents") < F.col("lo_fence"))
                    | (F.col("cents") > F.col("hi_fence")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("q1").cast("long").alias("q1_cents"),
            F.col("med").cast("long").alias("median_cents"),
            F.col("q3").cast("long").alias("q3_cents"),
            F.col("lo_fence").cast("long").alias("lo_fence_cents"),
            F.col("hi_fence").cast("long").alias("hi_fence_cents"),
            "n_outliers",
        )
        .orderBy("event_type")
    )
