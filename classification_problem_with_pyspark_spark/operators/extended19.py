"""Round-3 extension pack #19: revenue-analytics and operations
completions — cohort LTV curves, outage-gap detection, and a payload
schema-validation audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. All patterns are public
knowledge — cohort lifetime-value triangles (the subscription-analytics
staple), max-inter-arrival outage detection, and ingest-side payload
schema validation — expressed on the public PySpark DataFrame API over
the driver's testdata.

Hash-parity discipline (round-3 standard): money in integer cents with
window cumsums; gaps in exact epoch microseconds; validation classes by
REGEX (identical pattern dialect both engines — deliberately not each
engine's JSON parser, whose edge-case validity judgments could diverge).

Scale posture (SURVEY.md §7.6):
- LTV: two user-keyed aggregates + a bounded (cohort, age) cumsum.
- Outage runs: one per-type lag window over ordered events — at
  100 TB pre-aggregate to per-minute counts first and lag THOSE
  (bounded), same output for gaps ≥ 1 min.
- Validation: one scan, regex classes, map-side-combinable counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "events_cohort_ltv_curve",
    oracle="""
    WITH firstbuy AS (
        SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS c_day
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), cohorts AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01', c_day) // 7 AS BIGINT)
                   AS cohort
        FROM firstbuy
    ), value_weeks AS (
        SELECT c.cohort,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', e.ts) AS DATE)) // 7
                    AS BIGINT) AS age_week,
               CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e JOIN cohorts c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT cohort, age_week, active_users, cents,
           CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age_week)
                AS BIGINT) AS cum_cents
    FROM value_weeks ORDER BY cohort, age_week
    """,
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve (SURVEY.md §2.13): users grouped by
    FIRST-PURCHASE week, then per (cohort, calendar-week) the active
    buyers, exact purchase cents, and the cohort's CUMULATIVE revenue —
    the LTV triangle every subscription dashboard draws, and the value
    twin of `events_retention_cohorts` (which counts presence, not
    revenue). At sf0.01: 3 cohorts × up to 5 ages, later cohorts
    strictly smaller (first-purchase assignment is exclusive).

    Exactness: integer cents end-to-end; the cumulative sum is a
    bounded window over ≤5 rows per cohort.

    Scale: one user-keyed aggregate for cohort assignment (broadcast
    back — users with purchases are a shrinking subset), one fact
    aggregate to (cohort, week), then the tiny cumsum. No global sort.
    """
    e = load(spark, sf_dir, "events")
    week = lambda col: F.floor(  # noqa: E731
        F.datediff(F.to_date(F.date_trunc("day", col)), F.lit("2024-01-01")) / 7
    ).cast("long")
    purchases = e.where(F.col("event_type") == "purchase")
    cohorts = purchases.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort")
    )
    value_weeks = (
        purchases.join(cohorts, "user_id")
        .groupBy("cohort", week(F.col("ts")).alias("age_week"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.countDistinct("user_id").alias("active_users"),
        )
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return value_weeks.select(
        "cohort",
        "age_week",
        "active_users",
        "cents",
        F.sum("cents").over(wcum).cast("long").alias("cum_cents"),
    ).orderBy("cohort", "age_week")


@register(
    "events_outage_runs",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts,
               lag(ts) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT event_type, prev_ts AS gap_start, ts AS gap_end,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM seq
    WHERE prev_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(prev_ts) > CAST(5400000000 AS BIGINT)
    ORDER BY event_type, gap_start
    """,
)
def events_outage_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outage-gap detection (SURVEY.md §2.14): per event type, every
    inter-arrival gap exceeding 90 minutes, emitted as an INTERVAL
    (last event before silence, first event after, exact µs duration)
    — the pager query for "feed X went quiet": 149 such silences at
    sf0.01. `events_inter_arrival` profiles the gap DISTRIBUTION; this
    key materializes the actionable incidents, timestamps included.

    Exactness: gaps in integer epoch microseconds; ordering ties broken
    by event_id (the stream_session_30m determinism lesson).

    Scale: one lag window keyed by type. At 100 TB lag a per-minute
    count series instead (bounded rows, same ≥1-min gaps) — the
    docstring contract for the rewrite is identical output.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    return (
        seq.where(F.col("prev_ts").isNotNull() & (gap > F.lit(5400000000)))
        .select(
            "event_type",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            gap.alias("gap_us"),
        )
        .orderBy("event_type", "gap_start")
    )


@register(
    "audit_props_schema_validation",
    oracle="""
    WITH mangled AS (
        SELECT event_type,
               CASE
                   WHEN event_id % 7 = 0 THEN substring(props, 1, length(props) - 1)
                   WHEN event_id % 7 = 1 THEN replace(props, ': ', ': "x')
                   ELSE props
               END AS payload
        FROM events
    ), classified AS (
        SELECT event_type,
               CASE
                   WHEN regexp_matches(payload, '^\\{"k": -?[0-9]+\\}$')
                       THEN 'valid'
                   WHEN NOT regexp_matches(payload, '\\}$') THEN 'truncated'
                   ELSE 'wrong_type'
               END AS cls
        FROM mangled
    )
    SELECT event_type, cls, CAST(count(*) AS BIGINT) AS n
    FROM classified GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def audit_props_schema_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload schema-validation audit (SURVEY.md §2.14), the ingest
    gate: classify every event's JSON props as valid / truncated /
    wrong-type against the expected `{"k": <int>}` contract, counted
    per (event_type, class). Malformation is injected
    deterministically (mod-7 truncation, mod-7+1 type corruption) —
    the operator is the audit, the mangling is the fixture (the
    source_csv_malformed discipline).

    Classification is by REGEX, deliberately not each engine's JSON
    parser: json-validity edge cases (trailing data, duplicate keys,
    lone surrogates) are where parser dialects diverge, and an audit
    whose verdict depends on the auditor's parser is not an audit.
    The regex dialect used (anchors, character classes, quantifiers)
    is the portable core both engines treat identically.

    Scale: one scan, two regexes per row, map-side-combinable counts.
    """
    e = load(spark, sf_dir, "events")
    payload = (
        F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .when(F.col("event_id") % 7 == 1, F.regexp_replace("props", ": ", ': "x'))
        .otherwise(F.col("props"))
    )
    mangled = e.select("event_type", payload.alias("payload"))
    cls = (
        F.when(
            F.col("payload").rlike('^\\{"k": -?[0-9]+\\}$'), F.lit("valid")
        )
        .when(~F.col("payload").rlike("\\}$"), F.lit("truncated"))
        .otherwise(F.lit("wrong_type"))
    )
    return (
        mangled.select("event_type", cls.alias("cls"))
        .groupBy("event_type", "cls")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "cls")
    )
