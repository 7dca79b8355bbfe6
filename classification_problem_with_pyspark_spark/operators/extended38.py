"""Round-3 extension pack #38: sliding-window peak velocity and
ID-space gap auditing.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. The patterns are public
knowledge — per-entity peak request velocity over a sliding time window
(the rate-limit / fraud-burst audit) and monotonic-ID gap detection (the
ingestion-loss audit every CDC pipeline runs on its sequence columns) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): the sliding window is an
integer RANGE frame over epoch-µs (both engines define RANGE bounds
arithmetically on the same integers); peaks tie-break on the earliest
window end; gap islands are pure lag arithmetic on BIGINT keys.

Scale posture (SURVEY.md §7.6): velocity is ONE per-user RANGE-frame
window (Spark evaluates growing/sliding frames incrementally — only
shrinking unbounded-FOLLOWING frames are the O(n²) trap this round
fixed in the skyline); the gap audit is a single ordered lag pass over
the key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_shift
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

VELOCITY_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "events_peak_velocity_1h",
    oracle=f"""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS tu, event_id FROM events
    ),
    windowed AS (
        SELECT user_id, tu, event_id,
               CAST(count(*) OVER (
                   PARTITION BY user_id ORDER BY tu
                   RANGE BETWEEN {VELOCITY_WINDOW_US} PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS n_in_window
        FROM t
    ),
    ranked AS (
        SELECT user_id, n_in_window, tu,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n_in_window DESC, tu, event_id)
                   AS rn
        FROM windowed
    )
    SELECT user_id, n_in_window AS peak_events_1h,
           CAST(tu AS BIGINT) AS peak_window_end_us
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
)
def events_peak_velocity_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak 1-hour request velocity per user (SURVEY.md §2.5): the
    maximum number of events any user fires inside a sliding one-hour
    window (ending at an event), plus when that peak window closed —
    the rate-limit sizing / fraud-burst audit, answered exactly by one
    integer RANGE frame over epoch-µs (every event's window count is
    the events in (t−1h, t]); the peak picks the EARLIEST maximal
    window by (count DESC, time, event_id) total order.

    Exactness: RANGE bounds are integer µs on both engines; counts are
    exact; the peak pick is total-order deterministic.

    Scale: one user-keyed sliding-frame window (incremental
    evaluation — the frame only ever advances) + a per-user top-1
    (WindowGroupLimit drops losers before the shuffle boundary).
    """
    e = load(spark, sf_dir, "events")
    t = e.select("user_id", F.unix_micros("ts").alias("tu"), "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("tu")
        .rangeBetween(-VELOCITY_WINDOW_US, Window.currentRow)
    )
    windowed = t.select(
        "user_id",
        "tu",
        "event_id",
        F.count("*").over(w).cast("long").alias("n_in_window"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.desc("n_in_window"), "tu", "event_id"
    )
    return (
        windowed.select(
            "user_id",
            "n_in_window",
            "tu",
            F.row_number().over(w_rank).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_in_window").alias("peak_events_1h"),
            F.col("tu").cast("long").alias("peak_window_end_us"),
        )
        .orderBy("user_id")
    )


@register(
    "audit_monotonic_id_gaps",
    oracle="""
    WITH dk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    keys AS (
        SELECT k, lag(k) OVER (ORDER BY k) AS prev FROM dk
    ),
    gaps AS (
        SELECT prev + 1 AS gap_start, k - 1 AS gap_end, k - prev - 1 AS gap_len
        FROM keys WHERE prev IS NOT NULL AND k - prev > 1
    )
    SELECT CAST(gap_start AS BIGINT) AS gap_start,
           CAST(gap_end AS BIGINT) AS gap_end,
           CAST(gap_len AS BIGINT) AS gap_len
    FROM gaps ORDER BY gap_start
    """,
)
def audit_monotonic_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-ID gap audit over the order keys REFERENCED by
    lineitem (SURVEY.md §2.4 audit family): every missing-ID island in
    the distinct l_orderkey sequence as a (start, end, length) range —
    the ingestion-loss check CDC pipelines run on sequence columns (a
    gap is a dropped batch or an upstream filter; either way you want
    the RANGES, not a count, so you can re-request exactly the missing
    window). On this corpus the ranges are precisely the 257 line-less
    orders `audit_order_reconciliation` counts, here localized to
    re-requestable key windows. The KEY-space twin of
    `events_outage_runs`' time-space gaps.

    Exactness: one lag pass over sorted distinct BIGINT keys; pure
    integer arithmetic.

    Scale: the consecutive-pair set over the globally sorted key
    sequence decomposes exactly into (a) within-bucket pairs under a
    PARTITIONED lag (bucket = k DIV 2^20 — each window partition holds
    ≤1M keys) plus (b) one stitch pair per non-empty-bucket boundary
    (last key of bucket i, first key of the next non-empty bucket),
    whose lag runs over the BUCKET GRID (keyspace/2^20 rows, ~10^6 at a
    10^12 keyspace), never the key relation. Distinct + bucketed sort
    is the audit's honest cost (at scale the range-metadata/zonemap
    path pre-localizes candidate buckets — see
    `layout_zonemap_prune_audit`).
    """
    li = load(spark, sf_dir, "lineitem")
    dk = li.select(F.col("l_orderkey").alias("k")).distinct()
    bucket = F.expr(f"k DIV {1 << 20}")
    w_in = Window.partitionBy("b").orderBy("k")
    within = (
        dk.withColumn("b", bucket)
        .select("k", F.lag("k").over(w_in).alias("prev"))
        .where(F.col("prev").isNotNull())
    )
    stitch = (
        grid_shift(
            dk.groupBy(bucket.alias("b")).agg(
                F.min("k").alias("k"), F.max("k").alias("bmax")
            ),
            ["b"],
            [("prev", "bmax", -1)],
        )
        .select("k", "prev")
        .where(F.col("prev").isNotNull())
    )
    keys = within.unionByName(stitch)
    return (
        keys.where(F.col("k") - F.col("prev") > 1)
        .select(
            (F.col("prev") + 1).cast("long").alias("gap_start"),
            (F.col("k") - 1).cast("long").alias("gap_end"),
            (F.col("k") - F.col("prev") - 1).cast("long").alias("gap_len"),
        )
        .orderBy("gap_start")
    )
