"""Round-3 extension pack #45: bitemporal as-of accounting and
interval-union coverage.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — bitemporal ("as we knew it then" vs "as we know it now")
accounting from the temporal-database literature (Snodgrass), and the
merge-overlapping-intervals / union-length query (the gaps-and-islands
classic) — re-expressed on the public PySpark DataFrame API over the
driver's testdata. They complete the temporal family next to
`scd2_user_type_history` (valid-time only) and `join_dim_snapshot_asof`
(single time axis): bitemporal adds the TRANSACTION-time axis that
restatement audits need.

Hash-parity discipline (round-3 standard): the correction log is a
DETERMINISTIC synthesis (every order whose key ≡ 0 mod REVISE_MOD gets
one restatement 30 days later at 98% of the original cents), the as-of
instant is derived from the data (max order date minus ASOF_BACK_DAYS),
money folds exact integer cents, and interval endpoints are exact epoch
seconds (session TZ is pinned UTC by the catalog loader).

Scale posture (SURVEY.md §7.6): the bitemporal pick is one window over
the per-order version log (shuffle on the entity key — the natural
partitioning of any version store); interval merging is one window per
user plus a two-level aggregation, never a self-join — the O(n²)
interval-overlap trap is exactly what the cummax-island trick removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

REVISE_MOD = 7  # orders with key % 7 == 0 get a restatement version
REVISE_LAG_DAYS = 30  # restatement lands 30 days after the order date
REVISE_PCT = 98  # restated price = 98% of the original cents (floor)
ASOF_BACK_DAYS = 365  # report "as known" one year before the data's edge


@register(
    "join_bitemporal_asof",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_orderdate,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    asof_t AS (
        SELECT max(o_orderdate) - INTERVAL {ASOF_BACK_DAYS} DAY AS t FROM base
    ),
    versions AS (
        SELECT o_orderkey, o_orderstatus, 0 AS version,
               o_orderdate AS tx_ts, cents
        FROM base
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 1 AS version,
               o_orderdate + INTERVAL {REVISE_LAG_DAYS} DAY AS tx_ts,
               cents * {REVISE_PCT} // 100 AS cents
        FROM base WHERE o_orderkey % {REVISE_MOD} = 0
    ),
    known AS (  -- what the books said at the as-of instant
        SELECT o_orderkey, o_orderstatus, cents,
               row_number() OVER (PARTITION BY o_orderkey
                                  ORDER BY tx_ts DESC, version DESC) AS rn
        FROM versions, asof_t WHERE tx_ts <= t
    ),
    asof_pick AS (
        SELECT o_orderkey, o_orderstatus, cents FROM known WHERE rn = 1
    ),
    current_pick AS (
        SELECT o_orderkey, cents,
               row_number() OVER (PARTITION BY o_orderkey
                                  ORDER BY tx_ts DESC, version DESC) AS rn
        FROM versions
    ),
    joined AS (
        SELECT a.o_orderstatus, a.cents AS asof_cents, c.cents AS cur_cents
        FROM asof_pick a
        JOIN (SELECT o_orderkey, cents FROM current_pick WHERE rn = 1) c
          ON a.o_orderkey = c.o_orderkey
    )
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_known,
           CAST(SUM(asof_cents) AS BIGINT) AS asof_cents,
           CAST(SUM(cur_cents) AS BIGINT) AS current_cents,
           CAST(SUM(CASE WHEN cur_cents <> asof_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_restated_later,
           CAST(SUM(cur_cents - asof_cents) AS BIGINT) AS restatement_cents
    FROM joined
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def join_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of accounting (SURVEY.md §2.3): every order's price
    lives in a version log (original booking, plus a later restatement
    for every REVISE_MOD-th order at REVISE_PCT% of the cents); the
    query reports, per order status, the books AS KNOWN one year before
    the data's edge next to the books AS KNOWN NOW — the restatement
    audit ("how much did later corrections move what we reported?")
    that a single-time-axis SCD cannot answer, because it needs BOTH
    the valid-time entity state and the transaction-time knowledge
    horizon.

    Orders not yet booked at the as-of instant are correctly absent
    from both sides (the books did not know them); restatements landing
    after the instant show up only in the current column — that
    asymmetry IS the bitemporal semantics.

    Exactness: integer cents; the 98% restatement is floor-integer;
    the as-of instant derives from max(o_orderdate), entering the plan
    as a broadcast scalar (no driver action).

    Scale: the version log shuffles once on the entity key (the
    natural partitioning of any version store); both picks are one
    row_number window over that partitioning, and the final aggregate
    is by status — O(|statuses|) out. No time-range self-join.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    asof = base.agg(
        F.expr(
            f"max(o_orderdate) - INTERVAL {ASOF_BACK_DAYS} DAY"
        ).alias("t")
    )
    v0 = base.select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(0).alias("version"),
        F.col("o_orderdate").alias("tx_ts"),
        "cents",
    )
    v1 = base.where(F.col("o_orderkey") % REVISE_MOD == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(1).alias("version"),
        F.expr(f"o_orderdate + INTERVAL {REVISE_LAG_DAYS} DAY").alias("tx_ts"),
        F.expr(f"cents * {REVISE_PCT} DIV 100").alias("cents"),
    )
    versions = v0.unionByName(v1)
    w_pick = Window.partitionBy("o_orderkey").orderBy(
        F.desc("tx_ts"), F.desc("version")
    )
    asof_pick = (
        versions.crossJoin(F.broadcast(asof))
        .where(F.col("tx_ts") <= F.col("t"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            "cents",
            F.row_number().over(w_pick).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", F.col("cents").alias("asof_cents"))
    )
    current_pick = (
        versions.select(
            "o_orderkey", "cents", F.row_number().over(w_pick).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select("o_orderkey", F.col("cents").alias("cur_cents"))
    )
    return (
        asof_pick.join(current_pick, "o_orderkey")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_known"),
            F.sum("asof_cents").cast("long").alias("asof_cents"),
            F.sum("cur_cents").cast("long").alias("current_cents"),
            F.sum(
                F.when(F.col("cur_cents") != F.col("asof_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_restated_later"),
            F.sum(F.col("cur_cents") - F.col("asof_cents"))
            .cast("long")
            .alias("restatement_cents"),
        )
        .orderBy("status")
    )


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
               CAST(floor(epoch(ts)) AS BIGINT)
                   + CAST(round(value * 100) AS BIGINT) % 3600 + 60 AS end_s,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, start_s, end_s, event_id,
               CASE WHEN start_s <= max(end_s) OVER (
                        PARTITION BY user_id
                        ORDER BY start_s, end_s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS is_island_start
        FROM iv
    ),
    islanded AS (
        SELECT user_id, start_s, end_s,
               SUM(is_island_start) OVER (
                   PARTITION BY user_id
                   ORDER BY start_s, end_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ),
    islands AS (
        SELECT user_id, island,
               CAST(COUNT(*) AS BIGINT) AS n_iv,
               min(start_s) AS i_start, max(end_s) AS i_end
        FROM islanded GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_end - i_start) AS BIGINT) AS covered_s,
           CAST(max(i_end) - min(i_start) AS BIGINT) AS span_s,
           CAST((1000000 * SUM(i_end - i_start))
                // (max(i_end) - min(i_start)) AS BIGINT)
               AS utilization_micro
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user (SURVEY.md §2.4): each event
    opens an activity interval (duration derived deterministically from
    its value cents: cents % 3600 + 60 seconds); the query merges
    overlapping intervals per user — the gaps-and-islands classic — and
    reports total COVERED seconds (union length, overlaps counted
    once), island count, span, and utilization. The billing/SLA query
    ("how long was the user actually active?") that a plain
    SUM(duration) double-counts and a naive overlap self-join computes
    in O(n²).

    Island detection is the cummax trick: an interval starts a new
    island iff its start exceeds the running max end of every earlier
    interval (ordered by (start, end, event_id) so ties can never
    split differently on the two engines). Epochs are exact integer
    seconds under the catalog's pinned-UTC session.

    Scale: one shuffle on user_id, then two windows and a two-level
    aggregation INSIDE that partitioning — no re-shuffle, no
    self-join. This is the shape that survives 100 TB of events: cost
    is a per-user sort, and AQE handles the skewed-user case.
    """
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("start_s"),
        (
            F.unix_timestamp("ts").cast("long")
            + F.expr("CAST(round(value * 100) AS BIGINT) % 3600")
            + 60
        ).alias("end_s"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "end_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "start_s",
        "end_s",
        "event_id",
        F.when(
            F.col("start_s") <= F.max("end_s").over(w_prev), 0
        )
        .otherwise(1)
        .alias("is_island_start"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "end_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islanded = flagged.select(
        "user_id",
        "start_s",
        "end_s",
        F.sum("is_island_start").over(w_cum).alias("island"),
    )
    islands = islanded.groupBy("user_id", "island").agg(
        F.count("*").alias("n_iv"),
        F.min("start_s").alias("i_start"),
        F.max("end_s").alias("i_end"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count("*").alias("n_islands"),
            F.sum(F.col("i_end") - F.col("i_start"))
            .cast("long")
            .alias("covered_s"),
            (F.max("i_end") - F.min("i_start")).cast("long").alias("span_s"),
            F.expr(
                "CAST((1000000 * SUM(i_end - i_start)) "
                "DIV (max(i_end) - min(i_start)) AS BIGINT)"
            ).alias("utilization_micro"),
        )
        .orderBy("user_id")
    )
