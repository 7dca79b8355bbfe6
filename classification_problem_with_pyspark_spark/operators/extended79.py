"""Round-3 extension pack #79: MTBF/MTTR reliability accounting and
the rounding-modes semantics suite.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — MTBF/MTTR (mean time between failures / mean time to
repair, the reliability-engineering pair every SRE dashboard and
maintenance contract quotes) and SQL rounding-mode semantics
(HALF_UP vs HALF_EVEN/banker's — the .5-boundary divergence that
moves real money and that every engine pair must have pinned before
any financial parity claim) — re-expressed on the public PySpark
DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): failures are 'error'
events; repair closes at the user's next non-error event and the next
failure opens after a repair — both derived from LOCF/LEAD windows
under the (ts, event_id) total order, all exact integer seconds. The
rounding suite builds exact .5-boundary values from integer halves
(k + 1/2 exactly representable in binary — no synthesis noise), pins
Spark round() == DuckDB round() (HALF_UP away from zero) and
hand-rolls HALF_EVEN identically on both engines (DuckDB has no
banker's round; Spark's bround is deliberately NOT used so the same
expression runs on both).

Scale posture (SURVEY.md §7.6): MTBF/MTTR is two windows inside the
per-user shuffle + one rollup; the rounding suite is a constant-space
per-row projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "events_mtbf_mttr",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS t,
               LAG(event_type) OVER w AS prev_type,
               LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS prev_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    failures AS (  -- failure START: an error not preceded by an error
        SELECT user_id, t
        FROM seq
        WHERE event_type = 'error'
          AND (prev_type IS NULL OR prev_type <> 'error')
    ),
    repairs AS (  -- repair: a non-error directly after an error
        SELECT user_id, t, prev_t
        FROM seq
        WHERE event_type <> 'error' AND prev_type = 'error'
    ),
    tbf AS (  -- gaps between consecutive failure starts, per user
        SELECT user_id, t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   AS gap_s
        FROM failures
    )
    SELECT
        CAST((SELECT COUNT(*) FROM failures) AS BIGINT) AS n_failures,
        CAST((SELECT COUNT(*) FROM repairs) AS BIGINT) AS n_repairs,
        CAST((SELECT SUM(gap_s) // COUNT(*) FROM tbf WHERE gap_s IS NOT NULL)
             AS BIGINT) AS mtbf_s,
        CAST((SELECT SUM(t - prev_t) // COUNT(*) FROM repairs) AS BIGINT)
            AS mttr_s,
        CAST((SELECT MAX(t - prev_t) FROM repairs) AS BIGINT)
            AS worst_repair_s
    """,
)
def events_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF / MTTR (SURVEY.md §2.4): failures are error-run STARTS in
    each user's stream (an 'error' not preceded by one — consecutive
    errors are one incident, the run-length convention every incident
    tracker uses); a repair is the first non-error after an error,
    timed from the LAST error before it. MTBF = mean gap between
    failure starts, MTTR = mean repair time, worst-repair alongside —
    the reliability pair every SRE review quotes, derived from an
    event log with two windows and no state machine.

    Users whose trailing events are errors have an open incident with
    no repair — correctly absent from MTTR (unrepaired ≠ repaired
    slowly; censoring it in would flatter the number).

    Exactness: floored epoch seconds, integer floor means.

    Scale: LAG/LEAD windows inside the per-user shuffle + scalar
    rollups. The streaming twin is a 2-state machine; the batch
    algebra here is its replay.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_timestamp("ts").cast("long")
    seq = e.select(
        "user_id",
        "event_type",
        t.alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(t).over(w).alias("prev_t"),
    )
    failures = seq.where(
        (F.col("event_type") == "error")
        & (F.col("prev_type").isNull() | (F.col("prev_type") != "error"))
    ).select("user_id", "t")
    repairs = seq.where(
        (F.col("event_type") != "error") & (F.col("prev_type") == "error")
    ).select("user_id", "t", "prev_t")
    w_f = Window.partitionBy("user_id").orderBy("t")
    tbf = failures.select(
        (F.col("t") - F.lag("t").over(w_f)).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    n_f = failures.agg(F.count("*").alias("n_failures"))
    rep = repairs.agg(
        F.count("*").alias("n_repairs"),
        F.expr("CAST(SUM(t - prev_t) DIV COUNT(*) AS BIGINT)").alias("mttr_s"),
        F.max(F.col("t") - F.col("prev_t")).cast("long").alias("worst_repair_s"),
    )
    mtbf = tbf.agg(
        F.expr("CAST(SUM(gap_s) DIV COUNT(*) AS BIGINT)").alias("mtbf_s")
    )
    return (
        n_f.crossJoin(F.broadcast(rep))
        .crossJoin(F.broadcast(mtbf))
        .select("n_failures", "n_repairs", "mtbf_s", "mttr_s", "worst_repair_s")
    )


@register(
    "scalar_rounding_modes_suite",
    oracle="""
    WITH grid AS (  -- exact .5 boundaries: k + 1/2 is exact in binary
        SELECT n_nationkey AS k,
               (CAST(n_nationkey AS DOUBLE) - 12.0) + 0.5 AS x
        FROM nation
    )
    SELECT k,
           ROUND(x, 1) AS x_shown,
           CAST(round(x) AS BIGINT) AS half_away,
           CAST(floor(x) AS BIGINT) AS floor_v,
           CAST(ceil(x) AS BIGINT) AS ceil_v,
           CAST(CASE WHEN x - floor(x) = 0.5
                     THEN CAST(floor(x) AS BIGINT)
                          + CASE WHEN CAST(floor(x) AS BIGINT) % 2 = 0
                                 THEN 0 ELSE 1 END
                     ELSE CAST(round(x) AS BIGINT) END AS BIGINT)
               AS half_even,
           CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                     ELSE ceil(x - 0.5) END AS BIGINT) AS half_away_manual
    FROM grid
    ORDER BY k
    """,
)
def scalar_rounding_modes_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode semantics (SURVEY.md §2.8): a grid of EXACT .5
    boundaries (k − 12 + 1/2 — representable exactly in binary, so
    the boundary genuinely is a boundary) pushed through the modes
    that move money: round() (HALF_UP away from zero — pinned equal
    on both engines, including for NEGATIVE halves, where "up"
    means away from zero, not toward +∞), floor, ceil, a hand-rolled
    HALF_EVEN (banker's — floor + parity bump on exact halves; the
    same expression runs on both engines because DuckDB ships no
    banker's round and relying on Spark's bround would test nothing),
    and a manual floor(x+0.5)/ceil(x−0.5) reconstruction of
    half-away. Every financial-parity claim in this registry rests on
    round() behaving identically at .5 — this key is that claim,
    made falsifiable row by row across the sign change.

    Exactness: the boundaries are exact doubles; every output is an
    integer (plus the ROUND-1 echo of the input).

    Scale: constant-space per-row projection — semantics keys cost
    nothing and prevent everything.
    """
    grid = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        ((F.col("n_nationkey").cast("double") - 12.0) + 0.5).alias("x"),
    )
    # on a .5 boundary the even neighbor is floor when floor is even,
    # floor+1 when floor is odd — for BOTH signs (−11 → −10, 11 → 12)
    half_even = F.expr(
        "CAST(CASE WHEN x - floor(x) = 0.5 "
        "THEN CAST(floor(x) AS BIGINT) "
        "+ CASE WHEN CAST(floor(x) AS BIGINT) % 2 = 0 THEN 0 ELSE 1 END "
        "ELSE CAST(round(x) AS BIGINT) END AS BIGINT)"
    )
    return grid.select(
        "k",
        F.round("x", 1).alias("x_shown"),
        F.expr("CAST(round(x) AS BIGINT)").alias("half_away"),
        F.expr("CAST(floor(x) AS BIGINT)").alias("floor_v"),
        F.expr("CAST(ceil(x) AS BIGINT)").alias("ceil_v"),
        half_even.alias("half_even"),
        F.expr(
            "CAST(CASE WHEN x >= 0 THEN floor(x + 0.5) "
            "ELSE ceil(x - 0.5) END AS BIGINT)"
        ).alias("half_away_manual"),
    ).orderBy("k")
