"""Round-3 extension pack #81: water-filling fair allocation and
on-balance volume.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — max-min fair (water-filling) allocation (the bandwidth/
budget-sharing algorithm: raise a common waterline until the budget is
spent, capping each consumer at its demand — RFC-attested fairness for
links, and the token-budget split a data-mixture scheduler runs) and
on-balance volume (Granville 1963: the running sum of signed volume,
the classic accumulation/distribution indicator) — re-expressed on the
public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): saturation is decided by
the INTEGER inequality capᵢ·(remaining consumers) ≤ remaining budget
under the (cap, source) total order — no rational waterline ever
materializes; the unsaturated remainder splits by the pack-51
largest-remainder discipline, so the allocation sums to the budget
EXACTLY. OBV folds integer cents and a pinned (day) order with sign
from exact daily-total comparisons.

Scale posture (SURVEY.md §7.6): water-filling is one sort + prefix
window over the CONSUMER table (sources — tiny), never the corpus;
OBV is one daily aggregate + one cumulative window per type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum, grid_rank
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

BUDGET_NUM = 1  # budget = total demand * 1/2 (oversubscribed by design)
BUDGET_DEN = 2


@register(
    "agg_waterfill_fair_allocation",
    oracle=f"""
    WITH demand AS (  -- per-source token demand (its corpus size)
        SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS cap
        FROM documents GROUP BY source
    ),
    budgeted AS (
        SELECT source, cap,
               CAST((SELECT SUM(cap) FROM demand) * {BUDGET_NUM}
                    // {BUDGET_DEN} AS BIGINT) AS budget,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_src,
               row_number() OVER (ORDER BY cap, source) AS rk,
               CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS prefix_cap
        FROM demand
    ),
    classed AS (  -- saturated iff cap·(consumers from here on) fits
        SELECT *,
               cap * (n_src - rk + 1) <= budget - prefix_cap AS saturated
        FROM budgeted
    ),
    sat AS (
        SELECT CAST(COALESCE(SUM(cap), 0) AS BIGINT) AS sat_total,
               CAST(COUNT(*) AS BIGINT) AS n_sat
        FROM classed WHERE saturated
    ),
    unsat AS (
        SELECT c.source, c.cap, c.budget, c.saturated,
               c.budget - s.sat_total AS rem_budget,
               c.n_src - s.n_sat AS n_unsat,
               row_number() OVER (ORDER BY c.cap DESC, c.source) AS brk
        FROM classed c, sat s
    )
    SELECT source, cap AS demand_tokens, saturated,
           CAST(CASE WHEN saturated THEN cap
                ELSE rem_budget // n_unsat
                     + CASE WHEN brk <= rem_budget % n_unsat
                            THEN 1 ELSE 0 END
                END AS BIGINT) AS allocated_tokens
    FROM unsat
    ORDER BY source
    """,
)
def agg_waterfill_fair_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair allocation (SURVEY.md §2.12): split a token budget
    (half the total demand — oversubscribed by design) across sources
    by water-filling: small sources get everything they asked for
    (saturated), the rest share the remaining budget EQUALLY — the
    fairness rule of bandwidth allocation and the budget split a
    data-mixture scheduler runs before sampling. Saturation is decided
    by the integer inequality capᵢ·(remaining consumers) ≤ remaining
    budget, processed in (cap ASC, source) order — the waterline never
    materializes as a fraction; the equal share among unsaturated
    sources uses the pack-51 largest-remainder bump (tie order
    (cap DESC, source)), so Σ allocations = budget EXACTLY when any
    source is unsaturated (asserted in tests, with the conservation
    law and the max-min property — no unsaturated source gets less
    than any other's allocation).

    Exactness: integer tokens end to end.

    Scale: the whole algorithm runs on the per-SOURCE demand table
    (one corpus aggregate reduces to it); sort + prefix window over
    |sources| rows. The corpus is touched once, for demand.
    """
    demand = (
        load(spark, sf_dir, "documents")
        .select("source", F.size(F.split("text", " ")).alias("toks"))
        .groupBy("source")
        .agg(F.sum("toks").cast("long").alias("cap"))
    )
    tot = demand.agg(
        F.expr(
            f"CAST(SUM(cap) * {BUDGET_NUM} DIV {BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
        F.count("*").alias("n_src"),
    )
    budgeted = grid_cumsum(
        grid_rank(demand.crossJoin(F.broadcast(tot)), ["cap", "source"], "rk"),
        ["cap", "source"],
        [("prefix_cap", "cap")],
        keep=["source", "cap", "budget", "n_src", "rk"],
        frame_end=-1,
    )
    classed = budgeted.withColumn(
        "saturated",
        F.col("cap") * (F.col("n_src") - F.col("rk") + 1)
        <= F.col("budget") - F.col("prefix_cap"),
    )
    sat = classed.where("saturated").agg(
        F.coalesce(F.sum("cap"), F.lit(0)).cast("long").alias("sat_total"),
        F.count("*").alias("n_sat"),
    )
    unsat = grid_rank(
        classed.crossJoin(F.broadcast(sat)), [F.desc("cap"), "source"], "brk"
    ).select(
        "source",
        "cap",
        "saturated",
        (F.col("budget") - F.col("sat_total")).alias("rem_budget"),
        (F.col("n_src") - F.col("n_sat")).alias("n_unsat"),
        "brk",
    )
    return unsat.select(
        "source",
        F.col("cap").alias("demand_tokens"),
        "saturated",
        F.when(F.col("saturated"), F.col("cap"))
        .otherwise(
            F.expr(
                "rem_budget DIV n_unsat "
                "+ CASE WHEN brk <= rem_budget % n_unsat THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("allocated_tokens"),
    ).orderBy("source")


@register(
    "window_on_balance_volume",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    signed AS (
        SELECT event_type, d, vol,
               CASE WHEN cents > LAG(cents) OVER w THEN vol
                    WHEN cents < LAG(cents) OVER w THEN -vol
                    ELSE 0 END AS signed_vol
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(SUM(signed_vol) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv
    FROM signed
    ORDER BY event_type, day
    """,
)
def window_on_balance_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume (SURVEY.md §2.5): per event type's daily
    series, add the day's event count when the daily cents total rose,
    subtract it when it fell, carry the running sum — Granville's OBV,
    the original accumulation/distribution indicator (divergence
    between OBV and the price line is the classic early signal).
    Completes the technical-indicator family (Bollinger, EWMA,
    drawdown) with the volume-flow member; the first day's change is
    undefined and contributes ZERO, by the stated convention (not by
    accident of null arithmetic).

    Exactness: integer cents comparisons and integer volumes; the
    running sum is a pinned-order window.

    Scale: one daily aggregate (map-side combinable) + a LAG and a
    cumulative window over the calendar-bounded per-type series.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents"),
            F.count("*").alias("vol"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    signed = daily.select(
        "event_type",
        "d",
        F.when(F.col("cents") > F.lag("cents").over(w), F.col("vol"))
        .when(F.col("cents") < F.lag("cents").over(w), -F.col("vol"))
        .otherwise(0)
        .alias("signed_vol"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return signed.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.sum("signed_vol").over(w_cum).cast("long").alias("obv"),
    ).orderBy("event_type", "day")
