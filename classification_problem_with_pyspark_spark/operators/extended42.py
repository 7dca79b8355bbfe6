"""Round-3 extension pack #42: nearest-direction as-of join and the
Hodges-Lehmann pseudo-median.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. The patterns are public
knowledge — pandas' merge_asof(direction='nearest') semantics and the
Hodges-Lehmann estimator (1963: the median of all pairwise Walsh
averages, the location estimator behind the Wilcoxon signed-rank test) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): nearest-asof resolves by
exact integer µs distances with a both-engines tie rule (backward wins
ties); Walsh averages stay integral in DOUBLED units (walsh2 = xᵢ + xⱼ)
and the pseudo-median uses the lo+hi order-statistic pick — the
median2/mad4 discipline, property-tested in
tests/test_exact_statistics_properties.py.

Scale posture (SURVEY.md §7.6): nearest-asof is TWO growing-frame
windows over the per-user interleaved stream (the backward/forward asof
machinery composed — no join at all); Hodges-Lehmann pairs the BOUNDED
daily aggregate with itself (~n²/2 rows of two ints; n is the date
span, not the data), never raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "join_asof_nearest",
    oracle="""
    WITH stream AS (
        SELECT user_id, event_id, epoch_us(ts) AS tu,
               event_type = 'purchase' AS is_p
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    marked AS (
        SELECT user_id, event_id, tu, is_p,
               last_value(CASE WHEN is_p THEN tu END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY tu, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_p,
               first_value(CASE WHEN is_p THEN tu END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY tu, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_p
        FROM stream
    )
    SELECT user_id, event_id AS click_id, CAST(tu AS BIGINT) AS click_us,
           CAST(CASE
                WHEN prev_p IS NULL THEN next_p
                WHEN next_p IS NULL THEN prev_p
                WHEN tu - prev_p <= next_p - tu THEN prev_p
                ELSE next_p END AS BIGINT) AS nearest_purchase_us,
           CAST(least(COALESCE(tu - prev_p, 9223372036854775807),
                      COALESCE(next_p - tu, 9223372036854775807))
                AS BIGINT) AS gap_us
    FROM marked WHERE NOT is_p
    ORDER BY user_id, click_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of match (SURVEY.md §2.3): every click
    paired with its temporally CLOSEST purchase by the same user,
    whichever side it falls on — pandas' merge_asof(direction=
    'nearest'), completing the as-of trio (backward `join_asof_events`,
    forward `join_asof_forward`, tolerance `join_asof_tolerance`). Ties
    resolve backward (the pandas rule), pinned by the exact integer
    comparison tu − prev ≤ next − tu.

    Exactness: distances are integer µs; the winner CASE and the gap
    are pure integer expressions; window order totals on (tu,
    event_id).

    Scale: NO join — two growing-frame windows over the per-user
    interleaved stream (last/first IGNORE NULLS), the same one-shuffle
    shape as the directional as-ofs; at 100 TB this beats the
    range-join formulation by never materializing candidates.
    """
    e = load(spark, sf_dir, "events")
    stream = e.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tu"),
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("is_p"), F.col("tu"))
    marked = stream.select(
        "user_id",
        "event_id",
        "tu",
        "is_p",
        F.last(p_ts, ignorenulls=True).over(wb).alias("prev_p"),
        F.first(p_ts, ignorenulls=True).over(wf).alias("next_p"),
    )
    big = F.lit(9223372036854775807)
    return (
        marked.where(~F.col("is_p"))
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("tu").cast("long").alias("click_us"),
            F.expr(
                "CAST(CASE WHEN prev_p IS NULL THEN next_p"
                " WHEN next_p IS NULL THEN prev_p"
                " WHEN tu - prev_p <= next_p - tu THEN prev_p"
                " ELSE next_p END AS BIGINT)"
            ).alias("nearest_purchase_us"),
            F.least(
                F.coalesce(F.col("tu") - F.col("prev_p"), big),
                F.coalesce(F.col("next_p") - F.col("tu"), big),
            )
            .cast("long")
            .alias("gap_us"),
        )
        .orderBy("user_id", "click_id")
    )


@register(
    "agg_hodges_lehmann",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    walsh AS (
        SELECT a.cents + b.cents AS w2
        FROM daily a JOIN daily b ON a.day <= b.day
    ),
    ranked AS (
        SELECT w2, row_number() OVER (ORDER BY w2) AS rn,
               count(*) OVER () AS n
        FROM walsh
    ),
    hl AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN w2 ELSE 0 END)
                    + SUM(CASE WHEN rn = n // 2 + 1 THEN w2 ELSE 0 END)
                    AS BIGINT) AS hl4_cents
        FROM ranked
    ),
    med AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
                    + SUM(CASE WHEN rn = n // 2 + 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS median2_cents
        FROM (
            SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
                   count(*) OVER () AS n
            FROM daily
        ) x
    )
    SELECT n_days, n_pairs, hl4_cents, median2_cents FROM hl, med
    """,
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of daily order revenue (SURVEY.md
    §2.4 robust family): the median of all pairwise Walsh averages
    (xᵢ+xⱼ)/2 over the daily series — the location estimator behind the
    Wilcoxon signed-rank test, more efficient than the median under
    near-normal data yet still 29%-breakdown robust; completes the
    robust-location family (median / trimmed / winsorized / MAD /
    Theil-Sen slope) with the pairwise-average member.

    Exactness: Walsh averages stay integral as w2 = xᵢ + xⱼ; the
    pseudo-median ships as hl4 = lo+hi order statistics of w2 (4× the
    HL estimate, the median2 discipline squared); the plain doubled
    median rides along for comparison.

    Scale: the pair table is the BOUNDED daily aggregate squared
    (~n²/2 two-int rows where n is the date span — independent of
    fact volume; ~6.7M tiny rows at a 10-year span). The two order
    statistics are selected WITHOUT a single-task global sort via the
    bucket-stitch global rank. r11 (VERDICT r10 #2): Walsh-sum
    MAGNITUDE grows with data volume (daily cent sums scale with
    order count), so the former fixed 2^20-wide buckets grew the
    grid 765→2,451 per SF decade — the bucketing is now
    RANGE-NORMALIZED (value_range_k: fixed 4096 buckets over the
    broadcast min/max, exact long arithmetic), so the only
    single-task window is ≤4k rows at ANY revenue magnitude; ranks
    resolve by a bucket-PARTITIONED row_number plus the prior-bucket
    base count. Ties need no tiebreaker: only the VALUE at the two
    target ranks is consumed, and tied ranks share w2.
    """
    o = load(spark, sf_dir, "orders")
    # r12 optimization (guide §5, closing ADVICE r11 #3): the daily
    # aggregate fed five branches (both walsh sides, the day count, the
    # median rank, its bounds) and the walsh pair relation three (the
    # value_range_k bounds pass, the bucket histogram, the final rank) —
    # 11 orders scans and 2 extra O(n²) theta-join passes in the
    # before-plan. daily is date-grid bounded and walsh is daily², so
    # checkpointing both costs O(span²) tiny rows and makes it ONE fact
    # pass + ONE pair-join at any SF (walsh eager=False: the bounds
    # aggregate — the first job over it — materializes it in passing).
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
    ).localCheckpoint(eager=True)
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("ca") + F.col("cb")).alias("w2")
    ).localCheckpoint(eager=False)
    # Rank selection without a global sort (r11: range-normalized —
    # the hand-rolled fixed-width 2^20 bucket histogram grew with the
    # Walsh-sum magnitude; value_range_k pins the grid at ≤4k buckets
    # over the broadcast min/max). No tiebreaker: w2 ties share a
    # value, so tie order cannot change the selected value.
    from classification_problem_with_pyspark_spark.plans.global_rank import (
        bucketed_global_rank,
    )

    # Pair count CLOSED-FORM off the bounded daily aggregate (ADVICE
    # r11): the da <= db join emits exactly n*(n+1)/2 rows for n days,
    # so counting the quadratic pair relation itself was a full O(n²)
    # scan spent on a number derivable from the O(n) side for free.
    # (The value_range_k bounds min/max is now the only extra walsh
    # pass, and it shares the pair join's exchange via ReuseExchange.)
    tot_days = daily.agg(F.count("*").cast("long").alias("n"))
    tot_pairs = tot_days.select(
        F.expr("(n * (n + 1)) DIV 2").cast("long").alias("n")
    )
    granked = bucketed_global_rank(
        walsh, "w2", [], descending=False, value_range_k=4096, out="grank"
    ).select("w2", "grank")
    hl = granked.crossJoin(F.broadcast(tot_pairs)).agg(
        F.max("n").cast("long").alias("n_pairs"),
        (
            F.sum(F.expr("CASE WHEN grank = (n + 1) DIV 2 THEN w2 ELSE 0 END"))
            + F.sum(F.expr("CASE WHEN grank = n DIV 2 + 1 THEN w2 ELSE 0 END"))
        )
        .cast("long")
        .alias("hl4_cents"),
    )
    ranked_d = grid_rank(
        daily.crossJoin(F.broadcast(tot_days)), ["cents"], "rn"
    ).select("cents", "rn", "n")
    med = ranked_d.agg(
        F.count("*").cast("long").alias("n_days"),
        (
            F.sum(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN cents ELSE 0 END"))
            + F.sum(F.expr("CASE WHEN rn = n DIV 2 + 1 THEN cents ELSE 0 END"))
        )
        .cast("long")
        .alias("median2_cents"),
    )
    return hl.crossJoin(F.broadcast(med)).select(
        "n_days", "n_pairs", "hl4_cents", "median2_cents"
    )
