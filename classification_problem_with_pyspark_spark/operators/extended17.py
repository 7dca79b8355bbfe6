"""Round-3 extension pack #17: multi-objective and distributional
analytics — the Pareto skyline operator (window-algebra algorithm vs a
NOT-EXISTS dominance oracle) and Lorenz-curve decile shares.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the skyline operator (Börzsönyi, Kossmann, Stocker 2001) and
the Lorenz curve / cumulative-share decile table behind every inequality
report — expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): prices are integer cents,
dates integer epoch days; skyline membership is pure integer dominance
algebra; decile shares fold one floor(1e6·cum/total) expression. The two
engines run DIFFERENT ALGORITHMS for the skyline (window sweeps vs
NOT-EXISTS nested dominance) and must land on the identical set — the
strongest differential-test shape in the suite.

Scale posture (SURVEY.md §7.6):
- The 2-D skyline needs only two window passes (max-date over
  strictly-higher-price via an integer RANGE frame + same-price group
  max) — O(n log n), no pair join; the oracle's NOT EXISTS is the
  semantic spec (DuckDB's IEJoin makes it feasible oracle-side). At
  100 TB: local skyline per partition, then skyline of the union —
  the classic distributed-skyline reduction (skyline(skyline_p ∪ …) =
  skyline(all)); the window form here IS the per-partition step.
- Lorenz deciles are one ntile window + a 10-row cumulative pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "join_skyline_pareto",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(date_trunc('day', o_orderdate) AS DATE) AS d
        FROM orders
    )
    SELECT a.o_orderkey, a.cents, a.d
    FROM o a
    WHERE NOT EXISTS (
        SELECT 1 FROM o b
        WHERE b.cents >= a.cents AND b.d >= a.d
          AND (b.cents > a.cents OR b.d > a.d)
    )
    ORDER BY a.cents DESC, a.o_orderkey
    """,
)
def join_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (SURVEY.md §2.5): the orders not DOMINATED in
    (price, recency) — no other order is ≥ in both dimensions and > in
    one. The multi-objective "best trade-offs" operator (best-price-
    for-its-date frontier); 8 frontier orders at sf0.01.

    The engines deliberately run different algorithms and must agree:
    the ORACLE states the semantics directly (NOT EXISTS dominance —
    quadratic, feasible only through DuckDB's IEJoin), while the Spark
    side reduces to the PER-PRICE-GROUP table first: collapse to one
    row per distinct price (group max date), take the strictly-before
    RUNNING max over prices descending — the bucket-stitch cummax, so
    "max date among strictly higher-priced" never funnels the per-price
    relation through one task — and join back on price. A row survives
    iff that running max is < its date and it carries its own price
    group's max date.

    [MEASURED] The first cut phrased "strictly higher-priced" as ONE
    rangeBetween(1, unboundedFollowing) window — semantically identical,
    but Spark evaluates shrinking unbounded-FOLLOWING frames by
    recomputing the aggregate per row: O(n²), 380 s at sf0.1 (63% of
    the whole coverage sweep). The group/cummax/lag form is the same
    O(n log n) DuckDB gets from its segment trees: 0.9 s at sf0.1.

    Scale: skyline distributes by the classic reduction — local skyline
    per partition, then skyline of the ~tiny union (correct because a
    dominated point is dominated inside its own partition too); the
    price-keyed join back is the only fact-sized shuffle beyond the
    bounded per-price sort.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
    )
    days = F.datediff(F.col("d"), F.lit("1970-01-01"))
    per_price = o.select("cents", days.alias("dd")).groupBy("cents").agg(
        F.max("dd").alias("m_equal")
    )
    # r10: distinct order prices are near-unique, so the per-price grid
    # tracked the order count (caught by the cardinality tripwire). The
    # strictly-higher-priced running max is now the bucket-stitch cummax:
    # the only single-task window is the 2^16-cents bucket grid (bounded
    # by the price RANGE), per-price work hash-partitioned by bucket.
    from classification_problem_with_pyspark_spark.plans.global_rank import (
        bucketed_global_cummax,
    )

    frontier = bucketed_global_cummax(
        per_price,
        "cents",
        [],
        [("m_higher", "m_equal")],
        descending=True,
        bucket_bits=16,
        frame_end=-1,
    ).select(
        "cents",
        "m_equal",
        "m_higher",
    )
    return (
        o.select("o_orderkey", "cents", "d", days.alias("dd"))
        .join(frontier, "cents")
        .where(
            (F.col("m_higher").isNull() | (F.col("m_higher") < F.col("dd")))
            & (F.col("m_equal") <= F.col("dd"))
        )
        .select("o_orderkey", "cents", "d")
        .orderBy(F.desc("cents"), "o_orderkey")
    )


@register(
    "agg_lorenz_decile_shares",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), deciles AS (
        SELECT o_orderkey, cents,
               ntile(10) OVER (ORDER BY cents, o_orderkey) AS dec
        FROM o
    ), per AS (
        SELECT dec, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM deciles GROUP BY dec
    ), tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM o)
    SELECT CAST(dec AS BIGINT) AS decile, n, s AS sum_cents,
           CAST(floor(1000000.0 * SUM(s) OVER (ORDER BY dec) / tot.t)
                AS BIGINT) AS cum_share_micro
    FROM per CROSS JOIN tot ORDER BY decile
    """,
)
def agg_lorenz_decile_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile table (SURVEY.md §2.13): order revenue split
    into 10 equal-count deciles (ntile over a (cents, orderkey) total
    order — tie-deterministic), each with its exact cents sum and the
    CUMULATIVE share of total revenue in micro-units — the actual curve
    behind the `agg_gini` coefficient (bottom decile holds ~1%, top
    ~19% on this synthetic book; the last row is 1e6 by construction,
    asserted in tests).

    Exactness: integer cents sums; one floor(1e6·cum/total) per decile
    row (single expression, identical both engines).

    Scale: the exact ntile is computed in CLOSED FORM of the
    bucket-stitch global rank (plans/global_rank.py) — the only
    unpartitioned windows run over the 2^16-cents BUCKET grid (bounded
    by the price RANGE, not the order count) and the 10-row decile
    table. The same plan shape survives 100 TB unchanged.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Closed-form ntile over the BUCKET-STITCH global rank (r10: the r8
    # distinct-cents histogram is NOT a value-domain grid — order prices
    # are near-unique, so its cardinality tracked the order count
    # (15k→150k rows through one WindowExec task, caught by the grid
    # cardinality tripwire). 2^16-cents buckets bound the only
    # single-task window by the PRICE RANGE (~5e7 cents → ≤763 buckets
    # at any SF); per-order ranking is hash-partitioned by bucket.
    from classification_problem_with_pyspark_spark.plans.global_rank import (
        bucketed_global_rank,
        closed_form_ntile,
    )

    tot_n = o.agg(F.count("*").cast("long").alias("n_rows"))
    deciles = bucketed_global_rank(
        o.crossJoin(F.broadcast(tot_n)),
        "cents",
        [F.asc("o_orderkey")],
        descending=False,
        bucket_bits=16,
        out="rn",
    ).select(
        "cents",
        closed_form_ntile(F.col("rn"), F.col("n_rows"), 10).alias("dec"),
    )
    per = deciles.groupBy("dec").agg(
        F.count("*").alias("n"), F.sum("cents").cast("long").alias("s")
    )
    tot = o.agg(F.sum("cents").cast("long").alias("t"))
    return (
        grid_cumsum(
            per.crossJoin(F.broadcast(tot)),
            ["dec"],
            [("cum_s", "s")],
            keep=["dec", "n", "s", "t"],
        )
        .select(
            F.col("dec").cast("long").alias("decile"),
            "n",
            F.col("s").alias("sum_cents"),
            F.floor(1000000.0 * F.col("cum_s") / F.col("t"))
            .cast("long")
            .alias("cum_share_micro"),
        )
        .orderBy("decile")
    )
