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
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum, grid_rank, grid_shift
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
    row per distinct price (group max date), take a RUNNING max over
    prices descending (a growing ROWS frame Spark evaluates
    incrementally), lag it by one group to get "max date among strictly
    higher-priced", and join the two bounded columns back on price. A
    row survives iff that lagged cummax is < its date and it carries
    its own price group's max date.

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
    frontier = grid_shift(
        grid_cumsum(
            per_price,
            [F.desc("cents")],
            [("cummax", F.max("m_equal"))],
            keep=["cents", "m_equal"],
        ),
        [F.desc("cents")],
        [("m_higher", "cummax", -1)],
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

    Scale: the exact ntile is computed in CLOSED FORM — distinct-cents
    histogram base ranks + a cents-partitioned row_number — so no order
    row ever funnels through a single-task sort; the only unpartitioned
    windows run over the bounded distinct-cents grid and the 10-row
    decile table. The same plan shape survives 100 TB unchanged.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Closed-form ntile (r8 de-globalization): global rank = strictly-
    # lower-cents count (bounded distinct-cents grid cumsum) + the
    # cents-partitioned row_number; SQL ntile(k) is then a pure function
    # of (rank, n). No order row passes through a single-task sort.
    hist = o.groupBy("cents").agg(F.count("*").alias("c"))
    base = grid_cumsum(
        hist, ["cents"], [("base", "c")], keep=["cents"], frame_end=-1
    )
    tot_n = hist.agg(F.sum("c").cast("long").alias("n_rows"))
    w_in = Window.partitionBy("cents").orderBy("o_orderkey")
    deciles = (
        o.withColumn("rn_in", F.row_number().over(w_in))
        .join(F.broadcast(base), "cents")
        .crossJoin(F.broadcast(tot_n))
        .withColumn("rn", F.col("base") + F.col("rn_in"))
        .select(
            "cents",
            F.expr(
                "CAST(CASE WHEN rn <= (n_rows % 10) * (n_rows DIV 10 + 1) "
                "THEN (rn - 1) DIV (n_rows DIV 10 + 1) + 1 "
                "ELSE n_rows % 10 "
                "+ (rn - (n_rows % 10) * (n_rows DIV 10 + 1) - 1) "
                "DIV greatest(1, n_rows DIV 10) + 1 END AS INT)"
            ).alias("dec"),
        )
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
