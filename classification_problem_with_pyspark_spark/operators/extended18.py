"""Round-3 extension pack #18: community-structure and A/B-testing
completions — graph modularity of the region partition over the trade
graph, and the two-proportion z-test on cohort conversion.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — Newman–Girvan modularity Q = Σ_c (w_c/m − (d_c/2m)²) as the
standard partition-quality score, and the pooled two-proportion z-test
every A/B platform reports — expressed on the public PySpark DataFrame
API over the driver's testdata.

Hash-parity discipline (round-3 standard): edge weights, degrees, and
community sums are exact BIGINTs; Q-contributions and z fold ONE
double expression each (division/sqrt of exact integers → floor micro),
identical text on both engines.

Scale posture (SURVEY.md §7.6):
- Modularity reads the same nation-flow edge build as pagerank/paths
  (one fact pass), then everything is per-node/per-community integer
  sums over a 25-node graph — at any corpus size the graph stage is
  O(nations²) bounded.
- The z-test is two groupBys (user conversion flags → cohort counts)
  and a 2-row join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "graph_modularity_regions",
    oracle="""
    WITH edges AS (
        SELECT least(c.c_nationkey, s.s_nationkey) AS u,
               greatest(c.c_nationkey, s.s_nationkey) AS v,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ), m AS (SELECT CAST(sum(w) AS BIGINT) AS mw FROM edges),
    node_deg AS (
        SELECT n, CAST(sum(w) AS BIGINT) AS deg FROM (
            SELECT u AS n, w FROM edges UNION ALL SELECT v AS n, w FROM edges
        ) GROUP BY n
    ), comm AS (
        SELECT n_nationkey AS n, CAST(n_regionkey AS BIGINT) AS c FROM nation
    ), intra AS (
        SELECT cu.c, CAST(sum(e.w) AS BIGINT) AS w_in
        FROM edges e JOIN comm cu ON e.u = cu.n JOIN comm cv ON e.v = cv.n
        WHERE cu.c = cv.c GROUP BY cu.c
    ), dc AS (
        SELECT cu.c, CAST(sum(d.deg) AS BIGINT) AS d_sum
        FROM node_deg d JOIN comm cu ON d.n = cu.n GROUP BY cu.c
    )
    SELECT dc.c AS region, COALESCE(i.w_in, 0) AS intra_weight, dc.d_sum,
           CAST(floor(1000000.0 * COALESCE(i.w_in, 0) / m.mw) AS BIGINT)
               AS actual_micro,
           CAST(floor(1000000.0 * dc.d_sum * dc.d_sum / (4.0 * m.mw * m.mw))
               AS BIGINT) AS expected_micro
    FROM dc LEFT JOIN intra i ON dc.c = i.c CROSS JOIN m
    ORDER BY region
    """,
)
def graph_modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman–Girvan modularity of the REGION partition over the
    weighted nation trade graph (SURVEY.md §2.4b): per region, the
    intra-community edge weight, total degree, and the actual-vs-
    expected micro-unit terms whose difference sums to Q. On this
    corpus Q ≈ −0.037 — trade flows ignore region boundaries entirely
    (uniform synthetic routing), which is exactly what the score
    exists to quantify; a real trade network scores Q ≫ 0. Completes
    the graph family's community arc: label propagation FINDS
    communities (rows-only, iterative), modularity SCORES a given
    partition — and scoring is exactly SQL algebra, so it
    hash-checks.

    Exactness: weights/degrees/community sums are BIGINTs; each
    emitted term folds one double expression of exact integers
    (floor micro) — Q = Σ(actual − expected)/1e6 to within 5 floors.

    Scale: one fact pass builds the bounded edge list (the
    pagerank/shortest-path build); all else is integer sums over ≤25
    nodes / 5 communities.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .agg(F.count("*").alias("w"))
        .localCheckpoint()
    )
    mw = edges.agg(F.sum("w").cast("long").alias("mw"))
    node_deg = (
        edges.select(F.col("u").alias("n"), "w")
        .unionByName(edges.select(F.col("v").alias("n"), "w"))
        .groupBy("n")
        .agg(F.sum("w").cast("long").alias("deg"))
    )
    comm = n.select(
        F.col("n_nationkey").alias("n"), F.col("n_regionkey").cast("long").alias("c")
    )
    cu = comm.select(F.col("n").alias("u"), F.col("c").alias("cu"))
    cv = comm.select(F.col("n").alias("v"), F.col("c").alias("cv"))
    intra = (
        edges.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.sum("w").cast("long").alias("w_in"))
    )
    dc = (
        node_deg.join(F.broadcast(comm), "n")
        .groupBy("c")
        .agg(F.sum("deg").cast("long").alias("d_sum"))
    )
    return (
        dc.join(intra, "c", "left")
        .crossJoin(F.broadcast(mw))
        .select(
            F.col("c").alias("region"),
            F.coalesce("w_in", F.lit(0)).alias("intra_weight"),
            "d_sum",
            F.floor(1000000.0 * F.coalesce("w_in", F.lit(0)) / F.col("mw"))
            .cast("long")
            .alias("actual_micro"),
            F.floor(
                1000000.0
                * F.col("d_sum")
                * F.col("d_sum")
                / (4.0 * F.col("mw") * F.col("mw"))
            )
            .cast("long")
            .alias("expected_micro"),
        )
        .orderBy("region")
    )


@register(
    "agg_two_proportion_ztest",
    oracle="""
    WITH cohorts AS (
        SELECT user_id % 2 AS cohort, user_id,
               CAST(max(CASE WHEN event_type = 'purchase'
                             AND ts < TIMESTAMP '2024-01-03'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM cohorts GROUP BY cohort
    )
    SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
           CAST(floor(1000000.0 * (1.0*a.conv/a.n - 1.0*b.conv/b.n) /
                sqrt((1.0*(a.conv+b.conv)/(a.n+b.n))
                     * (1 - 1.0*(a.conv+b.conv)/(a.n+b.n))
                     * (1.0/a.n + 1.0/b.n)))
                AS BIGINT) AS z_micro
    FROM stats a, stats b WHERE a.cohort = 0 AND b.cohort = 1
    """,
)
def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (SURVEY.md §2.13), the A/B-dashboard
    statistic: split users into hash cohorts (user_id mod 2 — the
    `llm_split_hash` assignment discipline), define conversion as a
    purchase in the first 48 hours, and emit both cohorts' exact
    counts plus the pooled z in micro-units (−0.51 at sf0.01: the
    synthetic cohorts don't differ, as they shouldn't). Completes the
    testing family: t-test (means), Mann–Whitney (distributions),
    chi² (independence) — this one does RATES, the most common A/B
    decision.

    Exactness: all counts exact; z is ONE double expression
    (divisions + sqrt of exact integers, identical text both
    engines) floored to micro — the same single-expression discipline
    every stats key here uses.

    Scale: per-user conversion flags partial-aggregate map-side; the
    final stage is a 2-row self-join.
    """
    e = load(spark, sf_dir, "events")
    cohorts = e.groupBy((F.col("user_id") % 2).alias("cohort"), "user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-03").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("converted")
    )
    stats = cohorts.groupBy("cohort").agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    a = stats.where(F.col("cohort") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = stats.where(F.col("cohort") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    # association mirrors the oracle TEXT exactly: (1e6 * diff) / sqrt —
    # 1e6*(diff/sqrt) differs in the last ulp and can flip the floor
    num = 1000000.0 * (
        F.col("conv_a") / F.col("n_a") - F.col("conv_b") / F.col("n_b")
    )
    den = F.sqrt(pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    return a.crossJoin(b).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.floor(num / den).cast("long").alias("z_micro"),
    )
