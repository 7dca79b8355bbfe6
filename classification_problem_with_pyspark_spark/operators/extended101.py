"""Round-3 extension pack #101: Borda-count preference aggregation and
the price-endings census.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — the Borda count (de Borda 1770: each voter's ranking awards
k−rank points; the positional social-choice rule that aggregates
rankings rather than single votes, used today to fuse recommender
slates and judge panels) and psychological price-ending analysis (the
.99/.00 charm-vs-round census — Schindler's pricing literature; the
first diagnostic a pricing team runs on a catalog) — re-expressed on
the public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): each user ranks the event
types by exact per-user spend (ties by type name), Borda points fold
integer k−rank sums, and the winner is a total order; price endings
are cents % 100 with a literal ending classification.

Scale posture (SURVEY.md §7.6): Borda is one per-(user, type)
aggregate, a rank window inside the per-user partitioning, and a
points rollup; the census is a per-row mod + census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "agg_borda_count_ranking",
    oracle="""
    WITH ballots AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cents DESC, event_type) AS rnk,
               COUNT(*) OVER (PARTITION BY user_id) AS k
        FROM ballots
    ),
    points AS (
        SELECT event_type,
               CAST(SUM(k - rnk) AS BIGINT) AS borda_points,
               CAST(COUNT(*) AS BIGINT) AS n_ballots,
               CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_first_places
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, borda_points, n_ballots, n_first_places,
           CAST(row_number() OVER (ORDER BY borda_points DESC, event_type)
                AS BIGINT) AS borda_rank
    FROM points
    ORDER BY borda_rank
    """,
)
def agg_borda_count_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda count (SURVEY.md §2.4): every user ranks the event types
    by their own spend (a ballot), each ballot awards k−rank points,
    and the types are ranked by total points — de Borda's positional
    rule, the social-choice aggregation that fuses full RANKINGS
    (recommender-slate fusion and judge panels use exactly this; the
    plurality column `n_first_places` rides along because Borda and
    plurality disagreeing is the whole reason social choice is a
    field). Users who never touched a type simply rank fewer
    candidates — the variable-k ballot convention, stated, with each
    ballot's k carried per row.

    Exactness: exact per-user cents, rank windows with total tie
    orders, integer point sums.

    Scale: one (user, type) aggregate, one rank window inside the
    per-user shuffle, one |types|-row rollup.
    """
    ballots = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    w_rnk = Window.partitionBy("user_id").orderBy(F.desc("cents"), "event_type")
    w_k = Window.partitionBy("user_id")
    ranked = ballots.select(
        "user_id",
        "event_type",
        F.row_number().over(w_rnk).alias("rnk"),
        F.count("*").over(w_k).alias("k"),
    )
    points = ranked.groupBy("event_type").agg(
        F.sum(F.col("k") - F.col("rnk")).cast("long").alias("borda_points"),
        F.count("*").alias("n_ballots"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_first_places"),
    )
    return grid_rank(
        points,
        [F.desc("borda_points"), "event_type"],
        "borda_rank",
        cast="long",
    ).orderBy("borda_rank")


@register(
    "agg_price_endings_census",
    oracle="""
    WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    classed AS (
        SELECT CASE WHEN ending = 99 THEN 'charm_99'
                    WHEN ending = 0 THEN 'round_00'
                    WHEN ending % 10 = 9 THEN 'other_9'
                    WHEN ending % 10 = 0 THEN 'other_0'
                    ELSE 'plain' END AS ending_class,
               c
        FROM cents
    )
    SELECT ending_class,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS cents,
           CAST((1000000 * COUNT(*)) // (SELECT COUNT(*) FROM cents)
                AS BIGINT) AS share_micro
    FROM classed
    GROUP BY ending_class
    ORDER BY ending_class
    """,
)
def agg_price_endings_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-endings census (SURVEY.md §2.4): order totals classified
    by their cent ending — charm (.99), round (.00), other 9-endings,
    other 0-endings, plain — with counts, money, and shares. The
    first diagnostic a pricing team runs on a catalog (Schindler's
    charm-pricing literature): human-set prices pile onto 9s and 0s,
    and a near-uniform ending distribution is the signature of
    COMPUTED prices — which is exactly what this synthetic fixture
    exhibits and the hash pins (the test asserts the near-uniformity
    that real catalogs would violate: the audit detects
    catalog provenance either way).

    Exactness: integer cents, mod, census, floor-micro shares.

    Scale: per-row mod + one census — free, like every census key.
    """
    cents = load(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c")
    ).withColumn("ending", F.col("c") % 100)
    classed = cents.withColumn(
        "ending_class",
        F.when(F.col("ending") == 99, "charm_99")
        .when(F.col("ending") == 0, "round_00")
        .when(F.col("ending") % 10 == 9, "other_9")
        .when(F.col("ending") % 10 == 0, "other_0")
        .otherwise("plain"),
    )
    tot = cents.agg(F.count("*").alias("n_total"))
    return (
        classed.groupBy("ending_class")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("c").cast("long").alias("cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ending_class",
            "n_orders",
            "cents",
            F.expr("CAST((1000000 * n_orders) DIV n_total AS BIGINT)").alias(
                "share_micro"
            ),
        )
        .orderBy("ending_class")
    )
