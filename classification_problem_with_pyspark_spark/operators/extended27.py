"""Round-3 extension pack #27: exact model-evaluation suite — ROC curve,
tie-aware AUC, and a per-score reliability (calibration) table, all as
exact integer contracts.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. The patterns are public
knowledge — ROC analysis, the rank-sum identity AUC = (R₁ − n₁(n₁+1)/2)
/ (n₁n₀) with midrank tie handling (Hanley & McNeil 1982 / the
Mann-Whitney correspondence), and reliability tables — re-expressed on
the public PySpark DataFrame API over the driver's testdata.

The evaluated "model" is deterministic and data-derived: score = a
user's event count in their first 6 hours, label = converted (first
purchase) within 24 hours of enrollment — the early-activity propensity
toy. The signal is real (AUC ≈ 0.58 at sf0.01/sf0.1) and entirely
reproducible, so the eval machinery gets an EXACT oracle, unlike the
float-fitted MLlib keys which are rows-only by nature. That is the
point of the pack: the metric layer of an ML platform is relational and
belongs under the same hash-parity regime as any aggregate.

Hash-parity discipline (round-3 standard): scores and labels are exact
integers; cumulative ROC counts come from window sums over the bounded
distinct-score grid; AUC uses the ×2-integral midrank trick (the
agg_mannwhitney_u discipline) so tie handling never creates a half; all
rates fold as floor-micro integer divisions.

Scale posture (SURVEY.md §7.6): one fact-sized per-user aggregate + one
bounded-window join build the scored cohort; every metric after runs on
the distinct-score grid (bounded by the score range, not the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

SCORE_HOURS = 6  # early-activity scoring window after enrollment
LABEL_HOURS = 24  # conversion horizon defining the positive label

_SCORED_SQL = f"""
    u AS (
        SELECT user_id, epoch_us(min(ts)) AS t0,
               epoch_us(min(ts) FILTER (event_type = 'purchase')) AS fp
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT e.user_id, CAST(count(*) AS BIGINT) AS score
        FROM events e JOIN u ON e.user_id = u.user_id
        WHERE epoch_us(e.ts) < u.t0 + {SCORE_HOURS} * 3600000000
        GROUP BY e.user_id
    ),
    scored AS (
        SELECT u.user_id, COALESCE(s.score, 0) AS score,
               CASE WHEN fp IS NOT NULL
                         AND fp < t0 + {LABEL_HOURS} * 3600000000
                    THEN 1 ELSE 0 END AS label
        FROM u LEFT JOIN s ON u.user_id = s.user_id
    )
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("fp"),
    )
    s = (
        e.select("user_id", F.unix_micros("ts").alias("tu"))
        .join(u.select("user_id", "t0"), "user_id")
        .where(F.col("tu") < F.col("t0") + SCORE_HOURS * 3600000000)
        .groupBy("user_id")
        .agg(F.count("*").alias("score"))
    )
    label = (
        F.col("fp").isNotNull()
        & (F.col("fp") < F.col("t0") + LABEL_HOURS * 3600000000)
    ).cast("long")
    return u.join(s, "user_id", "left").select(
        "user_id",
        F.coalesce("score", F.lit(0)).alias("score"),
        label.alias("label"),
    )


@register(
    "ml_roc_curve_threshold",
    oracle=f"""
    WITH {_SCORED_SQL},
    tot AS (
        SELECT CAST(SUM(label) AS BIGINT) AS pos,
               CAST(SUM(1 - label) AS BIGINT) AS neg
        FROM scored
    ),
    grid AS (
        SELECT score, CAST(SUM(label) AS BIGINT) AS p,
               CAST(SUM(1 - label) AS BIGINT) AS n
        FROM scored GROUP BY score
    ),
    cum AS (
        SELECT score,
               SUM(p) OVER (ORDER BY score DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS tp,
               SUM(n) OVER (ORDER BY score DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS fp
        FROM grid
    )
    SELECT score AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(pos - tp AS BIGINT) AS fn, CAST(neg - fp AS BIGINT) AS tn,
           CAST((1000000 * tp) // pos AS BIGINT) AS tpr_micro,
           CAST((1000000 * fp) // neg AS BIGINT) AS fpr_micro,
           CAST((1000000 * tp) // (tp + fp) AS BIGINT) AS precision_micro
    FROM cum, tot ORDER BY threshold DESC
    """,
)
def ml_roc_curve_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC / PR curve points (SURVEY.md §2.11): for every distinct
    score threshold t, the confusion-matrix counts of the classifier
    "predict positive iff score ≥ t", plus TPR/FPR/precision in exact
    floor-micro units — the evaluation curve BinaryClassificationEvaluator
    computes, re-expressed as a hash-checkable relational contract over
    the deterministic early-activity propensity model.

    Exactness: counts cumulate over the distinct-score grid with a
    growing window frame (Spark evaluates those incrementally); every
    rate is an integer division.

    Scale: the cohort build is the only fact-sized work; the curve has
    one row per distinct score — bounded by the score range.
    """
    scored = _scored(spark, sf_dir)
    tot = scored.agg(
        F.sum("label").alias("pos"),
        F.sum(1 - F.col("label")).alias("neg"),
    )
    grid = scored.groupBy("score").agg(
        F.sum("label").alias("p"),
        F.sum(1 - F.col("label")).alias("n"),
    )
    cum = grid_cumsum(
        grid, [F.desc("score")], [("tp", "p"), ("fp", "n")], keep=["score"]
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("score").alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            (F.col("pos") - F.col("tp")).cast("long").alias("fn"),
            (F.col("neg") - F.col("fp")).cast("long").alias("tn"),
            F.expr("(1000000 * tp) DIV pos").alias("tpr_micro"),
            F.expr("(1000000 * fp) DIV neg").alias("fpr_micro"),
            F.expr("(1000000 * tp) DIV (tp + fp)").alias("precision_micro"),
        )
        .orderBy(F.desc("threshold"))
    )


@register(
    "ml_auc_exact",
    oracle=f"""
    WITH {_SCORED_SQL},
    grid AS (
        SELECT score, CAST(count(*) AS BIGINT) AS c,
               CAST(SUM(label) AS BIGINT) AS p
        FROM scored GROUP BY score
    ),
    cum AS (
        SELECT score, c, p,
               COALESCE(SUM(c) OVER (ORDER BY score
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS before
        FROM grid
    ),
    agg AS (
        SELECT CAST(SUM(p * (2 * before + c + 1)) AS BIGINT) AS r1_2,
               CAST(SUM(p) AS BIGINT) AS n1,
               CAST(SUM(c - p) AS BIGINT) AS n0
        FROM cum
    )
    SELECT n1 AS n_pos, n0 AS n_neg, r1_2 AS rank_sum_x2,
           (1000000 * (r1_2 - n1 * (n1 + 1))) // (2 * n1 * n0) AS auc_micro
    FROM agg
    """,
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware AUC (SURVEY.md §2.11) via the rank-sum identity
    AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀), with R₁ the positives' midrank sum —
    the Mann-Whitney correspondence, computed in ×2-integral midranks
    (per score group, the doubled midrank sum is p·(2·before + c + 1),
    an exact BIGINT; the agg_mannwhitney_u tie discipline) so AUC folds
    as one integer division. At sf0.01 the early-activity model scores
    AUC ≈ 0.58 — a real, reproducible signal, not a coin flip.

    Scale: O(n log n) where the naive positive×negative pair count is
    O(n²) — the whole statistic reduces to one pass over the bounded
    distinct-score grid after the cohort groupBy.
    """
    scored = _scored(spark, sf_dir)
    grid = scored.groupBy("score").agg(
        F.count("*").alias("c"),
        F.sum("label").alias("p"),
    )
    cum = grid_cumsum(
        grid,
        ["score"],
        [("before", "c")],
        keep=["score", "c", "p"],
        frame_end=-1,
    )
    agg = cum.agg(
        F.sum(
            F.col("p") * (2 * F.col("before") + F.col("c") + 1)
        ).alias("r1_2"),
        F.sum("p").alias("n1"),
        F.sum(F.col("c") - F.col("p")).alias("n0"),
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.col("r1_2").cast("long").alias("rank_sum_x2"),
        F.expr(
            "(1000000 * (r1_2 - n1 * (n1 + 1))) DIV (2 * n1 * n0)"
        ).alias("auc_micro"),
    )


@register(
    "ml_calibration_by_score",
    oracle=f"""
    WITH {_SCORED_SQL},
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(SUM(label) AS BIGINT) AS p_all
        FROM scored
    )
    SELECT score,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST((1000000 * SUM(label)) // count(*) AS BIGINT) AS pos_rate_micro,
           CAST((1000000 * p_all) // n_all AS BIGINT) AS base_rate_micro,
           CAST((1000000 * SUM(label) * n_all) // (count(*) * p_all) AS BIGINT)
               AS lift_micro
    FROM scored, tot
    GROUP BY score, n_all, p_all ORDER BY score
    """,
)
def ml_calibration_by_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table per score value (SURVEY.md §2.11): observed
    conversion rate at each score level against the cohort base rate,
    with multiplicative lift — the calibration view that tells you
    whether "score 4" MEANS anything (a well-ordered model shows
    monotone-ish pos_rate in score; lift > 1e6 marks the
    better-than-base segments a targeting rule would keep).

    Exactness: rates and lift fold as floor-micro divisions of exact
    counts; the base rate repeats per row by construction (one bounded
    cross join), keeping every row self-contained for downstream
    consumers.

    Scale: one groupBy on the bounded score grid after the cohort
    build; the totals row broadcasts.
    """
    scored = _scored(spark, sf_dir)
    tot = scored.agg(
        F.count("*").alias("n_all"),
        F.sum("label").alias("p_all"),
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .groupBy("score", "n_all", "p_all")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").alias("n_pos"),
            F.expr("(1000000 * SUM(label)) DIV count(*)").alias(
                "pos_rate_micro"
            ),
        )
        .select(
            "score",
            "n",
            "n_pos",
            "pos_rate_micro",
            F.expr("(1000000 * p_all) DIV n_all").alias("base_rate_micro"),
            F.expr("(1000000 * n_pos * n_all) DIV (n * p_all)").alias(
                "lift_micro"
            ),
        )
        .orderBy("score")
    )
