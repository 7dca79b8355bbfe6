"""Round-3 extension pack #12: Spark-4 SQL surface and evaluation
completions — the SQL pipe-syntax query language (|>), a Markov
next-event model trained and evaluated entirely in SQL algebra, and a
dataset-version diff audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. All patterns here are public
knowledge — SQL pipe syntax (the Spark 4.0 feature, from "SQL Has
Problems. We Can Fix Them" / the GoogleSQL pipe proposal), first-order
Markov-chain next-event prediction with temporal train/test splits, and
the added/removed/changed dataset-diff audit every data-versioning tool
ships — expressed on the public PySpark DataFrame/SQL API.

Hash-parity discipline (round-3 standard): the pipe query aggregates
exact counts and integer cents; the Markov model is argmax-by-(count,
lexicographic) — pure integer rank — and accuracy folds to floor-micro
units in one expression; the diff emits exact counts only.

Scale posture (SURVEY.md §7.6):
- Pipe syntax is surface, not engine: it parses to exactly the same
  logical plan as the ANSI equivalent (plan-asserted in tests), so
  every optimizer property (pushdown, partial agg) carries over.
- The Markov train/evaluate is two passes over user-keyed sequence
  windows plus a 5-row model broadcast back onto the test pairs.
- The diff joins the two versions on the primary key — one shuffle
  each side (or zero with co-bucketed versions, the
  sink_bucketed_join_roundtrip layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "relational_pipe_syntax",
    oracle="""
    SELECT l_returnflag, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_quantity >= 25
    GROUP BY l_returnflag, o_orderpriority
    HAVING count(*) > 100
    ORDER BY l_returnflag, o_orderpriority
    """,
)
def relational_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (SURVEY.md §2.2), the Spark 4.0 query-language
    surface: the same filter→join→aggregate→having→order pipeline
    written as `FROM … |> WHERE … |> JOIN … |> AGGREGATE … GROUP BY …
    |> WHERE … |> ORDER BY`, which Catalyst parses to EXACTLY the plan
    of the ANSI equivalent (the oracle) — hash match plus a plan
    assertion prove the pipe surface is pure syntax with zero engine
    cost.

    Pipe operators used: WHERE (pre- and post-aggregation — the
    post-agg WHERE is pipe-syntax's replacement for HAVING), JOIN,
    AGGREGATE … GROUP BY, ORDER BY. Exact integer cents; counts exact.

    Scale: nothing new to say — that is the point. Pushdown, partial
    aggregation, and join planning behave identically to the ANSI
    form; the pipe form exists for query AUTHORS (linear reading
    order), not the engine.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    li.createOrReplaceTempView("pipe_lineitem")
    o.createOrReplaceTempView("pipe_orders")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_quantity >= 25
        |> JOIN pipe_orders ON l_orderkey = o_orderkey
        |> AGGREGATE count(*) AS n_items,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS revenue_cents
           GROUP BY l_returnflag, o_orderpriority
        |> WHERE n_items > 100
        |> ORDER BY l_returnflag, o_orderpriority
        """
    )


@register(
    "events_markov_prediction",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS cur, next_type AS nxt, ts
        FROM seq WHERE next_type IS NOT NULL
    ), train AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt FROM pairs
        WHERE ts < TIMESTAMP '2024-01-25' GROUP BY 1, 2
    ), model AS (
        SELECT cur, nxt AS predicted FROM (
            SELECT cur, nxt,
                   row_number() OVER (PARTITION BY cur
                                      ORDER BY cnt DESC, nxt) AS rn
            FROM train) WHERE rn = 1
    ), test AS (
        SELECT cur, nxt FROM pairs WHERE ts >= TIMESTAMP '2024-01-25'
    )
    SELECT t.cur AS event_type, m.predicted,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.nxt = m.predicted THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           CAST(floor(1000000.0 * SUM(CASE WHEN t.nxt = m.predicted
                                           THEN 1 ELSE 0 END) / count(*))
                AS BIGINT) AS accuracy_micro
    FROM test t JOIN model m ON t.cur = m.cur
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def events_markov_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event prediction, trained AND evaluated in exact SQL
    algebra (SURVEY.md §2.13): build per-user event sequences, split
    temporally (train < Jan 25 ≤ test — the only honest split for
    sequence models), fit the first-order model as argmax transition
    per current state (count desc, lexicographic tie-break — pure
    integer rank, no probabilities materialized), and score next-event
    accuracy per state on the held-out tail.

    The companion to `events_transition_matrix` (which emits the full
    matrix): this key closes the loop into an EVALUATED model with an
    exact integer contract — unlike the MLlib keys, nothing here is
    float-fitted, so the whole train/predict/score pipeline
    hash-checks. Accuracy lands ~19-25% per state at sf0.01 (5 nearly
    uniform event types — the synthetic corpus has little sequence
    signal; the pipeline, not the lift, is the product).

    Scale: sequences window by user (no global sort); the model is
    5 rows broadcast onto test pairs; both passes are one scan each.
    """
    e = load(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "ts",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(wseq).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
    )
    split = F.lit("2024-01-25").cast("timestamp")
    train = (
        pairs.where(F.col("ts") < split)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
    )
    wrank = Window.partitionBy("cur").orderBy(F.desc("cnt"), F.asc("nxt"))
    model = (
        train.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    test = pairs.where(F.col("ts") >= split).select("cur", "nxt")
    correct = F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
    return (
        test.join(F.broadcast(model), "cur")
        .groupBy(F.col("cur").alias("event_type"), "predicted")
        .agg(
            F.count("*").alias("n_test"),
            correct.cast("long").alias("n_correct"),
            F.floor(1000000.0 * correct / F.count("*"))
            .cast("long")
            .alias("accuracy_micro"),
        )
        .orderBy("event_type")
    )


@register(
    "audit_dataset_diff",
    oracle="""
    WITH v2 AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 9 <> 0
    )
    SELECT COALESCE(d.lang, v.lang) AS lang,
           CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_added,
           CAST(SUM(CASE WHEN v.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND v.doc_id IS NOT NULL
                              AND v.text <> d.text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND v.doc_id IS NOT NULL
                              AND v.text = d.text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unchanged
    FROM documents d FULL OUTER JOIN v2 v USING (doc_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def audit_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff audit (SURVEY.md §2.14), the release gate
    every corpus pipeline runs between versions: given v1 (the corpus)
    and v2 (a deterministic simulated release: mod-9 docs dropped,
    mod-11 survivors revised), FULL-OUTER join on the primary key and
    classify every document as added / removed / changed / unchanged,
    reported per lang. Catches both silent data loss (removed ≫ 0) and
    unexpected churn (changed ≫ 0) before a training run consumes the
    release.

    n_added is structurally 0 here (the simulated v2 adds nothing) but
    the full-outer shape keeps the added path exercised — the operator
    is the audit, the synthetic v2 is the fixture. Exact counts only.

    Scale: one key-partitioned join; co-bucketed versions (the
    sink_bucketed_join_roundtrip layout) make it exchange-free. At
    100 TB compare content by digest, not text equality — same plan,
    md5 column instead (the llm_dedup_exact_hash discipline).
    """
    d = load(spark, sf_dir, "documents")
    v2 = (
        d.where(F.col("doc_id") % 9 != 0)
        .select(
            "doc_id",
            F.col("lang").alias("v_lang"),
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            )
            .otherwise(F.col("text"))
            .alias("v_text"),
        )
    )
    v1 = d.select("doc_id", "lang", "text")
    joined = v1.join(v2, "doc_id", "full_outer")
    both = F.col("text").isNotNull() & F.col("v_text").isNotNull()
    return (
        joined.groupBy(F.coalesce("lang", "v_lang").alias("lang"))
        .agg(
            F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("v_text").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(both & (F.col("v_text") != F.col("text")), 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.when(both & (F.col("v_text") == F.col("text")), 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
        )
        .orderBy("lang")
    )
