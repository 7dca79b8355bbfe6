"""Round-3 extension pack #82: Simpson's paradox audit and the
documents data-contract audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — Simpson's paradox detection (the aggregate association
reversing or vanishing inside every stratum — Simpson 1951, the
confounding trap every observational readout must be screened for)
and declarative data-contract auditing (field-level invariants —
uniqueness, derivations, domains — checked as conditional counts; the
dbt-tests/Great-Expectations shape) — re-expressed on the public
PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): association signs are the
EXACT integer cross-product a·d − b·c per stratum and overall (no
rates, no division — the sign is the statistic); contract verdicts
are conditional counts of pure predicates. Everything is integers.

Scale posture (SURVEY.md §7.6): the paradox audit is one conditional
count by (stratum, exposure, outcome) — 4 cells per stratum — plus a
|strata|-row comparison; the contract audit is one scan with k
predicate counters, map-side combinable (the only audit shape that
runs on every load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

SIMPSON_GATE = 50  # outcome: value > 50; exposure: weekend


@register(
    "agg_simpson_paradox_audit",
    oracle=f"""
    WITH cells AS (
        SELECT event_type AS stratum,
               CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS e,
               CASE WHEN value > {SIMPSON_GATE} THEN 1 ELSE 0 END AS o
        FROM events
    ),
    per_stratum AS (
        SELECT stratum,
               CAST(SUM(e * o) AS BIGINT) AS a,
               CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
               CAST(SUM((1 - e) * o) AS BIGINT) AS c,
               CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS d
        FROM cells GROUP BY stratum
    ),
    signed AS (
        SELECT stratum, a, b, c, d,
               CASE WHEN a * d - b * c > 0 THEN 1
                    WHEN a * d - b * c < 0 THEN -1 ELSE 0 END AS sign
        FROM per_stratum
    ),
    agg AS (
        SELECT CASE WHEN SUM(a) * SUM(d) - SUM(b) * SUM(c) > 0 THEN 1
                    WHEN SUM(a) * SUM(d) - SUM(b) * SUM(c) < 0 THEN -1
                    ELSE 0 END AS agg_sign
        FROM signed
    )
    SELECT s.stratum, s.a, s.b, s.c, s.d,
           CAST(s.sign AS BIGINT) AS stratum_sign,
           CAST(g.agg_sign AS BIGINT) AS aggregate_sign,
           s.sign <> 0 AND g.agg_sign <> 0 AND s.sign <> g.agg_sign
               AS reversed_vs_aggregate
    FROM signed s, agg g
    ORDER BY s.stratum
    """,
)
def agg_simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's paradox audit (SURVEY.md §2.4): the weekend↔high-value
    association's SIGN per event-type stratum next to the aggregate
    sign, with a reversal flag per stratum — the confounding screen
    every observational readout needs before anyone quotes the pooled
    number (Simpson 1951; the Berkeley-admissions shape). The sign is
    the exact integer cross-product a·d − b·c — no rates, no division,
    no float — which is the entire trick: association DIRECTION is
    decidable in integers, and direction is what the paradox is about.

    Strata where the sign flips against the aggregate are the finding;
    strata agreeing are the evidence the pooled number is safe to
    quote. (This fixture's association is near-null, so signs wobble
    by stratum — exactly the situation where quoting the aggregate
    without this table misleads.)

    Exactness: four conditional counts per stratum; integer
    cross-products; magnitudes ≲ n² — inside int64 to sf10.

    Scale: one (stratum, e, o) conditional-count pass + a broadcast
    aggregate sign. Cheap enough to gate every dashboard tile on.
    """
    cells = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("stratum"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("e"),
        F.when(F.col("value") > SIMPSON_GATE, 1).otherwise(0).alias("o"),
    )
    per = cells.groupBy("stratum").agg(
        F.sum(F.col("e") * F.col("o")).cast("long").alias("a"),
        F.sum(F.col("e") * (1 - F.col("o"))).cast("long").alias("b"),
        F.sum((1 - F.col("e")) * F.col("o")).cast("long").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("o"))).cast("long").alias("d"),
    )
    sign = F.when(F.col("a") * F.col("d") - F.col("b") * F.col("c") > 0, 1).when(
        F.col("a") * F.col("d") - F.col("b") * F.col("c") < 0, -1
    ).otherwise(0)
    signed = per.withColumn("sign", sign)
    totals = per.agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum("c").alias("tc"),
        F.sum("d").alias("td"),
    )
    agg_sign = (
        F.when(F.col("ta") * F.col("td") - F.col("tb") * F.col("tc") > 0, 1)
        .when(F.col("ta") * F.col("td") - F.col("tb") * F.col("tc") < 0, -1)
        .otherwise(0)
    )
    return (
        signed.crossJoin(F.broadcast(totals))
        .select(
            "stratum",
            "a",
            "b",
            "c",
            "d",
            F.col("sign").cast("long").alias("stratum_sign"),
            agg_sign.cast("long").alias("aggregate_sign"),
        )
        .withColumn(
            "reversed_vs_aggregate",
            (F.col("stratum_sign") != 0)
            & (F.col("aggregate_sign") != 0)
            & (F.col("stratum_sign") != F.col("aggregate_sign")),
        )
        .orderBy("stratum")
    )


@register(
    "audit_documents_contract",
    oracle="""
    WITH checks AS (
        SELECT source,
               CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END
                   AS v_nchars,
               CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 0
                    ELSE 1 END AS v_empty,
               CASE WHEN lang IN ('en','de','fr','es','it','pt','nl','sv',
                                  'pl','ru','ja','zh','ko','ar','hi','tr')
                    THEN 0 ELSE 1 END AS v_lang,
               CASE WHEN COUNT(*) OVER (PARTITION BY doc_id) = 1 THEN 0
                    ELSE 1 END AS v_dup_id
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(v_nchars) AS BIGINT) AS v_nchars_drift,
           CAST(SUM(v_empty) AS BIGINT) AS v_empty_text,
           CAST(SUM(v_lang) AS BIGINT) AS v_lang_domain,
           CAST(SUM(v_dup_id) AS BIGINT) AS v_duplicate_id,
           SUM(v_nchars) + SUM(v_empty) + SUM(v_lang) + SUM(v_dup_id) = 0
               AS contract_clean
    FROM checks
    GROUP BY source
    ORDER BY source
    """,
)
def audit_documents_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents data contract (SURVEY.md §2.4): field-level invariants
    checked as conditional counts per source — the derivation
    n_chars = length(text), non-empty text, lang inside the ISO-639
    short-code domain, and doc_id uniqueness (checked via a window
    count, the only invariant here that needs more than the row) —
    the dbt-tests / Great-Expectations shape as one relation. This
    fixture's contract is CLEAN (all violation counts zero, flag
    true), and that is the point: a green audit is evidence, and the
    oracle hash-pins the greenness so a regenerated corpus that
    breaks a derivation turns a driver round red instead of silently
    poisoning fifty downstream keys that assume it.

    Exactness: pure predicates and counts.

    Scale: one scan with k predicate counters (map-side combinable)
    plus one window for the uniqueness check — contract audits run
    on every load or they don't run at all.
    """
    d = load(spark, sf_dir, "documents")
    w_id = Window.partitionBy("doc_id")
    langs = (
        "en de fr es it pt nl sv pl ru ja zh ko ar hi tr".split()
    )
    checks = d.select(
        "source",
        F.when(F.col("n_chars") == F.length("text"), 0).otherwise(1).alias("v_nchars"),
        F.when(F.col("text").isNotNull() & (F.length("text") > 0), 0)
        .otherwise(1)
        .alias("v_empty"),
        F.when(F.col("lang").isin(langs), 0).otherwise(1).alias("v_lang"),
        F.when(F.count("*").over(w_id) == 1, 0).otherwise(1).alias("v_dup_id"),
    )
    return (
        checks.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("v_nchars").cast("long").alias("v_nchars_drift"),
            F.sum("v_empty").cast("long").alias("v_empty_text"),
            F.sum("v_lang").cast("long").alias("v_lang_domain"),
            F.sum("v_dup_id").cast("long").alias("v_duplicate_id"),
        )
        .withColumn(
            "contract_clean",
            (
                F.col("v_nchars_drift")
                + F.col("v_empty_text")
                + F.col("v_lang_domain")
                + F.col("v_duplicate_id")
            )
            == 0,
        )
        .orderBy("source")
    )
