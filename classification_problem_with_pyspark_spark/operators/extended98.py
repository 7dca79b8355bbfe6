"""Round-3 extension pack #98: semantic-version ordering and the
token-offset conservation audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — semantic-version comparison (semver.org: numeric
component-wise ordering, where the lexical string sort famously breaks
at "1.10.0" < "1.9.0" — the dependency-resolution bug every package
registry fixed decades ago and every ad-hoc version column reinvents)
and tokenization offset conservation (a tokenizer's spans must tile
the source string — Σ token lengths + separators = text length; HF
fast-tokenizers expose offsets precisely so pipelines can audit this)
— re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): versions are a
deterministic synthesis from supplier keys; numeric ordering folds
the components into one comparable integer (major·1e6 + minor·1e3 +
patch) and the lexical rank rides alongside so the DIVERGENCE is a
hash-pinned column. Offset conservation is pure integer length
algebra over whitespace tokenization, with the reconstruction deficit
(collapsed separator runs) quantified per document class.

Scale posture (SURVEY.md §7.6): both are per-row projections plus a
rank/census — semantics keys, priced accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "scalar_semver_ordering_suite",
    oracle="""
    WITH versions AS (
        SELECT s_suppkey AS supp_key,
               CAST(s_suppkey % 3 AS VARCHAR) || '.'
                   || CAST(s_suppkey % 13 AS VARCHAR) || '.'
                   || CAST(s_suppkey % 7 AS VARCHAR) AS ver,
               CAST(s_suppkey % 3 AS BIGINT) AS major,
               CAST(s_suppkey % 13 AS BIGINT) AS minor,
               CAST(s_suppkey % 7 AS BIGINT) AS patch
        FROM supplier
    ),
    ranked AS (
        SELECT supp_key, ver,
               major * 1000000 + minor * 1000 + patch AS ver_num,
               row_number() OVER (ORDER BY major * 1000000 + minor * 1000
                                  + patch, supp_key) AS semver_rank,
               row_number() OVER (ORDER BY ver, supp_key) AS lexical_rank
        FROM versions
    )
    SELECT supp_key, ver,
           CAST(ver_num AS BIGINT) AS ver_num,
           CAST(semver_rank AS BIGINT) AS semver_rank,
           CAST(lexical_rank AS BIGINT) AS lexical_rank,
           semver_rank <> lexical_rank AS rank_diverges
    FROM ranked
    ORDER BY supp_key
    """,
)
def scalar_semver_ordering_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semver ordering (SURVEY.md §2.8): deterministic x.y.z versions
    (components from supplier-key residues, with minors reaching 10+
    so the trap is live) ranked BOTH ways — numerically
    (major·1e6 + minor·1e3 + patch, the semver contract) and
    lexically (the string sort every ad-hoc version column gets by
    default) — with the divergence flag as a column. "1.10.x" sorting
    before "1.9.x" lexically is the dependency-resolution bug this
    key pins as a hash-checked fact; the numeric fold is the fix,
    identical on both engines.

    Exactness: integer components, integer fold, total rank orders.

    Scale: per-row string building + two ranks over the dim —
    semantics keys cost nothing and prevent version-gated rollout
    bugs that cost everything.
    """
    v = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_key"),
        F.concat(
            (F.col("s_suppkey") % 3).cast("string"),
            F.lit("."),
            (F.col("s_suppkey") % 13).cast("string"),
            F.lit("."),
            (F.col("s_suppkey") % 7).cast("string"),
        ).alias("ver"),
        (F.col("s_suppkey") % 3).cast("long").alias("major"),
        (F.col("s_suppkey") % 13).cast("long").alias("minor"),
        (F.col("s_suppkey") % 7).cast("long").alias("patch"),
    )
    ver_num = (
        F.col("major") * 1_000_000 + F.col("minor") * 1_000 + F.col("patch")
    )
    # De-globalized ranks (r8): both total orders tie-break on supp_key,
    # so each global rank = strictly-lower distinct-value count (bounded
    # version-grid cumsum) + a value-partitioned row_number — no supplier
    # row meets an unpartitioned window.
    rows = v.select("supp_key", "ver", ver_num.cast("long").alias("ver_num"))

    def _rank(col: str, name: str):
        hist = rows.groupBy(col).agg(F.count("*").alias("c"))
        return (
            grid_cumsum(hist, [col], [("base", "c")], keep=[col], frame_end=-1),
            Window.partitionBy(col).orderBy("supp_key"),
            name,
        )

    num_base, w_num, _ = _rank("ver_num", "semver_rank")
    lex_base, w_lex, _ = _rank("ver", "lexical_rank")
    return (
        rows.join(F.broadcast(num_base.withColumnRenamed("base", "nb")), "ver_num")
        .join(F.broadcast(lex_base.withColumnRenamed("base", "lb")), "ver")
        .select(
            "supp_key",
            "ver",
            "ver_num",
            (F.col("nb") + F.row_number().over(w_num))
            .cast("long")
            .alias("semver_rank"),
            (F.col("lb") + F.row_number().over(w_lex))
            .cast("long")
            .alias("lexical_rank"),
        )
        .withColumn(
            "rank_diverges", F.col("semver_rank") != F.col("lexical_rank")
        )
        .orderBy("supp_key")
    )


@register(
    "llm_token_offsets_audit",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(length(text) AS BIGINT) AS text_len,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(string_split(text, ' ')) - 1 AS BIGINT) AS n_seps,
               CAST((SELECT COALESCE(SUM(length(t)), 0)
                     FROM unnest(string_split(text, ' ')) AS u(t))
                    AS BIGINT) AS token_chars
        FROM documents
    ),
    audited AS (
        SELECT source,
               text_len - token_chars - n_seps AS deficit,
               CASE WHEN text_len = token_chars + n_seps
                    THEN 1 ELSE 0 END AS tiles_exactly
        FROM toks
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tiles_exactly) AS BIGINT) AS n_exact_tilings,
           CAST(SUM(1 - tiles_exactly) AS BIGINT) AS n_lossy,
           CAST(SUM(deficit) AS BIGINT) AS total_deficit_chars,
           CAST(MAX(deficit) AS BIGINT) AS max_deficit_chars
    FROM audited
    GROUP BY source
    ORDER BY source
    """,
)
def llm_token_offsets_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-offset conservation (SURVEY.md §2.12): single-character
    split tokenization must TILE the source exactly — Σ token chars +
    (n−1) separators = text length — an IDENTITY for a faithful
    splitter (consecutive separators yield empty tokens that preserve
    it). What the hash therefore pins is the cross-engine SPLIT
    SEMANTICS: an engine that dropped empty tokens, trimmed
    boundaries, or collapsed separator runs would break the identity
    on exactly the documents exhibiting those edges — the silent
    divergences that corrupt span-aligned label data (the reason HF
    fast tokenizers expose offsets at all). Conservation-law keys of
    this kind (see `agg_moments_merge_audit`) make an algebraic
    guarantee falsifiable rather than assumed.

    Exactness: pure integer length algebra.

    Scale: per-row arithmetic + one census; offset audits run at
    ingest rate or not at all.
    """
    toks = load(spark, sf_dir, "documents").select(
        "source",
        F.length("text").cast("long").alias("text_len"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.aggregate(
            F.split("text", " "),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t).cast("long"),
        ).alias("token_chars"),
    )
    audited = toks.select(
        "source",
        (
            F.col("text_len")
            - F.col("token_chars")
            - (F.col("n_tokens") - 1)
        ).alias("deficit"),
    ).withColumn(
        "tiles_exactly", F.when(F.col("deficit") == 0, 1).otherwise(0)
    )
    return (
        audited.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tiles_exactly").cast("long").alias("n_exact_tilings"),
            F.sum(1 - F.col("tiles_exactly")).cast("long").alias("n_lossy"),
            F.sum("deficit").cast("long").alias("total_deficit_chars"),
            F.max("deficit").cast("long").alias("max_deficit_chars"),
        )
        .orderBy("source")
    )
