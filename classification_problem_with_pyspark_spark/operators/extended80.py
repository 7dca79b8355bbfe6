"""Round-3 extension pack #80: CUPED variance reduction and the
multimodal pair-integrity audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — CUPED (Controlled-experiment Using Pre-Experiment Data;
Deng, Xu, Kohavi & Walker, WSDM 2013: adjust the experiment metric by
its pre-period covariate, Y′ = Y − θ(X − X̄), shrinking variance by
the squared correlation and therefore experiment runtime by the same
factor — the single highest-ROI trick in online experimentation) and
pair-integrity auditing for paired multimodal corpora (caption↔media
association checks via content digests; mispaired examples poison
contrastive training, so CLIP-style pipelines audit pairing before
any GPU spins) — re-expressed on the public PySpark DataFrame API
over the driver's testdata.

Hash-parity discipline (round-3 standard): per-user pre/post cents
are exact integers; θ and the variance-reduction ratio fold the
t-test discipline (integer co-moments, one ROUND-6 double close).
The caption table is a deterministic derivation of the media table
with every SWAP_MOD-th pair swapped cyclically inside its source;
integrity verdicts are digest equalities.

Scale posture (SURVEY.md §7.6): CUPED is two per-user aggregates +
one co-moment pass (the adjustment at scale is a broadcast θ applied
scan-side); the pair audit is a digest equi-join — no payloads move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

PRE_MAX_DAY = 15  # pre-period: days 1-15; post: the rest
SWAP_MOD = 23  # every 23rd caption (per source) is mispaired


@register(
    "events_cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= {PRE_MAX_DAY}
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > {PRE_MAX_DAY}
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               AS theta,
           ROUND(1.0 - POW(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
                       / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                          * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS var_ratio,
           ROUND(POW(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS corr_squared
    FROM mom
    """,
)
def events_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (SURVEY.md §2.4): per-user pre-period
    spend (days ≤ {PRE_MAX_DAY}) as the covariate X, post-period
    spend as the metric Y; θ = cov(X,Y)/var(X) and the adjusted
    metric's variance ratio var(Y′)/var(Y) = 1 − ρ² — the Deng-Kohavi
    identity, which means the reported `corr_squared` IS the fraction
    of experiment runtime CUPED saves on this metric. The adjustment
    every mature experimentation platform applies by default, folded
    closed-form so no adjusted rows materialize (at scale θ
    broadcasts and Y′ is a scan-side expression; the RATIO needs only
    the moments).

    Exactness: per-user sums are exact integer cents (users with no
    pre-period activity contribute X=0 — the real-world cold-start
    mass, kept, not dropped); the closes are identical ROUND-6
    doubles over the six exact co-moments.

    Scale: one per-user aggregate + one co-moment pass, both
    map-side combinable — the cheapest variance reduction there is.
    """
    day = F.dayofmonth("ts")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    per_user = load(spark, sf_dir, "events").groupBy("user_id").agg(
        F.sum(F.when(day <= PRE_MAX_DAY, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(day > PRE_MAX_DAY, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    mom = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return mom.select(
        "n",
        F.round(cov_n / varx_n, 6).alias("theta"),
        F.round(1.0 - F.pow(cov_n, 2) / (varx_n * vary_n), 6).alias("var_ratio"),
        F.round(F.pow(cov_n, 2) / (varx_n * vary_n), 6).alias("corr_squared"),
    )


@register(
    "multimodal_pair_integrity_audit",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, source, md5(text) AS payload_md5,
               row_number() OVER (PARTITION BY source ORDER BY doc_id)
                   AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    captions AS (  -- caption i carries the digest of its TRUE partner,
                   -- except every {SWAP_MOD}th pair is cyclically swapped
        SELECT a.media_id, a.source,
               CASE WHEN a.rn % {SWAP_MOD} = 0
                    THEN b.payload_md5 ELSE a.payload_md5 END AS claimed_md5
        FROM media a
        JOIN media b ON b.source = a.source
                    AND b.rn = (a.rn % a.n_src) + 1
    )
    SELECT m.source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN c.claimed_md5 = m.payload_md5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_intact,
           CAST(SUM(CASE WHEN c.claimed_md5 <> m.payload_md5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mispaired,
           CAST((1000000 * SUM(CASE WHEN c.claimed_md5 <> m.payload_md5
                                    THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS mispair_micro
    FROM media m JOIN captions c ON c.media_id = m.media_id
    GROUP BY m.source
    ORDER BY m.source
    """,
)
def multimodal_pair_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pair-integrity audit (SURVEY.md §2.12): every caption
    row claims its media partner by content digest; the audit joins
    claims against the media table and counts intact vs mispaired
    associations per source. The fixture mispairs every
    {SWAP_MOD}th caption cyclically within its source (a shuffle bug's
    signature — off-by-one joins misalign WHOLE shards in real
    pipelines), and the audit localizes the damage rate per source —
    the check CLIP-style contrastive training runs before any GPU
    time, because mispaired examples are actively poisonous, not just
    wasted. Digest-based (payloads never move) — the metadata-only
    discipline of the whole multimodal family.

    Exactness: md5 equality and integer counts.

    Scale: one digest equi-join on the pair key + a census; the
    payload column is never read (pruning), and the digests were
    computed once at ingest (`multimodal_binary_meta` holds that
    leg).
    """
    d = load(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        "source",
        F.md5("text").alias("payload_md5"),
        F.row_number().over(w_src).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n_src"),
    )
    partner = media.select(
        F.col("source").alias("p_source"),
        F.col("rn").alias("p_rn"),
        F.col("payload_md5").alias("partner_md5"),
    )
    captions = (
        media.join(
            partner,
            (F.col("p_source") == F.col("source"))
            & (F.col("p_rn") == (F.col("rn") % F.col("n_src")) + 1),
        )
        .select(
            "media_id",
            F.when(F.col("rn") % SWAP_MOD == 0, F.col("partner_md5"))
            .otherwise(F.col("payload_md5"))
            .alias("claimed_md5"),
        )
    )
    return (
        media.select("media_id", "source", "payload_md5")
        .join(captions, "media_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(F.col("claimed_md5") == F.col("payload_md5"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_intact"),
            F.sum(
                F.when(F.col("claimed_md5") != F.col("payload_md5"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_mispaired"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN claimed_md5 <> payload_md5 "
                "THEN 1 ELSE 0 END)) DIV COUNT(*) AS BIGINT)"
            ).alias("mispair_micro"),
        )
        .orderBy("source")
    )
