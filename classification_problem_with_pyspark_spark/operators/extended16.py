"""Round-3 extension pack #16: robust statistics and signal
decomposition — trimmed/winsorized means by rank algebra, and a 3-level
Haar wavelet energy decomposition of the daily event series.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — trimmed/winsorized means (classic robust location estimators)
and the Haar discrete wavelet transform (pairwise sums/differences per
level; detail energy localizes variance by time scale) — expressed on the
public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): everything is INTEGER — money
in cents, ranks by row_number (tie placement among equal values cannot
change any range-sum: the multiset in positions k+1..n−k is
rank-invariant), Haar coefficients are ± sums of counts and energies are
integer squares. No floats anywhere in either key.

Scale posture (SURVEY.md §7.6):
- Trimmed/winsorized rank windows partition by group; at 100 TB the
  exact rank pass runs on the approx-quantile-bounded candidate band
  (two-pass top-k discipline) instead of the full column.
- The Haar cascade is 3 successive map-side-combinable groupBys over a
  BOUNDED daily aggregate (31 → 16 → 8 → 4 rows per type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "agg_trimmed_winsorized_mean",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ), ranked AS (
        SELECT flag, c,
               row_number() OVER (PARTITION BY flag ORDER BY c) AS rn,
               CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
        FROM cents
    ), bounds AS (
        SELECT flag, c, rn, n, CAST(floor(n * 0.05) AS BIGINT) AS k
        FROM ranked
    )
    SELECT flag,
           max(n) AS n,
           max(k) AS k_each_side,
           CAST(SUM(CASE WHEN rn > k AND rn <= n - k THEN c ELSE 0 END)
                AS BIGINT) AS trimmed_sum_cents,
           CAST(SUM(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END)
                AS BIGINT) AS trimmed_n,
           CAST(max(CASE WHEN rn = k + 1 THEN c END) AS BIGINT)
               AS winsor_low_cents,
           CAST(max(CASE WHEN rn = n - k THEN c END) AS BIGINT)
               AS winsor_high_cents
    FROM bounds GROUP BY flag ORDER BY flag
    """,
)
def agg_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimators by rank algebra (SURVEY.md §2.13):
    per returnflag, the 5%-trimmed sum/count of price cents (drop the
    k=⌊0.05n⌋ smallest and largest) plus the winsorization clamp values
    (the k+1-th and n−k-th order statistics). The consumer divides for
    the trimmed mean and computes the winsorized sum as
    trimmed_sum + k·(low + high) — every term exact BIGINT, so the key
    emits the full estimator algebra without one float.

    Tie safety: row_number places equal values arbitrarily, but every
    emitted quantity is invariant to that placement — range-sums over
    ranks depend only on the value MULTISET, and the boundary order
    statistics are unique values by definition.

    Scale: one rank window per group; at 100 TB bound the exact pass
    with approx_percentile cutoffs first (the candidate-band trick) so
    the window sees ~2k rows per side instead of n.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    wrank = Window.partitionBy("flag").orderBy("c")
    wall = Window.partitionBy("flag")
    ranked = cents.select(
        "flag",
        "c",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wall).cast("long").alias("n"),
    ).withColumn("k", F.floor(F.col("n") * 0.05).cast("long"))
    kept = (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    return (
        ranked.groupBy("flag")
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("k_each_side"),
            F.sum(F.when(kept, F.col("c")).otherwise(0))
            .cast("long")
            .alias("trimmed_sum_cents"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("trimmed_n"),
            F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("c")))
            .cast("long")
            .alias("winsor_low_cents"),
            F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("c")))
            .cast("long")
            .alias("winsor_high_cents"),
        )
        .orderBy("flag")
    )


@register(
    "events_haar_energy",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) + 1 AS di,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), l1 AS (
        SELECT event_type, CAST(ceil(di / 2.0) AS BIGINT) AS g,
               CAST(SUM(CASE WHEN di % 2 = 1 THEN c ELSE -c END) AS BIGINT) AS d,
               CAST(SUM(c) AS BIGINT) AS a
        FROM daily GROUP BY 1, 2
    ), l2 AS (
        SELECT event_type, CAST(ceil(g / 2.0) AS BIGINT) AS g,
               CAST(SUM(CASE WHEN g % 2 = 1 THEN a ELSE -a END) AS BIGINT) AS d,
               CAST(SUM(a) AS BIGINT) AS a
        FROM l1 GROUP BY 1, 2
    ), l3 AS (
        SELECT event_type, CAST(ceil(g / 2.0) AS BIGINT) AS g,
               CAST(SUM(CASE WHEN g % 2 = 1 THEN a ELSE -a END) AS BIGINT) AS d,
               CAST(SUM(a) AS BIGINT) AS a
        FROM l2 GROUP BY 1, 2
    ), e1 AS (SELECT event_type, CAST(sum(d*d) AS BIGINT) AS energy_l1 FROM l1 GROUP BY 1),
       e2 AS (SELECT event_type, CAST(sum(d*d) AS BIGINT) AS energy_l2 FROM l2 GROUP BY 1),
       e3 AS (SELECT event_type, CAST(sum(d*d) AS BIGINT) AS energy_l3,
                     CAST(sum(a) AS BIGINT) AS total_count FROM l3 GROUP BY 1)
    SELECT event_type, energy_l1, energy_l2, energy_l3, total_count
    FROM e1 JOIN e2 USING (event_type) JOIN e3 USING (event_type)
    ORDER BY event_type
    """,
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level Haar wavelet energy decomposition (SURVEY.md §2.13) of
    each event type's daily-count series: level-1 detail energy captures
    day-to-day jitter, level 2 the 2–4-day swings, level 3 the
    week-scale movement — variance localized by TIME SCALE, which a
    plain stddev cannot do (the autocorrelation key measures lag
    similarity; this measures band energy). Unnormalized Haar (pairwise
    sum/difference cascade, absent days contribute 0), so every
    coefficient and every energy is an exact integer — the whole
    transform hash-checks with zero float tolerance, and total_count
    (the level-3 approximation sum) must equal the type's event count
    (asserted in tests: Σa conservation through the cascade).

    Scale: the cascade runs on the BOUNDED daily aggregate (31→16→8→4
    rows per type) — three map-side-combinable groupBys after the one
    fact-table pass; at any corpus size the wavelet work is O(days).
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        (
            F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01"))
            + 1
        ).alias("di"),
    ).agg(F.count("*").alias("c"))

    def cascade(df: DataFrame, pos: str, val: str) -> DataFrame:
        signed = F.when(F.col(pos) % 2 == 1, F.col(val)).otherwise(-F.col(val))
        return df.groupBy(
            "event_type", F.ceil(F.col(pos) / 2.0).cast("long").alias("g")
        ).agg(
            F.sum(signed).cast("long").alias("d"),
            F.sum(val).cast("long").alias("a"),
        )

    l1 = cascade(daily, "di", "c")
    l2 = cascade(l1, "g", "a")
    l3 = cascade(l2, "g", "a")
    energy = lambda df, name: df.groupBy("event_type").agg(  # noqa: E731
        F.sum(F.col("d") * F.col("d")).cast("long").alias(name)
    )
    e3 = l3.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("energy_l3"),
        F.sum("a").cast("long").alias("total_count"),
    )
    return (
        energy(l1, "energy_l1")
        .join(energy(l2, "energy_l2"), "event_type")
        .join(e3, "event_type")
        .orderBy("event_type")
    )
