"""Aggregations (SURVEY.md §2.4): groupBy/multi-agg/describe/distinct/
rollup/cube/grouping sets/conditional/having.

Scale posture: every aggregate here is a declarative groupBy — Spark plans
partial (map-side) aggregation before the shuffle, so bytes shuffled are
proportional to group cardinality, not input rows. That is exactly the
plan that survives 100 TB; tests/test_plans.py asserts partial_ agg nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load


@register(
    "groupby_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS row_cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EDA staple: df.groupBy(...).count() (SURVEY.md §2.4)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("row_cnt"))
    )


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           SUM(l_quantity) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
               AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 6)
               AS sum_charge,
           ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (TPC-H Q1 shape, SURVEY.md §7.2): filter + groupBy + 8 aggs.

    Filter is pushed to the parquet scan; partial aggregation means the
    shuffle carries 6 groups regardless of input size — the canonical
    scale-proof aggregation plan.

    Money math runs in DECIMAL, not double — caught by the multi-SF parity
    test (tests/test_multi_sf.py): double sums are order-dependent and the
    accumulated error GROWS with row count, so a query that hash-matches
    at sf0.01 silently diverges at sf0.1+. Decimal sums of 2-dec inputs
    are exact at any N (TPC-H itself specifies decimal); the exact sum is
    cast back to double for a stable output schema. Averages are
    sum/count on the exact sum — never engine-private AVG accumulation.
    """
    li = load(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = ep * (1 - disc)
    cnt = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(ep).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + tax)).cast("double"), 6).alias("sum_charge"),
            F.round(F.sum("l_quantity") / cnt, 6).alias("avg_qty"),
            F.round(F.sum(ep).cast("double") / cnt, 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / cnt, 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_describe",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(l_quantity) AS cnt,
           ROUND(AVG(l_quantity), 6) AS mean_val,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_val,
           MIN(l_quantity) AS min_val,
           MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           COUNT(l_extendedprice),
           ROUND(AVG(l_extendedprice), 6),
           ROUND(STDDEV_SAMP(l_extendedprice), 6),
           MIN(l_extendedprice),
           MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           COUNT(l_discount),
           ROUND(AVG(l_discount), 6),
           ROUND(STDDEV_SAMP(l_discount), 6),
           MIN(l_discount),
           MAX(l_discount)
    FROM lineitem
    """,
)
def agg_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.describe() re-expressed deterministically (SURVEY.md §2.4).

    One row per numeric column with count/mean/stddev/min/max — same
    information as the reference's canonical ``df.describe()`` EDA step,
    but typed and aliased for oracle comparison. Single pass per column
    set via one wide agg then unpivoted by unionByName (no shuffle growth).
    """
    li = load(spark, sf_dir, "lineitem")

    def one(colname: str) -> DataFrame:
        return li.agg(
            F.lit(colname).alias("column_name"),
            F.count(colname).alias("cnt"),
            F.round(F.avg(colname), 6).alias("mean_val"),
            F.round(F.stddev_samp(colname), 6).alias("stddev_val"),
            F.min(colname).alias("min_val"),
            F.max(colname).alias("max_val"),
        )

    out = one("l_quantity")
    for c in ("l_extendedprice", "l_discount"):
        out = out.unionByName(one(c))
    return out


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark plans a two-stage expand+agg."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count("*").alias("order_cnt"),
        )
    )


@register("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx_count_distinct (SURVEY.md §2.4) — approximate, so
    rows-only check by design (§7.4: never near the hash-checked set).

    At 100 TB this is THE distinct-count operator: fixed-size sketch per
    group, mergeable map-side, no expand explosion.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY.md §2.4)."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations (SURVEY.md §2.4)."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL over a temp view (SURVEY.md §3 EP2 — the SQL
    entry point shares the exact Catalyst pipeline with the DataFrame API)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderstatus,
               COUNT(*) AS order_cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS finished_value,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_cnt,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation: SUM(CASE WHEN ...) (SURVEY.md §2.4)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 2).alias(
            "finished_value"
        ),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_cnt"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("open_cnt"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 1500000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (SURVEY.md §2.4).

    The HAVING predicate uses the unrounded sum on both engines; only the
    projected value is rounded. Boundary risk is nil because order-of-
    addition error (~1e-9) cannot straddle a 7-digit threshold comparison
    at these magnitudes... but the local parity test verifies exactly.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.sum("o_totalprice").alias("_raw_spend"),
        )
        .where(F.col("_raw_spend") > 1500000)
        .drop("_raw_spend")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS val_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab (the notebook EDA staple `groupBy().pivot()`):
    order counts per priority × status, statuses spread into columns.

    The pivot VALUES are pinned explicitly — without them Spark runs an
    extra distinct-scan job to discover them, and at 100 TB that is a full
    pass over the fact table before the real aggregation even starts.
    The oracle is the standard conditional-aggregation rewrite, which is
    also exactly how Spark executes a pinned pivot (one pass, partial aggs).
    """
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("val"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F_cnt", F.lit(0)).alias("cnt_f"),
        F.coalesce("O_cnt", F.lit(0)).alias("cnt_o"),
        F.coalesce("P_cnt", F.lit(0)).alias("cnt_p"),
        F.coalesce("F_val", F.lit(0.0)).alias("val_f"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_median,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS price_median
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) per return flag.

    Spark's `percentile` and DuckDB's `quantile_cont` both use the
    (n-1)·p linear-interpolation convention → exact parity after
    round(,6). Exact percentiles need the full sorted group (one shuffle);
    at 100 TB swap in approx_percentile (KLL/GK sketch, mergeable,
    bounded memory) — kept as the oracle-free twin `agg_approx_distinct`
    pattern.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_median"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("qty_p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("price_median"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses_csv,
           COUNT(DISTINCT o_orderstatus) AS status_cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list aggregation made deterministic: collect_set
    (arrival-order-free) → sort_array → join to CSV. Raw collect_list
    output order is partition-dependent and must NEVER be hash-compared —
    sorting is what makes a collected aggregate testable (and at scale,
    collect_* per group is only safe when group fan-in is bounded, as a
    3-value status enum is).
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses_csv"),
        F.countDistinct("o_orderstatus").alias("status_cnt"),
    )


@register(
    "audit_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(*) AS row_cnt,
           COUNT(o_custkey) AS non_null_cnt,
           COUNT(DISTINCT o_custkey) AS distinct_cnt,
           ROUND(CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*), 6) AS fill_rate
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           COUNT(*),
           COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           ROUND(CAST(COUNT(o_orderstatus) AS DOUBLE) / COUNT(*), 6)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           COUNT(*),
           COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           ROUND(CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*), 6)
    FROM orders
    """,
)
def audit_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit profile (deequ-style): per column, row count,
    non-null count, distinct count, fill rate — the pre-ingestion gate a
    training-data pipeline runs before accepting a new drop.

    One wide aggregation per column batch over a single scan; at 100 TB
    swap COUNT(DISTINCT) for approx_count_distinct and this exact shape
    profiles any table in one pass.
    """
    o = load(spark, sf_dir, "orders")

    def one(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("row_cnt"),
            F.count(col).alias("non_null_cnt"),
            F.countDistinct(col).alias("distinct_cnt"),
            F.round(F.count(col).cast("double") / F.count("*"), 6).alias("fill_rate"),
        )

    out = one("o_custkey")
    for c in ("o_orderstatus", "o_totalprice"):
        out = out.unionByName(one(c))
    return out


@register("agg_hll_sketch_mergeable", oracle=None)
def agg_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL: per-event_type user sketches, then a MERGE of the
    per-type sketches, proving the estimate composes without re-scanning —
    the mergeability that makes distinct-counting 100 TB feasible
    (pre-aggregate sketches per partition/day, union them at query time).

    Estimates are deterministic for fixed input but engine-private →
    rows-only; tests assert the merged estimate is within 2% of the exact
    global distinct.
    """
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count("*").alias("event_cnt"),
    )
    merged = per_type.agg(
        F.lit("ALL_MERGED").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_users"),
        F.sum("event_cnt").alias("event_cnt"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sketch").alias("distinct_users"),
            "event_cnt",
        )
        .unionByName(merged)
    )


def salted_aggregate(
    df: DataFrame,
    key: str,
    value_col: str,
    salt_n: int = 8,
) -> DataFrame:
    """Skew-mitigating two-phase aggregation (SURVEY.md §7.6): count+sum
    grouped first by (key, salt) — spreading a hot key over ``salt_n``
    reducers — then re-aggregated by key. Spark's map-side partial
    aggregation already handles most skew for algebraic aggregates; this
    explicit form is for the pathological case (or non-algebraic
    per-group work downstream). Result is exactly groupBy(key).agg(...).
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value_col)), F.lit(salt_n)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"), F.sum(value_col).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("row_cnt"),
        F.sum("_sum").alias("value_sum"),
    )
