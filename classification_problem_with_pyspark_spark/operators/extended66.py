"""Round-3 extension pack #66: business-day settlement offsets and the
RLE compressibility layout audit.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — T+n business-day settlement (the securities convention:
a trade settles n WEEKDAYS later, so calendar arithmetic must skip
weekends via a business-day index, not add days) and run-length-
encoding compressibility estimation (count value runs under a file's
sort order — the advisor query behind Parquet/ORC encoding choices
and the whole reason layout keys like Z-ordering exist) — re-expressed
on the public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): the business-day index is a
dense ordinal over the weekday spine of the data's own date span
(row_number over the distinct weekday dates — no calendar state);
settlement is index + N and an inverse equi-join, all exact; run
counts are LAG inequalities summed under explicitly pinned total
orders.

Scale posture (SURVEY.md §7.6): the spine is calendar-bounded and
broadcast; facts join it twice by date equality — never a per-row
loop over days; the RLE audit is two window passes over the fact with
different pinned orders, each one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank, grid_shift
from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

SETTLE_DAYS = 2  # T+2, the post-2017 equities convention


@register(
    "join_business_day_settlement",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    spine AS (  -- dense business-day ordinals over the span
        SELECT d, row_number() OVER (ORDER BY d) AS bd
        FROM days WHERE dayofweek(d) BETWEEN 1 AND 5
    ),
    trades AS (
        SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS trade_d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        WHERE dayofweek(CAST(o_orderdate AS DATE)) BETWEEN 1 AND 5
    ),
    settled AS (
        SELECT t.k, t.trade_d, t.cents, s2.d AS settle_d,
               datediff('day', t.trade_d, s2.d) AS calendar_lag
        FROM trades t
        JOIN spine s1 ON s1.d = t.trade_d
        JOIN spine s2 ON s2.bd = s1.bd + {SETTLE_DAYS}
    )
    SELECT strftime(settle_d, '%Y-%m-%d') AS settle_day,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(cents) AS BIGINT) AS settle_cents,
           CAST(MAX(calendar_lag) AS BIGINT) AS max_calendar_lag,
           CAST(SUM(CASE WHEN calendar_lag > {SETTLE_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_weekend_crossers
    FROM settled
    GROUP BY settle_d
    ORDER BY settle_day
    """,
)
def join_business_day_settlement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T+{SETTLE_DAYS} business-day settlement (SURVEY.md §2.3): map
    every weekday trade to the date {SETTLE_DAYS} BUSINESS days later
    — the securities settlement calendar, where Friday's trade
    settles Tuesday (calendar lag 4, not 2). Adding days and clamping
    is wrong; the correct plan is a dense business-day ordinal over
    the calendar spine, settle = ordinal + N, and an inverse lookup —
    which is exactly what this key pins, with the weekend-crossing
    trades counted as evidence that the ordinal (not day-add)
    semantics ran. Cash-flow projection by settlement date falls out
    as the aggregation.

    Trades on the last {SETTLE_DAYS} business days of the span have
    no settlement date inside the data and are correctly absent (the
    inner join IS the semantics — unknown settlement is not a date).

    Exactness: dense ordinals, integer cents, date equality joins.

    Scale: the spine is calendar-bounded and broadcast; the fact
    joins it twice by equality — no row-at-a-time date walking, no
    range join. This is the reference-data join pattern every
    settlement engine runs at any volume.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.to_date("o_orderdate").alias("trade_d"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    days = o.select(F.col("trade_d").alias("d")).distinct()
    spine = grid_rank(
        days.where(F.dayofweek("d").between(2, 6)), ["d"], "bd"
    ).select("d", "bd")
    trades = o.where(F.dayofweek("trade_d").between(2, 6))
    s1 = spine.select(F.col("d").alias("trade_d"), F.col("bd").alias("bd1"))
    s2 = spine.select(F.col("d").alias("settle_d"), F.col("bd").alias("bd2"))
    settled = (
        trades.join(F.broadcast(s1), "trade_d")
        .join(F.broadcast(s2), F.col("bd2") == F.col("bd1") + SETTLE_DAYS)
        .select(
            "k",
            "cents",
            "settle_d",
            F.datediff("settle_d", "trade_d").alias("calendar_lag"),
        )
    )
    return (
        settled.groupBy("settle_d")
        .agg(
            F.count("*").alias("n_trades"),
            F.sum("cents").cast("long").alias("settle_cents"),
            F.max("calendar_lag").cast("long").alias("max_calendar_lag"),
            F.sum(
                F.when(F.col("calendar_lag") > SETTLE_DAYS, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_weekend_crossers"),
        )
        .select(
            F.date_format("settle_d", "yyyy-MM-dd").alias("settle_day"),
            "n_trades",
            "settle_cents",
            "max_calendar_lag",
            "n_weekend_crossers",
        )
        .orderBy("settle_day")
    )


@register(
    "layout_rle_compression_audit",
    oracle="""
    WITH ordered_by_key AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               LAG(l_returnflag) OVER w AS p_rf,
               LAG(l_linestatus) OVER w AS p_ls
        FROM lineitem
        WINDOW w AS (ORDER BY l_orderkey, l_linenumber, l_partkey,
                     l_returnflag, l_linestatus)
    ),
    ordered_by_col AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               LAG(l_returnflag) OVER w AS p_rf,
               LAG(l_linestatus) OVER w AS p_ls
        FROM lineitem
        WINDOW w AS (ORDER BY l_returnflag, l_linestatus, l_orderkey,
                     l_linenumber, l_partkey)
    ),
    runs AS (
        SELECT 'by_key' AS layout,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN p_rf IS NULL OR p_rf <> rf
                             THEN 1 ELSE 0 END) AS BIGINT) AS rf_runs,
               CAST(SUM(CASE WHEN p_ls IS NULL OR p_ls <> ls
                             THEN 1 ELSE 0 END) AS BIGINT) AS ls_runs
        FROM ordered_by_key
        UNION ALL
        SELECT 'by_value', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN p_rf IS NULL OR p_rf <> rf
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN p_ls IS NULL OR p_ls <> ls
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM ordered_by_col
    )
    SELECT layout, n_rows, rf_runs, ls_runs,
           CAST((1000000 * rf_runs) // n_rows AS BIGINT)
               AS rf_run_ratio_micro,
           CAST((1000000 * ls_runs) // n_rows AS BIGINT)
               AS ls_run_ratio_micro
    FROM runs
    ORDER BY layout
    """,
)
def layout_rle_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE compressibility audit (SURVEY.md §2.1): count value RUNS of
    the low-cardinality lineitem columns under two candidate file
    orders — the natural (orderkey, linenumber) write order vs a
    value-clustered sort — and report runs-per-row. Run count IS the
    RLE dictionary-page cost in Parquet/ORC: the value-sorted layout
    collapses each column to ~|distinct| runs (ratio ≈ 0) while the
    key order leaves ~independent values per row (ratio ≈ 1 − 1/k) —
    the measured evidence behind every "sort before write" layout
    decision, quantified next to `layout_zorder_cluster` /
    `layout_zonemap_prune_audit` (which hold the pruning side of the
    same trade).

    Exactness: runs are LAG inequalities under fully pinned total
    orders; ratios floor-micro.

    Scale: NO global sort. by_key: run starts decompose into
    within-bucket lag inequalities under a bucket-PARTITIONED window
    (bucket = l_orderkey DIV 2^15 — order-preserving because orderkey
    leads the sort key) plus one stitch comparison per adjacent
    non-empty bucket, whose lag runs over the bucket GRID (min_by/
    max_by on the full sort-key struct pick each bucket's first/last
    values). by_value: rf/ls are CONSTANT inside every (rf, ls) block
    of the value-clustered order, so run counts reduce exactly to lag
    inequalities over the tiny (rf, ls) block grid — the fact table
    contributes only a groupBy count.
    """
    li = load(spark, sf_dir, "lineitem")
    cols = [
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_returnflag",
        "l_linestatus",
    ]
    rows = li.select(*cols, F.expr(f"l_orderkey DIV {1 << 15}").alias("b"))
    w_in = Window.partitionBy("b").orderBy(*cols)
    flagged = rows.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.lag("l_returnflag").over(w_in).alias("p_rf"),
        F.lag("l_linestatus").over(w_in).alias("p_ls"),
    )
    within = flagged.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("p_rf").isNotNull() & (F.col("p_rf") != F.col("rf")), 1
            ).otherwise(0)
        ).alias("rf_in"),
        F.sum(
            F.when(
                F.col("p_ls").isNotNull() & (F.col("p_ls") != F.col("ls")), 1
            ).otherwise(0)
        ).alias("ls_in"),
    )
    kstruct = F.struct(*cols)
    bounds = (
        grid_shift(
            rows.groupBy("b").agg(
                F.min_by("l_returnflag", kstruct).alias("first_rf"),
                F.max_by("l_returnflag", kstruct).alias("last_rf"),
                F.min_by("l_linestatus", kstruct).alias("first_ls"),
                F.max_by("l_linestatus", kstruct).alias("last_ls"),
            ),
            ["b"],
            [("prev_rf", "last_rf", -1), ("prev_ls", "last_ls", -1)],
        )
        .select(
            "first_rf",
            "first_ls",
            "prev_rf",
            "prev_ls",
        )
        .agg(
            F.sum(
                F.when(
                    F.col("prev_rf").isNull()
                    | (F.col("prev_rf") != F.col("first_rf")),
                    1,
                ).otherwise(0)
            ).alias("rf_bd"),
            F.sum(
                F.when(
                    F.col("prev_ls").isNull()
                    | (F.col("prev_ls") != F.col("first_ls")),
                    1,
                ).otherwise(0)
            ).alias("ls_bd"),
        )
    )
    by_key = within.crossJoin(F.broadcast(bounds)).select(
        F.lit("by_key").alias("layout"),
        "n_rows",
        (F.col("rf_in") + F.col("rf_bd")).cast("long").alias("rf_runs"),
        (F.col("ls_in") + F.col("ls_bd")).cast("long").alias("ls_runs"),
    )
    vgrid = grid_shift(
        li.groupBy(
            F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
        ).agg(F.count("*").alias("c")),
        ["rf", "ls"],
        [("p_rf", "rf", -1), ("p_ls", "ls", -1)],
    )
    by_value = vgrid.agg(
        F.lit("by_value").alias("layout"),
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.col("p_rf").isNull() | (F.col("p_rf") != F.col("rf")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("rf_runs"),
        F.sum(
            F.when(
                F.col("p_ls").isNull() | (F.col("p_ls") != F.col("ls")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("ls_runs"),
    )
    out = by_key.unionByName(by_value)
    return out.select(
        "layout",
        "n_rows",
        "rf_runs",
        "ls_runs",
        F.expr("CAST((1000000 * rf_runs) DIV n_rows AS BIGINT)").alias(
            "rf_run_ratio_micro"
        ),
        F.expr("CAST((1000000 * ls_runs) DIV n_rows AS BIGINT)").alias(
            "ls_run_ratio_micro"
        ),
    ).orderBy("layout")
