"""The distributed global-rank helpers (plans/global_rank.py, round 9):
bucket-stitch exact row_number / top-k / closed-form NTILE over
entity-scale relations, verified against Spark's own global window
functions on small data (where the single-task reference is safe)."""

import pytest

pytestmark = pytest.mark.slow  # registry-wide / helper-identity sweeps: CI surface (VERDICT r12 #2)
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.global_rank import (
    bucketed_global_cummax,
    bucketed_global_cumsum,
    bucketed_global_rank,
    bucketed_global_topk,
    closed_form_ntile,
)


def _entity_df(spark, n=97):
    # non-uniform values with heavy ties + negatives; id completes the order
    return (
        spark.range(n)
        .groupBy("id")
        .agg(((F.first("id") * 37 % 11) * 13 - 26).cast("long").alias("v"))
    )


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("bits", [0, 3])
def test_bucketed_global_rank_matches_global_window(spark, descending, bits):
    df = _entity_df(spark)
    val = F.desc("v") if descending else F.asc("v")
    w = Window.orderBy(val, F.asc("id"))
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in bucketed_global_rank(
            df, "v", [F.asc("id")], descending=descending, bucket_bits=bits
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("k", [1, 7, 500])
def test_bucketed_global_topk_matches_filtered_rank(spark, k):
    df = _entity_df(spark)
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    expect = {
        (r["id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }
    got = {
        (r["id"], r["rn"])
        for r in bucketed_global_topk(
            df, "v", [F.asc("id")], k, bucket_bits=2
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (10, 4), (97, 10), (5, 5)])
def test_closed_form_ntile_matches_spark_ntile(spark, n, k):
    df = spark.range(n).groupBy("id").agg(F.first("id").alias("v"))
    w = Window.orderBy("v")
    expect = {
        r["id"]: r["t"] for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    ranked = bucketed_global_rank(df, "v", [], descending=False)
    got = {
        r["id"]: r["t"]
        for r in ranked.withColumn(
            "t", closed_form_ntile(F.col("rn"), F.lit(n).cast("long"), k)
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("frame_end", [0, -1])
@pytest.mark.parametrize("bits", [0, 3])
def test_bucketed_global_cumsum_matches_global_window(
    spark, descending, frame_end, bits
):
    df = _entity_df(spark).withColumn("wgt", (F.col("id") % 5 + 1).cast("long"))
    val = F.desc("v") if descending else F.asc("v")
    w = Window.orderBy(val, F.asc("id")).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    expect = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("wgt").over(w), F.lit(0))
        ).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in bucketed_global_cumsum(
            df,
            "v",
            [F.asc("id")],
            [("cum", "wgt")],
            descending=descending,
            bucket_bits=bits,
            frame_end=frame_end,
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("frame_end", [0, -1])
@pytest.mark.parametrize("bits", [0, 3])
def test_bucketed_global_cummax_matches_global_window(
    spark, descending, frame_end, bits
):
    df = _entity_df(spark).withColumn("m", ((F.col("id") * 31) % 17).cast("long"))
    val = F.desc("v") if descending else F.asc("v")
    w = Window.orderBy(val, F.asc("id")).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    expect = {
        r["id"]: r["mx"] for r in df.withColumn("mx", F.max("m").over(w)).collect()
    }
    got = {
        r["id"]: r["mx"]
        for r in bucketed_global_cummax(
            df,
            "v",
            [F.asc("id")],
            [("mx", "m")],
            descending=descending,
            bucket_bits=bits,
            frame_end=frame_end,
        ).collect()
    }
    assert got == expect


def test_null_value_fails_loudly_not_silently_dropped(spark):
    """ADVICE r9: a NULL in value_col used to produce a NULL bucket that
    the null-unsafe stitch join silently DROPPED. The non-null contract
    is now enforced with raise_error, so violating it fails the job."""
    df = spark.createDataFrame([(1, 10), (2, None), (3, 30)], ["id", "v"]).groupBy(
        "id"
    ).agg(F.first("v").alias("v"))
    ranked = bucketed_global_rank(df, "v", [F.asc("id")], bucket_bits=2)
    with pytest.raises(Exception, match="non-null contract"):
        ranked.collect()


def test_idiv_exact_beyond_double_precision(spark):
    """ADVICE r9: (a / b).cast('long') loses exactness above ~2^53; the
    decimal-backed _idiv must stay bit-exact at any long magnitude."""
    from classification_problem_with_pyspark_spark.plans.global_rank import _idiv

    cases = [
        (2**62 + 12345, 7),
        (2**53 + 1, 2),  # first magnitude where double drops the low bit
        (9_007_199_254_740_993, 3),
        (2**61, 2**31 - 1),
        (5, 7),
        (0, 3),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in cases], "a long, b long"
    ).withColumn("q", _idiv(F.col("a"), F.col("b")))
    got = {(r["a"], r["b"]): r["q"] for r in df.collect()}
    assert got == {(a, b): a // b for a, b in cases}


def _window_partition_specs(plan: str) -> list[str]:
    """Partition spec of every Window node in an executed-plan string.

    A WindowExec prints ``Window [exprs], [partitionSpec], [orderSpec]``
    — with NO partitionBy the middle group is absent (two groups). The
    bracket groups contain parens (windowspecdefinition(...)) but never
    nested ``], [`` so the split is unambiguous; the order spec is the
    group carrying ASC/DESC markers, which partition specs never do."""
    specs = []
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        groups = line[idx + len("Window ") :].split("], [")
        if len(groups) >= 3:
            specs.append(groups[1])
        else:
            specs.append("")  # ordered window with no partitionBy
    return specs


def test_rank_plan_has_no_whole_relation_window(spark):
    """The ONLY unpartitioned window in the helper's plan is the bucket-
    grid cumsum (whose input is the bucket histogram); the per-row
    ranking window must be hash-partitioned BY THE BUCKET KEY — asserted
    on each Window node's partition spec, not a whole-plan substring
    (ADVICE r9: the old check also matched project lists, so it kept
    passing if the in-bucket window lost its partitionBy)."""
    df = _entity_df(spark)
    plan = bucketed_global_rank(
        df, "v", [F.asc("id")], bucket_bits=3
    )._jdf.queryExecution().executedPlan().toString()
    specs = _window_partition_specs(plan)
    assert len(specs) == 2, f"expected grid + in-bucket windows, got {specs!r}"
    unpartitioned = [s for s in specs if not s.strip()]
    bucket_partitioned = [s for s in specs if "__gr_bkt" in s]
    # exactly one single-task window (the grid cumsum over the bucket
    # histogram) and exactly one window partitioned by the bucket key
    assert len(unpartitioned) == 1, f"partition specs: {specs!r}"
    assert len(bucket_partitioned) == 1, f"partition specs: {specs!r}"


@pytest.mark.parametrize("helper", ["cumsum", "cummax"])
def test_running_helpers_reject_unsupported_frame_end(spark, helper):
    """ADVICE r10: the bucket base is always the strictly-before-bucket
    aggregate, so any frame_end other than 0 (inclusive) or -1
    (strictly-before) would silently include too much of the prior
    buckets. The helpers must fail loudly at plan-build time."""
    df = _entity_df(spark).withColumn("wgt", F.lit(1).cast("long"))
    fn = bucketed_global_cumsum if helper == "cumsum" else bucketed_global_cummax
    with pytest.raises(ValueError, match="frame_end"):
        fn(df, "v", [F.asc("id")], [("out", "wgt")], frame_end=-2)


@pytest.mark.parametrize("descending", [True, False])
def test_value_range_k_matches_global_window_at_any_magnitude(spark, descending):
    """Range-normalized fixed-K bucketing (VERDICT r10 #2): bucket =
    (v - min) DIV width with width = (max - min) DIV K + 1 over broadcast
    bounds — the bucket GRID is <= K+1 rows at ANY value magnitude, so
    magnitude-growing domains (per-part revenue, Walsh sums of daily
    totals) stop growing the single-task grid with data volume. Exactness
    is pinned past 2^53 where double bucketing would misassign."""
    big = 2**60
    rows = [
        (i, big + (i * 37 % 11) * 13_000_000_000 - (i % 3))  # huge, tied, uneven
        for i in range(97)
    ]
    df = (
        spark.createDataFrame(rows, "id long, raw long")
        .groupBy("id")
        .agg(F.first("raw").alias("v"))
    )
    val = F.desc("v") if descending else F.asc("v")
    expect = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(val, F.asc("id")))
        ).collect()
    }
    out = bucketed_global_rank(
        df, "v", [F.asc("id")], descending=descending, value_range_k=8
    )
    got = {r["id"]: r["rn"] for r in out.collect()}
    assert got == expect


def test_value_range_k_grid_is_k_bounded(spark):
    """The routed grid must stay <= K+1 non-empty buckets regardless of
    how many entities (rows) feed it — the property the fixed-width
    2^bits buckets lacked for magnitude-growing aggregates."""
    from classification_problem_with_pyspark_spark.plans import bounded_grid

    df = (
        spark.range(5000)
        .groupBy("id")
        .agg((F.col("id") * F.lit(2**40)).cast("long").alias("v"))
    )
    bounded_grid.GRID_CAPTURE = cap = []
    try:
        bucketed_global_rank(df, "v", [F.asc("id")], value_range_k=64).collect()
    finally:
        bounded_grid.GRID_CAPTURE = None
    assert len(cap) == 1
    assert cap[0].count() <= 65
    # the construction cap rides on the routed grid, so the multi-SF
    # tripwire can verify count <= cap instead of growth heuristics
    assert getattr(cap[0], "_grid_k_cap", None) == 65


def test_value_range_k_range_overflow_fails_loudly(spark):
    """ADVICE r11: a value domain spanning large-negative to
    large-positive longs overflows (max - min) to a NEGATIVE value; the
    old form would have produced a non-positive width and silently wrong
    ranks. The width is now computed in the broadcast bounds aggregate
    behind a raise_error guard, so a non-conforming call site fails the
    job instead of corrupting every rank."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    df = (
        spark.createDataFrame(
            [(0, -(2**62) - 10), (1, 2**62 + 10)], "id long, v long"
        )
        .groupBy("id")
        .agg(F.first("v").alias("v"))
    )
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)) as ei:
        bucketed_global_rank(df, "v", [F.asc("id")], value_range_k=8).collect()
    assert "overflows signed 64-bit" in str(ei.value)
    # conforming domains are untouched by the guard
    ok = (
        spark.createDataFrame([(0, -50), (1, 70)], "id long, v long")
        .groupBy("id")
        .agg(F.first("v").alias("v"))
    )
    got = {
        r["id"]: r["rn"]
        for r in bucketed_global_rank(
            ok, "v", [F.asc("id")], descending=False, value_range_k=8
        ).collect()
    }
    assert got == {0: 1, 1: 2}


def test_value_range_k_tag_log_records_each_tagging(spark):
    """ADVICE r11: the cap cross-check hook — every value_range_k
    tagging appends its cap to RANGE_K_TAG_LOG (when armed), and the
    captured grid carries the same cap, so the multi-SF sweep can assert
    tags == caps-on-grids and catch a dropped dynamic attribute."""
    from classification_problem_with_pyspark_spark.plans import (
        bounded_grid,
        global_rank,
    )

    df = (
        spark.range(100)
        .groupBy("id")
        .agg(F.max(F.col("id") * 1000).alias("v"))
    )
    bounded_grid.GRID_CAPTURE = cap = []
    global_rank.RANGE_K_TAG_LOG = tags = []
    try:
        bucketed_global_rank(df, "v", [F.asc("id")], value_range_k=16)
    finally:
        bounded_grid.GRID_CAPTURE = None
        global_rank.RANGE_K_TAG_LOG = None
    assert tags == [17]
    assert [getattr(g, "_grid_k_cap", None) for g in cap] == [17]


def test_idiv_exact_with_precision_loss_disabled(spark):
    """ADVICE r10: the decimal spelling of _idiv relied on
    spark.sql.decimalOperations.allowPrecisionLoss=true; with it false,
    decimal(38,0)/decimal(38,0) overflows precision and returns NULL,
    silently nulling every ntile. _idiv must be config-independent."""
    from classification_problem_with_pyspark_spark.plans.global_rank import _idiv

    key = "spark.sql.decimalOperations.allowPrecisionLoss"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        cases = [(2**62 + 12345, 7), (2**53 + 1, 2), (5, 7), (0, 3)]
        df = spark.createDataFrame(
            [(a, b) for a, b in cases], "a long, b long"
        ).withColumn("q", _idiv(F.col("a"), F.col("b")))
        got = {(r["a"], r["b"]): r["q"] for r in df.collect()}
        assert got == {(a, b): a // b for a, b in cases}
        # and the closed-form ntile built on it stays non-null
        nt = (
            spark.range(1, 8)
            .withColumn("t", closed_form_ntile(F.col("id"), F.lit(7).cast("long"), 3))
            .collect()
        )
        assert [r["t"] for r in sorted(nt, key=lambda r: r["id"])] == [
            1, 1, 1, 2, 2, 3, 3,
        ]
    finally:
        spark.conf.set(key, old)
