"""Semantic property tests for extension pack 16 (extended16.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_trimmed_mean_estimator_algebra(spark):
    rows = QUERIES["agg_trimmed_winsorized_mean"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    li = load(spark, SF_DIR, "lineitem")
    for r in rows:
        assert r.trimmed_n == r.n - 2 * r.k_each_side
        assert r.winsor_low_cents <= r.winsor_high_cents
        # the trimmed mean is squeezed between the clamps
        tmean = r.trimmed_sum_cents / r.trimmed_n
        assert r.winsor_low_cents <= tmean <= r.winsor_high_cents
        # trimming discards extremes: trimmed mean differs from the raw
        # mean by less than the raw spread
        raw = (
            li.where(F.col("l_returnflag") == r.flag)
            .agg(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        assert raw.n == r.n
        # winsorized sum reconstruction stays within the raw total's scale
        wsum = r.trimmed_sum_cents + r.k_each_side * (
            r.winsor_low_cents + r.winsor_high_cents
        )
        assert 0 < wsum < 2 * raw.s


def test_trimmed_bounds_are_order_statistics(spark):
    rows = QUERIES["agg_trimmed_winsorized_mean"].fn(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    for r in rows:
        below = (
            li.where(F.col("l_returnflag") == r.flag)
            .where(F.round(F.col("l_extendedprice") * 100).cast("long") < r.winsor_low_cents)
            .count()
        )
        # strictly-below count can't exceed k (the k+1-th order statistic)
        assert below <= r.k_each_side, (r.flag, below, r.k_each_side)


def test_haar_energy_conservation(spark):
    rows = QUERIES["events_haar_energy"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    e = load(spark, SF_DIR, "events")
    want = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        # the level-3 approximation sum is the series total: Sigma a is
        # conserved through every Haar cascade level
        assert r.total_count == want[r.event_type], r
        assert r.energy_l1 > 0 and r.energy_l2 > 0 and r.energy_l3 > 0


def test_haar_detects_scale_of_injected_signal(spark):
    # sanity of the semantics on a constructed series: alternating
    # +-1 at day scale puts ALL energy in level 1
    rows = [(i + 1, 10 + (1 if i % 2 == 0 else -1)) for i in range(32)]
    df = spark.createDataFrame(rows, "di long, c long")

    def cascade(d, pos, val):
        signed = F.when(F.col(pos) % 2 == 1, F.col(val)).otherwise(-F.col(val))
        return d.groupBy(F.ceil(F.col(pos) / 2.0).cast("long").alias("g")).agg(
            F.sum(signed).alias("d"), F.sum(val).alias("a")
        )

    l1 = cascade(df, "di", "c")
    l2 = cascade(l1, "g", "a")
    e1 = l1.agg(F.sum(F.col("d") * F.col("d"))).collect()[0][0]
    e2 = l2.agg(F.sum(F.col("d") * F.col("d"))).collect()[0][0]
    assert e1 == 4 * 16  # 16 pairs, each difference = 2
    assert e2 == 0  # pair sums are constant -> no level-2 energy
