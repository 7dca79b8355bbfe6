"""Semantic property tests for extension pack 20 (extended20.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_manifest_prune_skips_and_agrees(spark):
    rows = QUERIES["sink_manifest_pruned_read"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    # pruning actually skipped something: predicate covers one band of ten
    assert r.n_bands_read < r.n_bands_total
    assert r.n_bands_read >= 1
    # pruned-read result equals the full-table query
    o = load(spark, SF_DIR, "orders")
    want = (
        o.where(F.col("o_totalprice") > 450000.0)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        .collect()[0]
    )
    assert (r.n_rows, r.revenue_cents) == (want.n, want.s)


def test_manifest_prune_is_sound_not_just_lucky(spark):
    # soundness: every row matching the predicate lives in a selected
    # band — no band with a qualifying row was pruned
    o = load(spark, SF_DIR, "orders")
    qualifying_bands = {
        row.band
        for row in o.where(F.col("o_totalprice") > 450000.0)
        .select(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("band"))
        .distinct()
        .collect()
    }
    max_per_band = {
        row.band: row.mx
        for row in o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("band")
        )
        .agg(F.max("o_totalprice").alias("mx"))
        .collect()
    }
    selected = {b for b, mx in max_per_band.items() if mx > 450000.0}
    assert qualifying_bands <= selected
