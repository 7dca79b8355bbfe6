"""Semantic property tests for extension pack 108 (extended108.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended108 import MAD_K
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_norm_quarantine_matches_python_fences(spark):
    row = QUERIES["emb_norm_quarantine"].fn(spark, SF_DIR).collect()[0]
    emb = load(spark, SF_DIR, "embeddings").collect()
    norms = sorted(
        (
            round(
                round(math.sqrt(sum(float(x) * float(x) for x in r.embedding)), 6)
                * 1_000_000
            ),
            r.vec_id,
        )
        for r in emb
    )
    ns = [v for v, _ in norms]
    n = len(ns)
    median = ns[(n + 1) // 2 - 1]
    devs = sorted(abs(v - median) for v in ns)
    mad = devs[(n + 1) // 2 - 1]
    quarantined = sum(1 for v in ns if abs(v - median) > MAD_K * mad)
    assert row.n_vectors == n
    assert row.median_norm_micro == median
    assert row.mad_norm_micro == mad
    assert row.n_quarantined == quarantined
    assert (row.min_norm_micro, row.max_norm_micro) == (min(ns), max(ns))
    # EMPIRICAL FINDING hash-pinned: this corpus is UNIT-NORMALIZED —
    # every norm is exactly 1.0 (micro 1e6), MAD is zero, nothing
    # quarantines; a single denormalized vector in a future corpus
    # would instantly trip the zero-width fence
    assert row.median_norm_micro == 1_000_000
    assert row.mad_norm_micro == 0
    assert row.n_quarantined == 0
    assert row.min_norm_micro == row.max_norm_micro == 1_000_000


def test_hoover_index_matches_python_fold(spark):
    row = QUERIES["agg_hoover_index"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select("l_suppkey", "l_extendedprice").collect()
    per = defaultdict(int)
    for r in li:
        per[r.l_suppkey] += round(r.l_extendedprice * 100)
    n = len(per)
    t = sum(per.values())
    abs_dev = sum(abs(rev * n - t) for rev in per.values())
    assert (row.n_suppliers, row.total_cents) == (n, t)
    assert row.abs_dev_scaled == abs_dev
    assert row.hoover_micro == (1_000_000 * (abs_dev // (2 * n))) // t
    # Hoover ∈ [0, 1); and it matches the float form to floor tolerance
    float_hoover = abs_dev / (2 * n * t)
    assert 0 <= row.hoover_micro < 1_000_000
    assert abs(row.hoover_micro / 1_000_000 - float_hoover) < 1e-4
    # supplier revenue is fairly even in TPC-H-ish data: modest index
    assert row.hoover_micro < 400_000
