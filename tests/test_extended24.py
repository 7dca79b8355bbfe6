"""Semantic property tests for extension pack 24 (extended24.py)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.operators.extended24 import N_PLANES
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_anova_moment_identities(spark):
    rows = QUERIES["agg_anova_f"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    o = load(spark, SF_DIR, "orders")
    assert r.k == o.select("o_orderpriority").distinct().count()
    assert r.n_total == o.count()
    # folded moments recomputed independently
    per = (
        o.select(
            F.col("o_orderpriority").alias("g"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10000").alias("u"),
        )
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("u").alias("s"),
             F.sum(F.col("u") * F.col("u")).alias("q"))
        .collect()
    )
    br = sum(p.s * p.s // p.n for p in per)
    S = sum(p.s for p in per)
    N = sum(p.n for p in per)
    Q = sum(p.q for p in per)
    ssb = br - (S * S) // N
    ssw = Q - br
    assert r.ssb_fold == ssb
    assert r.ssw_fold == ssw
    assert r.f_micro == (1_000_000 * (ssb // (r.k - 1))) // (ssw // (N - r.k))
    assert r.ssb_fold > 0 and r.ssw_fold > 0


def test_dispersion_index_mechanics(spark):
    rows = QUERIES["events_dispersion_index"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    assert len(rows) == e.select("event_type").distinct().count()
    total = e.count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        n, s1, s2 = r.n_buckets, r.n_events, r.sum_sq
        assert r.mean_micro == 1_000_000 * s1 // n
        assert r.fano_micro == 1_000_000 * (n * s2 - s1 * s1) // (n * s1)
        assert r.fano_micro > 0
        # all types share the one global hour grid
        assert r.n_buckets == rows[0].n_buckets


def test_srp_signature_buckets(spark):
    rows = QUERIES["emb_srp_signature"].fn(spark, SF_DIR).collect()
    emb = load(spark, SF_DIR, "embeddings")
    assert len(rows) == emb.count()
    from collections import Counter

    sizes = Counter(r.signature for r in rows)
    for r in rows:
        assert 0 <= r.signature < (1 << N_PLANES)
        assert r.bucket_size == sizes[r.signature]
    # random projections over a spread corpus: codes must actually spread
    assert len(sizes) > len(rows) // 4


def test_domain_affinity_acceptance_rule(spark):
    rows = QUERIES["llm_domain_affinity_resample"].fn(spark, SF_DIR).collect()
    assert rows, "resampling accepted nothing — degenerate affinity"
    for r in rows:
        assert 0 < r.affinity_micro <= 1_000_000
        assert r.affinity_micro == 1_000_000 * r.n_domain_hits // r.n_feats_distinct
        h = hashlib.md5(f"resample_{r.doc_id}".encode()).hexdigest()
        draw = int(h[:15], 16) % 1_000_000
        assert draw < r.affinity_micro
    # selective, not degenerate: strictly fewer than all docs accepted
    d = load(spark, SF_DIR, "documents")
    assert len(rows) < d.count()
