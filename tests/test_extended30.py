"""Semantic property tests for extension pack 30 (extended30.py)."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _avg_rank2(values):
    """2x average ranks with ties, matching the midrank identity."""
    counts = collections.Counter(values)
    before = 0
    r2 = {}
    for v in sorted(counts):
        c = counts[v]
        r2[v] = 2 * before + c + 1
        before += c
    return [r2[v] for v in values]


def test_spearman_matches_bruteforce(spark):
    rows = QUERIES["agg_spearman_corr"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    u = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(round(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    xs = [row.x for row in u]
    ys = [row.y for row in u]
    rx = _avg_rank2(xs)
    ry = _avg_rank2(ys)
    n = len(u)
    mean2 = n + 1
    assert sum(rx) == n * (n + 1) and sum(ry) == n * (n + 1)
    cov2 = sum((a - mean2) * (b - mean2) for a, b in zip(rx, ry))
    varx2 = sum((a - mean2) ** 2 for a in rx)
    vary2 = sum((b - mean2) ** 2 for b in ry)
    assert (r.n, r.cov2, r.varx2, r.vary2) == (n, cov2, varx2, vary2)
    assert r.rho_sign == (1 if cov2 > 0 else -1 if cov2 < 0 else 0)
    assert r.rho_sq_micro == ((1_000_000 * cov2) // varx2) * cov2 // vary2
    # activity and spend are mechanically positively rank-correlated
    assert r.rho_sign == 1
    assert 0 < r.rho_sq_micro < 1_000_000


def test_keyness_chi2_mechanics(spark):
    rows = QUERIES["llm_keyness_chi2"].fn(spark, SF_DIR).collect()
    d = load(spark, SF_DIR, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(rows) == 3 * n_sources
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
        assert r.chi2 >= 0
        assert r.n_occurrences >= 1
    for src, rs in by_src.items():
        assert [r.pos for r in sorted(rs, key=lambda r: r.pos)] == [1, 2, 3]
        ordered = sorted(rs, key=lambda r: r.pos)
        chis = [r.chi2 for r in ordered]
        assert chis == sorted(chis, reverse=True)


def test_keyness_chi2_values_recompute(spark):
    # recompute chi2 for the returned bigrams from raw counts with the
    # same operation order - doubles must match exactly
    rows = QUERIES["llm_keyness_chi2"].fn(spark, SF_DIR).collect()
    d = load(spark, SF_DIR, "documents")
    grams = (
        d.select("source", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> array_join(slice(toks, i, 2), ' '))"
                )
            ).alias("g"),
        )
        .collect()
    )
    pair = collections.Counter((r.source, r.g) for r in grams)
    g_tot = collections.Counter(r.g for r in grams)
    s_tot = collections.Counter(r.source for r in grams)
    n = len(grams)
    for r in rows:
        a = pair[(r.source, r.bigram)]
        assert a == r.n_occurrences
        b = g_tot[r.bigram] - a
        c = s_tot[r.source] - a
        dd = n - g_tot[r.bigram] - s_tot[r.source] + a
        chi2 = (
            float(n)
            * (float(a) * float(dd) - float(b) * float(c))
            * (float(a) * float(dd) - float(b) * float(c))
            / (float(a + b) * float(c + dd) * float(a + c) * float(b + dd))
        )
        assert r.chi2 == chi2, (r.source, r.bigram)
