"""Semantic property tests for extension pack 18 (extended18.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_modularity_terms_are_a_valid_decomposition(spark):
    rows = QUERIES["graph_modularity_regions"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per region
    # expected shares sum to ~1e6: Sigma d_c = 2m  =>  Sigma (d_c/2m)^2 <= 1
    # and actual shares sum to <= 1e6 (intra subset of all edges)
    assert sum(r.actual_micro for r in rows) <= 1_000_000
    d_total = sum(r.d_sum for r in rows)
    for r in rows:
        assert 0 <= r.intra_weight
        assert 0 < r.d_sum < d_total
        assert 0 <= r.actual_micro <= 1_000_000
        assert 0 <= r.expected_micro <= 1_000_000
    # uniform synthetic routing: modularity must be ~0 (|Q| < 0.1)
    q_micro = sum(r.actual_micro - r.expected_micro for r in rows)
    assert abs(q_micro) < 100_000, q_micro


def test_modularity_against_networkless_python(spark):
    # recompute Q from the raw edge definition in pure python
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    s = load(spark, SF_DIR, "supplier")
    n = {r.n_nationkey: r.n_regionkey for r in load(spark, SF_DIR, "nation").collect()}
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .count()
        .collect()
    )
    m = sum(e["count"] for e in edges)
    intra: dict[int, int] = {}
    deg: dict[int, int] = {}
    for e in edges:
        deg[e.u] = deg.get(e.u, 0) + e["count"]
        deg[e.v] = deg.get(e.v, 0) + e["count"]
        if n[e.u] == n[e.v]:
            intra[n[e.u]] = intra.get(n[e.u], 0) + e["count"]
    rows = QUERIES["graph_modularity_regions"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert r.intra_weight == intra.get(r.region, 0), r
        d_want = sum(d for node, d in deg.items() if n[node] == r.region)
        assert r.d_sum == d_want, r


def test_two_proportion_z_symmetry_and_counts(spark):
    rows = QUERIES["agg_two_proportion_ztest"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    e = load(spark, SF_DIR, "events")
    n_users = e.select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    # conversion defined on a 48h window: strictly fewer than everyone
    assert r.conv_a + r.conv_b < n_users
    # |z| for identical synthetic cohorts stays well under 3 sigma
    assert abs(r.z_micro) < 3_000_000
