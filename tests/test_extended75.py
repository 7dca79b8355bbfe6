"""Semantic property tests for extension pack 75 (extended75.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_degree_assortativity_matches_python_pearson(spark):
    row = QUERIES["graph_degree_assortativity"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in per_order.values():
        for p in parts:
            for q in parts:
                if p != q:
                    edges.add((p, q))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    xs = [deg[s] for s, d in edges]
    ys = [deg[d] for s, d in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r_expect = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert row.n_directed_edges == m
    assert abs(row.assortativity - r_expect) < 1e-5
    # by symmetry of the directed edge list, sx == sy exactly
    assert sx == sy
    assert -1 <= row.assortativity <= 1


def test_flow_reciprocity_matches_python_sets(spark):
    row = QUERIES["graph_flow_reciprocity"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey").collect()
    sup = {r.s_suppkey: r.s_nationkey for r in load(spark, SF_DIR, "supplier").collect()}
    orders = {r.o_orderkey: r.o_custkey for r in load(spark, SF_DIR, "orders").collect()}
    cust = {r.c_custkey: r.c_nationkey for r in load(spark, SF_DIR, "customer").collect()}
    w = defaultdict(int)
    for r in li:
        src = sup[r.l_suppkey]
        dst = cust[orders[r.l_orderkey]]
        if src != dst:
            w[(src, dst)] += 1
    n_edges = len(w)
    n_recip = sum(1 for (s, d) in w if (d, s) in w)
    total = sum(w.values())
    mutual = sum(min(v, w.get((d, s), 0)) for (s, d), v in w.items())
    assert (row.n_edges, row.n_reciprocated) == (n_edges, n_recip)
    assert (row.total_w, row.mutual_w) == (total, mutual)
    assert row.edge_reciprocity_micro == 1_000_000 * n_recip // n_edges
    assert row.weighted_reciprocity_micro == 1_000_000 * mutual // total
    # a dense trade matrix: most pairs reciprocate, but weighted mutuality
    # is strictly lower (min() clips the asymmetric mass)
    assert row.edge_reciprocity_micro > 500_000
    assert row.weighted_reciprocity_micro < row.edge_reciprocity_micro
