"""Semantic property tests for extension pack 46 (extended46.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended46 import (
    KNN_K,
    SEED_MOD,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _adjacency(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in per_order.values():
        for p in parts:
            for q in parts:
                if p != q:
                    adj[p].add(q)
    return adj


def test_harmonic_centrality_matches_python_bfs(spark):
    rows = {r.seed: r for r in QUERIES["graph_harmonic_centrality_sampled"].fn(spark, SF_DIR).collect()}
    adj = _adjacency(spark)
    seeds = {
        p
        for p in adj
        if int(hashlib.md5(f"hc_{p}".encode()).hexdigest()[:15], 16) % SEED_MOD == 0
    }
    assert set(rows) == seeds
    assert seeds  # the hash rule genuinely selects some seeds
    for s in seeds:
        level = {s}
        seen = {s}
        counts = []
        for _ in range(3):
            nxt = {n for u in level for n in adj[u]} - seen
            counts.append(len(nxt))
            seen |= nxt
            level = nxt
        r = rows[s]
        assert (r.n_hop1, r.n_hop2, r.n_hop3) == tuple(counts)
        assert r.harmonic_micro == (
            1_000_000 * counts[0] + 500_000 * counts[1] + 333_333 * counts[2]
        )


def test_mutual_knn_pairs_are_reciprocal_topk(spark):
    pairs = QUERIES["emb_mutual_knn_pairs"].fn(spark, SF_DIR).collect()
    # independently derive the directed top-k from the already
    # driver-hash-verified exact top-k key
    topk = QUERIES["llm_similarity_topk"].fn(spark, SF_DIR).collect()
    rank = {(r.qid, r.nid): (r.neighbor_rank, r.cosine_sim) for r in topk}
    assert KNN_K == 5  # both keys use the same k
    expected = {
        (q, n)
        for (q, n) in rank
        if q < n and (n, q) in rank
    }
    got = {(r.src, r.dst) for r in pairs}
    assert got == expected
    assert expected  # the fixture genuinely has reciprocal neighbors
    for r in pairs:
        assert r.src < r.dst
        assert rank[(r.src, r.dst)][0] == r.rank_fwd
        assert rank[(r.dst, r.src)][0] == r.rank_rev
        assert rank[(r.src, r.dst)][1] == r.cosine_sim
    # mutuality is strictly selective: fewer mutual edges than directed ones
    assert len(pairs) < len(topk) / 2
