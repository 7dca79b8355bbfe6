"""Semantic property tests for extension pack 39 (extended39.py)."""

from __future__ import annotations

import collections
import itertools
import re

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_flesch_recomputes(spark):
    rows = QUERIES["llm_readability_flesch"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    texts = {d.doc_id: d.text for d in docs}
    assert len(rows) == len(docs)
    for r in rows:
        t = texts[r.doc_id]
        words = len(t.split(" "))
        sents = 1 + t.count(".")
        syll = len(re.findall(r"[aeiouAEIOU]+", t))
        assert (r.words, r.sents, r.syllables) == (words, sents, syll)
        assert r.flesch_milli == 206_835 - (1015 * words) // sents - (
            84_600 * syll
        ) // words
    # syllable-dense vs sparse docs must separate
    scores = [r.flesch_milli for r in rows]
    assert max(scores) - min(scores) > 1_000


def test_link_prediction_properties(spark):
    rows = QUERIES["graph_link_prediction_jaccard"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = collections.defaultdict(set)
    for x in li:
        by_order[x.l_orderkey].add(x.l_partkey)
    adj = collections.defaultdict(set)
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            adj[u].add(v)
            adj[v].add(u)
    from classification_problem_with_pyspark_spark.operators.extended39 import HUB_CAP

    keys = [(-r.jaccard_micro, r.u, r.v) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.u < r.v
        assert r.v not in adj[r.u]  # predicted links are NON-edges
        # common counts only non-hub shared neighbors (the cap contract)
        common = sum(
            1 for n in adj[r.u] & adj[r.v] if len(adj[n]) <= HUB_CAP
        )
        assert common == r.common > 0
        assert (r.deg_u, r.deg_v) == (len(adj[r.u]), len(adj[r.v]))
        union = r.deg_u + r.deg_v - r.common
        assert r.jaccard_micro == 1_000_000 * r.common // union


def test_group_by_all_infers_keys(spark):
    rows = QUERIES["relational_group_by_all"].fn(spark, SF_DIR).collect()
    c = load(spark, SF_DIR, "customer")
    n = load(spark, SF_DIR, "nation")
    explicit = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")).alias(
                "total_balance_cents"
            ),
        )
        .collect()
    )
    want = {
        (r.c_mktsegment, r.n_name): (r.n_customers, r.total_balance_cents)
        for r in explicit
    }
    assert len(rows) == len(want)
    for r in rows:
        assert want[(r.c_mktsegment, r.n_name)] == (
            r.n_customers,
            r.total_balance_cents,
        )
