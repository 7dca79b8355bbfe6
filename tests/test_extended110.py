"""Semantic property tests for extension pack 110 (extended110.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended110 import (
    CONT_NGRAM,
    CONT_THRESHOLD_MICRO,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _shingle_sets(docs):
    out = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        if len(ws) < CONT_NGRAM:
            out[doc_id] = set()
            continue
        out[doc_id] = {
            " ".join(ws[i : i + CONT_NGRAM])
            for i in range(len(ws) - CONT_NGRAM + 1)
        }
    return out


def test_containment_matches_python_set_algebra(spark):
    rows = QUERIES["llm_containment_dedup"].fn(spark, SF_DIR).collect()
    docs = [
        (r.doc_id, r.text)
        for r in load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    ]
    sets = _shingle_sets(docs)
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        if not sets[a]:
            continue
        for b in ids[i + 1 :]:
            if not sets[b]:
                continue
            shared = len(sets[a] & sets[b])
            if shared == 0:
                continue
            na, nb = len(sets[a]), len(sets[b])
            small, big = (a, b) if (na, a) <= (nb, b) else (b, a)
            n_small, n_big = min(na, nb), max(na, nb)
            cont = (1_000_000 * shared) // n_small
            if cont >= CONT_THRESHOLD_MICRO:
                expected[(small, big)] = (n_small, n_big, shared, cont)
    assert {(r.small_doc, r.big_doc) for r in rows} == set(expected)
    for r in rows:
        n_small, n_big, shared, cont = expected[(r.small_doc, r.big_doc)]
        assert (r.n_small, r.n_big, r.shared) == (n_small, n_big, shared)
        assert r.containment_micro == cont
        assert r.fully_contained == (cont == 1_000_000)
    # EMPIRICAL FINDING pinned: this corpus's near-dup pairs are EXACT
    # duplicates — every pair above the 0.5 band is fully contained
    # (incidental shingle overlap tops out ≈ 4%); a partial quote in a
    # future corpus would surface as fully_contained = false
    assert rows and all(r.fully_contained for r in rows)


def test_group_advantage_matches_python_fold(spark):
    rows = QUERIES["llm_group_advantage_normalize"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    rewards = {}
    groups = defaultdict(list)
    for r in docs:
        ws = r.text.split(" ")
        rew = (1_000_000 * len(set(ws))) // len(ws)
        rewards[r.doc_id] = (r.source, rew)
        groups[r.source].append(rew)
    assert len(rows) == len(docs)
    for row in rows:
        src, rew = rewards[row.doc_id]
        assert row.source == src
        assert row.reward_micro == rew
        rs = groups[src]
        n, s, q = len(rs), sum(rs), sum(x * x for x in rs)
        assert row.group_mean_micro == s // n
        var_scaled = n * q - s * s
        assert row.group_std_micro == round(math.sqrt(var_scaled) / n)
        if var_scaled == 0:
            assert row.advantage_micro == 0
        else:
            z = (rew - s / n) / (math.sqrt(var_scaled) / n)
            assert row.advantage_micro == round(1_000_000 * z)


def test_group_advantage_sums_near_zero_per_group(spark):
    """Standardized scores sum to ~0 within every group (exactly 0 up
    to micro-rounding of n terms)."""
    rows = QUERIES["llm_group_advantage_normalize"].fn(spark, SF_DIR).collect()
    per_group = defaultdict(list)
    for r in rows:
        per_group[r.source].append(r.advantage_micro)
    for src, advs in per_group.items():
        assert abs(sum(advs)) <= len(advs), src  # ≤ 1 micro rounding each
