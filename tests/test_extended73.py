"""Semantic property tests for extension pack 73 (extended73.py)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended73 import (
    MIGRATION_SPLIT,
    RATE1_BP,
    RATE2_BP,
    TIER1_CENTS,
    TIER2_CENTS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_tiered_pricing_conserves_slices_and_charges_marginally(spark):
    rows = {r.status: r for r in QUERIES["agg_tiered_pricing_brackets"].fn(spark, SF_DIR).collect()}
    orders = load(spark, SF_DIR, "orders").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for o in orders:
        cents = round(o.o_totalprice * 100)
        s0 = min(cents, TIER1_CENTS)
        s1 = min(max(cents - TIER1_CENTS, 0), TIER2_CENTS - TIER1_CENTS)
        s2 = max(cents - TIER2_CENTS, 0)
        assert s0 + s1 + s2 == cents  # slice conservation, per order
        fee = s1 * RATE1_BP // 10000 + s2 * RATE2_BP // 10000
        a = agg[o.o_orderstatus]
        a[0] += 1
        a[1] += cents
        a[2] += s0
        a[3] += s1
        a[4] += s2
        a[5] += fee
        a[6] += 1 if cents > TIER2_CENTS else 0
    assert set(rows) == set(agg)
    for st, (n, cents, s0, s1, s2, fee, top) in agg.items():
        r = rows[st]
        assert (r.n_orders, r.base_cents) == (n, cents)
        assert (r.tier0_cents, r.tier1_cents, r.tier2_cents) == (s0, s1, s2)
        assert (r.fee_cents, r.n_top_tier) == (fee, top)
        # marginal-rate sanity: fee strictly below flat top-rate billing
        assert r.fee_cents < cents * RATE2_BP // 10000
        assert r.tier0_cents + r.tier1_cents + r.tier2_cents == r.base_cents
    assert any(r.n_top_tier > 0 for r in rows.values())  # tiers exercised


def test_decile_migration_matrix_matches_python_ranks(spark):
    rows = {(r.decile_from, r.decile_to): r.n_parts for r in QUERIES["window_decile_migration_matrix"].fn(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    ).collect()
    split = dt.datetime.fromisoformat(MIGRATION_SPLIT)
    rev = defaultdict(lambda: [0, 0])
    for r in li:
        idx = 0 if r.l_shipdate < split else 1
        rev[r.l_partkey][idx] += round(r.l_extendedprice * 100)

    def deciles(idx):
        parts = [(p, v[idx]) for p, v in rev.items() if v[idx] > 0]
        parts.sort(key=lambda t: (-t[1], t[0]))
        n = len(parts)
        out = {}
        base, rem = divmod(n, 10)
        i = 0
        for d in range(1, 11):
            size = base + (1 if d <= rem else 0)
            for p, _ in parts[i : i + size]:
                out[p] = d
            i += size
        return out

    d1, d2 = deciles(0), deciles(1)
    expected = defaultdict(int)
    for p in set(d1) & set(d2):
        expected[(d1[p], d2[p])] += 1
    assert rows == dict(expected)
    # row sums recover the from-decile populations of the matched parts
    matched = set(d1) & set(d2)
    from_pop = defaultdict(int)
    for p in matched:
        from_pop[d1[p]] += 1
    for d in from_pop:
        assert sum(n for (f, _), n in rows.items() if f == d) == from_pop[d]
    # rank churn genuinely exists; this fixture's period revenues are
    # near-independent, so the diagonal carries ~1/10 of the mass (the
    # matrix READING: high diagonal = sticky ranks, uniform = churn)
    diag = sum(n for (f, t), n in rows.items() if f == t)
    off = sum(n for (f, t), n in rows.items() if f != t)
    assert off > 0 and diag > 0
    total = diag + off
    assert diag >= total // 20  # at least half the independent baseline
