"""Semantic property tests for extension pack 51 (extended51.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_largest_remainder_allocation_conserves_every_order(spark):
    rows = QUERIES["join_largest_remainder_allocation"].fn(spark, SF_DIR).collect()
    totals = {
        r.o_orderkey: round(r.o_totalprice * 100)
        for r in load(spark, SF_DIR, "orders").collect()
    }
    per_order = defaultdict(list)
    for r in rows:
        per_order[r.orderkey].append(r)
    assert set(per_order) == set(totals) & set(per_order)  # joined orders only
    for k, lines in per_order.items():
        t = totals[k]
        # THE theorem: integer allocations sum exactly to the order total
        assert sum(x.alloc_cents for x in lines) == t
        q_tot = sum(x.quantity for x in lines)
        for x in lines:
            floor_share = t * x.quantity // q_tot
            # each line gets its floor share or exactly one cent more
            assert x.alloc_cents in (floor_share, floor_share + 1)
    # replay the remainder-rank rule on a sample of multi-line orders;
    # (orderkey, linenumber) is NOT unique in the fixture, so compare
    # row MULTISETS under the engine's (rem DESC, ln, q DESC) rank
    sample = [k for k, ls in per_order.items() if len(ls) >= 4][:50]
    for k in sample:
        lines = per_order[k]
        t = totals[k]
        q_tot = sum(x.quantity for x in lines)
        deficit = t - sum(t * x.quantity // q_tot for x in lines)
        ranked = sorted(
            lines,
            key=lambda x: (-((t * x.quantity) % q_tot), x.linenumber, -x.quantity),
        )
        expect = sorted(
            (x.linenumber, x.quantity,
             t * x.quantity // q_tot + (1 if i < deficit else 0))
            for i, x in enumerate(ranked)
        )
        got = sorted((x.linenumber, x.quantity, x.alloc_cents) for x in lines)
        assert got == expect


def test_target_encoding_loo_matches_python_and_leaks_nothing(spark):
    rows = QUERIES["ml_target_encoding_loo"].fn(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"
    ).collect()
    per_cat = defaultdict(lambda: [0, 0])
    n_all = 0
    s_all = 0
    for r in li:
        y = 1 if r.l_returnflag == "R" else 0
        per_cat[r.l_partkey][0] += 1
        per_cat[r.l_partkey][1] += y
        n_all += 1
        s_all += y
    assert len(rows) == n_all
    for r in rows:
        n_cat, s_cat = per_cat[r.partkey]
        if n_cat > 1:
            expect = 1_000_000 * (s_cat - r.y) // (n_cat - 1)
        else:
            expect = 1_000_000 * (s_all - r.y) // (n_all - 1)
        assert r.te_micro == expect
        assert 0 <= r.te_micro <= 1_000_000
    # leakage check: within one category, rows with y=1 must see a LOWER
    # encoding than rows with y=0 (their own positive label is excluded)
    seen = defaultdict(set)
    for r in rows:
        seen[r.partkey].add((r.y, r.te_micro))
    mixed = [
        v for k, v in seen.items()
        if per_cat[k][0] > 1 and {y for y, _ in v} == {0, 1}
    ]
    assert mixed
    for v in mixed[:100]:
        te1 = {t for y, t in v if y == 1}
        te0 = {t for y, t in v if y == 0}
        assert max(te1) < max(te0) and min(te1) < min(te0)
