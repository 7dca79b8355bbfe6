"""Semantic property tests for extension pack 81 (extended81.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended81 import (
    BUDGET_DEN,
    BUDGET_NUM,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_waterfill_is_maxmin_fair_and_conserves_budget(spark):
    rows = {r.source: r for r in QUERIES["agg_waterfill_fair_allocation"].fn(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("source", "text").collect()
    demand = defaultdict(int)
    for d in docs:
        demand[d.source] += len(d.text.split(" "))
    budget = sum(demand.values()) * BUDGET_NUM // BUDGET_DEN
    assert set(rows) == set(demand)
    # replay water-filling
    order = sorted(demand.items(), key=lambda kv: (kv[1], kv[0]))
    remaining, consumers = budget, len(order)
    sat = {}
    for src, cap in order:
        if cap * consumers <= remaining:
            sat[src] = cap
            remaining -= cap
            consumers -= 1
        else:
            break  # saturation is a PREFIX of the ascending-cap order
    unsat = [s for s in demand if s not in sat]
    alloc = dict(sat)
    if unsat:
        base, rem = divmod(remaining, len(unsat))
        bump_order = sorted(unsat, key=lambda s: (-demand[s], s))
        for i, s in enumerate(bump_order):
            alloc[s] = base + (1 if i < rem else 0)
    for src, r in rows.items():
        assert r.demand_tokens == demand[src]
        assert r.saturated == (src in sat)
        assert r.allocated_tokens == alloc[src]
        assert r.allocated_tokens <= r.demand_tokens or r.saturated
    # conservation: the budget is spent exactly (some source unsaturated)
    assert unsat
    assert sum(r.allocated_tokens for r in rows.values()) == budget
    # max-min property: every unsaturated allocation >= every saturated cap,
    # and unsaturated allocations differ by at most 1
    un_allocs = [rows[s].allocated_tokens for s in unsat]
    assert max(un_allocs) - min(un_allocs) <= 1
    if sat:
        assert min(un_allocs) >= max(sat.values())


def test_obv_matches_python_running_sum(spark):
    rows = QUERIES["window_on_balance_volume"].fn(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events").select("event_type", "ts", "value").collect()
    daily = defaultdict(lambda: [0, 0])
    for e in ev:
        key = (e.event_type, e.ts.strftime("%Y-%m-%d"))
        daily[key][0] += math.floor(e.value * 100 + 0.5)
        daily[key][1] += 1
    expected = {}
    by_type = defaultdict(list)
    for (typ, day), (cents, vol) in daily.items():
        by_type[typ].append((day, cents, vol))
    for typ, days in by_type.items():
        days.sort()
        obv = 0
        prev = None
        for day, cents, vol in days:
            if prev is not None:
                obv += vol if cents > prev else -vol if cents < prev else 0
            prev = cents
            expected[(typ, day)] = obv
    got = {(r.event_type, r.day): r.obv for r in rows}
    assert got == expected
    # OBV genuinely oscillates (both signs appear across the series)
    assert any(v > 0 for v in got.values()) and any(v < 0 for v in got.values())
