"""Semantic property tests for extension pack 45 (extended45.py)."""

from __future__ import annotations

import datetime as dt

from classification_problem_with_pyspark_spark.operators.extended45 import (
    ASOF_BACK_DAYS,
    REVISE_LAG_DAYS,
    REVISE_MOD,
    REVISE_PCT,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_bitemporal_asof_matches_python_replay(spark):
    rows = {r.status: r for r in QUERIES["join_bitemporal_asof"].fn(spark, SF_DIR).collect()}
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    ).collect()
    t = max(o.o_orderdate for o in orders) - dt.timedelta(days=ASOF_BACK_DAYS)
    agg = {}
    for o in orders:
        if o.o_orderdate > t:
            continue  # not yet booked at the as-of instant
        cents = round(o.o_totalprice * 100)
        revised_cents = cents * REVISE_PCT // 100
        has_rev = o.o_orderkey % REVISE_MOD == 0
        rev_ts = o.o_orderdate + dt.timedelta(days=REVISE_LAG_DAYS)
        asof_c = revised_cents if (has_rev and rev_ts <= t) else cents
        cur_c = revised_cents if has_rev else cents
        a = agg.setdefault(o.o_orderstatus, [0, 0, 0, 0])
        a[0] += 1
        a[1] += asof_c
        a[2] += cur_c
        a[3] += 1 if cur_c != asof_c else 0
    assert set(rows) == set(agg)
    for st, (n, asof_c, cur_c, n_restated) in agg.items():
        r = rows[st]
        assert (r.n_known, r.asof_cents, r.current_cents) == (n, asof_c, cur_c)
        assert r.n_restated_later == n_restated
        assert r.restatement_cents == cur_c - asof_c
    # the synthesis genuinely produces pending restatements (visible only
    # in the current column) — otherwise the query degenerates to an SCD
    assert sum(r.n_restated_later for r in rows.values()) > 0
    assert sum(r.restatement_cents for r in rows.values()) < 0  # 98% < 100%


def test_interval_coverage_matches_python_merge(spark):
    rows = {r.user_id: r for r in QUERIES["events_interval_coverage"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value", "event_id").collect()
    per_user = {}
    for e in ev:
        start = int(e.ts.replace(tzinfo=dt.timezone.utc).timestamp() // 1)
        cents = round(e.value * 100)
        per_user.setdefault(e.user_id, []).append((start, start + cents % 3600 + 60, e.event_id))
    assert set(rows) == set(per_user)
    for uid, ivs in per_user.items():
        ivs.sort()
        merged = []
        for s, e, _ in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        covered = sum(e - s for s, e, _ in merged)
        span = max(e for _, e, _ in merged) - min(s for s, _, _ in merged)
        r = rows[uid]
        assert r.n_intervals == len(ivs)
        assert r.n_islands == len(merged)
        assert r.covered_s == covered
        assert r.span_s == span
        assert r.utilization_micro == 1_000_000 * covered // span
        # union length can never exceed the span or the naive duration sum
        assert covered <= span
        assert covered <= sum(e - s for s, e, _ in ivs)
    # overlaps genuinely occur in the fixture (otherwise the merge is vacuous)
    assert any(r.n_islands < r.n_intervals for r in rows.values())
