"""Semantic property tests for extension pack 97 (extended97.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended97 import (
    SURVIVOR_MIN_DAY,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_survivorship_bias_matches_python_replay(spark):
    rows = {r.week: r for r in QUERIES["events_survivorship_bias_audit"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    weekly = defaultdict(int)
    survivors = set()
    for e in ev:
        wk = (e.ts.day - 1) // 7
        weekly[(e.user_id, wk)] += math.floor(e.value * 100 + 0.5)
        if e.ts.day >= SURVIVOR_MIN_DAY:
            survivors.add(e.user_id)
    per_week = defaultdict(lambda: [0, 0, 0, 0])
    for (uid, wk), cents in weekly.items():
        a = per_week[wk]
        a[0] += 1
        a[2] += cents
        if uid in survivors:
            a[1] += 1
            a[3] += cents
    assert set(rows) == set(per_week)
    for wk, (n, ns, tot, s_tot) in per_week.items():
        r = rows[wk]
        assert (r.n_user_weeks, r.n_survivor_weeks) == (n, ns)
        assert r.all_avg_cents == tot // n
        assert r.survivor_avg_cents == s_tot // ns
        assert r.bias_cents == s_tot // ns - tot // n
    # the audit's structure: in the final week every active user is a
    # survivor by definition, so the bias there is exactly zero
    last = max(per_week)
    assert rows[last].bias_cents == 0
    assert rows[last].n_survivor_weeks == rows[last].n_user_weeks


def test_record_recovery_matches_python_runs(spark):
    rows = {r.event_type: r for r in QUERIES["window_record_recovery_days"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "ts", "value").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for e in ev:
        daily[e.event_type][e.ts.strftime("%Y-%m-%d")] += math.floor(
            e.value * 100 + 0.5
        )
    expected = {}
    for typ, days in daily.items():
        peak = 0
        runs = []
        cur = 0
        for d in sorted(days):
            equity = days[d]
            peak = max(peak, equity)
            if equity < peak:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)  # right-censored trailing run counts
        if runs:
            expected[typ] = (
                len(runs),
                max(runs),
                sum(runs),
                sum(runs) // len(runs),
            )
    assert set(rows) == set(expected)
    for typ, (n, worst, total, mean) in expected.items():
        r = rows[typ]
        assert (r.n_drawdowns, r.worst_recovery_days) == (n, worst)
        assert (r.total_days_under, r.mean_recovery_days) == (total, mean)
        assert r.worst_recovery_days >= r.mean_recovery_days
    # drawdowns genuinely occur on day-level equity curves
    assert any(r.n_drawdowns > 0 for r in rows.values())
