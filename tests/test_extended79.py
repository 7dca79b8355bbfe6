"""Semantic property tests for extension pack 79 (extended79.py)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_mtbf_mttr_matches_python_incident_replay(spark):
    row = QUERIES["events_mtbf_mttr"].fn(spark, SF_DIR).collect()[0]
    ev = sorted(
        load(spark, SF_DIR, "events").select("user_id", "event_type", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(
            (r.event_type, int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp() // 1))
        )
    failures = []
    repairs = []
    for seq in per.values():
        starts = []
        prev = None
        for (typ, t), p in zip(seq, [None] + seq[:-1]):
            prev = p
            if typ == "error" and (prev is None or prev[0] != "error"):
                starts.append(t)
            if typ != "error" and prev is not None and prev[0] == "error":
                repairs.append(t - prev[1])
        failures.append(starts)
    n_failures = sum(len(s) for s in failures)
    gaps = [b - a for s in failures for a, b in zip(s, s[1:])]
    assert row.n_failures == n_failures
    assert row.n_repairs == len(repairs)
    assert row.mtbf_s == sum(gaps) // len(gaps)
    assert row.mttr_s == sum(repairs) // len(repairs)
    assert row.worst_repair_s == max(repairs)
    # reliability sanity: repairs come fast relative to failure spacing
    assert row.mttr_s < row.mtbf_s
    assert row.n_repairs <= row.n_failures  # open incidents never repair


def test_rounding_modes_pin_boundary_semantics(spark):
    rows = {r.k: r for r in QUERIES["scalar_rounding_modes_suite"].fn(spark, SF_DIR).collect()}
    for k, r in rows.items():
        m = k - 12  # x = m + 0.5 exactly
        # HALF_UP away from zero: positive halves go up, negative DOWN
        expect_away = m + 1 if m + 0.5 > 0 else m if m + 0.5 < 0 else 1
        # x = m + .5; away-from-zero: for x>0 → m+1; x<0 → m (toward -∞?)
        # careful: x = -11.5 → away from zero = -12 = m; x = -0.5... m=-1 →
        # away = -1 = m. So expect_away = m+1 if x>0 else m.
        expect_away = m + 1 if m + 0.5 > 0 else m
        assert r.half_away == expect_away
        assert r.half_away_manual == expect_away
        assert r.floor_v == m
        assert r.ceil_v == m + 1
        # banker's: to the even neighbor
        assert r.half_even == (m if m % 2 == 0 else m + 1)
        assert r.half_even % 2 == 0
    # the sign change is genuinely covered
    assert any(k - 12 < -1 for k in rows) and any(k - 12 >= 1 for k in rows)
    # and the two modes genuinely diverge on odd negative halves
    assert any(rows[k].half_away != rows[k].half_even for k in rows)
