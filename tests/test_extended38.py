"""Semantic property tests for extension pack 38 (extended38.py)."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.operators.extended38 import (
    VELOCITY_WINDOW_US,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_peak_velocity_matches_two_pointer_replay(spark):
    rows = QUERIES["events_peak_velocity_1h"].fn(spark, SF_DIR).collect()
    ev = (
        load(spark, SF_DIR, "events")
        .select("user_id", F.unix_micros("ts").alias("tu"), "event_id")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.tu, e.event_id))
    assert len(rows) == len(by_user)
    got = {r.user_id: (r.peak_events_1h, r.peak_window_end_us) for r in rows}
    for uid, ts in by_user.items():
        ts.sort()
        best = (0, None)
        lo = 0
        for hi in range(len(ts)):
            while ts[hi][0] - ts[lo][0] > VELOCITY_WINDOW_US:
                lo += 1
            cnt = hi - lo + 1
            # RANGE frame counts peers with equal tu too; with unique
            # tu per user the row frame equals the range frame
            if cnt > best[0]:
                best = (cnt, ts[hi][0])
        assert got[uid] == best, uid


def test_peak_velocity_bounds(spark):
    rows = QUERIES["events_peak_velocity_1h"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    per_user = {
        r.user_id: r.c
        for r in e.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    for r in rows:
        assert 1 <= r.peak_events_1h <= per_user[r.user_id]
    # a random walk over 30 days concentrates SOME burst above 1
    assert any(r.peak_events_1h > 1 for r in rows)


def test_id_gaps_recover_lineless_orders(spark):
    rows = QUERIES["audit_monotonic_id_gaps"].fn(spark, SF_DIR).collect()
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    with_lines = {r.l_orderkey for r in li.select("l_orderkey").distinct().collect()}
    all_keys = {r.o_orderkey for r in o.select("o_orderkey").collect()}
    missing = sorted(all_keys - with_lines)
    # interior missing keys (inside the referenced range) must be
    # covered by exactly the reported gap ranges
    lo, hi = min(with_lines), max(with_lines)
    interior = [k for k in missing if lo < k < hi]
    covered = set()
    for r in rows:
        assert r.gap_len == r.gap_end - r.gap_start + 1
        for k in range(r.gap_start, r.gap_end + 1):
            covered.add(k)
    assert covered == set(interior)
    assert rows, "corpus is known to have line-less orders"
