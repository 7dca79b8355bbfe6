"""Semantic property tests for extension pack 48 (extended48.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended48 import N_SHARDS
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_scd2_snapshot_grid_matches_python_replay(spark):
    rows = QUERIES["scd2_snapshot_grid"].fn(spark, SF_DIR).collect()
    ev = sorted(
        load(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    # run-length compress per user
    changes = defaultdict(list)  # user -> [(ts, type)]
    prev = {}
    months = set()
    for r in ev:
        months.add(r.ts.replace(hour=0, minute=0, second=0, microsecond=0))
        if prev.get(r.user_id) != r.event_type:
            changes[r.user_id].append((r.ts, r.event_type))
            prev[r.user_id] = r.event_type
    expected = defaultdict(int)
    for m in months:
        for uid, ch in changes.items():
            state = None
            for ts, typ in ch:  # chronological
                if ts <= m:
                    state = typ
                else:
                    break
            if state is not None:
                expected[(m.strftime("%Y-%m-%d"), state)] += 1
    got = {(r.day, r.event_type): r.n_users for r in rows}
    assert got == dict(expected)
    # snapshots at later months cover at least as many users (users only appear)
    per_month = defaultdict(int)
    for (m, _), n in got.items():
        per_month[m] += n
    ms = sorted(per_month)
    assert all(per_month[a] <= per_month[b] for a, b in zip(ms, ms[1:]))
    # the first month's snapshot misses users who appear later (no invention)
    assert per_month[ms[0]] < len(changes)


def test_moments_merge_audit_is_exact_and_matches_replay(spark):
    rows = {r.event_type: r for r in QUERIES["agg_moments_merge_audit"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "event_id", "value").collect()
    agg = defaultdict(lambda: [set(), 0, 0, 0])  # shards, n, s, q
    for r in ev:
        shard = (
            int(hashlib.md5(f"shard_{r.event_id}".encode()).hexdigest()[:15], 16)
            % N_SHARDS
        )
        # engine round() is half-away-from-zero on the IEEE double;
        # Python round() banker's-rounds — replay the engine rule
        deci = math.floor(r.value * 10 + 0.5)
        a = agg[r.event_type]
        a[0].add(shard)
        a[1] += 1
        a[2] += deci
        a[3] += deci * deci
    assert set(rows) == set(agg)
    for typ, (shards, n, s, q) in agg.items():
        r = rows[typ]
        assert r.merge_exact is True  # the mergeability theorem, exactly
        assert r.n_shards == len(shards)
        assert r.n == n
        assert r.mean_micro == 1_000_000 * s // (10 * n)
        assert r.var_micro == (10_000 * ((n * q - s * s) // n)) // n
        # variance is non-negative and below the uniform upper bound
        assert 0 <= r.var_micro
