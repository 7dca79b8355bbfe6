"""Semantic property tests for extension pack 74 (extended74.py)."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended74 import (
    CORRUPT_SHARD,
    TRAILER_SHARDS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_burstiness_matches_python_moments(spark):
    row = QUERIES["events_burstiness_goh_barabasi"].fn(spark, SF_DIR).collect()[0]
    ev = sorted(
        load(spark, SF_DIR, "events").select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp() // 1))
    gaps = []
    for ts in per.values():
        gaps.extend(b - a for a, b in zip(ts, ts[1:]))
    n = len(gaps)
    s = sum(gaps)
    q = sum(g * g for g in gaps)
    mean = s / n
    sd = math.sqrt((q - s * s / n) / n)
    assert row.n == n
    assert row.total_gap_s == s
    assert abs(row.mean_gap_s - mean) < 1e-4
    assert abs(row.sd_gap_s - sd) < 1e-4
    assert abs(row.burstiness - (sd - mean) / (sd + mean)) < 1e-5
    # Poisson-like synthetic arrivals: B near 0, inside (-1, 1)
    assert -1 < row.burstiness < 1
    assert abs(row.burstiness) < 0.5


def test_trailer_validation_flags_exactly_the_corrupt_shard(spark):
    rows = {r.shard: r for r in QUERIES["source_trailer_record_validation"].fn(spark, SF_DIR).collect()}
    nat = load(spark, SF_DIR, "nation").collect()
    shards = defaultdict(list)
    for r in nat:
        shards[r.n_nationkey % TRAILER_SHARDS].append(
            (r.n_nationkey, r.n_nationkey * 100 + r.n_regionkey)
        )
    assert set(rows) == set(range(TRAILER_SHARDS))
    for shard, recs in shards.items():
        r = rows[shard]
        declared_n = len(recs)
        declared_cents = sum(c for _, c in recs)
        assert r.n_records_declared == declared_n
        assert r.cents_declared == declared_cents
        if shard == CORRUPT_SHARD:
            dropped = max(c for _, c in recs)
            assert r.n_records_read == declared_n - 1
            assert r.cents_read == declared_cents - dropped
            assert not r.count_ok and not r.total_ok
        else:
            assert r.n_records_read == declared_n
            assert r.cents_read == declared_cents
            assert r.count_ok and r.total_ok
    # exactly one shard fails — the control localizes, not just detects
    assert sum(1 for r in rows.values() if not r.count_ok) == 1
