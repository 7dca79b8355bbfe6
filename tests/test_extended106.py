"""Semantic property tests for extension pack 106 (extended106.py)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended106 import (
    PVM_SPLIT,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_pvm_bridge_conserves_exactly(spark):
    row = QUERIES["agg_price_volume_mix_bridge"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    split = dt.datetime.fromisoformat(PVM_SPLIT)
    pq = defaultdict(lambda: [[0, 0], [0, 0]])
    for r in li:
        per = 0 if r.l_shipdate < split else 1
        pq[r.l_partkey][per][0] += int(r.l_quantity)
        pq[r.l_partkey][per][1] += round(r.l_extendedprice * 100)
    vol = price = joint = delta = n = 0
    for part, ((q0, c0), (q1, c1)) in pq.items():
        if q0 == 0 or q1 == 0:
            continue
        up0 = 10000 * c0 // q0
        up1 = 10000 * c1 // q1
        n += 1
        vol += (q1 - q0) * up0
        price += q0 * (up1 - up0)
        joint += (q1 - q0) * (up1 - up0)
        delta += q1 * up1 - q0 * up0
    assert row.n_parts == n
    assert (row.volume_effect, row.price_effect) == (vol, price)
    assert (row.joint_effect, row.delta_revenue) == (joint, delta)
    # THE theorem: the bridge conserves exactly, by algebra
    assert row.conservation_residual == 0
    assert vol + price + joint == delta


def test_cron_punctuality_matches_python_replay(spark):
    rows = {r.event_type: r for r in QUERIES["events_cron_punctuality"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "ts").collect()
    firsts = {}
    for e in ev:
        hr = e.ts.replace(minute=0, second=0, microsecond=0)
        key = (e.event_type, hr)
        if key not in firsts or e.ts < firsts[key]:
            firsts[key] = e.ts
    per = defaultdict(list)
    for (typ, hr), first in firsts.items():
        off = int(
            first.replace(tzinfo=dt.timezone.utc).timestamp() // 1
        ) - int(hr.replace(tzinfo=dt.timezone.utc).timestamp() // 1)
        per[typ].append(off)
    assert set(rows) == set(per)
    for typ, offs in per.items():
        r = rows[typ]
        assert r.n_hours == len(offs)
        assert (r.best_offset_s, r.worst_offset_s) == (min(offs), max(offs))
        assert r.mean_offset_s == sum(offs) // len(offs)
        assert r.n_on_time == sum(1 for o in offs if o <= 60)
    # per-type arrivals are sparse (~13/hour): the memoryless first-offset
    # averages minutes, with a real but minority within-a-minute mass —
    # exactly the Poisson waiting-time shape the key's docstring pins
    total_hours = sum(r.n_hours for r in rows.values())
    on_time = sum(r.n_on_time for r in rows.values())
    assert 0 < on_time < total_hours // 2
    assert all(r.mean_offset_s > 60 for r in rows.values())
