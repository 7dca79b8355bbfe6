"""Semantic property tests for extension pack 58 (extended58.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended58 import (
    ABC_A_MICRO,
    ABC_B_MICRO,
    SRM_ALERT_MICRO,
    XYZ_X_CV2_MICRO,
    XYZ_Y_CV2_MICRO,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_abc_xyz_matrix_matches_python_replay(spark):
    rows = {(r.abc, r.xyz): r for r in QUERIES["agg_abc_xyz_classification"].fn(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).collect()
    per = defaultdict(lambda: [0, 0, 0, 0])  # rev, n, s, q
    for r in li:
        a = per[r.l_partkey]
        a[0] += round(r.l_extendedprice * 100)
        a[1] += 1
        a[2] += int(r.l_quantity)
        a[3] += int(r.l_quantity) ** 2
    order = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))
    tot = sum(v[0] for v in per.values())
    cum = 0
    expected = defaultdict(lambda: [0, 0])
    for part, (rev, n, s, q) in order:
        cum += rev
        share = 1_000_000 * cum // tot
        abc = "A" if share <= ABC_A_MICRO else "B" if share <= ABC_B_MICRO else "C"
        cv2 = 1_000_000 * (n * q - s * s) // (s * s)
        xyz = "X" if cv2 <= XYZ_X_CV2_MICRO else "Y" if cv2 <= XYZ_Y_CV2_MICRO else "Z"
        expected[(abc, xyz)][0] += 1
        expected[(abc, xyz)][1] += rev
    assert set(rows) == set(expected)
    for key, (n_parts, rev) in expected.items():
        assert (rows[key].n_parts, rows[key].revenue_cents) == (n_parts, rev)
    # conservation + Pareto shape: A-cells hold a minority of parts but
    # the (strict) majority of revenue
    assert sum(r.revenue_cents for r in rows.values()) == tot
    a_parts = sum(r.n_parts for (a, _), r in rows.items() if a == "A")
    a_rev = sum(r.revenue_cents for (a, _), r in rows.items() if a == "A")
    tot_parts = sum(r.n_parts for r in rows.values())
    assert a_parts / tot_parts < 0.75  # A is not everything
    assert a_rev / tot >= 0.5


def test_srm_check_matches_python_counts(spark):
    rows = {r.day: r for r in QUERIES["events_srm_check"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_id", "ts").collect()
    daily = defaultdict(lambda: [0, 0])
    for e in ev:
        arm = (
            int(hashlib.md5(f"arm_{e.event_id}".encode()).hexdigest()[:15], 16) % 2
        )
        daily[e.ts.strftime("%Y-%m-%d")][arm] += 1
    assert set(rows) == set(daily)
    for day, (n0, n1) in daily.items():
        r = rows[day]
        assert (r.n0, r.n1) == (n0, n1)
        chi2 = 1_000_000 * (n0 - n1) ** 2 // (n0 + n1)
        assert r.chi2_micro == chi2
        assert r.srm_alert == (chi2 > SRM_ALERT_MICRO)
    # a healthy md5 coin at ~330 events/day should not alert every day
    alerts = sum(1 for r in rows.values() if r.srm_alert)
    assert alerts < len(rows) / 2
