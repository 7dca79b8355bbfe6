"""Semantic property tests for extension pack 68 (extended68.py)."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended68 import FRAME_S
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_range_interval_frame_matches_python_scan(spark):
    rows = {r.user_id: r for r in QUERIES["window_range_interval_frame"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    per = defaultdict(list)
    for e in ev:
        t = int(e.ts.replace(tzinfo=dt.timezone.utc).timestamp() // 1)
        per[e.user_id].append((t, math.floor(e.value * 100 + 0.5)))
    assert set(rows) == set(per)
    for uid, pts in per.items():
        pts.sort()
        peak_c = peak_n = total = 0
        for t, _ in pts:
            # RANGE frame: every row with t' in [t - FRAME_S, t] (peers incl.)
            in_frame = [(tt, cc) for tt, cc in pts if t - FRAME_S <= tt <= t]
            c = sum(cc for _, cc in in_frame)
            n = len(in_frame)
            peak_c = max(peak_c, c)
            peak_n = max(peak_n, n)
            total += c
        r = rows[uid]
        assert (r.peak_hour_cents, r.peak_hour_events) == (peak_c, peak_n)
        assert r.frame_cents_sum == total
        # frames genuinely reach beyond single events on this density
        assert r.peak_hour_events > 1


def test_boxplot_fences_match_python_order_stats(spark):
    rows = {r.event_type: r for r in QUERIES["agg_boxplot_fences"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_type", "event_id", "value").collect()
    per = defaultdict(list)
    for e in ev:
        per[e.event_type].append((math.floor(e.value * 100 + 0.5), e.event_id))
    assert set(rows) == set(per)
    for typ, vals in per.items():
        vals.sort()
        n = len(vals)
        cents = [c for c, _ in vals]
        q1 = cents[(n + 3) // 4 - 1]
        med = cents[(n + 1) // 2 - 1]
        q3 = cents[(3 * n + 1) // 4 - 1]
        lo = q1 - (3 * (q3 - q1)) // 2
        hi = q3 + (3 * (q3 - q1)) // 2
        outliers = sum(1 for c in cents if c < lo or c > hi)
        r = rows[typ]
        assert (r.q1_cents, r.median_cents, r.q3_cents) == (q1, med, q3)
        assert (r.lo_fence_cents, r.hi_fence_cents) == (lo, hi)
        assert r.n_outliers == outliers
        assert r.q1_cents <= r.median_cents <= r.q3_cents
        # fences bracket the box
        assert r.lo_fence_cents <= r.q1_cents and r.q3_cents <= r.hi_fence_cents
