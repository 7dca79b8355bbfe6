"""Semantic property tests for extension pack 55 (extended55.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended55 import (
    FX_SPREAD,
    LOOKBACK,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()

CCY = {"O": "EUR", "F": "GBP"}


def _rate(ccy: str, d) -> int:
    h = int(
        hashlib.md5(f"fx_{ccy}_{d.strftime('%Y-%m-%d')}".encode()).hexdigest()[:15],
        16,
    )
    return 1_000_000 + h % FX_SPREAD


def test_fx_asof_locf_matches_python_replay(spark):
    rows = {r.ccy: r for r in QUERIES["join_fx_rate_asof"].fn(spark, SF_DIR).collect()}
    orders = load(spark, SF_DIR, "orders").collect()
    days = sorted({o.o_orderdate.date() for o in orders})
    weekdays = [d for d in days if d.isoweekday() <= 5]
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        ccy = CCY.get(o.o_orderstatus, "JPY")
        d = o.o_orderdate.date()
        cents = round(o.o_totalprice * 100)
        fix_day = max((x for x in weekdays if x <= d), default=None)
        a = agg[ccy]
        a[0] += 1
        a[2] += cents
        if fix_day is None:
            a[1] += 1
        else:
            a[3] += cents * _rate(ccy, fix_day) // 1_000_000
    assert set(rows) == set(agg)
    for ccy, (n, unrated, native, conv) in agg.items():
        r = rows[ccy]
        assert (r.n_orders, r.n_unrated) == (n, unrated)
        assert (r.native_cents, r.converted_cents) == (native, conv)
        # rates are 1.0..1.5, so conversion inflates rated volume
        assert r.converted_cents >= r.native_cents - native * (unrated > 0)
    # weekend orders exist, so LOCF genuinely fires (rate day != order day)
    assert any(d.isoweekday() > 5 for d in days)


def test_ushape_attribution_conserves_every_conversion(spark):
    rows = {r.touch_type: r for r in QUERIES["events_attribution_ushape_exact"].fn(spark, SF_DIR).collect()}
    ev = sorted(
        load(spark, SF_DIR, "events").select(
            "user_id", "event_id", "event_type", "ts", "value"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(r)
    total_conv_cents = 0
    n_conv_with_touches = 0
    expected = defaultdict(lambda: [0, 0])
    for seq in per_user.values():
        for i, r in enumerate(seq):
            if r.event_type != "purchase":
                continue
            cents = math.floor(r.value * 100 + 0.5)
            touches = seq[max(0, i - LOOKBACK) : i]  # last LOOKBACK preceding
            if not touches:
                continue
            n_conv_with_touches += 1
            total_conv_cents += cents
            k = len(touches)
            if k == 1:
                nums, den = [1], 1
            elif k == 2:
                nums, den = [1, 1], 2
            else:
                nums = [2 * (k - 2)] + [1] * (k - 2) + [2 * (k - 2)]
                den = 5 * (k - 2)
            floors = [cents * n // den for n in nums]
            rems = [cents * n % den for n in nums]
            deficit = cents - sum(floors)
            # rn in the engine counts backward from the conversion
            order = sorted(
                range(k), key=lambda j: (-rems[j], k - j)
            )[:deficit]
            for j, t in enumerate(touches):
                bump = 1 if j in order else 0
                expected[t.event_type][0] += 1
                expected[t.event_type][1] += floors[j] + bump
    assert set(rows) == set(expected)
    got_cents = sum(r.attributed_cents for r in rows.values())
    # THE theorem: every conversion's cents are conserved exactly
    assert got_cents == total_conv_cents
    for typ, (n, cents) in expected.items():
        r = rows[typ]
        assert (r.n_touches, r.attributed_cents) == (n, cents)
    assert n_conv_with_touches > 0
