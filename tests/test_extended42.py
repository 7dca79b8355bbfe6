"""Semantic property tests for extension pack 42 (extended42.py)."""

from __future__ import annotations

import collections

import numpy as np
import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_asof_nearest_replays(spark):
    rows = QUERIES["join_asof_nearest"].fn(spark, SF_DIR).collect()
    ev = (
        load(spark, SF_DIR, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("tu"),
            "event_type",
        )
        .collect()
    )
    by_user = collections.defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    got = {r.click_id: (r.nearest_purchase_us, r.gap_us) for r in rows}
    n_clicks = 0
    for uid, es in by_user.items():
        purchases = sorted(x.tu for x in es if x.event_type == "purchase")
        for x in es:
            if x.event_type != "click":
                continue
            n_clicks += 1
            prev = max((p for p in purchases if p <= x.tu), default=None)
            nxt = min((p for p in purchases if p >= x.tu), default=None)
            if prev is None and nxt is None:
                expect = (None, 9223372036854775807)
            elif prev is None:
                expect = (nxt, nxt - x.tu)
            elif nxt is None:
                expect = (prev, x.tu - prev)
            elif x.tu - prev <= nxt - x.tu:
                expect = (prev, x.tu - prev)
            else:
                expect = (nxt, nxt - x.tu)
            assert got[x.event_id] == expect, x.event_id
    assert len(rows) == n_clicks


def test_hodges_lehmann_matches_numpy(spark):
    r = QUERIES["agg_hodges_lehmann"].fn(spark, SF_DIR).collect()[0]
    daily = (
        load(spark, SF_DIR, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "c"
            )
        )
        .collect()
    )
    x = np.array(sorted(row.c for row in daily), dtype=np.int64)
    n = len(x)
    assert r.n_days == n
    assert r.n_pairs == n * (n + 1) // 2
    w2 = (x[:, None] + x[None, :])[np.triu_indices(n)]
    w2.sort()
    m = len(w2)
    hl4 = int(w2[(m + 1) // 2 - 1]) + int(w2[m // 2])
    assert r.hl4_cents == hl4
    med2 = int(x[(n + 1) // 2 - 1]) + int(x[n // 2])
    assert r.median2_cents == med2
    # HL and the median are distinct estimators of the same location:
    # hl4/4 and median2/2 agree within 10% on this series
    assert abs(r.hl4_cents / 4 - r.median2_cents / 2) < 0.1 * (
        r.median2_cents / 2
    )
