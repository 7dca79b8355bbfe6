"""Semantic property tests for extension pack 66 (extended66.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended66 import (
    SETTLE_DAYS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_business_day_settlement_matches_python_calendar(spark):
    rows = {r.settle_day: r for r in QUERIES["join_business_day_settlement"].fn(spark, SF_DIR).collect()}
    orders = load(spark, SF_DIR, "orders").collect()
    days = sorted({o.o_orderdate.date() for o in orders})
    bdays = [d for d in days if d.isoweekday() <= 5]
    ordinal = {d: i for i, d in enumerate(bdays)}
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        d = o.o_orderdate.date()
        if d.isoweekday() > 5 or d not in ordinal:
            continue
        tgt = ordinal[d] + SETTLE_DAYS
        if tgt >= len(bdays):
            continue  # settles beyond the data edge — absent by contract
        settle = bdays[tgt]
        lag = (settle - d).days
        a = agg[settle.strftime("%Y-%m-%d")]
        a[0] += 1
        a[1] += round(o.o_totalprice * 100)
        a[2] = max(a[2], lag)
        a[3] += 1 if lag > SETTLE_DAYS else 0
    assert set(rows) == set(agg)
    crossers = 0
    for day, (n, cents, mx, wc) in agg.items():
        r = rows[day]
        assert (r.n_trades, r.settle_cents) == (n, cents)
        assert (r.max_calendar_lag, r.n_weekend_crossers) == (mx, wc)
        crossers += wc
    # weekend-crossing trades genuinely occur (Thu/Fri trades settle Mon/Tue)
    assert crossers > 0
    assert all(r.max_calendar_lag >= SETTLE_DAYS for r in rows.values())


def test_rle_audit_value_sort_collapses_runs(spark):
    rows = {r.layout: r for r in QUERIES["layout_rle_compression_audit"].fn(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag", "l_linestatus"
    ).collect()

    def count_runs(order_key):
        seq = sorted(li, key=order_key)
        rf_runs = ls_runs = 0
        p_rf = p_ls = None
        for r in seq:
            if p_rf != r.l_returnflag:
                rf_runs += 1
            if p_ls != r.l_linestatus:
                ls_runs += 1
            p_rf, p_ls = r.l_returnflag, r.l_linestatus
        return rf_runs, ls_runs

    by_key = count_runs(
        lambda r: (r.l_orderkey, r.l_linenumber, r.l_partkey, r.l_returnflag, r.l_linestatus)
    )
    by_val = count_runs(
        lambda r: (r.l_returnflag, r.l_linestatus, r.l_orderkey, r.l_linenumber, r.l_partkey)
    )
    n = len(li)
    assert (rows["by_key"].rf_runs, rows["by_key"].ls_runs) == by_key
    assert (rows["by_value"].rf_runs, rows["by_value"].ls_runs) == by_val
    for layout, (rf, ls) in (("by_key", by_key), ("by_value", by_val)):
        r = rows[layout]
        assert r.n_rows == n
        assert r.rf_run_ratio_micro == 1_000_000 * rf // n
        assert r.ls_run_ratio_micro == 1_000_000 * ls // n
    # the audit's verdict: value sort collapses runs by orders of magnitude
    assert rows["by_value"].rf_runs <= 10  # ~|distinct rf values| runs
    assert rows["by_key"].rf_runs > 100 * rows["by_value"].rf_runs
