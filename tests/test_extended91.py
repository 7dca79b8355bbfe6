"""Semantic property tests for extension pack 91 (extended91.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_second_price_auction_matches_python_settlement(spark):
    row = QUERIES["agg_second_price_auction"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    ).collect()
    bids = defaultdict(dict)
    for r in li:
        c = round(r.l_extendedprice * 100)
        cur = bids[r.l_partkey].get(r.l_suppkey, 0)
        bids[r.l_partkey][r.l_suppkey] = max(cur, c)
    n_items = len(bids)
    n_comp = first = second = 0
    for item, bs in bids.items():
        order = sorted(bs.items(), key=lambda kv: (-kv[1], kv[0]))
        win_bid = order[0][1]
        clearing = order[1][1] if len(order) > 1 else win_bid
        if len(order) > 1:
            n_comp += 1
        first += win_bid
        second += clearing
    assert row.n_items == n_items
    assert row.n_competitive == n_comp
    assert (row.first_price_cents, row.second_price_cents) == (first, second)
    assert row.bidder_surplus_cents == first - second
    assert row.revenue_ratio_micro == 1_000_000 * second // first
    # the mechanism's signature: strictly positive surplus, ratio < 1
    assert row.bidder_surplus_cents > 0
    assert row.revenue_ratio_micro < 1_000_000
    assert row.n_competitive > n_items // 2  # most items are contested


def test_masking_formats_preserve_length_and_content(spark):
    rows = QUERIES["scalar_masking_format_suite"].fn(spark, SF_DIR).collect()
    sup = {r.s_suppkey: r.s_name for r in load(spark, SF_DIR, "supplier").collect()}
    assert {r.supp_key for r in rows} == set(sup)
    for r in rows:
        name = sup[r.supp_key]
        assert r.name_len == len(name)
        assert len(r.keep_last4) == len(name)
        assert r.keep_last4.endswith(name[-4:])
        assert set(r.keep_last4[:-4]) <= {"*"}
        assert len(r.keep_initial) == len(name)
        assert r.keep_initial[0] == name[0]
        assert set(r.keep_initial[1:]) <= {"*"}
        assert r.masked_email == name[0].lower() + "***@supplier.example"
