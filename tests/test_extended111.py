"""Semantic property tests for extension pack 111 (extended111.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended111 import ASOF_COMMIT
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_time_travel_reads_the_prefix_snapshot(spark):
    """AS OF commit 2 must see (view, click) — NOT the post-compaction
    latest state (click, purchase) that source_txn_log_replay reads."""
    rows = QUERIES["sink_snapshot_time_travel"].fn(spark, SF_DIR).collect()
    types = [r.event_type for r in rows]
    assert types == ["click", "view"]
    ev = load(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    n = defaultdict(int)
    users = defaultdict(set)
    for r in ev:
        n[r.event_type] += 1
        users[r.event_type].add(r.user_id)
    for r in rows:
        assert r.n_events == n[r.event_type]
        assert r.n_users == len(users[r.event_type])
    assert ASOF_COMMIT == 2  # the contract the latest-state twin contrasts


def test_time_travel_and_replay_snapshots_differ(spark):
    """The same log, two versions: prefix fold vs full fold must expose
    different live segment sets (this is the point of time travel)."""
    asof = {
        r.event_type
        for r in QUERIES["sink_snapshot_time_travel"].fn(spark, SF_DIR).collect()
    }
    latest = {
        r.event_type
        for r in QUERIES["source_txn_log_replay"].fn(spark, SF_DIR).collect()
    }
    assert asof == {"view", "click"}
    assert latest == {"click", "purchase"}


def test_friedman_matches_python_fold(spark):
    rows = QUERIES["agg_friedman_test"].fn(spark, SF_DIR).collect()
    o = load(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    ).collect()
    cells = defaultdict(int)
    for r in o:
        block = (r.o_orderdate.year, r.o_orderdate.month)
        cells[(block, r.o_orderpriority)] += round(r.o_totalprice * 100)
    treatments = sorted({t for (_, t) in cells})
    k = len(treatments)
    blocks = defaultdict(dict)
    for (block, t), cents in cells.items():
        blocks[block][t] = cents
    complete = {b: d for b, d in blocks.items() if len(d) == k}
    rank_sum2 = defaultdict(int)
    for b, d in complete.items():
        vals = sorted(d.values())
        for t, v in d.items():
            lower = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            rank_sum2[t] += 2 * (lower + 1) + ties - 1
    bb = len(complete)
    ssq2 = sum(v * v for v in rank_sum2.values())
    chi2 = (3_000_000 * ssq2) // (bb * k * (k + 1)) - 3_000_000 * bb * (k + 1)
    assert len(rows) == k
    for r in rows:
        assert r.n_blocks == bb
        assert r.rank_sum2 == rank_sum2[r.treatment]
        assert r.mean_rank_micro == (1_000_000 * r.rank_sum2) // (2 * bb)
        assert r.chi2_f_micro == chi2
    # sanity: doubled rank sums over all treatments = b * k * (k+1)
    assert sum(rank_sum2.values()) == bb * k * (k + 1)
    # fixture pins priority-exchangeability: χ²_F far below the
    # df=4, α=0.01 cut (13.28) — no priority systematically out-ranks
    assert rows[0].chi2_f_micro < 13_280_000
