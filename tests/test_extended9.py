"""Semantic property tests for extension pack 9 (extended9.py).

Oracle parity (tests/test_oracle_parity.py) already pins exact values;
these assert the MATHEMATICAL invariants — U-statistic identities,
attribution conservation laws, pair ordering, and the rate source's
closed-form output — so a self-consistent-but-wrong refactor still fails.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_mannwhitney_u_identity(spark):
    rows = QUERIES["agg_mannwhitney_u"].fn(spark, SF_DIR).collect()
    assert len(rows) == 2
    by = {r.event_type: r for r in rows}
    n1, n2 = by["click"].n, by["view"].n
    # U1 + U2 == n1*n2 (here everything is carried x2)
    assert by["click"].u_x2 + by["view"].u_x2 == 2 * n1 * n2
    # rank sums cover 1..N: sum over both samples of 2*rank == N(N+1)
    total = by["click"].rank_sum_x2 + by["view"].rank_sum_x2
    N = n1 + n2
    assert total == N * (N + 1)
    assert 0 <= by["click"].u_x2 <= 2 * n1 * n2


def test_attribution_conservation_laws(spark):
    rows = QUERIES["events_attribution_multitouch"].fn(spark, SF_DIR).collect()
    assert rows
    # every attributed purchase has exactly one first and one last touch
    n_attributed = sum(r.first_touch for r in rows)
    assert n_attributed == sum(r.last_touch for r in rows)
    e = load(spark, SF_DIR, "events")
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    assert 0 < n_attributed <= n_purchases
    # linear credit conserves ~1e6 per attributed purchase (floor loss < n per purchase)
    total_credit = sum(r.linear_credit_micro for r in rows)
    total_touches = sum(r.touches for r in rows)
    assert total_credit <= 1_000_000 * n_attributed
    assert total_credit > 1_000_000 * n_attributed - total_touches
    # purchase never credits itself
    assert all(r.event_type != "purchase" for r in rows)


def test_preference_pairs_ordering(spark):
    rows = QUERIES["llm_preference_pairs"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_group >= 2, r
        assert r.margin_micro == r.chosen_score_micro - r.rejected_score_micro
        assert r.margin_micro >= 0, r
        # a pair is two distinct documents unless all scores tie exactly
        if r.margin_micro > 0:
            assert r.chosen_doc_id != r.rejected_doc_id, r
        assert 0 <= r.rejected_score_micro <= 1_000_000
        assert 0 <= r.chosen_score_micro <= 1_000_000
    # one pair per (lang, source) group
    keys = [(r.lang, r.source) for r in rows]
    assert len(keys) == len(set(keys))


def test_rate_source_closed_form(spark):
    rows = QUERIES["stream_rate_source_agg"].fn(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert [r.bucket for r in rows] == list(range(8))
    assert all(r.n == 12 for r in rows)  # 96 rows over 8 buckets
    assert sum(r.value_sum for r in rows) == sum(range(96))
    # startTimestamp pinned to epoch 0 -> no wall-clock leak
    assert all(r.batch_ts.timestamp() == 0 for r in rows)
