"""Semantic property tests for extension pack 8 (extended8.py).

Oracle parity (tests/test_oracle_parity.py) already pins exact values for
the four oracle-checked keys; these assert the MATHEMATICAL invariants the
operators claim, so a future refactor that stays self-consistent on both
engines but breaks the semantics still fails. The two rows-only keys
(isotonic, BPE learning) get their full quality gates here instead.
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE

load_all_modules()


def test_freshness_lag_zero_for_watermark_type(spark):
    rows = QUERIES["audit_freshness_sla"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    # exactly one type holds the corpus watermark -> lag 0, never breached
    zero = [r for r in rows if r.lag_micros == 0]
    assert len(zero) == 1 and not zero[0].sla_breach
    for r in rows:
        assert r.lag_micros >= 0
        assert r.sla_breach == (r.lag_micros > 1_800_000_000), r
        assert 0 <= r.n_last_day <= r.n_events, r


def test_theil_sen_slope_is_a_pairwise_slope_median(spark):
    rows = QUERIES["agg_theil_sen"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    # recompute per-type daily counts in python and check the lower median
    daily = (
        load(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .count()
        .collect()
    )
    series: dict[str, list] = collections.defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day.toordinal(), r["count"]))
    import math

    for row in rows:
        pts = sorted(series[row.event_type])
        slopes = sorted(
            math.floor(1_000_000.0 * (c2 - c1) / (d2 - d1))
            for i, (d1, c1) in enumerate(pts)
            for (d2, c2) in pts[i + 1 :]
        )
        assert row.n_days == len(pts)
        assert row.n_pairs == len(slopes)
        assert row.ts_slope_micro_per_day == slopes[(len(slopes) + 1) // 2 - 1], row


def test_interval_overlap_plan_is_banded_not_cartesian(spark):
    df = QUERIES["join_interval_overlap"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the overlap join must be an equi-join on the day band
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_interval_overlap_exposure_is_consistent(spark):
    rows = QUERIES["join_interval_overlap"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:200]:
        assert 1 <= r.n_burst_types <= 5, r
        assert r.n_burst_windows >= r.n_burst_types, r
        # a burst window holds > its type's hourly average (>= 1 event)
        assert r.burst_events_total >= r.n_burst_windows, r


def test_weighted_priority_sample_favors_long_docs(spark):
    rows = QUERIES["llm_sample_weighted_priority"].fn(spark, SF_DIR).collect()
    assert len(rows) == 100  # 20 per lang x 5 langs
    per_lang = collections.Counter(r.lang for r in rows)
    assert set(per_lang.values()) == {20}
    # weighted by n_chars: the sampled mean length must exceed the corpus
    # mean (the whole point of weighting)
    corpus_avg = (
        load(spark, SF_DIR, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_avg = sum(r.n_chars for r in rows) / len(rows)
    assert sample_avg > corpus_avg, (sample_avg, corpus_avg)


def test_isotonic_fit_is_monotone_and_bounded(spark):
    rows = QUERIES["ml_isotonic_regression"].fn(spark, SF_DIR).collect()
    assert len(rows) == 50
    qs = [r.quantity for r in rows]
    assert qs == sorted(qs)
    fits = [r.fit_price for r in rows]
    # the isotonic contract: non-decreasing predictions
    assert all(b >= a for a, b in zip(fits, fits[1:])), fits
    # fitted values stay inside the observed label range
    lo, hi = min(r.avg_price for r in rows), max(r.avg_price for r in rows)
    assert all(lo - 0.01 <= f <= hi + 0.01 for f in fits)
    # PAV preserves the mean of the fitted sequence vs the labels
    assert abs(sum(fits) - sum(r.avg_price for r in rows)) / sum(fits) < 1e-6


def _reference_bpe(word_counts: dict[str, int], n_rounds: int):
    """Pure-python BPE merge learner (Sennrich et al. 2016 semantics,
    left-to-right non-overlapping merges, lexicographic tie-break)."""
    words = [(list(w), c) for w, c in word_counts.items()]
    merges = []
    for step in range(1, n_rounds + 1):
        counts: collections.Counter = collections.Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, cnt))
        merged = l + r
        new_words = []
        for syms, c in words:
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            new_words.append((out, c))
        words = new_words
    return merges


def test_bpe_merge_learn_matches_python_reference(spark):
    rows = QUERIES["llm_bpe_merge_learn"].fn(spark, SF_DIR_SMOKE).collect()
    assert rows
    got = [(r.step, r.left, r.right, r.pair_count) for r in rows]
    wc: collections.Counter = collections.Counter()
    for r in load(spark, SF_DIR_SMOKE, "documents").select("text").collect():
        for w in r.text.split(" "):
            if w:
                wc[w] += 1
    want = _reference_bpe(dict(wc), len(got))
    assert got == want, (got[:3], want[:3])


def test_bpe_merged_tokens_chain(spark):
    rows = QUERIES["llm_bpe_merge_learn"].fn(spark, SF_DIR).collect()
    assert len(rows) == 6
    assert [r.step for r in rows] == [1, 2, 3, 4, 5, 6]
    vocab = set()
    for r in rows:
        # every merge input is a single char or a previously-learned merge
        for side in (r.left, r.right):
            assert len(side) == 1 or side in vocab, r
        vocab.add(r.left + r.right)
        assert r.pair_count > 0
