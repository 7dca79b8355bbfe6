"""Quality gates for the rows-only keys that had no dedicated test
(round-5, VERDICT r4 "Next round #6"): every rows-only key must earn its
place with a quantitative assertion, not just "it ran". The other
rows-only keys' gates live in test_ann_quality.py / test_ml.py /
test_streaming.py / test_scale_helpers.py etc. — the full key→gate map is
the SURVEY.md §5 rows-only table.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE

load_all_modules()


def test_approx_distinct_within_hll_error(spark):
    """agg_approx_distinct: HLL at rsd=0.01 must land within 5% of the
    exact per-type distinct user count (generous vs the 1% rsd, tight
    enough to catch a wrong column or grouping)."""
    got = {
        r.event_type: r.approx_users
        for r in QUERIES["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and got
    for t, n in exact.items():
        assert abs(got[t] - n) <= max(2, 0.05 * n), (t, got[t], n)


def test_kmeans_partitions_all_vectors(spark):
    """ml_cluster_kmeans: cluster ids in [0,8), every vector assigned
    exactly once (sizes sum to the table), and no degenerate single
    mega-cluster."""
    rows = QUERIES["ml_cluster_kmeans"].fn(spark, SF_DIR).collect()
    n_vecs = load(spark, SF_DIR, "embeddings").count()
    assert all(0 <= r.cluster < 8 for r in rows)
    assert sum(r.member_cnt for r in rows) == n_vecs
    assert len(rows) >= 2 and max(r.member_cnt for r in rows) < n_vecs


def test_text_features_norms_positive_and_complete(spark):
    """ml_text_features: one row per lang, doc counts conserved, and the
    trained TF-IDF / Word2Vec norms are strictly positive (a zero norm
    means the pipeline silently emptied a column)."""
    rows = QUERIES["ml_text_features"].fn(spark, SF_DIR).collect()
    by_lang = {
        r.lang: r.n
        for r in load(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r.lang: r.n_docs for r in rows} == by_lang
    for r in rows:
        assert r.avg_tfidf_norm > 0 and r.avg_w2v_norm > 0, r


def test_logreg_confusion_conserves_the_test_set(spark):
    """ml_train_logreg: confusion-matrix cells exactly cover the seeded
    test split (conservation is the strongest checkable property here —
    the synthetic embeddings are noise w.r.t. the label, so a skill gate
    would pin luck, not plumbing)."""
    from classification_problem_with_pyspark_spark.operators.ml import (
        _embedding_features,
        split_train_test,
    )

    rows = QUERIES["ml_train_logreg"].fn(spark, SF_DIR).collect()
    assert all(r.label in (0, 1) and r.prediction in (0, 1) for r in rows)
    _, test = split_train_test(_embedding_features(spark, SF_DIR))
    assert sum(r.cnt for r in rows) == test.count() > 0


def test_tree_ensembles_report_sane_accuracy(spark):
    """ml_train_trees: all three ensemble rows present, accuracy a real
    probability (noise features → no skill floor beyond 'not absurd')."""
    rows = {r.model: r.accuracy for r in QUERIES["ml_train_trees"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"decision_tree", "random_forest", "gbt"}
    for m, acc in rows.items():
        assert 0.0 < acc <= 1.0, (m, acc)


def test_other_classifiers_report_sane_accuracy(spark):
    """ml_train_others: NaiveBayes + LinearSVC rows present with a real
    probability for accuracy — a collapsed 0.0 means a broken feature
    path (NB's non-negativity transform, SVC's raw vector)."""
    rows = {r.model: r.accuracy for r in QUERIES["ml_train_others"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"naive_bayes", "linear_svc"}
    for m, acc in rows.items():
        assert 0.0 < acc <= 1.0, (m, acc)


def test_multiclass_reports_all_models_in_range(spark):
    """ml_train_multiclass: all three 10-class models report, accuracy a
    real probability and not the all-zeros of a dead pipeline. (The
    fixture's features carry no label signal — measured ≈0.05–0.11 vs
    majority 0.118 — so beating a baseline is NOT a valid gate here;
    per-model determinism under seed is covered by ml_train_fm's twin.)"""
    rows = {
        r.model: r.accuracy
        for r in QUERIES["ml_train_multiclass"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"logreg_multinomial", "one_vs_rest_svc", "mlp_64_32_10"}
    for m, acc in rows.items():
        assert 0.0 < acc <= 1.0, (m, acc)


def test_cv_grid_marks_exactly_the_argmax(spark):
    """ml_tune_cv: full 2×2 grid reported, exactly one best row, and the
    flag sits on the max mean AUC (ties broken by MLlib's first-max —
    assert the flagged metric equals the max)."""
    rows = QUERIES["ml_tune_cv"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    assert best[0].mean_auc == max(r.mean_auc for r in rows)
    assert all(0.0 <= r.mean_auc <= 1.0 for r in rows)


def test_stateful_totals_key_matches_batch(spark):
    """stream_stateful_user_totals (the registry key itself, not just the
    underlying transform): the FINAL running total per user emitted by
    the applyInPandasWithState stream equals the batch groupBy. Update
    mode may emit one row per user per micro-batch — the final one is
    the max event_cnt."""
    out = QUERIES["stream_stateful_user_totals"].fn(spark, SF_DIR_SMOKE).collect()
    final: dict[int, tuple[int, float]] = {}
    for r in out:
        if r.user_id not in final or r.event_cnt > final[r.user_id][0]:
            final[r.user_id] = (r.event_cnt, r.value_sum)
    batch = {
        r.user_id: (r.cnt, round(r.vs, 2))
        for r in load(spark, SF_DIR_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("vs"))
        .collect()
    }
    assert set(final) == set(batch)
    for u, (cnt, vs) in batch.items():
        assert final[u][0] == cnt, (u, final[u], cnt)
        assert abs(final[u][1] - vs) < 0.02, (u, final[u], vs)


def test_watermark_demo_accounting_is_consistent(spark):
    """stream_watermark_demo: hourly counts conserve the event total and
    the finalized flag is exactly 'window end ≤ max_ts − 10 min'."""
    rows = QUERIES["stream_watermark_demo"].fn(spark, SF_DIR_SMOKE).collect()
    e = load(spark, SF_DIR_SMOKE, "events")
    assert sum(r.event_cnt for r in rows) == e.count()
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    for r in rows:
        start = dt.datetime.strptime(r.hour_start, "%Y-%m-%d %H:%M:%S")
        expected = start + dt.timedelta(hours=1) <= max_ts - dt.timedelta(minutes=10)
        assert r.finalized_by_watermark == expected, (r, max_ts)
    assert any(r.finalized_by_watermark for r in rows)
