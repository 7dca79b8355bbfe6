"""Semantic property tests for extension pack 27 (extended27.py)."""

from __future__ import annotations

from fractions import Fraction

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_roc_curve_confusion_identities(spark):
    rows = QUERIES["ml_roc_curve_threshold"].fn(spark, SF_DIR).collect()
    assert rows
    pos = rows[0].tp + rows[0].fn
    neg = rows[0].fp + rows[0].tn
    prev_tp = prev_fp = 0
    for r in rows:  # thresholds descending: counts must only grow
        assert r.tp + r.fn == pos and r.fp + r.tn == neg
        assert r.tp >= prev_tp and r.fp >= prev_fp
        prev_tp, prev_fp = r.tp, r.fp
        assert r.tpr_micro == 1_000_000 * r.tp // pos
        assert r.fpr_micro == 1_000_000 * r.fp // neg
        assert r.precision_micro == 1_000_000 * r.tp // (r.tp + r.fp)
    # the loosest threshold classifies everyone positive
    assert rows[-1].tp == pos and rows[-1].fp == neg


def test_auc_equals_roc_trapezoid_exactly(spark):
    auc = QUERIES["ml_auc_exact"].fn(spark, SF_DIR).collect()[0]
    roc = QUERIES["ml_roc_curve_threshold"].fn(spark, SF_DIR).collect()
    pos = auc.n_pos
    neg = auc.n_neg
    # trapezoid over the exact (fp, tp) staircase, in rationals —
    # the rank-sum midrank AUC is exactly this area (ties ↔ diagonals)
    pts = [(0, 0)] + [(r.fp, r.tp) for r in roc]
    area = Fraction(0)
    for (fp0, tp0), (fp1, tp1) in zip(pts, pts[1:]):
        area += Fraction((fp1 - fp0) * (tp1 + tp0), 2)
    auc_frac = area / (pos * neg)
    assert auc.auc_micro == (1_000_000 * auc_frac.numerator) // auc_frac.denominator
    # the early-activity model genuinely ranks (sf0.01: ~0.58)
    assert 520_000 < auc.auc_micro < 680_000


def test_calibration_table_accounts_for_everyone(spark):
    rows = QUERIES["ml_calibration_by_score"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_users
    pos = sum(r.n_pos for r in rows)
    for r in rows:
        assert 0 <= r.n_pos <= r.n
        assert r.pos_rate_micro == 1_000_000 * r.n_pos // r.n
        assert r.base_rate_micro == 1_000_000 * pos // n_users
        assert r.lift_micro == 1_000_000 * r.n_pos * n_users // (r.n * pos)
    # some segment must beat the base rate for the AUC signal to exist
    assert any(r.lift_micro > 1_000_000 for r in rows)
