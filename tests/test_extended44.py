"""Semantic property tests for extension pack 44 (extended44.py)."""

from __future__ import annotations

import hashlib

from classification_problem_with_pyspark_spark.operators.extended44 import (
    FLIP_MOD,
    LIFT_BOOST,
    LIFT_K,
    N_CLASSES,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _h(prefix: str, vec_id: int) -> int:
    return int(hashlib.md5(f"{prefix}{vec_id}".encode()).hexdigest()[:15], 16)


def _labels(spark):
    return [
        (r.vec_id, r.label)
        for r in load(spark, SF_DIR, "embeddings").select("vec_id", "label").collect()
    ]


def test_classification_report_matches_python_replay(spark):
    rows = {r["class"]: r for r in QUERIES["ml_classification_report_exact"].fn(spark, SF_DIR).collect()}
    pairs = _labels(spark)
    tp = [0] * N_CLASSES
    support = [0] * N_CLASSES
    n_pred = [0] * N_CLASSES
    for vec_id, y in pairs:
        yhat = (y + 1) % N_CLASSES if _h("clf_", vec_id) % FLIP_MOD == 0 else y
        support[y] += 1
        n_pred[yhat] += 1
        if y == yhat:
            tp[y] += 1
    f1s = []
    for c in range(N_CLASSES):
        r = rows[c]
        assert (r.support, r.n_predicted, r.tp) == (support[c], n_pred[c], tp[c])
        p = 1_000_000 * tp[c] // max(1, n_pred[c])
        rec = 1_000_000 * tp[c] // max(1, support[c])
        f1 = (2 * p * rec) // max(1, p + rec)
        assert (r.precision_micro, r.recall_micro, r.f1_micro) == (p, rec, f1)
        f1s.append(f1)
    any_row = rows[0]
    assert any_row.macro_f1_micro == sum(f1s) // N_CLASSES
    assert any_row.accuracy_micro == 1_000_000 * sum(tp) // len(pairs)
    # the stand-in predictor is genuinely noisy but mostly right
    assert 600_000 < any_row.accuracy_micro < 950_000


def test_lift_deciles_partition_and_monotone_gain(spark):
    rows = sorted(
        QUERIES["ml_lift_gain_deciles"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    pairs = _labels(spark)
    n = len(pairs)
    p_total = sum(1 for _, lab in pairs if lab == 0)
    assert [r.decile for r in rows] == list(range(1, LIFT_K + 1))
    assert sum(r.n_rows for r in rows) == n
    assert sum(r.n_pos for r in rows) == p_total
    # replay decile assignment: sort by (score desc, vec_id), ntile split
    scored = sorted(
        (
            -(_h("lift_", v) % 1_000_000 + (LIFT_BOOST if lab == 0 else 0)),
            v,
            lab,
        )
        for v, lab in pairs
    )
    base, rem = divmod(n, LIFT_K)
    idx = 0
    cum = 0
    for d, r in enumerate(rows, start=1):
        size = base + (1 if d <= rem else 0)
        chunk = scored[idx : idx + size]
        idx += size
        n_pos = sum(1 for s in chunk if s[2] == 0)
        assert r.n_rows == size
        assert r.n_pos == n_pos
        assert r.min_score_micro == -chunk[-1][0] if chunk else True
        cum += n_pos
        assert r.cum_gain_micro == 1_000_000 * cum // p_total
        assert r.lift_micro == (1_000_000 * n_pos * n) // (size * p_total)
    # gains are cumulative and end at 100%
    gains = [r.cum_gain_micro for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000
    # the boosted score concentrates positives up front: decile-1 lift > 1
    assert rows[0].lift_micro > 1_000_000
