"""Semantic property tests for extension pack 40 (extended40.py)."""

from __future__ import annotations

import collections
import hashlib

from classification_problem_with_pyspark_spark.operators.extended26 import (
    _POISSON_CDF_MICRO,
)
from classification_problem_with_pyspark_spark.operators.extended40 import AUC_B
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()


def test_mcnemar_cells_tie_to_langid(spark):
    r = QUERIES["ml_mcnemar_test"].fn(spark, SF_DIR).collect()[0]
    langid = QUERIES["llm_langid"].fn(spark, SF_DIR).collect()
    cells = collections.Counter()
    for x in langid:
        a = x.is_match
        b = x.tagged_lang == "en"
        cells[(a, b)] += 1
    assert r.both_right == cells[(True, True)]
    assert r.only_a == cells[(True, False)]
    assert r.only_b == cells[(False, True)]
    assert r.both_wrong == cells[(False, False)]
    total = sum(cells.values())
    assert r.both_right + r.only_a + r.only_b + r.both_wrong == total
    d = r.only_a - r.only_b
    assert r.chi2_micro == (1_000_000 * d * d) // (r.only_a + r.only_b)


def _poisson_w(u: int) -> int:
    for k, t in enumerate(_POISSON_CDF_MICRO):
        if u < t:
            return k
    return 8


def test_auc_bootstrap_ci_replays(spark):
    r = QUERIES["ml_auc_bootstrap_ci"].fn(spark, SF_DIR).collect()[0]
    from classification_problem_with_pyspark_spark.operators.extended27 import _scored

    cohort = _scored(spark, SF_DIR).collect()
    aucs = []
    for b in range(AUC_B):
        grid = collections.defaultdict(lambda: [0, 0])
        for s in cohort:
            u = int(
                hashlib.md5(
                    f"aucboot_{b}_{s.user_id}".encode()
                ).hexdigest()[:15],
                16,
            ) % 1_000_000
            w = _poisson_w(u)
            g = grid[s.score]
            g[0] += w
            g[1] += w * s.label
        before = 0
        r1_2 = n1 = n0 = 0
        for score in sorted(grid):
            c, p = grid[score]
            r1_2 += p * (2 * before + c + 1)
            n1 += p
            n0 += c - p
            before += c
        if n1 > 0 and n0 > 0:
            aucs.append((1_000_000 * (r1_2 - n1 * (n1 + 1))) // (2 * n1 * n0))
    aucs.sort()
    assert r.n_replicates == len(aucs)
    assert r.ci_lo_micro == aucs[1]
    assert r.ci_hi_micro == aucs[len(aucs) - 2]
    # the CI brackets the point AUC from the exact key
    point = QUERIES["ml_auc_exact"].fn(spark, SF_DIR).collect()[0].auc_micro
    assert r.ci_lo_micro <= point <= r.ci_hi_micro
    assert r.ci_lo_micro < r.ci_hi_micro
