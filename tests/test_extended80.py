"""Semantic property tests for extension pack 80 (extended80.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended80 import (
    PRE_MAX_DAY,
    SWAP_MOD,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_cuped_matches_python_identity(spark):
    row = QUERIES["events_cuped_variance_reduction"].fn(spark, SF_DIR).collect()[0]
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    per = defaultdict(lambda: [0, 0])
    for e in ev:
        c = math.floor(e.value * 100 + 0.5)
        if e.ts.day <= PRE_MAX_DAY:
            per[e.user_id][0] += c
        else:
            per[e.user_id][1] += c
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    assert row.n == n
    assert abs(row.theta - cov_n / varx_n) < 1e-5
    rho2 = cov_n * cov_n / (varx_n * vary_n)
    assert abs(row.corr_squared - rho2) < 1e-5
    assert abs(row.var_ratio - (1 - rho2)) < 1e-5
    # the Deng-Kohavi identity: ratio + rho2 == 1 (up to rounding)
    assert abs(row.var_ratio + row.corr_squared - 1.0) < 3e-6
    # this fixture's per-user pre/post spends are near-independent, so
    # CUPED honestly reports tiny-but-positive savings — the identity
    # (not a big number) is what the key certifies
    assert row.corr_squared > 0
    assert 0 < row.var_ratio < 1


def test_pair_integrity_flags_exactly_the_swapped_captions(spark):
    rows = {r.source: r for r in QUERIES["multimodal_pair_integrity_audit"].fn(spark, SF_DIR).collect()}
    docs = sorted(
        load(spark, SF_DIR, "documents").select("doc_id", "source", "text").collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    per_src = defaultdict(list)
    for d in docs:
        per_src[d.source].append(d)
    assert set(rows) == set(per_src)
    for src, ds in per_src.items():
        n = len(ds)
        mispaired = 0
        for i, d in enumerate(ds, start=1):
            if i % SWAP_MOD == 0:
                partner = ds[i % n]  # rn % n + 1 in 1-based = ds[i % n] 0-based
                own = hashlib.md5(d.text.encode()).hexdigest()
                other = hashlib.md5(partner.text.encode()).hexdigest()
                if other != own:
                    mispaired += 1
        r = rows[src]
        assert r.n_pairs == n
        assert r.n_mispaired == mispaired
        assert r.n_intact == n - mispaired
        assert r.mispair_micro == 1_000_000 * mispaired // n
    # the injected damage is genuinely present and localized (~1/SWAP_MOD)
    total = sum(r.n_pairs for r in rows.values())
    bad = sum(r.n_mispaired for r in rows.values())
    assert 0 < bad <= total // SWAP_MOD + len(rows)
