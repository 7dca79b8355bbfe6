"""Semantic property tests for extension pack 71 (extended71.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from classification_problem_with_pyspark_spark.operators.extended71 import (
    DEFECT_GATE,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_index_of_coincidence_matches_python_counts(spark):
    rows = {r.lang: r for r in QUERIES["llm_index_of_coincidence"].fn(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("lang", "text").collect()
    counts = defaultdict(Counter)
    for d in docs:
        for ch in d.text.lower():
            if "a" <= ch <= "z":
                counts[d.lang][ch] += 1
    assert set(rows) == set(counts)
    for lang, c in counts.items():
        n = sum(c.values())
        coinc = sum(v * (v - 1) for v in c.values())
        r = rows[lang]
        assert r.n == n
        assert r.n_distinct_letters == len(c)
        assert r.ic_micro == 1_000_000 * coinc // (n * (n - 1))
        # natural language sits well above uniform-random (1/26 ≈ 38461µ)
        assert 38_461 < r.ic_micro < 120_000


def test_p_chart_verdicts_are_exact_and_match_float_form(spark):
    rows = {r.day: r for r in QUERIES["events_p_chart_control_limits"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("ts", "value").collect()
    daily = defaultdict(lambda: [0, 0])
    for e in ev:
        d = e.ts.strftime("%Y-%m-%d")
        daily[d][0] += 1
        daily[d][1] += 1 if e.value > DEFECT_GATE else 0
    N = sum(v[0] for v in daily.values())
    X = sum(v[1] for v in daily.values())
    assert set(rows) == set(daily)
    for day, (n_d, x_d) in daily.items():
        r = rows[day]
        assert (r.n_d, r.x_d) == (n_d, x_d)
        assert r.p_micro == 1_000_000 * x_d // n_d
        assert r.center_micro == 1_000_000 * X // N
        # the integer verdict equals the float-form 3σ test
        exact = (x_d * N - n_d * X) ** 2 > 9 * X * (N - X) * n_d
        assert r.out_of_control == exact
        pbar = X / N
        float_form = abs(x_d / n_d - pbar) > 3 * math.sqrt(
            pbar * (1 - pbar) / n_d
        )
        assert exact == float_form
        assert abs(
            r.sigma3_halfwidth - 3 * math.sqrt(pbar * (1 - pbar) / n_d)
        ) < 2e-6
    # a stable process: mostly in control (md5-free real data, no injection)
    ooc = sum(1 for r in rows.values() if r.out_of_control)
    assert ooc < len(rows) / 2
