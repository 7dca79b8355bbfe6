"""Semantic property tests for extension pack 99 (extended99.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended99 import (
    LOOK_GATE,
    OBF_BOUNDS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_group_sequential_aa_never_crosses(spark):
    rows = {r.look: r for r in QUERIES["events_group_sequential_looks"].fn(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events").select("event_id", "ts", "value").collect()
    weekly = defaultdict(lambda: [0, 0, 0, 0])
    for e in ev:
        wk = (e.ts.day - 1) // 7
        if wk > 3:
            continue
        arm = int(hashlib.md5(f"arm_{e.event_id}".encode()).hexdigest()[:15], 16) % 2
        conv = 1 if e.value > LOOK_GATE else 0
        a = weekly[wk]
        a[arm] += 1
        a[2 + arm] += conv
    cn0 = cn1 = cc0 = cc1 = 0
    for wk in range(4):
        n0, n1, c0, c1 = weekly[wk]
        cn0 += n0
        cn1 += n1
        cc0 += c0
        cc1 += c1
        p = (cc0 + cc1) / (cn0 + cn1)
        z = (cc1 / cn1 - cc0 / cn0) / math.sqrt(
            p * (1 - p) * (1 / cn0 + 1 / cn1)
        )
        r = rows[wk + 1]
        assert r.cum_n == cn0 + cn1
        assert r.cum_conversions == cc0 + cc1
        assert abs(r.z - z) < 2e-6
        assert abs(r.boundary - OBF_BOUNDS[wk]) < 1e-9
        assert r.crossed == (abs(round(z, 6)) > OBF_BOUNDS[wk])
    # an A/A on a hash coin: no interim boundary crosses (the null
    # behavior group-sequential monitoring must exhibit)
    assert not any(r.crossed for r in rows.values())
    # boundaries tighten monotonically toward the final look
    bs = [rows[k].boundary for k in sorted(rows)]
    assert bs == sorted(bs, reverse=True)


def test_bitpack_roundtrip_is_lossless_and_injective(spark):
    row = QUERIES["scalar_bitpack_roundtrip_suite"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).collect()
    triples = {(r.l_partkey, r.l_suppkey, int(r.l_quantity)) for r in li}
    words = {
        (p << 32) | (s << 12) | q for p, s, q in triples
    }
    assert row.n_rows == len(li)
    assert row.n_roundtrip_ok == len(li)  # every row unpacks exactly
    assert row.n_distinct_words == len(words)
    assert row.n_distinct_triples == len(triples)
    assert row.n_distinct_words == row.n_distinct_triples  # injectivity
    assert row.min_word == min(words)
    assert row.max_word == max(words)
    # field widths genuinely hold the domains (qty < 2^12, supp < 2^20)
    assert all(q < 4096 and s < 1048576 for _, s, q in triples)
