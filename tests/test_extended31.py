"""Semantic property tests for extension pack 31 (extended31.py)."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_cohen_kappa_consistent_with_langid(spark):
    rows = QUERIES["ml_cohen_kappa"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    langid = QUERIES["llm_langid"].fn(spark, SF_DIR).collect()
    assert r.n_docs == len(langid)
    assert r.n_agree == sum(1 for x in langid if x.is_match)
    assert r.accuracy_micro == 1_000_000 * r.n_agree // r.n_docs
    conf = collections.Counter(
        (x.tagged_lang, x.predicted_lang) for x in langid
    )
    rowt = collections.Counter()
    colt = collections.Counter()
    for (t, p), c in conf.items():
        rowt[t] += c
        colt[p] += c
    sum_rc = sum(rowt[k] * colt.get(k, 0) for k in rowt)
    assert r.sum_rc == sum_rc
    n, tr = r.n_docs, r.n_agree
    assert r.kappa_micro == (1_000_000 * (n * tr - sum_rc)) // (n * n - sum_rc)
    # kappa strictly below raw accuracy: chance agreement is nonzero
    assert r.kappa_micro < r.accuracy_micro


def test_bucket_purity_consistent_with_signatures(spark):
    purity = QUERIES["emb_bucket_label_purity"].fn(spark, SF_DIR).collect()
    sigs = QUERIES["emb_srp_signature"].fn(spark, SF_DIR).collect()
    by_sig = collections.defaultdict(collections.Counter)
    for s in sigs:
        by_sig[s.signature][s.label] += 1
    multi = {k: v for k, v in by_sig.items() if sum(v.values()) >= 2}
    assert len(purity) == len(multi)
    for r in purity:
        labels = multi[r.signature]
        assert r.bucket_size == sum(labels.values())
        best = sorted(labels.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r.top_label, r.top_n) == best
        assert r.purity_micro == 1_000_000 * r.top_n // r.bucket_size


def test_runs_test_replay(spark):
    rows = QUERIES["agg_runs_test"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    daily = (
        load(spark, SF_DIR, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "cents"
            )
        )
        .collect()
    )
    cents = sorted(x.cents for x in daily)
    n_all = len(cents)
    median2 = cents[(n_all + 1) // 2 - 1] + cents[n_all // 2]
    seq = [
        1 if 2 * x.cents > median2 else 0
        for x in sorted(daily, key=lambda x: x.day)
        if 2 * x.cents != median2
    ]
    n1 = sum(seq)
    n2 = len(seq) - n1
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert (r.n_above, r.n_below, r.n_runs) == (n1, n2, runs)
    n = n1 + n2
    d = (runs - 1) * n - 2 * n1 * n2
    assert r.z_sign == (1 if d > 0 else -1 if d < 0 else 0)
    assert r.z_sq_micro == ((d * d) // (2 * n1 * n2)) * (n - 1) * 1_000_000 // (
        2 * n1 * n2 - n
    )
