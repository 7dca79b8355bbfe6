"""Semantic property tests for extension pack 35 (extended35.py)."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.operators.extended35 import (
    LEN_BUCKET,
    SUM_BUCKET,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_fingerprint_buckets_match_bruteforce(spark):
    rows = QUERIES["multimodal_payload_fingerprint_buckets"].fn(
        spark, SF_DIR
    ).collect()
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    fp = {}
    for d in docs:
        bl = len(d.text)
        bs = sum(ord(c) for c in d.text)
        fp[d.doc_id] = (bl, bs, f"{bl // LEN_BUCKET}:{bs // SUM_BUCKET}")
    occupancy = collections.Counter(v[2] for v in fp.values())
    expect_ids = {k for k, v in fp.items() if occupancy[v[2]] >= 2}
    assert {r.media_id for r in rows} == expect_ids
    for r in rows:
        bl, bs, bid = fp[r.media_id]
        assert (r.byte_len, r.byte_sum, r.bucket_id) == (bl, bs, bid)
        assert r.bucket_size == occupancy[bid]
        assert r.bucket_size >= 2


def test_fingerprint_buckets_group_similar_payloads(spark):
    # co-bucketed payloads are closer in the quantized metric than the
    # population average: max in-bucket length spread is bounded by the
    # bucket width, while the global length spread is much larger
    rows = QUERIES["multimodal_payload_fingerprint_buckets"].fn(
        spark, SF_DIR
    ).collect()
    by_bucket = collections.defaultdict(list)
    for r in rows:
        by_bucket[r.bucket_id].append(r.byte_len)
    for lens in by_bucket.values():
        assert max(lens) - min(lens) < LEN_BUCKET
    all_lens = [r.byte_len for r in rows]
    assert max(all_lens) - min(all_lens) > 10 * LEN_BUCKET


def test_length_bias_recomputes_from_pairs(spark):
    rows = QUERIES["llm_preference_length_bias"].fn(spark, SF_DIR).collect()
    pairs = QUERIES["llm_preference_pairs"].fn(spark, SF_DIR).collect()
    lens = {
        r.doc_id: r.n
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    agg = collections.defaultdict(lambda: [0, 0, 0])  # n, longer, gapsum
    for p in pairs:
        cl = lens[p.chosen_doc_id]
        rl = lens[p.rejected_doc_id]
        a = agg[p.lang]
        a[0] += 1
        a[1] += 1 if cl > rl else 0
        a[2] += cl - rl
    assert len(rows) == len(agg)
    for r in rows:
        n, longer, gap = agg[r.lang]
        assert (r.n_pairs, r.n_chosen_longer) == (n, longer)
        assert r.longer_share_micro == 1_000_000 * longer // n
        q = abs(1_000_000 * gap) // n
        assert r.mean_gap_micro == (q if gap >= 0 else -q)
    # the audit covers every pair exactly once
    assert sum(r.n_pairs for r in rows) == len(pairs)
