"""Semantic property tests for extension pack 56 (extended56.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from classification_problem_with_pyspark_spark.operators.extended56 import (
    N_SEEDS,
    SYNC_FIX_MS,
    SYNC_OK_MS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _h(prefix: str, key: int) -> int:
    return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:15], 16)


def test_farthest_first_seeds_match_python_greedy(spark):
    rows = sorted(
        QUERIES["emb_farthest_first_seeds"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.pick_order,
    )
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }

    def d(a, b):
        return round(math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b))), 6)

    chosen = [min(vecs)]
    dists = [0.0]
    for _ in range(N_SEEDS):
        best = None
        for vid, emb in vecs.items():
            if vid in chosen:
                continue
            near = min(d(emb, vecs[c]) for c in chosen)
            key = (-near, vid)
            if best is None or key < best[0]:
                best = (key, vid, near)
        chosen.append(best[1])
        dists.append(best[2])
    assert [r.vec_id for r in rows] == chosen
    assert [r.pick_order for r in rows] == list(range(N_SEEDS + 1))
    for r, expect in zip(rows[1:], dists[1:]):
        assert abs(r.d_to_nearest_prior - expect) < 2e-6
    # k-center radius curve: the greedy's pick distances never increase
    ds = [r.d_to_nearest_prior for r in rows[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(ds, ds[1:]))
    assert ds[0] > 0


def test_av_sync_audit_matches_python_census(spark):
    rows = {(r.source, r.verdict): r for r in QUERIES["multimodal_av_sync_audit"].fn(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for doc in docs:
        audio = 30000 + _h("adur_", doc.doc_id) % 60000
        video = audio + _h("vdrift_", doc.doc_id) % 600 - 300
        drift = abs(video - audio)
        verdict = (
            "in_sync" if drift <= SYNC_OK_MS
            else "degraded" if drift <= SYNC_FIX_MS
            else "remux"
        )
        a = agg[(doc.source, verdict)]
        a[0] += 1
        a[1] = max(a[1], drift)
        a[2] += drift
    assert set(rows) == set(agg)
    for key, (n, mx, tot) in agg.items():
        r = rows[key]
        assert (r.n_media, r.max_drift_ms, r.total_drift_ms) == (n, mx, tot)
    # all three verdict classes genuinely occur across the corpus
    assert {v for _, v in rows} == {"in_sync", "degraded", "remux"}
