"""Semantic property tests for extension pack 47 (extended47.py)."""

from __future__ import annotations

import hashlib
import math

from classification_problem_with_pyspark_spark.operators.extended47 import (
    LONG_SIDE_CAP,
    PATCH,
    PQ_ANCHOR_MOD,
    PQ_M,
    PQ_SUBDIM,
    TOKEN_BUDGET,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def _h(prefix: str, key: int) -> int:
    return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:15], 16)


def test_pq_assignment_matches_python_argmin(spark):
    rows = QUERIES["emb_pq_codebook_assign"].fn(spark, SF_DIR).collect()
    vecs = {
        r.vec_id: list(r.embedding)
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    anchors = {v: e for v, e in vecs.items() if _h("pq_", v) % PQ_ANCHOR_MOD == 0}
    assert len(anchors) > 4  # codebook genuinely non-trivial
    assert len(rows) == len(vecs) * PQ_M
    got = {(r.vec_id, r.subspace): (r.code, r.code_dist) for r in rows}
    for vid, emb in list(vecs.items())[:60]:  # spot-check a prefix
        for s in range(PQ_M):
            lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
            best = min(
                (
                    (
                        round(
                            math.sqrt(
                                sum(
                                    (float(a) - float(b)) ** 2
                                    for a, b in zip(emb[lo:hi], c[lo:hi])
                                )
                            ),
                            6,
                        ),
                        cid,
                    )
                    for cid, c in anchors.items()
                ),
            )
            code, dist = got[(vid, s)]
            assert code == best[1]
            assert abs(dist - best[0]) < 2e-6  # replay fp noise only
    # every anchor quantizes itself with zero error in every subspace
    for cid in anchors:
        for s in range(PQ_M):
            assert got[(cid, s)] == (cid, 0.0)


def test_patch_grid_budget_matches_python_replay(spark):
    rows = {r.source: r for r in QUERIES["multimodal_patch_grid_budget"].fn(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    agg = {}
    for d in docs:
        w = 256 + _h("w_", d.doc_id) % 1280
        h = 256 + _h("h_", d.doc_id) % 800
        raw = math.ceil(w / PATCH) * math.ceil(h / PATCH)
        if raw > TOKEN_BUDGET:
            if w >= h:
                ow, oh = LONG_SIDE_CAP, h * LONG_SIDE_CAP // w
            else:
                ow, oh = w * LONG_SIDE_CAP // h, LONG_SIDE_CAP
            down = 1
        else:
            ow, oh, down = w, h, 0
        out = math.ceil(ow / PATCH) * math.ceil(oh / PATCH)
        a = agg.setdefault(d.source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += down
        a[2] += raw
        a[3] += out
        a[4] = max(a[4], raw)
    assert set(rows) == set(agg)
    for src, (n, nd, raw, budget, mx) in agg.items():
        r = rows[src]
        assert (r.n_images, r.n_downscaled, r.raw_tokens, r.budget_tokens, r.max_raw_tokens) == (
            n,
            nd,
            raw,
            budget,
            mx,
        )
        # downscale always lands within budget (cap chosen so 512/16=32²=1024)
        assert r.budget_tokens <= r.n_images * TOKEN_BUDGET
    assert any(r.n_downscaled > 0 for r in rows.values())  # rule genuinely fires
