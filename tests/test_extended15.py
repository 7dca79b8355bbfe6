"""Semantic property tests for extension pack 15 (extended15.py)."""

from __future__ import annotations

import hashlib

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE

load_all_modules()

_MAXLONG = 9223372036854775807


def _fingerprints(text: str) -> set:
    """Pure-python reference: 4-word shingle hashes, strict local-min
    selection over a +-3 window."""
    w = text.split(" ")
    n = max(1, len(w) - 3)
    hs = [
        int(hashlib.md5(" ".join(w[i : i + 4]).encode()).hexdigest()[:15], 16)
        for i in range(n)
    ]
    out = set()
    for i, h in enumerate(hs):
        prev_min = min(hs[max(0, i - 3) : i], default=_MAXLONG)
        next_min = min(hs[i + 1 : i + 4], default=_MAXLONG)
        if h <= prev_min and h < next_min:
            out.add(h)
    return out


def test_winnowing_matches_python_reference(spark):
    rows = QUERIES["llm_fingerprint_winnowing"].fn(spark, SF_DIR_SMOKE).collect()
    docs = load(spark, SF_DIR_SMOKE, "documents").select("doc_id", "text").collect()
    fps = {r.doc_id: _fingerprints(r.text) for r in docs}
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b])
            if shared >= 3:
                want[(a, b)] = shared
    got = {(r.doc_a, r.doc_b): r.shared_fp for r in rows}
    assert got == want


def test_winnowing_is_alignment_robust(spark):
    # the property that justifies winnowing: a document trivially shares
    # all its fingerprints with itself, and near-dup pairs found by the
    # key must share actual shingles (not hash accidents, at 60 bits)
    rows = QUERIES["llm_fingerprint_winnowing"].fn(spark, SF_DIR).collect()
    assert rows  # the sf0.01 corpus has near-dup pairs (24 measured)
    docs = {
        r.doc_id: r.text
        for r in load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    for r in rows[:10]:
        a, b = docs[r.doc_a], docs[r.doc_b]
        sh_a = {" ".join(a.split(" ")[i : i + 4]) for i in range(max(1, len(a.split(" ")) - 3))}
        sh_b = {" ".join(b.split(" ")[i : i + 4]) for i in range(max(1, len(b.split(" ")) - 3))}
        # every reported pair shares at least shared_fp literal shingles
        assert len(sh_a & sh_b) >= r.shared_fp, (r.doc_a, r.doc_b)
