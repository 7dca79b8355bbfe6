"""Semantic property tests for extension pack 14 (extended14.py)."""

from __future__ import annotations

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()


def test_matryoshka_overlap_monotone_in_prefix_length(spark):
    rows = QUERIES["emb_matryoshka_eval"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    total16 = total32 = 0
    for r in rows:
        assert 0 <= r.overlap16_at5 <= 5 and 0 <= r.overlap32_at5 <= 5, r
        assert r.top1_match32 in (0, 1)
        total16 += r.overlap16_at5
        total32 += r.overlap32_at5
    # a longer prefix can only carry more of the full-vector structure
    # (statistically — individual queries may flip, the mean must not)
    assert total32 > total16, (total16, total32)
    # isotropic random embeddings: truncation recall must be POOR -- the
    # audit's entire reason to exist is detecting exactly this
    assert total16 / len(rows) < 2.5
    # ...but nonzero: prefixes still share 16/64 of the energy
    assert total16 > 0


def test_matryoshka_consistency_with_exact_topk(spark):
    # the full-vector (64-dim) ranking inside this key must agree with
    # the standalone exact top-5 key on the same discipline
    top = QUERIES["llm_similarity_topk"].fn(spark, SF_DIR).collect()
    by_q: dict[int, set] = {}
    for r in top:
        by_q.setdefault(r.qid, set()).add(r.nid)
    rows = QUERIES["emb_matryoshka_eval"].fn(spark, SF_DIR).collect()
    # overlap32 counts intersections against exactly those top-5 sets:
    # overlap can never exceed the size of the reference set
    for r in rows[:50]:
        assert r.overlap32_at5 <= len(by_q[r.qid]) == 5
