"""Semantic property tests for extension pack 98 (extended98.py)."""

from __future__ import annotations

from collections import defaultdict

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_semver_ordering_diverges_from_lexical(spark):
    rows = {r.supp_key: r for r in QUERIES["scalar_semver_ordering_suite"].fn(spark, SF_DIR).collect()}
    sup = [r.s_suppkey for r in load(spark, SF_DIR, "supplier").collect()]
    vers = {
        k: (k % 3, k % 13, k % 7) for k in sup
    }
    by_num = sorted(sup, key=lambda k: (vers[k][0] * 10**6 + vers[k][1] * 10**3 + vers[k][2], k))
    by_lex = sorted(sup, key=lambda k: (f"{vers[k][0]}.{vers[k][1]}.{vers[k][2]}", k))
    num_rank = {k: i + 1 for i, k in enumerate(by_num)}
    lex_rank = {k: i + 1 for i, k in enumerate(by_lex)}
    assert set(rows) == set(sup)
    for k, r in rows.items():
        mj, mn, pt = vers[k]
        assert r.ver == f"{mj}.{mn}.{pt}"
        assert r.ver_num == mj * 10**6 + mn * 10**3 + pt
        assert r.semver_rank == num_rank[k]
        assert r.lexical_rank == lex_rank[k]
        assert r.rank_diverges == (num_rank[k] != lex_rank[k])
    # the trap is live: two-digit minors exist and the orders diverge
    assert any(vers[k][1] >= 10 for k in sup)
    assert any(r.rank_diverges for r in rows.values())
    # and specifically: some x.10+.z ranks BEFORE x.2-9.z lexically
    # but after numerically (the canonical bug instance)
    diverged = [k for k, r in rows.items() if r.rank_diverges]
    assert diverged


def test_token_offsets_tile_this_corpus_exactly(spark):
    rows = {r.source: r for r in QUERIES["llm_token_offsets_audit"].fn(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        toks = d.text.split(" ")
        deficit = len(d.text) - sum(len(t) for t in toks) - (len(toks) - 1)
        a = agg[d.source]
        a[0] += 1
        a[1] += 1 if deficit == 0 else 0
        a[2] += deficit
        a[3] = max(a[3], deficit)
    assert set(rows) == set(agg)
    for src, (n, exact, tot, mx) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_exact_tilings) == (n, exact)
        assert r.n_lossy == n - exact
        assert (r.total_deficit_chars, r.max_deficit_chars) == (tot, mx)
    # a faithful splitter tiles by construction — deficit identically 0;
    # the key pins that BOTH engines' split semantics are faithful
    # (dropping empty tokens or trimming boundaries would break this)
    assert all(r.n_lossy == 0 for r in rows.values())
