"""Semantic property tests for extension pack 10 (extended10.py).

Oracle parity pins exact values for the three oracle-checked keys; these
assert the semantic invariants (MOR reconstruction laws, seasonality
algebra, CSV mangling structure) and give the rows-only BPE applier its
full quality gate against the pure-python reference tokenizer.
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR, SF_DIR_SMOKE
from tests.test_extended8 import _reference_bpe

load_all_modules()


def test_mor_reconstruction_laws(spark):
    rows = QUERIES["sink_merge_on_read_roundtrip"].fn(spark, SF_DIR).collect()
    by = {r.status: r for r in rows}
    o = load(spark, SF_DIR, "orders")
    n_total = o.count()
    n_deleted = o.where(F.col("o_orderkey") % 13 == 0).count()
    # deletes remove exactly the mod-13 keys
    assert sum(r.n_orders for r in rows) == n_total - n_deleted
    # every surviving mod-7 key lands in status 'R'
    n_upserted = o.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0)
    ).count()
    assert by["R"].n_orders >= n_upserted  # 'R' also exists natively? (it doesn't)
    native_r = o.where(
        (F.col("o_orderstatus") == "R") & (F.col("o_orderkey") % 7 != 0)
    ).count()
    assert by["R"].n_orders == n_upserted + native_r


def test_dow_residuals_average_to_zeroish_per_cell(spark):
    rows = QUERIES["events_dow_seasonality_residual"].fn(spark, SF_DIR).collect()
    assert rows
    cells: dict[tuple, list] = collections.defaultdict(list)
    for r in rows:
        # weekday cell: residuals are (cnt-avg)/avg; their mean over the
        # cell is ~0 by construction (floor loss < 1 micro-unit per row)
        cells[(r.event_type, r.day.weekday())].append(r)
    for key, rs in cells.items():
        total = sum(r.residual_micro for r in rs)
        assert -len(rs) * 2 <= total <= len(rs), (key, total)
        # expected_micro identical across the cell
        assert len({r.expected_micro for r in rs}) == 1, key


def test_csv_multiline_structure(spark):
    rows = QUERIES["source_csv_multiline_quoted"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    d = load(spark, SF_DIR, "documents")
    per_lang = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    multi = {
        r.lang: r.n
        for r in d.where(F.col("doc_id") % 3 == 0)
        .where(F.col("text").contains(" "))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_docs == per_lang[r.lang]
        # docs with embedded newlines == mod-3 docs that had spaces
        assert r.n_multiline == multi.get(r.lang, 0), r.lang


def test_bpe_applier_matches_python_reference(spark):
    rows = QUERIES["llm_tokenizer_apply_merges"].fn(spark, SF_DIR_SMOKE).collect()
    assert rows
    docs = load(spark, SF_DIR_SMOKE, "documents").select("doc_id", "text").collect()
    wc: collections.Counter = collections.Counter()
    for r in docs:
        for w in r.text.split(" "):
            if w:
                wc[w] += 1
    merges = _reference_bpe(dict(wc), 6)
    # re-apply the merges to every word with the reference merger
    word_tokens: dict[str, int] = {}
    for w in wc:
        syms = list(w)
        for _, l, rr, _ in merges:
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == rr:
                    out[-1] = l + rr
                else:
                    out.append(s)
            syms = out
        word_tokens[w] = len(syms)
    want = {
        r.doc_id: sum(word_tokens[w] for w in r.text.split(" ") if w) for r in docs
    }
    got = {r.doc_id: r.n_tokens_bpe for r in rows}
    assert got == want


def test_bpe_applier_compression_bounds(spark):
    rows = QUERIES["llm_tokenizer_apply_merges"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows[:100]:
        assert 0 < r.n_tokens_bpe <= r.n_chars_tok, r
        assert r.chars_per_token_micro >= 1_000_000, r  # merges only shrink
        assert r.n_words <= r.n_tokens_bpe  # a word is >= 1 token
