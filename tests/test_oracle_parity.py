"""Oracle-differential test (primary gate, SURVEY.md §5.1-5.2).

Runs EVERY registered query that declares an oracle and asserts exact
parity with DuckDB at sf0.01 — the same comparison the driver makes.
Rows-only queries are smoke-run (executes + schema is stable).
"""

from __future__ import annotations

import pytest

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR
from tests.parity import compare

load_all_modules()

ORACLE_KEYS = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_KEYS = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(name, spark, oracle_con):
    q = QUERIES[name]
    ok, msg = compare(name, q.fn(spark, SF_DIR), q.oracle, oracle_con)
    assert ok, msg


def test_no_oracle_emits_hugeint_or_decimal(oracle_con):
    """Type the WHOLE oracle surface lazily (no execution) — one fast sweep
    so a future HUGEINT/DECIMAL regression fails CI by name even before the
    per-key parity runs (VERDICT r2 'What's wrong #1')."""
    from tests.parity import check_oracle_types

    bad = {
        n: hazards
        for n in ORACLE_KEYS
        if (hazards := check_oracle_types(QUERIES[n].oracle, oracle_con))
    }
    assert not bad, f"oracles with hash-hazardous result types: {bad}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_smoke(name, spark):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_stratified_sample_is_deterministic_and_bounded(spark):
    q = QUERIES["llm_sample_stratified"]
    a = {r.doc_id for r in q.fn(spark, SF_DIR).collect()}
    b = {r.doc_id for r in q.fn(spark, SF_DIR).collect()}
    assert a == b  # seeded Bernoulli over a stable partitioning
    from classification_problem_with_pyspark_spark.sources.catalog import load

    total_en = load(spark, SF_DIR, "documents").where("lang = 'en'").count()
    got_en = sum(
        1 for r in q.fn(spark, SF_DIR).collect() if r.lang == "en"
    )
    # fraction 0.3 with generous Bernoulli slack
    assert 0.1 * total_en < got_en < 0.55 * total_en
