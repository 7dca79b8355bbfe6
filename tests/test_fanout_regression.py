"""Single-partition fan-out regression tripwire (VERDICT r4 #8).

Each testdata table is ONE parquet file, so any operator that explodes /
shingles / replicates straight off the scan runs its per-row md5 work in
a single task — the class fixed in commit de6aab2 (sf0.1 coverage sweep
525 s → 392 s). The fix is a `repartition(32, <row key>)` between the
scan and the fan-out; this sweep asserts the resulting
`Exchange hashpartitioning(<row key>, ...)` is still in each fixed
operator's physical plan. The check is plan-text (cheap, SF-independent)
because the regression mode is exactly "someone removes the repartition
and the plan silently degrades to one task" — re-measured timings live
in BENCH_COVERAGE.json per round.
"""

from __future__ import annotations

import pytest

from classification_problem_with_pyspark_spark.plans.explain import formatted_plan
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()

# key → the row-identity column its pre-fan-out repartition hashes on
FIXED_FANOUTS = {
    "llm_retrieval_mrr": "qid",
    "emb_srp_signature": "vec_id",
    "llm_cdc_chunk_dedup": "doc_id",
    "agg_bootstrap_ci_revenue": "o_orderkey",
    "emb_pq_codebook_assign": "vec_id",
    "llm_source_overlap_matrix": "doc_id",
    "llm_dedup_threshold_curve": "doc_id",
    "llm_rank_fusion_rrf": "qid",
}


@pytest.mark.parametrize("key,col", sorted(FIXED_FANOUTS.items()))
def test_fanout_operator_spreads_scan_before_explode(spark, key, col):
    plan = formatted_plan(QUERIES[key].fn(spark, SF_DIR))
    assert f"hashpartitioning({col}" in plan, (
        f"{key}: no Exchange hashpartitioning({col}, ...) in the plan — "
        f"the pre-fan-out repartition was removed; on single-file testdata "
        f"the explode/md5 stage would run in ONE task (see de6aab2)"
    )
