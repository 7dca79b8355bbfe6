"""Fixed-per-query-overhead A/B (VERDICT r12 #6): the ~0.25-0.4 s/query
AQE stage-scheduling + noop-sink setup cost dominates the 479-key sweep
tail. This harness times a mixed set of overhead-dominated coverage keys
under one named config variant per process (fresh JVM each run — config
is session-wide), so a shell loop can interleave variants:

  for r in 1 2 3; do
    python scripts/overhead_ab.py base     >> /tmp/oh_base.jsonl
    python scripts/overhead_ab.py coalesce >> /tmp/oh_coalesce.jsonl
  done

Variants (all cluster-sane; guide §1.2 — config only after algorithm):
  base      the engine session factory exactly as shipped
  coalesce  + spark.sql.adaptive.coalescePartitions.parallelismFirst=false
            and advisoryPartitionSizeInBytes=256m (guide §9): respect the
            advisory size instead of maximizing tiny-partition
            parallelism — fewer post-shuffle tasks per stage at ANY scale
Prints one JSON line: {"variant": ..., "total": s, "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classification_problem_with_pyspark_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_modules,
)
from classification_problem_with_pyspark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Overhead-dominated mixed slice of the coverage sweep (sub-second to
# ~1.5 s keys across families; none touched this round).
KEYS = [
    "agg_rollup",
    "join_semi",
    "scalar_json_suite",
    "events_distinct_users_daily",
    "window_topn_per_group",
    "llm_dedup_exact_hash",
    "agg_count_min_sketch",
    "agg_having_global_share",
    "graph_degree_distribution",
    "llm_langid",
    "llm_text_stats",
    "events_funnel",
    "agg_approx_distinct",
    "scalar_math_suite",
    "join_range_events",
    "window_lag_lead_events",
    "agg_hhi_concentration",
    "llm_ngram_profile",
    "events_retention_cohorts",
    "agg_grouping_sets",
]

VARIANTS = {
    "base": {},
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    },
}


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    conf = VARIANTS[variant]
    spark = get_spark(app_name=f"overhead_ab_{variant}")
    for k, v in conf.items():
        spark.conf.set(k, v)
    spark.range(1).count()
    load_all_modules()
    # one warm pass at sf0.01 (the bench's JIT discipline)
    for name in KEYS:
        QUERIES[name].fn(spark, "/root/testdata/sf0.01").write.mode(
            "overwrite"
        ).format("noop").save()
    timings: dict[str, float] = {}
    for name in KEYS:
        t0 = time.time()
        QUERIES[name].fn(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "variant": variant,
                "total": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
