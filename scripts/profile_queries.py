"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query key (default: the bench HEADLINE set) this measures,
on the SAME session/config the bench uses:
  - t_build   : Python-side DataFrame construction (fn call; py4j + analysis)
  - t_exec    : noop-sink execution wall time, median of N runs (warm)
  - jobs      : Spark jobs launched by one execution (statusTracker diff)
  - stages    : stages launched by one execution
and optionally dumps .explain("formatted") to plans/<tag>/<key>_<suffix>.txt.

Usage:
  python scripts/profile_queries.py [--runs 3] [--plans plans/r12 --suffix before] [key ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classification_problem_with_pyspark_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_modules,
)
from classification_problem_with_pyspark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "agg_pricing_summary",
    "topk_revenue",
    "window_topn_per_group",
    "events_distinct_users_daily",
    "join_semi",
    "agg_rollup",
    "scalar_json_suite",
    "join_asof_events",
    "stream_session_30m",
    "llm_dedup_exact_hash",
    "llm_similarity_topk",
    "llm_tfidf",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to dump explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()
    keys = args.keys or HEADLINE

    spark = get_spark(app_name="profile")
    spark.range(1).count()
    load_all_modules()
    sc = spark.sparkContext
    jtracker = sc._jsc.sc().statusTracker()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    # Warm pass at sf0.01 (the bench's warm-up discipline).
    if not args.no_warm:
        for k in keys:
            QUERIES[k].fn(spark, "/root/testdata/sf0.01").write.mode(
                "overwrite"
            ).format("noop").save()

    results = {}
    for k in keys:
        fn = QUERIES[k].fn
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        if args.plans:
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{k}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        execs = []
        jobs = stages = 0
        for i in range(args.runs):
            jobs_before = len(jtracker.getJobIdsForGroup(None))
            stages_before = int(sc._jsc.sc().dagScheduler().nextStageId())
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            execs.append(time.time() - t0)
            if i == args.runs - 1:
                jobs = len(jtracker.getJobIdsForGroup(None)) - jobs_before
                stages = (
                    int(sc._jsc.sc().dagScheduler().nextStageId()) - stages_before
                )
        results[k] = {
            "t_build": round(t_build, 3),
            "t_exec_med": round(statistics.median(execs), 3),
            "t_exec_min": round(min(execs), 3),
            "t_exec_all": [round(x, 3) for x in execs],
            "jobs": jobs,
            "stages": stages,
        }
        print(f"{k}: {results[k]}", file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
