"""Measured memory posture of the eager co-purchase-edge checkpoints
(VERDICT r12 #3): run the named keys on a VANILLA default-heap session
(the grading driver's posture — no engine session factory, no 16g
driver) at sf0.1, and report the block-manager bytes each key's
localCheckpoints actually pin, against the JVM's max heap.

Reconciles the r5 OOM record in BASELINE.md (a checkpointed GLOBAL
co-purchase edge relation OOMed a default-1g session at sf0.1 inside
graph_bfs_3hop's then-unbounded plan) with the r12 re-introduction of
edge checkpoints in graph_triangle_count / graph_link_prediction_jaccard
(+ the pre-existing one in graph_degree_assortativity).

Usage: python scripts/heap_posture.py [key ...]
Env:   HEAP_POSTURE_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classification_problem_with_pyspark_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_modules,
)

SF_DIR = os.environ.get("HEAP_POSTURE_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_KEYS = [
    "graph_triangle_count",
    "graph_link_prediction_jaccard",
    "graph_degree_assortativity",
    "graph_harmonic_centrality_sampled",
]


def main() -> int:
    keys = sys.argv[1:] or DEFAULT_KEYS
    from pyspark.sql import SparkSession

    # Vanilla, like scripts/driver_sim.py: default driver memory (1g).
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    load_all_modules()
    jvm_rt = spark._jvm.java.lang.Runtime.getRuntime()
    print(f"max heap: {jvm_rt.maxMemory() / 2**20:.0f} MiB", flush=True)
    rc = 0
    for key in keys:
        t0 = time.time()
        try:
            df = QUERIES[key].fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001 — the OOM is the finding
            print(f"FAIL {key}: {type(exc).__name__}: {exc}", flush=True)
            rc = 1
            continue
        wall = time.time() - t0
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        pinned = sum(i.memSize() for i in infos)
        disk = sum(i.diskSize() for i in infos)
        n_rdds = len(infos)
        print(
            f"OK  {key}: {wall:.1f}s, {n_rdds} pinned RDDs, "
            f"{pinned / 2**20:.1f} MiB memory / {disk / 2**20:.1f} MiB disk",
            flush=True,
        )
        # drop the checkpoint references so the next key starts clean
        del df
        spark._jvm.System.gc()
        time.sleep(1)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
