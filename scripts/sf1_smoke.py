"""sf1-scale smoke for the bucket-stitch global_rank helpers (VERDICT r9 #7).

The helpers' bucket_bits guidance (16 for cents-scale domains) was only
ever exercised up to sf0.1. This script builds a synthetic ~sf1 fixture —
the sf0.1 `events` table replicated 10x with per-replica user_id /
event_id offsets, so every per-user aggregate replicates exactly and the
ENTITY count (users) grows 10x while value DOMAINS stay put — then runs
the two heaviest bucket-stitch keys (`agg_rfm_segmentation`,
`agg_spearman_corr`) on it and verifies:

  1. hash stability: Spark result == DuckDB oracle on the same synthetic
     parquet (the full driver-surface compare from tests/parity.py);
  2. grid invariance: each grid routed through plans/bounded_grid (the
     only single-task windows) counted at sf0.1 AND synthetic-sf1 — the
     bucket histograms must NOT grow ~10x with the entity count;
  3. task counts: per-stage task counts for each key's execution, showing
     the plan stays multi-task with only the grid-sized single-task
     stages at 10x the entities.

Usage: python scripts/sf1_smoke.py   (writes the fixture under
/root/repo/.synth_sf1, ~110 MB; safe to delete afterwards)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SYNTH = "/root/repo/.synth_sf1"
SRC = "/root/testdata/sf0.1"
KEYS = ("agg_rfm_segmentation", "agg_spearman_corr")
REPLICAS = 10
USER_STRIDE = 10_000  # > max user_id 1499 at sf0.1
EVENT_STRIDE = 10_000_000


def build_fixture() -> None:
    os.makedirs(SYNTH, exist_ok=True)
    out = f"{SYNTH}/events.parquet"
    if os.path.exists(out):
        return
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"""
        COPY (
            SELECT event_id + r.i * {EVENT_STRIDE} AS event_id, ts,
                   user_id + r.i * {USER_STRIDE} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet', range({REPLICAS}) r(i)
        ) TO '{out}' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT count(*), count(DISTINCT user_id) FROM '{out}'").fetchone()
    print(f"fixture: {n[0]} rows, {n[1]} users -> {out}")


def main() -> int:
    build_fixture()

    from pyspark.sql import SparkSession

    from classification_problem_with_pyspark_spark.plans import bounded_grid
    from classification_problem_with_pyspark_spark.registry import (
        QUERIES,
        load_all_modules,
    )
    from parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    load_all_modules()
    sc = spark.sparkContext
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    failed = []
    for key in KEYS:
        q = QUERIES[key]
        for label, sf_dir in (("sf0.1", SRC), ("synth-sf1", SYNTH)):
            # grid cardinality: every relation routed to a single-task window
            bounded_grid.GRID_CAPTURE = cap = []
            try:
                df = q.fn(spark, sf_dir)
            finally:
                bounded_grid.GRID_CAPTURE = None
            grids = [g.count() for g in cap]

            sc.setJobGroup(f"{key}@{label}", key)
            t0 = time.time()
            n_rows = df.count()
            wall = time.time() - t0
            stage_tasks = []
            tracker = sc.statusTracker()
            for jid in tracker.getJobIdsForGroup(f"{key}@{label}"):
                jinfo = tracker.getJobInfo(jid)
                if jinfo is None:
                    continue
                for sid in jinfo.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None:
                        stage_tasks.append(sinfo.numTasks)
            single = sum(1 for t in stage_tasks if t == 1)
            print(
                f"{key} @ {label}: {n_rows} rows in {wall:.1f}s; "
                f"grids={grids}; stages={len(stage_tasks)} "
                f"(single-task: {single}, max tasks: {max(stage_tasks or [0])})"
            )

            # oracle parity on the same dir (the driver-surface check)
            for t in ("events",):
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            ok, msg = compare(key, df, q.oracle, con)
            print(f"{key} @ {label}: oracle {'HASH-OK' if ok else 'FAIL: ' + msg}")
            if not ok:
                failed.append((key, label, msg))

    if failed:
        print("FAILED:", failed)
        return 1
    print("sf1 smoke: all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
