"""sf1-scale smoke for the bucket-stitch global_rank helpers (VERDICT r9 #7,
extended r11 per VERDICT r10 #7 + ADVICE r10).

The helpers' bucket_bits guidance (16 for cents-scale domains) was only
ever exercised up to sf0.1. This script builds a synthetic ~sf1 fixture —
the sf0.1 `events` table replicated 10x with per-replica user_id /
event_id offsets (per-user aggregates replicate exactly; ENTITY count
grows 10x, value DOMAINS stay put), plus the sf0.1 `orders` table
replicated 10x with per-replica o_orderkey strides AND a 1-cent
o_totalprice offset per replica (so the DISTINCT-PRICE entity relation
grows ~10x while the cents RANGE — what bounds the 2^16 bucket grid —
stays fixed) — then runs the heaviest bucket-stitch keys on it and
verifies:

  1. hash stability: Spark result == DuckDB oracle on the same synthetic
     parquet (the full driver-surface compare from tests/parity.py);
  2. grid invariance: each grid routed through plans/bounded_grid (the
     only single-task windows) counted at sf0.1 AND synthetic-sf1 — the
     bucket histograms must NOT grow ~10x with the entity count;
  3. task counts: per-stage task counts for each key's execution, showing
     the plan stays multi-task with only the grid-sized single-task
     stages at 10x the entities.

KEYS covers the r9 rewrites (agg_rfm_segmentation, agg_spearman_corr),
the r10 bucketed_global_cummax rewrite (join_skyline_pareto), and — r12 —
the r11 value_range_k rewrite (agg_hodges_lehmann: the 10x fixture grows
the Walsh-sum VALUE RANGE ~10x at a fixed day count, the exact case
range-normalized bucketing exists for; its primary oracle is day-count-
bounded so no synth override is needed).

Usage: python scripts/sf1_smoke.py [repo_root [src_sf_dir [synth_dir]]]
(or env SPARK_GRAFT_REPO / SPARK_GRAFT_SF1_SRC / SPARK_GRAFT_SF1_SYNTH;
defaults /root/repo, /root/testdata/sf0.1, <repo>/.synth_sf1 — the
fixture is ~250 MB and safe to delete afterwards). DuckDB oracle views
are registered for EVERY parquet table present in the directory under
compare (ADVICE r10: the old version hardcoded the 'events' view and
the paths, so extending KEYS to an orders-reading key would have
compared against a stale or missing view).
"""

from __future__ import annotations

import glob
import os
import sys
import time

import duckdb

REPO = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_REPO", "/root/repo"
)
SRC = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1"
)
SYNTH = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "SPARK_GRAFT_SF1_SYNTH", os.path.join(REPO, ".synth_sf1")
)

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

KEYS = (
    "agg_rfm_segmentation",
    "agg_spearman_corr",
    "join_skyline_pareto",
    # r12 (VERDICT r11 #5): the value_range_k poster child. The 10x
    # orders fixture grows the DAILY-REVENUE MAGNITUDE ~10x (10 replicas
    # of each order land on the same o_orderdate) while the day count —
    # and therefore the Walsh pair count and the window-form oracle's
    # cost — stays fixed, so this exercises exactly the case fixed-width
    # buckets failed at (range-tracking grids): the range-normalized
    # 4096-bucket grid must hold <= 4097 rows at 10x the value range.
    "agg_hodges_lehmann",
)

# Oracle overrides for the 10x fixture ONLY. join_skyline_pareto's
# primary oracle states dominance directly (NOT EXISTS — quadratic,
# IEJoin-feasible at sf0.1's 150k orders, measured infeasible at the
# fixture's 1.5M). The override is DuckDB's O(n log n) window
# formulation of the same semantics (the per-price reduction the key's
# docstring proves); the full quadratic semantics stays verified at
# sf0.1 by the primary oracle every run, so the synth check's job —
# hash stability of the Spark plan at 10x entities — is preserved.
SYNTH_ORACLE_OVERRIDES = {
    "join_skyline_pareto": """
    WITH o AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(date_trunc('day', o_orderdate) AS DATE) AS d
        FROM orders
    ),
    per_price AS (
        SELECT cents, MAX(d) AS m_equal FROM o GROUP BY cents
    ),
    frontier AS (
        SELECT cents, m_equal,
               MAX(m_equal) OVER (ORDER BY cents DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS m_higher
        FROM per_price
    )
    SELECT o.o_orderkey, o.cents, o.d
    FROM o JOIN frontier f ON f.cents = o.cents
    WHERE (f.m_higher IS NULL OR f.m_higher < o.d) AND f.m_equal <= o.d
    ORDER BY o.cents DESC, o.o_orderkey
    """,
}
REPLICAS = 10
USER_STRIDE = 10_000  # > max user_id 1499 at sf0.1
EVENT_STRIDE = 10_000_000
ORDER_STRIDE = 10_000_000  # > max o_orderkey 600000 at sf0.1


def build_fixture() -> None:
    os.makedirs(SYNTH, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    out = f"{SYNTH}/events.parquet"
    if not os.path.exists(out):
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
        n = con.execute(
            f"SELECT count(*), count(DISTINCT user_id) FROM '{out}'"
        ).fetchone()
        print(f"fixture: {n[0]} events, {n[1]} users -> {out}")

    out = f"{SYNTH}/orders.parquet"
    if not os.path.exists(out):
        # The 1-cent per-replica price offset grows the DISTINCT-PRICE
        # entity count ~10x (the per-price relation join_skyline_pareto's
        # bucketed cummax ranks) while the price RANGE — and therefore the
        # 2^16-cents bucket GRID — stays fixed. Offsets <= 9 cents cannot
        # collide across replicas of the same base price.
        con.execute(
            f"""
            COPY (
                SELECT * REPLACE (
                    o_orderkey + r.i * {ORDER_STRIDE} AS o_orderkey,
                    o_totalprice + r.i * 0.01 AS o_totalprice
                )
                FROM '{SRC}/orders.parquet', range({REPLICAS}) r(i)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
        n = con.execute(
            "SELECT count(*), count(DISTINCT CAST(round(o_totalprice*100) AS BIGINT)) "
            f"FROM '{out}'"
        ).fetchone()
        print(f"fixture: {n[0]} orders, {n[1]} distinct cent prices -> {out}")


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Every parquet table present in sf_dir becomes a view named after
    its basename — whatever tables a KEY reads are guaranteed fresh."""
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        t = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")


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
            register_views(con, sf_dir)
            oracle = q.oracle
            if label == "synth-sf1" and key in SYNTH_ORACLE_OVERRIDES:
                oracle = SYNTH_ORACLE_OVERRIDES[key]
            ok, msg = compare(key, df, oracle, con)
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
