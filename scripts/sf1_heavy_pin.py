"""Larger-SF scaling pin for the heaviest coverage-sweep keys
(VERDICT r12 #6): the sf0.1 headline is fixed-overhead-bound (10/12
core-count ratios ≈ 1), so scaling claims need a bigger input. This
builds a synthetic ~sf1 fixture for the two tables the heavy graph/emb
keys read — lineitem replicated 10x with per-replica l_orderkey AND
l_partkey strides (10 disjoint co-purchase graph copies: edge count,
seed count and ball work all scale ~10x, cleanly), embeddings
replicated 10x with vec_id strides — then times each key at sf0.1 and
at synth-sf1 (noop sink, warm) and reports the wall ratio plus the
task/stage counts, so "the plan stays multi-task and ~linear" is a
measured row instead of a guess.

NO oracle run here: correctness is gated elsewhere (driver_sim /
pytest); this is a SCALING pin. Usage:
  python scripts/sf1_heavy_pin.py [key ...]
Env: SPARK_GRAFT_SF1H_SRC (default /root/testdata/sf0.1),
     SPARK_GRAFT_SF1H_SYNTH (default <repo>/.synth_sf1h).
The fixture (~200 MB) is safe to delete afterwards.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF1H_SRC", "/root/testdata/sf0.1")
SYNTH = os.environ.get(
    "SPARK_GRAFT_SF1H_SYNTH", os.path.join(REPO, ".synth_sf1h")
)

DEFAULT_KEYS = [
    "graph_harmonic_centrality_sampled",
    "graph_triangle_count",
    "graph_link_prediction_jaccard",
    "graph_degree_assortativity",
    "emb_mutual_knn_pairs",
]

REPLICAS = 10
OK_STRIDE = 100_000_000  # far above any sf0.1 l_orderkey
PK_STRIDE = 10_000_000  # far above any sf0.1 l_partkey
VID_STRIDE = 10_000_000


def build_fixture() -> None:
    os.makedirs(SYNTH, exist_ok=True)
    con = duckdb.connect()
    li_out = os.path.join(SYNTH, "lineitem.parquet")
    emb_out = os.path.join(SYNTH, "embeddings.parquet")
    if not os.path.exists(li_out):
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                  l_orderkey + r.i * {OK_STRIDE} AS l_orderkey,
                  l_partkey + r.i * {PK_STRIDE} AS l_partkey)
              FROM read_parquet('{SRC}/lineitem.parquet'),
                   range({REPLICAS}) r(i)
            ) TO '{li_out}' (FORMAT PARQUET)
            """
        )
    if not os.path.exists(emb_out):
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (vec_id + r.i * {VID_STRIDE} AS vec_id)
              FROM read_parquet('{SRC}/embeddings.parquet'),
                   range({REPLICAS}) r(i)
            ) TO '{emb_out}' (FORMAT PARQUET)
            """
        )
    con.close()


def main() -> int:
    keys = sys.argv[1:] or DEFAULT_KEYS
    build_fixture()

    from classification_problem_with_pyspark_spark.registry import (
        QUERIES,
        load_all_modules,
    )
    from classification_problem_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="sf1_heavy_pin")
    load_all_modules()
    st = spark.sparkContext.statusTracker()

    def run(key: str, sf_dir: str) -> tuple[float, int, int]:
        spark.sparkContext.setJobDescription(f"sf1_heavy_pin {key} @ {sf_dir}")
        j0 = max(st.getJobIdsForGroup(None) or [0])
        t0 = time.time()
        QUERIES[key].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.time() - t0
        jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j > j0]
        n_stages = sum(
            len(st.getJobInfo(j).stageIds)
            for j in jobs
            if st.getJobInfo(j) is not None
        )
        return wall, len(jobs), n_stages

    print(f"{'key':42s} {'sf0.1':>8s} {'synth1':>8s} {'ratio':>6s} jobs/stages@1")
    for key in keys:
        run(key, SRC)  # warm the code paths
        w01, _, _ = run(key, SRC)
        w1, j1, s1 = run(key, SYNTH)
        print(
            f"{key:42s} {w01:8.2f} {w1:8.2f} {w1 / max(w01, 1e-9):6.1f} "
            f"{j1}/{s1}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
