"""Semantic property tests for extension pack 36 (extended36.py)."""

from __future__ import annotations

import collections
import hashlib

import pyspark.sql.functions as F

from classification_problem_with_pyspark_spark.operators.extended36 import CHECKSUM_BLOCK
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_generator_suite_shapes(spark):
    rows = QUERIES["scalar_generator_suite"].fn(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "nation").collect()
    n_nations = len(n)
    by_gen = collections.defaultdict(list)
    for r in rows:
        by_gen[r.gen].append(r)
    # stack and inline each emit exactly 2 rows per nation
    assert len(by_gen["stack"]) == 2 * n_nations
    assert len(by_gen["inline"]) == 2 * n_nations
    # posexplode_outer keeps empty-array nations as NULL rows
    outer = by_gen["posexplode_outer"]
    null_rows = [r for r in outer if r.pos is None]
    empty_nations = sum(1 for x in n if x.n_nationkey % 3 == 0)
    assert len(null_rows) == empty_nations
    for r in null_rows:
        assert r.attr is None and r.val is None
    # non-null rows reproduce the sliced characters positionally
    names = {x.n_nationkey: x.n_name for x in n}
    for r in outer:
        if r.pos is not None:
            assert r.val == names[r.key][r.pos]
            assert r.pos < r.key % 3
    # stack rows carry the unpivoted attrs
    for r in by_gen["stack"]:
        assert r.attr in ("name", "region")


def test_replication_checksum_recomputes(spark):
    rows = QUERIES["audit_replication_checksum"].fn(spark, SF_DIR).collect()
    orders = (
        load(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            "o_orderstatus",
        )
        .collect()
    )
    blocks = collections.defaultdict(lambda: [0, 0])
    for o in orders:
        s = f"{o.o_orderkey}|{o.o_custkey}|{o.cents}|{o.o_orderstatus}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 10**12
        b = blocks[o.o_orderkey // CHECKSUM_BLOCK]
        b[0] += 1
        b[1] += h
    assert len(rows) == len(blocks)
    for r in rows:
        n, ck = blocks[r.block_id]
        assert (r.n_rows, r.checksum) == (n, ck)


def test_replication_checksum_detects_a_flip(spark):
    # flipping one row's status must change exactly that block's checksum
    rows = {r.block_id: r.checksum for r in
            QUERIES["audit_replication_checksum"].fn(spark, SF_DIR).collect()}
    o = load(spark, SF_DIR, "orders")
    first = o.orderBy("o_orderkey").limit(1).collect()[0]
    s_orig = (
        f"{first.o_orderkey}|{first.o_custkey}|"
        f"{round(first.o_totalprice * 100)}|{first.o_orderstatus}"
    )
    s_flip = (
        f"{first.o_orderkey}|{first.o_custkey}|"
        f"{round(first.o_totalprice * 100)}|X"
    )
    h = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 10**12  # noqa: E731
    blk = first.o_orderkey // CHECKSUM_BLOCK
    tampered = rows[blk] - h(s_orig) + h(s_flip)
    assert tampered != rows[blk]
