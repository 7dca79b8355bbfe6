"""Semantic property tests for extension pack 28 (extended28.py)."""

from __future__ import annotations

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

import pyspark.sql.functions as F

load_all_modules()


def test_frequent_2seq_bounds(spark):
    rows = QUERIES["events_frequent_2seq"].fn(spark, SF_DIR).collect()
    e = load(spark, SF_DIR, "events")
    n_users = e.select("user_id").distinct().count()
    n_types = e.select("event_type").distinct().count()
    assert 0 < len(rows) <= n_types * n_types
    for r in rows:
        assert 0 < r.n_users_with_seq <= n_users
        assert r.support_micro == 1_000_000 * r.n_users_with_seq // n_users


def test_prefixspan_len2_matches_exact_sql(spark):
    # the load-bearing pin: MLlib's length-2 pattern frequencies must
    # equal the exact SQL subsequence counts, pattern by pattern
    ps = QUERIES["ml_prefixspan_sequences"].fn(spark, SF_DIR).collect()
    seq2 = {
        (r.first_type, r.then_type): r.n_users_with_seq
        for r in QUERIES["events_frequent_2seq"].fn(spark, SF_DIR).collect()
    }
    len2 = [r for r in ps if r.pattern.count(">") == 1]
    assert len2, "no length-2 patterns above support - fixture too sparse"
    for r in len2:
        a, b = r.pattern.split(">")
        assert r.freq == seq2[(a, b)], (r.pattern, r.freq, seq2.get((a, b)))
    # and every length-1 pattern freq is the plain user count per type
    per_type = {
        r.event_type: r.cnt
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    for r in ps:
        if ">" not in r.pattern:
            assert r.freq == per_type[r.pattern]


def test_fifo_allocation_conservation(spark):
    rows = QUERIES["join_fifo_allocation"].fn(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    qty = F.expr("CAST(round(l_quantity) AS BIGINT)")
    tot = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum(qty).alias("s")).collect()
    }
    assert rows
    for r in rows:
        assert r.matched_qty > 0
    # per part, matched total == min(supply total, demand total)
    import collections

    per_part_match = collections.Counter()
    for r in rows:
        per_part_match[r.part] += r.matched_qty
    per_side = (
        li.groupBy("l_partkey", "l_returnflag")
        .agg(F.sum(qty).alias("s"))
        .collect()
    )
    sup = {r.l_partkey: r.s for r in per_side if r.l_returnflag == "N"}
    dem = {r.l_partkey: r.s for r in per_side if r.l_returnflag == "R"}
    for part in set(sup) & set(dem):
        assert per_part_match[part] == min(sup[part], dem[part]), part
    # global sanity: nothing matched beyond either side's total
    total_matched = sum(per_part_match.values())
    assert total_matched <= min(tot["N"], tot["R"])


def test_fifo_matches_bruteforce_queue_replay(spark):
    # replay FIFO with an explicit two-pointer queue walk in Python and
    # require the identical allocation multiset
    rows = QUERIES["join_fifo_allocation"].fn(spark, SF_DIR).collect()
    got = {
        (r.part, r.s_order, r.s_line, r.d_order, r.d_line): r.matched_qty
        for r in rows
    }
    li = (
        load(spark, SF_DIR, "lineitem")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("q"),
            "l_shipdate",
        )
        .collect()
    )
    import collections

    sides = collections.defaultdict(lambda: {"N": [], "R": []})
    for r in li:
        if r.l_returnflag in ("N", "R"):
            sides[r.l_partkey][r.l_returnflag].append(
                (r.l_shipdate, r.l_orderkey, r.l_linenumber, r.q)
            )
    want = {}
    for part, sd in sides.items():
        sup = sorted(sd["N"])
        dem = sorted(sd["R"])
        i = j = 0
        s_left = sup[0][3] if sup else 0
        d_left = dem[0][3] if dem else 0
        while i < len(sup) and j < len(dem):
            m = min(s_left, d_left)
            if m > 0:
                key = (part, sup[i][1], sup[i][2], dem[j][1], dem[j][2])
                want[key] = want.get(key, 0) + m
            s_left -= m
            d_left -= m
            if s_left == 0:
                i += 1
                s_left = sup[i][3] if i < len(sup) else 0
            if d_left == 0:
                j += 1
                d_left = dem[j][3] if j < len(dem) else 0
    assert got == want
