"""Property-based differential fuzzing (SURVEY.md §5.5): hypothesis
generates random filter+groupBy+agg queries over lineitem; each is built
twice — PySpark expression tree and ANSI SQL — and compared exactly through
the same parity harness the driver uses.

Aggregates are chosen for cross-engine determinism (SURVEY.md §7.5):
count(*) is exact; sum(l_quantity) sums integral doubles (exact in IEEE
double); min/max are order-insensitive. No order-sensitive float sums.
Predicate literals are integers / fixed enums — no float-boundary flakes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR
from tests.parity import compare

# (column, spark builder, sql renderer) per predicate template
_NUM_COLS = {"l_quantity": (1, 50), "l_linenumber": (1, 7)}
_ENUMS = {"l_returnflag": ("A", "N", "R"), "l_linestatus": ("O", "F")}
_OPS = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__", "=": "__eq__"}
_GROUP_COLS = ("l_returnflag", "l_linestatus", "l_linenumber")


@st.composite
def predicates(draw):
    kind = draw(st.sampled_from(["num", "enum", "in"]))
    if kind == "num":
        col = draw(st.sampled_from(sorted(_NUM_COLS)))
        lo, hi = _NUM_COLS[col]
        op = draw(st.sampled_from(sorted(_OPS)))
        val = draw(st.integers(min_value=lo, max_value=hi))
        return (getattr(F.col(col), _OPS[op])(F.lit(val)), f"{col} {op} {val}")
    if kind == "enum":
        col = draw(st.sampled_from(sorted(_ENUMS)))
        val = draw(st.sampled_from(_ENUMS[col]))
        return (F.col(col) == val, f"{col} = '{val}'")
    col = draw(st.sampled_from(sorted(_ENUMS)))
    vals = draw(
        st.lists(st.sampled_from(_ENUMS[col]), min_size=1, max_size=3, unique=True)
    )
    in_list = ", ".join(f"'{v}'" for v in vals)
    return (F.col(col).isin(list(vals)), f"{col} IN ({in_list})")


@st.composite
def fuzz_queries(draw):
    preds = draw(st.lists(predicates(), min_size=1, max_size=3))
    conj = draw(st.sampled_from([" AND ", " OR "]))
    group = draw(st.sampled_from(_GROUP_COLS))
    return preds, conj, group


@pytest.mark.fuzz
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(q=fuzz_queries())
def test_random_filter_agg_matches_duckdb(q, spark, oracle_con):
    preds, conj, group = q
    spark_pred = preds[0][0]
    for p, _ in preds[1:]:
        spark_pred = (spark_pred & p) if conj == " AND " else (spark_pred | p)
    sql_pred = conj.join(f"({s})" for _, s in preds)

    df = (
        load(spark, SF_DIR, "lineitem")
        .where(spark_pred)
        .groupBy(group)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )
    oracle = f"""
    SELECT {group},
           COUNT(*) AS cnt,
           SUM(l_quantity) AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    WHERE {sql_pred}
    GROUP BY {group}
    """
    ok, msg = compare("fuzz", df, oracle, oracle_con)
    assert ok, f"{sql_pred} GROUP BY {group}: {msg}"


_JOIN_TYPES = ("inner", "left", "left_semi", "left_anti")


@st.composite
def join_fuzz(draw):
    how = draw(st.sampled_from(_JOIN_TYPES))
    status = draw(st.sampled_from(["F", "O", "P"]))
    bal = draw(st.integers(min_value=-999, max_value=9999))
    return how, status, bal


@pytest.mark.fuzz
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(q=join_fuzz())
def test_random_join_matches_duckdb(q, spark, oracle_con):
    how, status, bal = q
    c = load(spark, SF_DIR, "customer").where(F.col("c_acctbal") > bal)
    o = load(spark, SF_DIR, "orders").where(F.col("o_orderstatus") == status)
    sql_how = {"inner": "JOIN", "left": "LEFT JOIN"}.get(how)
    if how in ("inner", "left"):
        df = (
            c.join(o, c.c_custkey == o.o_custkey, how)
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("order_cnt"))
        )
        oracle = f"""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
        FROM (SELECT * FROM customer WHERE c_acctbal > {bal}) c
        {sql_how} (SELECT * FROM orders WHERE o_orderstatus = '{status}') o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
        """
    else:
        df = c.join(o, c.c_custkey == o.o_custkey, how).select("c_custkey")
        exists = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        oracle = f"""
        SELECT c.c_custkey
        FROM (SELECT * FROM customer WHERE c_acctbal > {bal}) c
        WHERE {exists} (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = '{status}')
        """
    ok, msg = compare("join_fuzz", df, oracle, oracle_con)
    assert ok, f"{how}/{status}/{bal}: {msg}"


_WIN_FUNCS = ("row_number", "rank", "dense_rank")
_PART_COLS = ("o_orderpriority", "o_orderstatus")


@pytest.mark.fuzz
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    func=st.sampled_from(_WIN_FUNCS),
    part=st.sampled_from(_PART_COLS),
    desc=st.booleans(),
)
def test_random_window_matches_duckdb(func, part, desc, spark, oracle_con):
    from pyspark.sql.window import Window

    # (o_orderdate, o_orderkey) is a total order -> every rank function is
    # deterministic on both engines
    direction = "DESC" if desc else "ASC"
    w = Window.partitionBy(part).orderBy(
        F.col("o_orderdate").desc() if desc else F.col("o_orderdate").asc(),
        F.col("o_orderkey").asc(),
    )
    df = (
        load(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            F.col(part).alias("part_key"),
            getattr(F, func)().over(w).alias("pos"),
        )
        .where(F.col("pos") <= 3)
    )
    oracle = f"""
    SELECT o_orderkey, {part} AS part_key,
           {func}() OVER (PARTITION BY {part}
                          ORDER BY o_orderdate {direction}, o_orderkey) AS pos
    FROM orders
    QUALIFY pos <= 3
    """
    ok, msg = compare("window_fuzz", df, oracle, oracle_con)
    assert ok, f"{func}/{part}/{direction}: {msg}"


_SETOPS = ("union_all", "union", "intersect", "except")


@pytest.mark.fuzz
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    op=st.sampled_from(_SETOPS),
    s1=st.sampled_from(["F", "O", "P"]),
    s2=st.sampled_from(["F", "O", "P"]),
    bal=st.integers(min_value=0, max_value=5000),
)
def test_random_setop_matches_duckdb(op, s1, s2, bal, spark, oracle_con):
    o = load(spark, SF_DIR, "orders")
    a = o.where(F.col("o_orderstatus") == s1).select("o_orderpriority", "o_orderstatus")
    b = (
        o.where((F.col("o_orderstatus") == s2) & (F.col("o_totalprice") > bal))
        .select("o_orderpriority", "o_orderstatus")
    )
    if op == "union_all":
        df, sql_op = a.unionByName(b), "UNION ALL"
    elif op == "union":
        df, sql_op = a.unionByName(b).distinct(), "UNION"
    elif op == "intersect":
        df, sql_op = a.intersect(b), "INTERSECT"
    else:
        df, sql_op = a.subtract(b), "EXCEPT"
    oracle = f"""
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderstatus = '{s1}'
    {sql_op}
    SELECT o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderstatus = '{s2}' AND o_totalprice > {bal}
    """
    ok, msg = compare("setop_fuzz", df, oracle, oracle_con)
    assert ok, f"{op}/{s1}/{s2}/{bal}: {msg}"
