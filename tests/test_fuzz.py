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


# ---------------------------------------------------------------------------
# Surface 5: scalar expression trees (string / integer / conditional)
# ---------------------------------------------------------------------------
# Random depth-2 compositions of scalar functions rendered BOTH as a Spark
# Column and as DuckDB SQL. Functions restricted to exactly-portable ones:
# string ops (no collation/locale), integer arithmetic (no float rounding),
# CASE WHEN. The query groups by the expression and counts, so any
# divergence in any row changes the hash.


@st.composite
def str_exprs(draw, depth=0):
    base = draw(st.sampled_from(["o_orderpriority", "o_orderstatus"]))
    col, sql = F.col(base), base
    n_wraps = draw(st.integers(min_value=1, max_value=2 if depth == 0 else 1))
    for _ in range(n_wraps):
        fn = draw(
            st.sampled_from(
                ["upper", "lower", "substr", "concat", "reverse", "lpad", "replace"]
            )
        )
        if fn == "upper":
            col, sql = F.upper(col), f"upper({sql})"
        elif fn == "lower":
            col, sql = F.lower(col), f"lower({sql})"
        elif fn == "substr":
            k = draw(st.integers(min_value=1, max_value=4))
            col, sql = F.substring(col, 1, k), f"substr({sql}, 1, {k})"
        elif fn == "concat":
            lit = draw(st.sampled_from(["_x", "#", "ab"]))
            col, sql = F.concat(col, F.lit(lit)), f"concat({sql}, '{lit}')"
        elif fn == "reverse":
            col, sql = F.reverse(col), f"reverse({sql})"
        elif fn == "lpad":
            n = draw(st.integers(min_value=3, max_value=12))
            col, sql = F.lpad(col, n, "*"), f"lpad({sql}, {n}, '*')"
        else:
            a, b = draw(st.sampled_from([("-", "+"), ("URGENT", "U"), ("O", "0")]))
            col, sql = F.replace(col, F.lit(a), F.lit(b)), f"replace({sql}, '{a}', '{b}')"
    return col, sql


@st.composite
def int_exprs(draw):
    base = draw(st.sampled_from(["o_orderkey", "o_custkey"]))
    col, sql = F.col(base), base
    fn = draw(st.sampled_from(["mod", "plus", "times", "abs_minus", "greatest"]))
    k = draw(st.integers(min_value=1, max_value=97))
    if fn == "mod":
        col, sql = col % k, f"{sql} % {k}"
    elif fn == "plus":
        col, sql = col + k, f"{sql} + {k}"
    elif fn == "times":
        col, sql = col * k, f"{sql} * {k}"
    elif fn == "abs_minus":
        col, sql = F.abs(col - k), f"abs({sql} - {k})"
    else:
        col, sql = F.greatest(col % 100, F.lit(k)), f"greatest({sql} % 100, {k})"
    return col, sql


@st.composite
def cond_exprs(draw):
    thresh = draw(st.integers(min_value=1000, max_value=400000))
    a, b = draw(st.sampled_from([("hi", "lo"), ("big", "small"), ("1", "0")]))
    col = F.when(F.col("o_totalprice") > thresh, a).otherwise(b)
    sql = f"CASE WHEN o_totalprice > {thresh} THEN '{a}' ELSE '{b}' END"
    return col, sql


@pytest.mark.fuzz
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(s=str_exprs(), i=int_exprs(), c=cond_exprs())
def test_random_scalar_exprs_match_duckdb(s, i, c, spark, oracle_con):
    (s_col, s_sql), (i_col, i_sql), (c_col, c_sql) = s, i, c
    df = (
        load(spark, SF_DIR, "orders")
        .select(
            s_col.alias("e_str"),
            i_col.cast("long").alias("e_int"),
            c_col.alias("e_cond"),
        )
        .groupBy("e_str", "e_int", "e_cond")
        .agg(F.count("*").alias("cnt"))
    )
    oracle = f"""
    SELECT {s_sql} AS e_str,
           CAST({i_sql} AS BIGINT) AS e_int,
           {c_sql} AS e_cond,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1, 2, 3
    """
    ok, msg = compare("scalar_fuzz", df, oracle, oracle_con)
    assert ok, f"{s_sql} | {i_sql} | {c_sql}: {msg}"


# ---------------------------------------------------------------------------
# Surface 6: window FRAME aggregates (random ROWS BETWEEN bounds)
# ---------------------------------------------------------------------------

_FRAME_AGGS = {"sum": "SUM", "min": "MIN", "max": "MAX", "count": "COUNT"}


@pytest.mark.fuzz
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    agg=st.sampled_from(sorted(_FRAME_AGGS)),
    part=st.sampled_from(("o_orderpriority", "o_orderstatus")),
    prec=st.integers(min_value=0, max_value=4),
    foll=st.integers(min_value=0, max_value=4),
    unbounded_start=st.booleans(),
)
def test_random_frame_agg_matches_duckdb(agg, part, prec, foll, unbounded_start, spark, oracle_con):
    """Random ROWS-frame windows over an integer measure (o_custkey —
    exact at any frame size, no float-order flakes). The (o_orderdate,
    o_orderkey) order is total, so every frame content is deterministic
    on both engines."""
    from pyspark.sql.window import Window

    start = Window.unboundedPreceding if unbounded_start else -prec
    w = (
        Window.partitionBy(part)
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(start, foll)
    )
    df = (
        load(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            getattr(F, agg)("o_custkey").over(w).alias("frame_val"),
        )
    )
    start_sql = "UNBOUNDED PRECEDING" if unbounded_start else (
        f"{prec} PRECEDING" if prec else "CURRENT ROW"
    )
    end_sql = f"{foll} FOLLOWING" if foll else "CURRENT ROW"
    oracle = f"""
    SELECT o_orderkey,
           CAST({_FRAME_AGGS[agg]}(o_custkey) OVER (
               PARTITION BY {part}
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN {start_sql} AND {end_sql}) AS BIGINT) AS frame_val
    FROM orders
    """
    ok, msg = compare("frame_fuzz", df, oracle, oracle_con)
    assert ok, f"{agg}/{part}/{start_sql}..{end_sql}: {msg}"


# ---------------------------------------------------------------------------
# Surface 7: random ROLLUP / CUBE / GROUPING SETS
# ---------------------------------------------------------------------------

_GS_DIMS = ("o_orderpriority", "o_orderstatus", "o_orderdate_year")


@pytest.mark.fuzz
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    kind=st.sampled_from(("rollup", "cube")),
    d1=st.sampled_from(_GS_DIMS),
    d2=st.sampled_from(_GS_DIMS),
    measure=st.sampled_from(("o_custkey", "o_orderkey")),
)
def test_random_grouping_sets_match_duckdb(kind, d1, d2, measure, spark, oracle_con):
    """Random ROLLUP/CUBE over derived dims with GROUPING() markers (the
    markers disambiguate subtotal NULLs from genuine NULL keys, making
    every row hash-identifiable)."""
    if d1 == d2:
        d2 = _GS_DIMS[(_GS_DIMS.index(d1) + 1) % len(_GS_DIMS)]
    base = load(spark, SF_DIR, "orders").select(
        F.col("o_orderpriority"),
        F.col("o_orderstatus"),
        F.year("o_orderdate").alias("o_orderdate_year"),
        F.col("o_custkey"),
        F.col("o_orderkey"),
    )
    grouped = getattr(base, kind)(d1, d2)
    df = grouped.agg(
        F.count("*").alias("n"),
        F.sum(measure).alias("msum"),
        F.grouping(d1).alias("g1"),
        F.grouping(d2).alias("g2"),
    )
    oracle = f"""
    WITH base AS (
        SELECT o_orderpriority, o_orderstatus,
               EXTRACT(year FROM o_orderdate) AS o_orderdate_year,
               o_custkey, o_orderkey
        FROM orders
    )
    SELECT {d1}, {d2},
           COUNT(*) AS n, CAST(SUM({measure}) AS BIGINT) AS msum,
           GROUPING({d1}) AS g1, GROUPING({d2}) AS g2
    FROM base
    GROUP BY {kind.upper()} ({d1}, {d2})
    """
    ok, msg = compare("gs_fuzz", df, oracle, oracle_con)
    assert ok, f"{kind}/{d1}/{d2}/{measure}: {msg}"

