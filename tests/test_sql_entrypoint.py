"""EP2 (SURVEY.md §3): the engine registers temp views so queries run
through spark.sql as well as the DataFrame API. For keys whose oracle SQL
is dialect-shared ANSI, the SAME text must produce the SAME result through
Spark's parser — proving the parser entry point, not just the DataFrame
builder, against each engine's semantics.
"""

from __future__ import annotations

import pytest

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import register_views
from tests.conftest import SF_DIR

load_all_modules()

# keys whose oracle text parses identically in Spark SQL and DuckDB
DIALECT_SHARED = [
    "groupby_count",
    "project_rename",
    "agg_count_distinct",
    "agg_having",
    "join_semi",
    "subquery_scalar_above_avg",
    "subquery_exists_not_exists",
    "agg_bitwise",
    "setop_except_all",
    "graph_degree_distribution",
]


@pytest.mark.parametrize("name", DIALECT_SHARED)
def test_sql_text_matches_dataframe_result(name, spark):
    register_views(spark, SF_DIR)
    q = QUERIES[name]
    via_sql = {tuple(r) for r in spark.sql(q.oracle).collect()}
    via_df = {tuple(r) for r in q.fn(spark, SF_DIR).collect()}
    assert via_sql == via_df
