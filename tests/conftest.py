"""Shared fixtures: one warm SparkSession + DuckDB oracle connection.

BASELINE.md implication: Spark cold start is ~11 s — reuse ONE session
across the whole test run or the suite is unusable.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classification_problem_with_pyspark_spark.session import get_spark
from classification_problem_with_pyspark_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
