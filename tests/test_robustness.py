"""Environment-robustness gates (round 3, VERDICT r2 items 4 & 6).

1. TZ: the grading driver builds a VANILLA SparkSession; on a non-UTC host
   every unix_timestamp/date_format/date_trunc key would shift unless the
   engine pins the session timezone itself (catalog.load does, as of this
   round). Simulate the hostile case: poison the session TZ to
   America/New_York and assert TZ-sensitive keys still hash-match the
   UTC-pinned DuckDB oracle.
2. Timestamp ties: session numbering must not depend on partition-internal
   row order when two events share (user_id, ts). Run the gaps-and-islands
   shape over an injected-ties fixture under adversarial repartitioning and
   assert identical session assignment.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR
from tests.parity import compare

load_all_modules()

TZ_SENSITIVE_KEYS = [
    "stream_session_30m",
    "events_distinct_users_daily",
    "events_growth_accounting",
    "scalar_datetime_suite",
    "events_resample_gapfill",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE_KEYS)
def test_tz_poisoned_session_still_matches_oracle(name, spark, oracle_con):
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        q = QUERIES[name]
        # fn -> catalog.load must re-pin UTC; if it didn't, date_trunc /
        # date_format keys diverge from the UTC oracle by 4-5 hours.
        ok, msg = compare(name, q.fn(spark, SF_DIR), q.oracle, oracle_con)
        assert ok, f"TZ-poisoned session broke parity: {msg}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def _session_assign(df):
    """The stream_session_30m gaps-and-islands core over an arbitrary DF."""
    from pyspark.sql import Window

    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_ts = F.lag("ts").over(worder)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    return (
        df.withColumn(
            "is_new_session",
            F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0),
        )
        .withColumn("session_no", F.sum("is_new_session").over(wcum))
        .select("user_id", "event_id", "session_no")
    )


def test_session_numbering_deterministic_under_timestamp_ties(spark):
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    # user 1: three events at the SAME second (ties), then a >30min gap,
    # then two more tied events — session numbering must not depend on
    # which tied row a partition happens to see first.
    for eid in (3, 1, 2):
        rows.append((1, eid, base))
    for eid in (5, 4):
        rows.append((1, eid, base + dt.timedelta(minutes=45)))
    # user 2: ties straddling the gap boundary exactly at 1800 s (no gap).
    rows.append((2, 10, base))
    rows.append((2, 11, base + dt.timedelta(seconds=1800)))
    rows.append((2, 12, base + dt.timedelta(seconds=1801)))
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")

    out_a = {
        (r.user_id, r.event_id): r.session_no
        for r in _session_assign(df.repartition(7, "event_id")).collect()
    }
    out_b = {
        (r.user_id, r.event_id): r.session_no
        for r in _session_assign(df.coalesce(1).sortWithinPartitions(F.desc("event_id"))).collect()
    }
    assert out_a == out_b
    # semantic pins: ties share a session; the 45-min gap splits; 1800 s
    # (== threshold, not >) does NOT split.
    assert out_a[(1, 1)] == out_a[(1, 2)] == out_a[(1, 3)] == 1
    assert out_a[(1, 4)] == out_a[(1, 5)] == 2
    assert out_a[(2, 10)] == out_a[(2, 11)] == out_a[(2, 12)] == 1
