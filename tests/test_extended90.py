"""Semantic property tests for extension pack 90 (extended90.py)."""

from __future__ import annotations

from classification_problem_with_pyspark_spark.operators.extended90 import (
    DRIFT_MOD,
    MISSING_MOD,
    TOL_CENTS,
)
from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from classification_problem_with_pyspark_spark.sources.catalog import load
from tests.conftest import SF_DIR

load_all_modules()


def test_tolerance_reconciliation_matches_python_greedy(spark):
    row = QUERIES["join_tolerance_reconciliation"].fn(spark, SF_DIR).collect()[0]
    orders = load(spark, SF_DIR, "orders").collect()
    ledger = {o.o_orderkey: round(o.o_totalprice * 100) for o in orders}
    statement = {}
    for lid, cents in ledger.items():
        if lid % MISSING_MOD == 0:
            continue
        drift = (3 if lid % 2 == 0 else -3) if lid % DRIFT_MOD == 0 else 0
        statement[lid] = cents + drift
    # candidate pairs within tolerance
    by_cents = {}
    for lid, c in ledger.items():
        by_cents.setdefault(c, []).append(lid)
    cands = []
    for sid, sc in statement.items():
        for c in range(sc - TOL_CENTS, sc + TOL_CENTS + 1):
            for lid in by_cents.get(c, []):
                cands.append((abs(sc - ledger[lid]), sid, lid))
    # greedy-by-statement: each sid picks its best (adiff, lid)
    best_for_sid = {}
    for adiff, sid, lid in sorted(cands):
        if sid not in best_for_sid:
            best_for_sid[sid] = (adiff, lid)
    # one-use: each lid accepts its best claimant by (adiff, sid)
    claims = {}
    for sid, (adiff, lid) in best_for_sid.items():
        cur = claims.get(lid)
        if cur is None or (adiff, sid) < cur:
            claims[lid] = (adiff, sid)
    matched = [(sid, lid, adiff) for lid, (adiff, sid) in claims.items()]
    n_exact = sum(1 for _, _, a in matched if a == 0)
    n_tol = sum(1 for _, _, a in matched if a > 0)
    assert (row.n_ledger, row.n_statement) == (len(ledger), len(statement))
    assert row.n_matched == len(matched)
    assert (row.n_exact, row.n_tolerance) == (n_exact, n_tol)
    assert row.total_drift_cents == sum(a for _, _, a in matched)
    matched_sids = {s for s, _, _ in matched}
    matched_lids = {l for _, l, _ in matched}
    assert row.n_unmatched_statement == len(statement) - len(matched_sids)
    assert row.n_unmatched_ledger == len(ledger) - len(matched_lids)
    # the close-out story holds: drift lines matched within tolerance,
    # missing lines left ledger entries unmatched
    assert row.n_tolerance > 0
    assert row.n_unmatched_ledger >= len(ledger) // MISSING_MOD - 1


def test_duration_format_decomposition_conserves(spark):
    rows = QUERIES["scalar_duration_format_suite"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:500]:
        assert r.total_s == 86400 * r.days + 3600 * r.hours + 60 * r.minutes + r.seconds
        assert 0 <= r.hours < 24 and 0 <= r.minutes < 60 and 0 <= r.seconds < 60
        assert r.iso8601 == f"P{r.days}DT{r.hours}H{r.minutes}M{r.seconds}S"
    # multi-day durations genuinely occur (the D field does work)
    assert any(r.days > 0 for r in rows)
