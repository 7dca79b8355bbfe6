"""Semantic property tests for extension pack 7 (extended7.py).

Oracle parity (tests/test_oracle_parity.py) already pins exact values;
these assert the MATHEMATICAL invariants the operators claim, so a future
refactor that stays self-consistent on both engines but breaks the
semantics still fails.
"""

from __future__ import annotations

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()


def test_line_dedup_removes_only_duplicated_windows(spark):
    rows = QUERIES["llm_line_dedup"].fn(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_chunks_total for r in rows)
    kept = sum(r.n_chunks_kept for r in rows)
    assert 0 < kept < total  # corpus HAS duplicate windows; not all drop
    for r in rows:
        assert 0 <= r.n_chunks_kept <= r.n_chunks_total, r
        # rebuilt text word count == 10·(kept-1) .. 10·kept (tail window short)
        n_words = len(r.clean_text.split()) if r.clean_text else 0
        assert n_words <= 10 * r.n_chunks_kept, r
        if r.n_chunks_kept > 0:
            assert n_words > 10 * (r.n_chunks_kept - 1) - 10, r


def test_line_dedup_surviving_windows_are_globally_unique(spark):
    rows = QUERIES["llm_line_dedup"].fn(spark, SF_DIR).collect()
    seen: dict[str, int] = {}
    for r in rows:
        if not r.clean_text:
            continue
        w = r.clean_text.split(" ")
        # Surviving windows were count==1 corpus-wide. Re-chunking the
        # REBUILT text does not reproduce original window boundaries (gaps
        # shift positions), so check the weaker global invariant: no
        # rebuilt text equals another doc's rebuilt text unless both kept
        # everything identical — i.e., rebuilt texts with >=1 kept chunk
        # of unique windows never collide across docs.
        key = r.clean_text
        assert key not in seen or not w, (r.doc_id, seen[key])
        seen[key] = r.doc_id


def test_semdedup_survivor_invariants(spark):
    rows = QUERIES["emb_semdedup"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    by_id = {r.vec_id: r for r in rows}
    dropped = [r for r in rows if r.is_dropped]
    assert dropped  # threshold chosen so some drop at sf0.01
    for r in dropped:
        assert r.dup_of is not None and r.dup_of < r.vec_id, r
        # survivor chain: dup_of points into the same cell
        assert by_id[r.dup_of].cell == r.cell, r
    for r in rows:
        if not r.is_dropped:
            assert r.dup_of is None, r
        assert 0 <= r.cell <= 15, r


def test_interpolation_gaps_lie_between_neighbors(spark):
    rows = QUERIES["window_linear_interpolate"].fn(spark, SF_DIR).collect()
    assert rows
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r.hour_start)
        # first/last rows are observed by construction (spine bounds)
        assert not rs[0].was_gap and not rs[-1].was_gap, et
        vals = [r.value_interp for r in rs]
        gaps = [i for i, r in enumerate(rs) if r.was_gap]
        assert gaps, et  # data has holes at sf0.01
        for i in gaps:
            lo = next(j for j in range(i - 1, -1, -1) if not rs[j].was_gap)
            hi = next(j for j in range(i + 1, len(rs)) if not rs[j].was_gap)
            lo_v, hi_v = vals[lo], vals[hi]
            assert min(lo_v, hi_v) - 1e-6 <= vals[i] <= max(lo_v, hi_v) + 1e-6, (
                et,
                i,
            )


def test_asof_forward_gap_nonnegative_and_minimal(spark):
    rows = QUERIES["join_asof_forward"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.gap_us >= 0, r
        assert r.next_purchase_ts >= r.click_ts, r  # lexicographic == temporal


def test_mann_kendall_stat_bounds(spark):
    rows = QUERIES["events_trend_mann_kendall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        n = r.n_days
        max_s = n * (n - 1) // 2
        assert -max_s <= r.s_stat <= max_s, r
        assert r.var_s > 0, r
        assert r.trend in ("increasing", "decreasing", "no_trend"), r
        # z and S must agree in sign (continuity correction keeps |z| smaller)
        if r.s_stat > 0:
            assert r.z_score >= 0, r
        elif r.s_stat < 0:
            assert r.z_score <= 0, r
        else:
            assert r.z_score == 0, r
