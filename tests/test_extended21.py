"""Semantic property tests for extension pack 21 (extended21.py)."""

from __future__ import annotations

from classification_problem_with_pyspark_spark.registry import QUERIES, load_all_modules
from tests.conftest import SF_DIR

load_all_modules()


def test_hhi_bounds_and_monopoly(spark):
    rows = QUERIES["agg_hhi_concentration"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        # HHI in (1/n, 1]: 1/n at perfect equality, 1 at monopoly
        lo = 1_000_000 // r.n_suppliers
        assert lo - 1 <= r.hhi_micro <= 1_000_000, r
        if r.n_suppliers == 1:
            assert r.hhi_micro == 1_000_000, r
        assert r.market_kdollars > 0


def test_hhi_more_suppliers_less_concentration_on_average(spark):
    rows = QUERIES["agg_hhi_concentration"].fn(spark, SF_DIR).collect()
    small = [r.hhi_micro for r in rows if r.n_suppliers <= 2]
    large = [r.hhi_micro for r in rows if r.n_suppliers >= 5]
    assert small and large
    assert min(small) > max(large)  # 2 suppliers can't beat 5+ spread evenly-ish


def test_bollinger_band_geometry(spark):
    rows = QUERIES["window_bollinger_bands"].fn(spark, SF_DIR).collect()
    assert rows
    n_breakout = 0
    for r in rows:
        assert r.n == 7
        assert r.lower_micro <= r.ma_micro <= r.upper_micro, r
        # band is symmetric around the mean to within floor loss
        mid2 = r.upper_micro + r.lower_micro
        assert abs(mid2 - 2 * r.ma_micro) <= 2, r
        if r.breakout_up:
            n_breakout += 1
            assert r.c * 1_000_000 > r.upper_micro, r
    # the synthetic series is tame: breakouts are rare but present
    assert 1 <= n_breakout <= len(rows) // 10


def test_bollinger_excludes_warmup(spark):
    rows = QUERIES["window_bollinger_bands"].fn(spark, SF_DIR).collect()
    per_type: dict[str, int] = {}
    for r in rows:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
    # 30 days of data, 7-day window -> exactly 24 full-window rows/type
    assert set(per_type.values()) == {24}
