"""The shared bounded-grid cumsum helper (plans/bounded_grid.py, round 8):
the one place the distinct-value-grid family spells its single-partition
ordered window, with the boundedness argument enforced as a plan-shape
assertion instead of a ratchet-allowlist prose note.

Round 10 adds the multi-SF cardinality TRIPWIRE: the lineage-walk
assertion proves "post-aggregation", not "value-domain bounded" —
``groupBy(user_id)`` passes it while growing linearly with the fact
table. The tripwire counts every routed grid at sf0.01 AND sf0.1 and
fails any site whose cardinality tracks the scale factor (a value-domain
grid saturates; an entity-scale one grows ~10× per decade), replacing
round 9's one-off human audit with a structural gate (VERDICT r9 #2).
"""

import itertools
import json
import os

import pytest
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.plans import bounded_grid, global_rank
from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum


def test_grid_cumsum_running_total(spark):
    grid = (
        spark.range(6)
        .select((F.col("id") % 3).alias("k"), F.lit(1).alias("c"))
        .groupBy("k")
        .agg(F.sum("c").alias("n"))
    )
    rows = {
        r["k"]: r["cum"]
        for r in grid_cumsum(grid, ["k"], [("cum", "n")], keep=["k"]).collect()
    }
    assert rows == {0: 2, 1: 4, 2: 6}


def test_grid_cumsum_exclusive_frame_coalesces_first_row_to_zero(spark):
    grid = spark.range(4).groupBy("id").agg(F.count("*").alias("c"))
    rows = {
        r["id"]: r["before"]
        for r in grid_cumsum(
            grid, ["id"], [("before", "c")], keep=["id"], frame_end=-1
        ).collect()
    }
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3}


def test_grid_cumsum_rejects_unaggregated_relation(spark):
    fact = spark.range(10).select(F.col("id").alias("score"))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(fact, ["score"], [("cum", "score")], keep=["score"])


def test_grid_rank_row_number_and_ntile(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank

    grid = spark.range(4).groupBy("id").agg(F.count("*").alias("c"))
    rn = {r["id"]: r["rk"] for r in grid_rank(grid, [F.desc("id")], "rk").collect()}
    assert rn == {3: 1, 2: 2, 1: 3, 0: 4}
    nt = {
        r["id"]: r["half"]
        for r in grid_rank(grid, ["id"], "half", fn=F.ntile(2)).collect()
    }
    assert nt == {0: 1, 1: 1, 2: 2, 3: 2}


def test_grid_rank_rejects_unaggregated_relation(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_rank

    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_rank(spark.range(5), ["id"], "rk")


def test_grid_shift_lag_and_lead(spark):
    from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_shift

    grid = spark.range(3).groupBy("id").agg((F.first("id") * 10).alias("v"))
    out = {
        r["id"]: (r["prev"], r["next"])
        for r in grid_shift(
            grid, ["id"], [("prev", "v", -1), ("next", "v", 1)]
        ).collect()
    }
    assert out == {0: (None, 10), 1: (0, 20), 2: (10, None)}


def test_grid_cumsum_rolling_frame_and_column_aggregates(spark):
    grid = (
        spark.range(5)
        .groupBy("id")
        .agg((F.first("id") + 1).alias("v"))
    )
    out = {
        r["id"]: (r["n"], r["mx"], r["s"])
        for r in grid_cumsum(
            grid,
            ["id"],
            [("n", F.count("*")), ("mx", F.max("v")), ("s", "v")],
            keep=["id"],
            frame_start=-1,
        ).collect()
    }
    # 2-row rolling frame: count, max(v), sum(v) over {prev, current}
    assert out == {
        0: (1, 1, 1),
        1: (2, 2, 3),
        2: (2, 3, 5),
        3: (2, 4, 7),
        4: (2, 5, 9),
    }


def test_grid_cumsum_running_max(spark):
    grid = (
        spark.range(4)
        .groupBy("id")
        .agg((F.first("id") * 7 % 5).alias("v"))  # 0,2,4,1
    )
    out = {
        r["id"]: r["mx"]
        for r in grid_cumsum(
            grid, ["id"], [("mx", F.max("v"))], keep=["id"]
        ).collect()
    }
    assert out == {0: 0, 1: 2, 2: 4, 3: 4}


def test_grid_cumsum_accepts_distinct(spark):
    grid = spark.range(8).select((F.col("id") % 4).alias("v")).distinct()
    out = grid_cumsum(grid, [F.desc("v")], [("cum", "v")], keep=["v"])
    assert {r["v"]: r["cum"] for r in out.collect()} == {3: 3, 2: 5, 1: 6, 0: 6}


def test_grid_cumsum_rejects_fact_crossjoin_broadcast_aggregate(spark):
    """The r8 substring check's loophole (ADVICE r8 medium): a raw
    fact-scale relation cross-joined with a tiny broadcast aggregate
    total contains an Aggregate node SOMEWHERE in the plan, but the
    fact branch still funnels every row through one WindowExec task.
    The r9 lineage walk requires ALL join branches bounded."""
    fact = spark.range(10).select(F.col("id").alias("score"))
    tot = fact.agg(F.count("*").alias("n"))
    leaky = fact.crossJoin(F.broadcast(tot))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(leaky, ["score"], [("cum", "score")], keep=["score"])


def test_grid_cumsum_rejects_union_with_unbounded_branch(spark):
    agg = spark.range(6).groupBy((F.col("id") % 2).alias("v")).agg(
        F.count("*").alias("c")
    )
    mixed = agg.select("v").unionAll(spark.range(3).select(F.col("id").alias("v")))
    with pytest.raises(AssertionError, match="post-aggregation"):
        grid_cumsum(mixed, ["v"], [("cum", "v")], keep=["v"])


# ---------------------------------------------------------------------------
# Multi-SF grid-cardinality tripwire (round 10, VERDICT r9 #2)
# ---------------------------------------------------------------------------

_SF_LO, _SF_HI = "/root/testdata/sf0.01", "/root/testdata/sf0.1"

# Entity-scale rule, calibrated against the fixture tables: every entity
# table grows ~10× from sf0.01 to sf0.1 (customer 1.5k→15k, supplier
# 100→1k, part 2k→20k, documents 500→5k), while value-domain grids
# (scores, days, deciles, 2^bits price buckets) saturate by sf0.01. The
# >500 absolute floor ignores domain-fill jitter on tiny grids but keeps
# per-supplier grids (1000 rows at sf0.1) in scope; the 100k backstop
# catches near-fact-scale grids regardless of measured growth.
def _entity_scale(lo: int, hi: int) -> bool:
    return hi > 100_000 or (hi > 4 * lo and hi > 500)


def _captured_grid_counts(spark, fn, sf_dir) -> list[tuple[int, int | None]]:
    """(count, construction_cap) per routed grid. The cap is the
    `_grid_k_cap` tag the fixed-K (value_range_k) bucketing attaches:
    such grids hold <= cap non-empty buckets at ANY scale, so the sweep
    verifies the count against the cap instead of applying growth
    heuristics (occupancy legitimately fills below a hard cap).

    Cap-propagation cross-check (ADVICE r11): the tag is a dynamic
    attribute carried manually from `_with_bucket` to the bucket grid; a
    transformation inserted between tagging and the groupBy would drop it
    silently. Every value_range_k tagging logs its cap to
    `global_rank.RANGE_K_TAG_LOG`; asserting the multiset of caps seen ON
    captured grids equals the logged multiset turns a dropped tag into a
    loud failure naming the query."""
    bounded_grid.GRID_CAPTURE = cap = []
    global_rank.RANGE_K_TAG_LOG = tags = []
    try:
        fn(spark, sf_dir)
    finally:
        bounded_grid.GRID_CAPTURE = None
        global_rank.RANGE_K_TAG_LOG = None
    out = [(g.count(), getattr(g, "_grid_k_cap", None)) for g in cap]
    carried = sorted(k for _, k in out if k is not None)
    assert carried == sorted(tags), (
        f"value_range_k cap tags dropped between _with_bucket and the "
        f"captured grid: tagged caps {sorted(tags)} but grids carry "
        f"{carried} — a transformation between tagging and the bucket "
        f"groupBy lost the _grid_k_cap attribute (see _carry_cap)"
    )
    return out


def test_entity_scale_relation_trips_the_cardinality_rule(spark):
    """A one-row-per-customer relation passes the lineage assertion (it
    IS post-aggregation) — exactly the class the eight r9 offenders were
    in. The multi-SF rule must flag it."""
    counts = {}
    for sf in (_SF_LO, _SF_HI):
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        ent = cust.groupBy("c_custkey").agg(F.sum("c_acctbal").alias("v"))
        bounded_grid.GRID_CAPTURE = cap = []
        try:
            from classification_problem_with_pyspark_spark.plans.bounded_grid import (
                grid_rank,
            )

            grid_rank(ent, [F.desc("v"), F.asc("c_custkey")], "rk")
        finally:
            bounded_grid.GRID_CAPTURE = None
        assert len(cap) == 1  # the lineage walk accepted it — that's the gap
        counts[sf] = cap[0].count()
    assert _entity_scale(counts[_SF_LO], counts[_SF_HI])


# Trend gate (VERDICT r10 #3): the absolute thresholds in _entity_scale
# let sub-threshold growers coast (the r10 post-closing count audit found
# agg_tail_attribution_topk at 6.6k→17.8k — gate-passing but growing).
# Any site whose sf0.01→sf0.1 count ratio exceeds 1.5× with >50 rows at
# sf0.1 is flagged unless allowlisted here with a saturation argument
# (the reason a finite domain cap bounds it at every SF).
_TREND_RATIO, _TREND_MIN_HI = 1.5, 50
# Each entry documents why a finite, data-independent VALUE-DOMAIN cap
# bounds the site at every SF; the measured sf0.01→sf0.1 growth is
# occupancy filling BELOW that cap, not the cap moving. (Sites capped
# by fixed-K bucketing need no entry: value_range_k tags its grid with
# `_grid_k_cap` and the sweep verifies count <= cap structurally.)
# The r11 first run of this gate flagged ten sites: five were real
# growers and were rewritten (window_decile_migration_matrix ×2,
# llm_budgeted_selection_greedy, llm_quality_bucket_token_budget,
# llm_vocab_growth_curve — plus the unflagged-but-same-class
# sort_nulls suppkey branch, proactively); these five are the
# domain-capped remainder.
_TREND_ALLOW: dict[str, str] = {
    "events_kaplan_meier[site 1]": (
        "hour-granular duration domain: t_hours <= the fixed ~30-day "
        "event window in hours (~730 cap); 59->97 is day-fill"
    ),
    "ml_uncertainty_margin_sampling[site 0]": (
        "margin = top1-top2 of md5%1000(+boost) scores: domain subset of "
        "[0, 999+boost] by literal construction; 297->510 fills that cap"
    ),
    "scalar_semver_ordering_suite[site 0]": (
        "version numeric domain = (suppkey%3, %13, %7) folds: exactly "
        "3*13*7 = 273 values; sf0.1 sits AT the cap (100->273)"
    ),
    "scalar_semver_ordering_suite[site 1]": (
        "version string domain: same 273-value construction cap as site 0"
    ),
    "sort_nulls_ordering[site 0]": (
        "16-unit buckets over the fixed TPC-H acctbal range "
        "[-999.99, 9999.99]: <=688 buckets at any SF; 87->493 fills the cap"
    ),
}

_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "grid_cardinality_snapshot.json"
)


def _aligned_pairs(lo: list[int], hi: list[int]) -> list[tuple[int, int]]:
    """Cross-SF site alignment of plain counts. Per-index when the
    capture counts agree (plan building is deterministic). When a
    data-dependent iterative key changes its round count with SF, align
    the DESCENDING-sorted count lists pairwise, padding the missing side
    with 0 (ADVICE r10: the old max-vs-max fallback let a small growing
    grid hide behind a large saturated one; sorted pairwise keeps every
    site in scope, and an extra hi-side site with no lo counterpart
    compares against 0, which trips the trend gate if it is big)."""
    if len(hi) == len(lo):
        return list(zip(lo, hi))
    return list(
        itertools.zip_longest(
            sorted(lo, reverse=True), sorted(hi, reverse=True), fillvalue=0
        )
    )


def test_trend_gate_catches_the_r10_count_audit_sites():
    """The commit-a9bc1cf regression: agg_tail_attribution_topk measured
    6,600 -> 17,800 across the SF decade — inside the absolute gate
    (17,800 < 4x6,600 and < 100k) but plainly growing. The trend rule
    must flag exactly this shape."""
    c_lo, c_hi = 6_600, 17_800
    assert not _entity_scale(c_lo, c_hi)  # the r10 gate let it coast
    assert c_hi > _TREND_MIN_HI and c_hi > _TREND_RATIO * c_lo


def test_aligned_pairs_sorted_fallback_exposes_hidden_grower():
    """ADVICE r10: with differing capture lengths the old max-vs-max
    fallback compared only the largest sites, so a small growing grid
    hid behind a large saturated one. Sorted-descending pairwise keeps
    it in scope, and an extra hi-side site pairs against 0."""
    pairs = _aligned_pairs([30_000, 100], [30_000, 5_000, 900])
    assert (30_000, 30_000) in pairs
    assert (100, 5_000) in pairs  # the hidden grower, now visible
    assert (0, 900) in pairs  # the new hi-only site, compared against 0
    assert any(
        c_hi > _TREND_MIN_HI and c_hi > _TREND_RATIO * c_lo for c_lo, c_hi in pairs
    )
    # equal lengths stay per-index (plan building is deterministic)
    assert _aligned_pairs([3, 1], [4, 2]) == [(3, 4), (1, 2)]


@pytest.mark.slow
def test_grid_cardinality_sf_invariance_sweep(spark):
    """THE structural gate: build every registry query at sf0.01 with the
    capture hook on; for each query that routes relations through the
    grid helpers, re-build at sf0.1 and count each routed grid at both
    SFs. Any grid whose cardinality tracks SF is an entity-scale input
    that would silently re-create the single-task-window-scales-with-data
    class the r9 hand audit fixed. Three gates (r10 VERDICT #3 ratcheted
    this from thresholds to trend):

      1. absolute: _entity_scale (>4× and >500, or >100k) — the r10 rule;
      2. trend: any site growing >1.5× sf0.01→sf0.1 with >50 rows at
         sf0.1, unless allowlisted with a saturation argument;
      3. snapshot: the measured per-site counts must match the committed
         tests/grid_cardinality_snapshot.json (regenerate with
         GRID_SNAPSHOT_WRITE=1 after auditing any diff) — so every new
         or re-shaped grid site shows up in review, not just the ones
         that already crossed a threshold.
    """
    from classification_problem_with_pyspark_spark.registry import (
        QUERIES,
        load_all_modules,
    )

    load_all_modules()
    lo_counts: dict[str, list[tuple[int, int | None]]] = {}
    for name in sorted(QUERIES):
        counts = _captured_grid_counts(spark, QUERIES[name].fn, _SF_LO)
        if counts:
            lo_counts[name] = counts

    assert lo_counts, "capture hook saw no grid sites — hook broken?"

    measured: dict[str, dict[str, list]] = {}
    offenders: list[str] = []
    for name, lo in sorted(lo_counts.items()):
        hi = _captured_grid_counts(spark, QUERIES[name].fn, _SF_HI)
        measured[name] = {
            "lo": [c for c, _ in lo],
            "hi": [c for c, _ in hi],
            "caps": [k for _, k in hi],
        }
        # caps align per-index only when the capture shapes agree; the
        # sorted fallback (rare, iterative keys) is cap-blind by design
        caps = [k for _, k in hi] if len(hi) == len(lo) else [None] * max(
            len(hi), len(lo)
        )
        aligned = _aligned_pairs([c for c, _ in lo], [c for c, _ in hi])
        for i, (c_lo, c_hi) in enumerate(aligned):
            site = f"{name}[site {i}]"
            cap = caps[i] if i < len(caps) else None
            if cap is not None:
                # structurally capped (fixed-K bucketing): verify the
                # cap instead of growth heuristics
                if c_hi > cap:
                    offenders.append(
                        f"{site}: {c_hi} exceeds its construction cap {cap}"
                    )
                continue
            if _entity_scale(c_lo, c_hi):
                offenders.append(f"{site}: {c_lo} -> {c_hi} (absolute)")
            elif (
                c_hi > _TREND_MIN_HI
                and c_hi > _TREND_RATIO * c_lo
                and site not in _TREND_ALLOW
            ):
                offenders.append(f"{site}: {c_lo} -> {c_hi} (trend >1.5x)")
    assert not offenders, (
        "grid sites whose cardinality grows with SF (entity-scale input "
        "to a single-task window — use plans/global_rank bucket-stitch, "
        "or value_range_k for magnitude-growing domains): "
        f"{offenders}"
    )

    if os.environ.get("GRID_SNAPSHOT_WRITE") == "1":
        with open(_SNAPSHOT_PATH, "w") as f:
            json.dump(measured, f, indent=1, sort_keys=True)
        return
    with open(_SNAPSHOT_PATH) as f:
        committed = json.load(f)
    drift = {
        name: {"committed": committed.get(name), "measured": m}
        for name, m in measured.items()
        if committed.get(name) != m
    } | {
        name: {"committed": c, "measured": None}
        for name, c in committed.items()
        if name not in measured
    }
    assert not drift, (
        "per-site grid counts drifted from tests/grid_cardinality_snapshot.json "
        "— audit each diff (is the new count still domain-bounded?), then "
        f"regenerate with GRID_SNAPSHOT_WRITE=1: {drift}"
    )


def test_grid_cumsum_accepts_join_of_two_aggregates_and_literals(spark):
    a = spark.range(6).groupBy((F.col("id") % 3).alias("k")).agg(
        F.count("*").alias("ca")
    )
    b = spark.range(6).groupBy((F.col("id") % 3).alias("k")).agg(
        F.sum("id").alias("sb")
    )
    lit = spark.createDataFrame([(0, 10), (1, 20), (2, 30)], ["k", "w"])
    grid = a.join(b, "k").join(lit, "k")
    out = grid_cumsum(grid, ["k"], [("cum", "ca")], keep=["k", "sb", "w"])
    assert {r["k"]: r["cum"] for r in out.collect()} == {0: 2, 1: 4, 2: 6}
