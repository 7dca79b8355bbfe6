"""Distributed exact global rank / ntile / top-k over ENTITY-scale
relations (round 9).

The bounded-grid helpers (plans/bounded_grid.py) are safe only for
VALUE-DOMAIN grids — one row per distinct score / day / bucket. Several
operators need an exact global ORDER over a relation that is
post-aggregation but ENTITY-scale (one row per user / part / vector /
path): those rows grow linearly with the fact table, so even the
"aggregate-sized" single-task sort is a 100×-scale bottleneck.

This module is the one place that order is spelled scalably, using the
bucket-stitch recipe (first used for audit_monotonic_id_gaps, r7):

1. bucket = floor(value / 2^bucket_bits). The NON-EMPTY-BUCKET grid is
   bounded by |value range| / 2^bucket_bits — a property of the value
   DOMAIN, not of the entity count.
2. A strictly-before cumsum over the bucket grid (via grid_cumsum, so
   the single-task WindowExec sees only the bucket histogram) gives
   each bucket its global rank base.
3. row_number() PARTITIONED BY bucket (hash-distributed, never a single
   task) orders rows inside each bucket; global rank = base + in-bucket
   row_number. The (value, *ties) ordering is a total order across
   buckets because floor-division is monotone.

bucket_bits=0 degenerates to the r8 distinct-value-histogram recipe
(bucket == value): right for small integer domains (counts, days,
scores); use 16-20 for wide cents/monetary domains so the bucket grid
stays tiny regardless of how many entities exist.

Skew note: a popular bucket becomes one large window partition; at real
scale choose bucket_bits so 2^bits ≪ value spread, and salt only if a
single VALUE dominates (then no exact total order exists without a
merge anyway).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.plans.bounded_grid import grid_cumsum

__all__ = [
    "bucketed_global_rank",
    "bucketed_global_topk",
    "bucketed_global_cumsum",
    "bucketed_global_cummax",
    "closed_form_ntile",
]

_BKT = "__gr_bkt"
_CNT = "__gr_cnt"
_BASE = "__gr_base"


_INTEGRAL_TYPES = {"bigint", "int", "smallint", "tinyint"}

# Test-only tag log (ADVICE r11): `_grid_k_cap` is a dynamic Python
# attribute propagated manually (`_carry_cap`), so a future transformation
# inserted between the tagging in `_with_bucket` and the bucket groupBy
# would silently drop it and the tripwire would fall back to trend
# heuristics. When set to a list, every value_range_k tagging appends its
# cap here; the multi-SF sweep cross-checks the multiset of caps observed
# ON captured grids against this log, so a dropped tag fails loudly
# instead of degrading invisibly.
RANGE_K_TAG_LOG: list[int] | None = None


def _with_bucket(
    df: DataFrame,
    value_col: str,
    bucket_bits: int,
    value_range_k: int | None = None,
) -> DataFrame:
    # Loud guard for the non-null contract (ADVICE r9): a NULL value would
    # yield a NULL bucket and the null-unsafe stitch join would then
    # silently DROP the row. raise_error makes the violation fail the job
    # instead; the per-row isNull check stays inside codegen and is free
    # on the contract-conforming path.
    v = F.when(
        F.col(value_col).isNull(),
        F.raise_error(
            F.lit(
                f"bucketed_global_*: NULL in value column {value_col!r} "
                "violates the documented non-null contract (the stitch "
                "join would silently drop the row)"
            )
        ),
    ).otherwise(F.col(value_col))
    if value_range_k is not None:
        # Range-normalized fixed-K buckets (round 11, VERDICT r10 #2): a
        # fixed 2^bits bucket WIDTH keeps the grid bounded only when the
        # value RANGE is a property of the domain. Aggregates whose
        # magnitude grows with data volume (per-part revenue, Walsh sums
        # of daily totals) widen their range ~linearly with SF, so the
        # grid grows with data. bucket = (v - min) DIV width with
        # width = (max - min) DIV K + 1 over the BROADCAST min/max keeps
        # the grid <= K+1 non-empty buckets at ANY magnitude; all
        # arithmetic is exact long DIV (monotone in v, so cross-bucket
        # ordering is preserved). Integral value domains only — the two
        # extra aggregate passes (min/max) share the input's exchange via
        # ReuseExchange. Range overflow needs max-min < 2^63; rather than
        # documenting that precondition, the width is computed ONCE in the
        # bounds aggregate behind a loud guard (ADVICE r11): a domain
        # spanning large-negative to large-positive longs overflows
        # (mx - mn) — wrapping NEGATIVE under non-ANSI (which would yield
        # a non-positive width and silently corrupt every bucket, hence
        # every rank) and throwing Spark's generic ARITHMETIC_OVERFLOW
        # under ANSI. `try_subtract` returns NULL on overflow in BOTH
        # modes, so the guard is deterministic regardless of the session's
        # ansi setting: width NULL while max is non-NULL == overflow ->
        # raise_error names this helper and the offending column. Empty
        # input keeps its prior behavior: NULL bounds -> NULL width ->
        # NULL bucket on zero rows (max is NULL, so the guard stays off).
        dt = df.schema[value_col].dataType.simpleString()
        if dt not in _INTEGRAL_TYPES:
            raise ValueError(
                f"value_range_k requires an integral value column, got {dt!r}"
            )
        k = int(value_range_k)
        bounds = df.agg(
            F.min(value_col).cast("long").alias("__gr_mn"),
            F.max(value_col).cast("long").alias("__gr_mx"),
        ).withColumn(
            "__gr_w",
            F.when(
                F.col("__gr_mx").isNotNull()
                & F.expr("try_subtract(__gr_mx, __gr_mn)").isNull(),
                F.raise_error(
                    F.lit(
                        "bucketed_global_* value_range_k: value range "
                        f"max-min of column {value_col!r} overflows signed "
                        "64-bit; range-normalized bucketing requires "
                        "max-min < 2^63"
                    )
                ).cast("long"),
            ).otherwise(F.expr(f"try_subtract(__gr_mx, __gr_mn) DIV {k} + 1")),
        )
        out = (
            df.withColumn("__gr_v", v.cast("long"))
            .crossJoin(F.broadcast(bounds))
            .withColumn(_BKT, F.expr("(__gr_v - __gr_mn) DIV __gr_w"))
            .drop("__gr_v", "__gr_mn", "__gr_mx", "__gr_w")
        )
        # Construction-cap tag for the cardinality tripwire: a fixed-K
        # grid holds <= K+1 non-empty buckets at ANY scale, so the
        # multi-SF sweep verifies the measured count against this cap
        # instead of applying growth heuristics (occupancy legitimately
        # fills BELOW the cap as SF grows).
        out._grid_k_cap = k + 1
        if RANGE_K_TAG_LOG is not None:
            RANGE_K_TAG_LOG.append(k + 1)
        return out
    if bucket_bits == 0:
        return df.withColumn(_BKT, v)
    return df.withColumn(_BKT, F.floor(v / F.lit(2**bucket_bits)).cast("long"))


def _check_frame_end(frame_end: int) -> None:
    if frame_end not in (0, -1):
        raise ValueError(
            f"frame_end={frame_end}: bucketed running aggregates support "
            "only 0 (inclusive) or -1 (strictly-before). The bucket base "
            "is always the strictly-before-BUCKET aggregate, so any other "
            "negative offset would silently include too much of the prior "
            "buckets (ADVICE r10)."
        )


def _carry_cap(grid: DataFrame, bucketed: DataFrame) -> DataFrame:
    """Propagate the fixed-K construction-cap tag from the bucketed
    relation onto the bucket GRID handed to grid_cumsum, so the capture
    hook (and therefore the multi-SF tripwire) sees it."""
    cap = getattr(bucketed, "_grid_k_cap", None)
    if cap is not None:
        grid._grid_k_cap = cap
    return grid


def _bucket_bases(bucketed: DataFrame, descending: bool) -> DataFrame:
    """Non-empty-bucket grid with each bucket's strictly-before row count
    (its global rank base). The grid_cumsum input is post-groupBy, so the
    single-task window holds |non-empty buckets| rows only."""
    bhist = _carry_cap(
        bucketed.groupBy(_BKT).agg(F.count("*").alias(_CNT)), bucketed
    )
    order = [F.desc(_BKT)] if descending else [F.asc(_BKT)]
    return grid_cumsum(bhist, order, [(_BASE, _CNT)], keep=[_BKT], frame_end=-1)


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    ties: Iterable[Column | str],
    *,
    descending: bool = True,
    bucket_bits: int = 0,
    value_range_k: int | None = None,
    out: str = "rn",
) -> DataFrame:
    """Append exact global ``row_number`` `out` under
    ``ORDER BY value_col [DESC], *ties`` without a whole-relation
    single-task sort. `value_col` must be numeric and non-null (all
    call sites rank non-null aggregates); `ties` must complete a total
    order for a deterministic result. `value_range_k` switches to
    range-normalized fixed-K buckets for magnitude-growing integral
    domains (see `_with_bucket`)."""
    bucketed = _with_bucket(df, value_col, bucket_bits, value_range_k)
    bases = _bucket_bases(bucketed, descending)
    val = F.desc(value_col) if descending else F.asc(value_col)
    w_in = Window.partitionBy(_BKT).orderBy(val, *ties)
    return (
        bucketed.join(F.broadcast(bases), _BKT)
        .withColumn(out, F.col(_BASE) + F.row_number().over(w_in))
        .drop(_BKT, _BASE)
    )


def bucketed_global_topk(
    df: DataFrame,
    value_col: str,
    ties: Iterable[Column | str],
    k: int,
    *,
    descending: bool = True,
    bucket_bits: int = 0,
    value_range_k: int | None = None,
    out: str = "rn",
) -> DataFrame:
    """Exact global top-k (rows with rank <= k plus the rank column):
    like `bucketed_global_rank` but rows in buckets whose base >= k are
    PRUNED before the in-bucket window, so the ranking work touches only
    head buckets — the selection is broadcast-prune + partitioned rank,
    never an entity-scale sort."""
    bucketed = _with_bucket(df, value_col, bucket_bits, value_range_k)
    bases = _bucket_bases(bucketed, descending).where(F.col(_BASE) < k)
    val = F.desc(value_col) if descending else F.asc(value_col)
    w_in = Window.partitionBy(_BKT).orderBy(val, *ties)
    return (
        bucketed.join(F.broadcast(bases), _BKT)
        .withColumn(out, F.col(_BASE) + F.row_number().over(w_in))
        .where(F.col(out) <= k)
        .drop(_BKT, _BASE)
    )


def bucketed_global_cumsum(
    df: DataFrame,
    value_col: str,
    ties: Iterable[Column | str],
    sums: Iterable[tuple[str, str]],
    *,
    descending: bool = False,
    bucket_bits: int = 0,
    value_range_k: int | None = None,
    frame_end: int = 0,
) -> DataFrame:
    """Exact running totals under ``ORDER BY value_col [DESC], *ties``
    without a whole-relation single-task window: per-bucket totals
    cumsum strictly-before on the bucket grid (the only single-task
    window — grid-sized) + an in-bucket framed running sum partitioned
    by bucket. `sums` is ``(out_name, src_col)`` pairs (numeric,
    non-null); `frame_end` 0 = inclusive running total, -1 =
    strictly-before (empty in-bucket frames coalesce to 0). Only those
    two frames exist here: the bucket base is always the
    strictly-before-BUCKET aggregate, so any other offset would
    silently include too much of the prior buckets (ADVICE r10 — hence
    the loud guard)."""
    _check_frame_end(frame_end)
    names = list(sums)
    bucketed = _with_bucket(df, value_col, bucket_bits, value_range_k)
    bagg = _carry_cap(
        bucketed.groupBy(_BKT).agg(
            *[F.sum(src).alias(f"__gr_s_{out}") for out, src in names]
        ),
        bucketed,
    )
    order = [F.desc(_BKT)] if descending else [F.asc(_BKT)]
    bases = grid_cumsum(
        bagg,
        order,
        [(f"__gr_b_{out}", f"__gr_s_{out}") for out, src in names],
        keep=[_BKT],
        frame_end=-1,
    )
    val = F.desc(value_col) if descending else F.asc(value_col)
    w_in = Window.partitionBy(_BKT).orderBy(val, *ties).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    out_df = bucketed.join(F.broadcast(bases), _BKT)
    for out, src in names:
        run = F.coalesce(F.sum(src).over(w_in), F.lit(0))
        out_df = out_df.withColumn(out, F.col(f"__gr_b_{out}") + run)
    return out_df.drop(_BKT, *[f"__gr_b_{out}" for out, _ in names])


def bucketed_global_cummax(
    df: DataFrame,
    value_col: str,
    ties: Iterable[Column | str],
    maxes: Iterable[tuple[str, str]],
    *,
    descending: bool = False,
    bucket_bits: int = 0,
    value_range_k: int | None = None,
    frame_end: int = 0,
) -> DataFrame:
    """Exact running MAX under ``ORDER BY value_col [DESC], *ties``
    without a whole-relation single-task window (round 10, for the
    skyline frontier): per-bucket maxes cummax strictly-before on the
    bucket grid (the only single-task window — grid-sized) + an
    in-bucket framed running max partitioned by bucket; the row's
    running max is the GREATEST of the two (null-skipping, so an empty
    prefix yields the in-bucket value and a fully empty frame yields
    NULL — the same semantics as ``max() OVER`` with that frame).
    `maxes` is ``(out_name, src_col)`` pairs; `frame_end` 0 = inclusive,
    -1 = strictly-before (NULL when nothing precedes) — no other frame
    is expressible over the strictly-before bucket base (ADVICE r10),
    so anything else fails loudly."""
    _check_frame_end(frame_end)
    names = list(maxes)
    bucketed = _with_bucket(df, value_col, bucket_bits, value_range_k)
    bagg = _carry_cap(
        bucketed.groupBy(_BKT).agg(
            *[F.max(src).alias(f"__gr_m_{out}") for out, src in names]
        ),
        bucketed,
    )
    order = [F.desc(_BKT)] if descending else [F.asc(_BKT)]
    bases = grid_cumsum(
        bagg,
        order,
        [(f"__gr_b_{out}", F.max(f"__gr_m_{out}")) for out, src in names],
        keep=[_BKT],
        frame_end=-1,
    )
    val = F.desc(value_col) if descending else F.asc(value_col)
    w_in = Window.partitionBy(_BKT).orderBy(val, *ties).rowsBetween(
        Window.unboundedPreceding, frame_end
    )
    out_df = bucketed.join(F.broadcast(bases), _BKT)
    for out, src in names:
        out_df = out_df.withColumn(
            out, F.greatest(F.col(f"__gr_b_{out}"), F.max(src).over(w_in))
        )
    return out_df.drop(_BKT, *[f"__gr_b_{out}" for out, _ in names])


def _idiv(a: Column, b: Column) -> Column:
    """Integer-exact ``a DIV b`` for non-negative longs at ANY magnitude
    (ADVICE r9: double-division-cast-to-long is exact only below ~2^53).
    Spelled as Spark's IntegralDivide builtin — long-in/long-out, exact
    at every magnitude, and CONFIG-INDEPENDENT (ADVICE r10: the former
    DECIMAL(38,0) remainder-stripped divide was exact only under the
    default spark.sql.decimalOperations.allowPrecisionLoss=true; with it
    false, decimal(38,0)/decimal(38,0) overflows the result precision
    and returns NULL, silently nulling every ntile). For the
    non-negative operands the helpers pass, truncating ``div`` equals
    floor division. Matches the repo's integer-exact DIV posture (cf.
    the windows.py ntile SQL spelling)."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def closed_form_ntile(rn: Column, n: Column, k: int) -> Column:
    """ANSI NTILE(k) as a closed form of (global row_number rn, total n):
    the first n % k tiles get n DIV k + 1 rows, the rest n DIV k —
    exactly Spark's and DuckDB's distribution rule. greatest(1, ·)
    guards the n < k degenerate relations where n DIV k = 0. All index
    arithmetic is integer-exact via `_idiv` — no float rounding at any
    row count."""
    big = _idiv(n, F.lit(k).cast("long"))  # n DIV k
    rem = n - big * k  # n % k
    cut = rem * (big + 1)
    return (
        F.when(rn <= cut, _idiv(rn - 1, big + 1) + 1)
        .otherwise(rem + _idiv(rn - cut - 1, F.greatest(F.lit(1), big)) + 1)
        .cast("int")
    )
