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


def _with_bucket(df: DataFrame, value_col: str, bucket_bits: int) -> DataFrame:
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
    if bucket_bits == 0:
        return df.withColumn(_BKT, v)
    return df.withColumn(_BKT, F.floor(v / F.lit(2**bucket_bits)).cast("long"))


def _bucket_bases(bucketed: DataFrame, descending: bool) -> DataFrame:
    """Non-empty-bucket grid with each bucket's strictly-before row count
    (its global rank base). The grid_cumsum input is post-groupBy, so the
    single-task window holds |non-empty buckets| rows only."""
    bhist = bucketed.groupBy(_BKT).agg(F.count("*").alias(_CNT))
    order = [F.desc(_BKT)] if descending else [F.asc(_BKT)]
    return grid_cumsum(bhist, order, [(_BASE, _CNT)], keep=[_BKT], frame_end=-1)


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    ties: Iterable[Column | str],
    *,
    descending: bool = True,
    bucket_bits: int = 0,
    out: str = "rn",
) -> DataFrame:
    """Append exact global ``row_number`` `out` under
    ``ORDER BY value_col [DESC], *ties`` without a whole-relation
    single-task sort. `value_col` must be numeric and non-null (all
    call sites rank non-null aggregates); `ties` must complete a total
    order for a deterministic result."""
    bucketed = _with_bucket(df, value_col, bucket_bits)
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
    out: str = "rn",
) -> DataFrame:
    """Exact global top-k (rows with rank <= k plus the rank column):
    like `bucketed_global_rank` but rows in buckets whose base >= k are
    PRUNED before the in-bucket window, so the ranking work touches only
    head buckets — the selection is broadcast-prune + partitioned rank,
    never an entity-scale sort."""
    bucketed = _with_bucket(df, value_col, bucket_bits)
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
    frame_end: int = 0,
) -> DataFrame:
    """Exact running totals under ``ORDER BY value_col [DESC], *ties``
    without a whole-relation single-task window: per-bucket totals
    cumsum strictly-before on the bucket grid (the only single-task
    window — grid-sized) + an in-bucket framed running sum partitioned
    by bucket. `sums` is ``(out_name, src_col)`` pairs (numeric,
    non-null); `frame_end` 0 = inclusive running total, -1 =
    strictly-before (empty in-bucket frames coalesce to 0)."""
    names = list(sums)
    bucketed = _with_bucket(df, value_col, bucket_bits)
    bagg = bucketed.groupBy(_BKT).agg(
        *[F.sum(src).alias(f"__gr_s_{out}") for out, src in names]
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
    -1 = strictly-before (NULL when nothing precedes)."""
    names = list(maxes)
    bucketed = _with_bucket(df, value_col, bucket_bits)
    bagg = bucketed.groupBy(_BKT).agg(
        *[F.max(src).alias(f"__gr_m_{out}") for out, src in names]
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
    ``a - a % b`` is an exact multiple of ``b``; dividing exact multiples
    as DECIMAL(38,0) yields the integer quotient bit-exactly (the result
    type decimal(38,6) holds any long quotient with room to spare), so
    the final long cast never rounds. Matches the repo's integer-exact
    DIV posture (cf. the windows.py ntile SQL spelling)."""
    return ((a - a % b).cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")


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
