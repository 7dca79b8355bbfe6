"""Global-window ratchet (VERDICT r5 "Next round #3").

A `Window.orderBy(...)` with no `partitionBy` moves the ENTIRE input
relation to one task (Spark logs `WindowExec: No Partition Defined`).
On a grid of post-aggregation rows that is free; on a 100 TB fact table
it is the single likeliest scale-killer class left in the package. This
test freezes every current unpartitioned-window site behind an explicit
per-file allowlist with its boundedness argument — adding a NEW site (or
growing a file's count) fails CI until the author either partitions the
window, pre-aggregates to a bounded grid first, or consciously
allowlists it here with the argument written down.

Two spellings are ratcheted:
  - `Window.orderBy(` — ordered global window (rank/ntile/cumsum);
  - `Window.partitionBy()` with EMPTY args — unordered global window
    (whole-relation counts/sums used by in-plan median folds).

Companion of tests/test_collect_ratchet.py (driver-materialization
ratchet); together they pin the two "silently single-node" classes.

Boundedness argument vocabulary used below:
  grid        = post-groupBy relation whose row count is the distinct
                count of a low-cardinality key (days/weeks/scores/
                deciles/buckets/event-types/parts/strata) — the window
                runs AFTER the shuffle-agg already shrank the data;
  dim         = dimension table (nation/supplier/customer at TPC-H
                scale factors — bounded, never the fact table);
  top-k       = rank window immediately filtered to a constant k
                (TakeOrdered shape; docstring names the approx-
                percentile pre-cut that replaces it at 100 TB);
  documented  = the site IS a deliberate global sort and the operator
                docstring states the 100 TB posture (z-order OPTIMIZE's
                one legitimate write-side sort; layout audits that run
                on row-group samples at scale; exact-median keys whose
                scale form is a sketch).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "classification_problem_with_pyspark_spark"

# file → (max allowed `Window.orderBy(` sites, boundedness argument)
ORDERBY_ALLOWLIST = {
    "plans/bounded_grid.py": (3, "grid: the SHARED bounded-grid window helpers (grid_cumsum / grid_rank / grid_shift, one ordered-window site each) — boundedness is ENFORCED by a lineage walk (r9, ADVICE r8 medium): every root-to-leaf path of the input's analyzed plan must pass through Aggregate/Deduplicate or end in a literal relation, joins require ALL branches bounded — so every routed site is a post-aggregation distinct-value grid, never the fact relation (the fact-crossJoin-broadcast(agg) loophole of the old substring check is regression-tested); 74 of the 77 per-file sites at r8 open either route here (43 importing operator files) or were de-globalized outright; only the z-order write sort remains"),
    "operators/extended4.py": (3, "documented: z-order OPTIMIZE — the write job's one legitimate global sort; docstring names broadcast quantile boundaries at scale"),
}

# file → (max allowed empty `Window.partitionBy()` sites, argument).
# EMPTY since round 7: every former whole-relation count/sum window was
# rewritten as agg + crossJoin(broadcast) — the form that never funnels
# its input through one WindowExec task. New sites fail CI; prefer the
# agg + broadcast form.
EMPTY_PARTITIONBY_ALLOWLIST: dict[str, tuple[int, str]] = {}

_ORDERBY = "Window.orderBy("
_EMPTY_PB = re.compile(r"Window\.partitionBy\(\)")


def _sites(needle: str | re.Pattern) -> dict[str, int]:
    out: dict[str, int] = {}
    for p in sorted(PKG.rglob("*.py")):
        text = p.read_text()
        n = (
            len(needle.findall(text))
            if isinstance(needle, re.Pattern)
            else text.count(needle)
        )
        if n:
            out[str(p.relative_to(PKG))] = n
    return out


def _check(sites: dict[str, int], allow: dict[str, tuple[int, str]], kind: str):
    unknown = {f: n for f, n in sites.items() if f not in allow}
    assert not unknown, (
        f"new {kind} site(s) {unknown} — a global window single-tasks its "
        f"whole input at scale. Partition it, pre-aggregate to a bounded "
        f"grid first, or allowlist it here WITH its boundedness argument."
    )
    grown = {f: (n, allow[f][0]) for f, n in sites.items() if n > allow[f][0]}
    assert not grown, f"{kind} count grew beyond allowlist (got, max): {grown}"


def test_no_new_unpartitioned_ordered_windows():
    _check(_sites(_ORDERBY), ORDERBY_ALLOWLIST, "Window.orderBy-without-partitionBy")


def test_no_new_empty_partitionby_windows():
    _check(_sites(_EMPTY_PB), EMPTY_PARTITIONBY_ALLOWLIST, "empty Window.partitionBy()")


def test_no_unpartitioned_windows_inside_spark_sql():
    """The two allowlists above see only the DataFrame-API spelling; a
    `spark.sql("... OVER (ORDER BY ...)")` site is the same global window
    in SQL clothing. Every current OVER(ORDER BY) in the package lives in
    a DuckDB *oracle* string (driver-side, sf0.01 — not a scale surface);
    this AST scan keeps it that way by failing on any spark.sql(...),
    F.expr(...), expr(...), or selectExpr(...) call whose argument
    contains an un-partitioned OVER clause (the expr/selectExpr
    spellings would otherwise slip past both the DataFrame-API counts
    and the .sql scan)."""
    import ast

    pat = re.compile(r"OVER\s*\(\s*ORDER\s+BY", re.I)
    sql_attrs = {"sql", "expr", "selectExpr"}
    hits = []
    for p in sorted(PKG.rglob("*.py")):
        src = p.read_text()
        if not pat.search(src):
            continue
        for node in ast.walk(ast.parse(src)):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = (
                fn.attr
                if isinstance(fn, ast.Attribute)
                else fn.id if isinstance(fn, ast.Name) else None
            )
            if name not in sql_attrs:
                continue
            seg = ast.get_source_segment(src, node) or ""
            if pat.search(seg):
                hits.append(f"{p.relative_to(PKG)}:{node.lineno}")
    assert not hits, (
        f"unpartitioned OVER(ORDER BY) inside spark.sql/expr/selectExpr at "
        f"{hits} — add a PARTITION BY, pre-aggregate, or move the site to "
        f"the DataFrame API where the ratchet allowlist can hold its argument"
    )


def test_allowlists_not_stale():
    """Shrink the ratchet when sites are removed — keeps arguments honest."""
    ob = _sites(_ORDERBY)
    stale = [f for f in ORDERBY_ALLOWLIST if f not in ob]
    pb = _sites(_EMPTY_PB)
    stale += [f for f in EMPTY_PARTITIONBY_ALLOWLIST if f not in pb]
    assert not stale, f"allowlisted files no longer have sites — remove: {stale}"
