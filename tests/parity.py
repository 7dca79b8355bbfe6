"""Local replica of the driver's DuckDB differential check (SURVEY.md §5.2).

Normalization mirrors the contract: sort columns by name, normalize values
(Decimal→float, datetime→isoformat µs), sort rows, compare. We compare
EXACT values — the engine's rule is that queries round order-sensitive
float aggregates in-query on both sides, so outputs must be bit-identical.
A tolerance-only match is reported as a WARNING (risky under the driver's
value-hash), not a pass.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal
from typing import Any

MISMATCH_PREVIEW = 5


def _norm_value(v: Any) -> Any:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def _close(a: Any, b: Any, rel: float = 1e-7) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)
    return a == b


def compare(name: str, spark_df, oracle_sql: str, con) -> tuple[bool, str]:
    """Returns (ok, message). ok=True only on exact match."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    if sorted(scols) != sorted(ocols):
        return False, f"{name}: COLUMN MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"{name}: ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"

    s = _normalize(srows, scols)
    o = _normalize(orows, ocols)
    if s == o:
        return True, f"{name}: OK ({len(s)} rows)"

    # Diagnose: exact mismatch — is it within float tolerance?
    diffs = [(a, b) for a, b in zip(s, o) if a != b]
    tol_ok = all(
        len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b)) for a, b in diffs
    )
    preview = "; ".join(f"spark={a} oracle={b}" for a, b in diffs[:MISMATCH_PREVIEW])
    if tol_ok:
        return False, (
            f"{name}: WARNING values differ only within float tolerance "
            f"({len(diffs)} rows) — WOULD FAIL the driver's hash. {preview}"
        )
    return False, f"{name}: VALUE MISMATCH ({len(diffs)} rows differ). {preview}"
