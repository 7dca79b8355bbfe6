"""Local replica of the driver's DuckDB differential check (SURVEY.md §5.2).

Normalization mirrors the contract: sort columns by name, normalize values
(Decimal→float, datetime→isoformat µs), sort rows, compare. We compare
EXACT values — the engine's rule is that queries round order-sensitive
float aggregates in-query on both sides, so outputs must be bit-identical.
A tolerance-only match is reported as a WARNING (risky under the driver's
value-hash), not a pass.

TYPE-STRICT (round-2 fix): the driver hashes canonical value *reprs*, so
``68`` (Spark BIGINT) vs ``68.0`` (DuckDB DOUBLE) is a driver FAIL even
though Python ``68 == 68.0`` is True. Every value is therefore normalized
to a ``(type_tag, canonical)`` pair — int vs float vs bool vs str can never
silently compare equal here while failing the driver's hash.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal
from typing import Any

MISMATCH_PREVIEW = 5


def _norm_value(v: Any) -> Any:
    """Normalize to a (type_tag, canonical) pair; containers recurse."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        # Distinct tag (round-3, ADVICE r2): Decimal reprs are scale-sensitive
        # ("1.50" vs "1.5") and the driver canonicalizes them differently from
        # float — conflating them with float here would hide exactly the
        # int-vs-float class of blind spot this module exists to close. The
        # oracle type gate in compare() bans DECIMAL/HUGEINT outputs outright,
        # so this tag should never match anything; if it does, it fails loudly.
        return ("decimal", str(v.normalize()))
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_norm_value(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("str", str(v)) if not isinstance(v, str) else ("str", v)


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x[1] is None, x[0], str(x[1])) for x in t))
    return out


def _close(a: Any, b: Any, rel: float = 1e-7) -> bool:
    """Tolerance compare over normalized (tag, value) pairs — diagnostics only."""
    ta, va = a if isinstance(a, tuple) and len(a) == 2 else ("?", a)
    tb, vb = b if isinstance(b, tuple) and len(b) == 2 else ("?", b)
    if ta in ("int", "float") and tb in ("int", "float"):
        if isinstance(va, str) or isinstance(vb, str):  # NaN sentinel
            return va == vb
        return math.isclose(float(va), float(vb), rel_tol=rel, abs_tol=1e-9)
    return a == b


_BANNED_ORACLE_TYPES = ("HUGEINT", "DECIMAL")


def driver_canon_hazard(rows: list[tuple], cols: list[str]) -> str | None:
    """Replicate the driver's pandas canonicalization (round-5 fix,
    VERDICT r4 #1): the real driver sorts the result through
    ``pandas.DataFrame.sort_values`` over every column before hashing.
    ``sort_values`` factorizes object columns, which *hashes* each cell —
    a list/dict cell raises ``TypeError: unhashable type`` and the key is
    recorded as ERR no matter how correct the values are (the
    `scalar_array_setops_suite` r4 incident; the HUGEINT lesson applied
    to the value layer). Running the same canon locally makes any such
    output fail HERE first. Returns an error string, or None if the
    frame canonicalizes cleanly.
    """
    import pandas as pd

    pdf = pd.DataFrame(rows or [], columns=cols)
    try:
        pdf.sort_values(by=sorted(cols), kind="mergesort")
    except TypeError as e:
        return f"pandas sort_values raised {type(e).__name__}: {e}"
    return None


def check_oracle_types(oracle_sql: str, con) -> list[str]:
    """Relation-type gate (VERDICT r2 #1): DuckDB promotes SUM(<integer>) to
    HUGEINT (int128) and literal arithmetic to DECIMAL; the driver's
    value-hash is type-sensitive while Python fetch flattens both to
    int/Decimal→float, so the drift is invisible to value comparison. Typing
    the relation lazily (no execution) catches the class at its source.
    Returns a list of offending "column: TYPE" strings (empty = clean).
    """
    rel = con.sql(oracle_sql)
    return [
        f"{c}: {t}"
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t) for b in _BANNED_ORACLE_TYPES)
    ]


def schema_canon_hazards(schema) -> list[str]:
    """Lazy (no-execution) twin of driver_canon_hazard: any ArrayType /
    MapType anywhere in the output schema — top-level or nested inside a
    struct — collects to a list/dict cell (or a tuple containing one)
    that pandas ``sort_values`` cannot hash. Returns offending
    "path: type" strings (empty = clean). Used by the all-key sweep in
    tests/test_driver_canon.py so the hazard is caught at schema-analysis
    time across the whole registry, not just the keys a round executes.
    """
    from pyspark.sql import types as T

    out: list[str] = []

    def walk(dtype, path: str) -> None:
        if isinstance(dtype, (T.ArrayType, T.MapType)):
            out.append(f"{path}: {dtype.simpleString()}")
        elif isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f.dataType, f"{path}.{f.name}")

    for f in schema.fields:
        walk(f.dataType, f.name)
    return out


def compare(name: str, spark_df, oracle_sql: str, con) -> tuple[bool, str]:
    """Returns (ok, message). ok=True only on exact, type-strict match."""
    banned = check_oracle_types(oracle_sql, con)
    if banned:
        return False, (
            f"{name}: ORACLE TYPE HAZARD {banned} — CAST to BIGINT/DOUBLE in "
            f"the oracle SQL (driver hash is type-sensitive)"
        )
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    if sorted(scols) != sorted(ocols):
        return False, f"{name}: COLUMN MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"{name}: ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"

    # Driver-canon gate: BOTH sides must survive the driver's pandas
    # sort_values canonicalization, or the driver records ERR regardless
    # of value correctness.
    for side, rows_, cols_ in (("spark", srows, scols), ("oracle", orows, ocols)):
        hazard = driver_canon_hazard(rows_, cols_)
        if hazard:
            return False, (
                f"{name}: DRIVER CANON HAZARD ({side} side) — {hazard}. "
                f"Stringify array/map outputs (array_join / array_to_string)."
            )

    s = _normalize(srows, scols)
    o = _normalize(orows, ocols)
    if s == o:
        return True, f"{name}: OK ({len(s)} rows)"

    # Diagnose: exact mismatch — tolerance-only or type-only drift?
    diffs = [(a, b) for a, b in zip(s, o) if a != b]
    tol_ok = all(
        len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b)) for a, b in diffs
    )
    preview = "; ".join(f"spark={a} oracle={b}" for a, b in diffs[:MISMATCH_PREVIEW])
    if tol_ok:
        return False, (
            f"{name}: WARNING values differ only by type or within float "
            f"tolerance ({len(diffs)} rows) — WOULD FAIL the driver's hash. {preview}"
        )
    return False, f"{name}: VALUE MISMATCH ({len(diffs)} rows differ). {preview}"
