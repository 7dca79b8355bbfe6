"""Vector expression helpers (SURVEY.md §2.12 similarity search).

All pure JVM-side higher-order functions over array<float|double> columns —
no UDFs, no Python boundary, whole-stage-codegen friendly. Math runs in
DOUBLE: float32 accumulation would diverge from any oracle beyond ~1e-6
relative, while double accumulation error (~1e-15) is far inside the
round(·,6) grid used by the similarity queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, left-to-right."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm in double."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|) — classic cosine, double math throughout."""
    return dot(a, b) / (norm(a) * norm(b))
