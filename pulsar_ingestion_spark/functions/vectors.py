"""Vector math over array<float> embedding columns — pure built-ins.

Dot products / norms use ``F.aggregate`` (an ordered left fold), so the
floating-point summation order is DETERMINISTIC (array order) — required
for cross-engine hash parity (DuckDB oracle uses list_reduce, same fold).
Everything stays in whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity rounded for stable cross-engine ordering."""
    return F.round(cosine(a, b), digits)
