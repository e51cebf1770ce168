"""Vector math over array<float> embedding columns — pure built-ins.

Dot products / norms use ``F.aggregate`` (an ordered left fold), so the
floating-point summation order is DETERMINISTIC (array order) — required
for cross-engine hash parity (DuckDB oracle uses list_reduce, same fold).
Everything stays in whole-stage codegen; no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_rounded_kernel(a: Column, b: Column, digits: int = 6) -> Column:
    """Bit-identical twin of :func:`cosine_rounded` for HIGH-VOLUME pair
    reranks (the §6n mechanism: the HOF fold dispatches ~6·dim
    interpreted lambdas per pair — three dots — which dominated the IVF
    rerank at the 100× point).

    The Arrow kernel computes ONLY the three dot products, each
    accumulated column-by-column in float64 — the exact IEEE sequence of
    the ordered ``F.aggregate`` fold — and returns them as a struct; the
    division, sqrt, and round stay JVM-side as the SAME expressions
    ``cosine_rounded`` uses.  No numpy rounding is involved anywhere
    (np.round is half-even; Spark/DuckDB round half-away — replicating
    BigDecimal rounding bitwise in numpy is not safe), so the result is
    bit-identical by construction (pinned by
    ``test_cosine_kernel_matches_hof``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("ab double, aa double, bb double")
    def _dots(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        if len(x) == 0:
            return pd.DataFrame({"ab": [], "aa": [], "bb": []})
        va = np.vstack(x.to_numpy()).astype(np.float64)
        vb = np.vstack(y.to_numpy()).astype(np.float64)
        n, dim = va.shape
        ab = np.zeros(n)
        aa = np.zeros(n)
        bb = np.zeros(n)
        for j in range(dim):
            ab += va[:, j] * vb[:, j]
            aa += va[:, j] * va[:, j]
            bb += vb[:, j] * vb[:, j]
        return pd.DataFrame({"ab": ab, "aa": aa, "bb": bb})

    d = _dots(a, b)
    return F.round(d["ab"] / (F.sqrt(d["aa"]) * F.sqrt(d["bb"])), digits)
