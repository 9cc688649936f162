"""Vector math over array<float|double> columns — built-in higher-order
functions only (zip_with / aggregate run inside codegen; no Python UDF,
no serialization per row). Foundation for the similarity-search operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right (deterministic)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(None)).otherwise(dot(a, b) / d)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
