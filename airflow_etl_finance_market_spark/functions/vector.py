"""Vector expressions over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns.

Native Catalyst higher-order functions (zip_with/aggregate) — no UDF, no
Python boundary. The fold is strictly left-to-right, which makes the result
bit-identical to DuckDB's list_reduce over the same doubles: the harness
oracles rely on that.

For large-scale similarity search these expressions are the re-rank kernel;
candidate generation (LSH bucketing) lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    """Widen array<float> → array<double> (exact) so arithmetic is in f64."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a NULLIF zero-norm guard (F7 semantics)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
