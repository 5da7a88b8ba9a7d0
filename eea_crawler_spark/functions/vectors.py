"""Vector column expressions over ``array<float>`` embedding columns.

All math is built-in higher-order functions (zip_with/aggregate), cast to
DOUBLE element-wise before multiplying and summed strictly left-to-right —
this makes the result bit-reproducible and lets the DuckDB oracle
(list_transform + list_sum, also sequential) match after ROUND.

Scale posture: these are per-row expressions — no shuffle, no UDF; a
cosine over a 768-dim column is 768 fused codegen ops per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    """Cosine rounded for cross-engine determinism (see module docstring)."""
    return F.round(cosine(a, b), digits)
