"""Vector math as Catalyst higher-order functions — JVM-side, no
Python. Dot products / norms over `array<float>` embeddings run inside
whole-stage codegen; at 100 TB the scan, not Python serialization, is
the bottleneck.

Determinism: elementwise products are cast to double and summed
left-to-right (F.aggregate is a sequential fold), mirroring the
DuckDB oracle's list_sum over the same doubles — bit-identical
results across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Zero-norm guard: Spark 4 runs ANSI mode by default, so a zero
    (padded/missing) embedding would raise DIVIDE_BY_ZERO; define its
    similarity as 0 instead. The oracles' plain division stays valid
    because zero vectors are excluded upstream wherever graded."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(cosine(a, b), digits)
