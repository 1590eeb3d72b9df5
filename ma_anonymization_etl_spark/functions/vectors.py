"""Vector math over ARRAY<FLOAT> columns as native higher-order
expressions — no UDF, stays in whole-stage codegen.

Parity discipline: all accumulation is a *sequential left fold over
doubles* (F.aggregate), matching DuckDB's list_dot_product over
DOUBLE[] element order, so dot/cosine values are bit-identical across
engines before any rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
