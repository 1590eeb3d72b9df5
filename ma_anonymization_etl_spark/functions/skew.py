"""Skew mitigation — SCALE.md made executable.

AQE's skew-join splitting covers joins; for *aggregations* over a
hot key (one user_id owning 10% of 100 TB), pre-split the key with a
deterministic salt, partially aggregate per (key, salt), then combine.
Both stages are ordinary hash aggregates; the hot key's load spreads
over `buckets` reducers in stage 1 and collapses to one tiny row set
in stage 2.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 10000


def with_salt(df: DataFrame, cols: Sequence[str], buckets: int,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the whole row's stable columns —
    NOT rand() (reruns/retries must land rows in the same bucket)."""
    basis = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    return df.withColumn(salt_col, F.pmod(F.xxhash64(basis), F.lit(buckets)))


def salted_sum_count(df: DataFrame, keys: Sequence[str], value_col: str,
                     buckets: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregate: exact scaled-int sum + count per
    key, numerically identical to the direct groupBy (int sums are
    associative), robust to any key distribution."""
    keys = list(keys)
    stage1 = (
        with_salt(df, keys, buckets)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.floor(F.col(value_col) * _SCALE)).alias("__s"),
            F.count("*").alias("__n"),
        )
    )
    return stage1.groupBy(*keys).agg(
        (F.sum("__s").cast("double") / _SCALE).alias(f"sum_{value_col}"),
        F.sum("__n").alias("n"),
    )
