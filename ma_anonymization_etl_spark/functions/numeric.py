"""Numeric helpers shared across operators — oracle-parity aware.

Float-sum parity (SURVEY.md §7 "hard parts" #1): a float64 SUM over 60k
values of magnitude ~1e4 accumulates order-dependent error up to ~1e-3,
so raw double sums can't be hash-compared.  Casting to DECIMAL doesn't
fix it either — Spark rounds the *shortest decimal repr* of a double
(Java BigDecimal.valueOf) while DuckDB rounds its exact binary
expansion, so values near a .00005 boundary round differently (observed:
~40/139k lineitem rows).

The deterministic construction used by ``dsum``:

    SUM(FLOOR(x * 10000)::BIGINT) / 10000.0

``x * 10000`` and ``FLOOR`` are identical IEEE ops in both engines, the
int64 sum is exact and order-independent, and the final division of
identical operands is identical.  Semantics: sums values truncated to
4 dp — documented per operator.  Overflow headroom: int64 holds sums to
9.2e14 at 4 dp; fine for 1e12-row × 1e4-magnitude workloads per group.

AVG/STDDEV/CORR keep float accumulation (result magnitudes are small,
error ~1e-8) and are ROUNDed to 4 dp on both sides instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Kept for ops that need a decimal type (not cross-engine sum parity).
DEC = "decimal(18,4)"

_SCALE = 10000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, order-independent, engine-identical SUM of a double column.

    Oracle twin: ``sql_dsum`` — keep the two in sync.
    """
    return (F.sum(F.floor(_c(col) * _SCALE)).cast("double") / _SCALE).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {_SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {_SCALE} AS {alias}"
    )


def ravg(col: Column | str, alias: str, nd: int = 4) -> Column:
    """ROUND(AVG(x), nd) — float accumulation bounded-rounded on both sides."""
    return F.round(F.avg(_c(col)), nd).alias(alias)


def sql_ravg(expr: str, alias: str, nd: int = 4) -> str:
    return f"ROUND(AVG({expr}), {nd}) AS {alias}"
