"""Per-group ordinary least squares via EXACT integer sufficient
statistics — the regression/trend primitive (SQL's REGR_SLOPE /
REGR_INTERCEPT family) computed so the result is bit-identical across
engines.

Float formulations (avg-centered like most engines' regr_*) are
summation-order-dependent — a distributed sum of doubles changes with
partitioning, so the same query hashes differently run to run. Here
the caller first fixes x and y as LONGs (the repo's float convention:
``round(value * scale)`` per row — one deterministic rounding), and
everything downstream is exact:

    n, Σx, Σy, Σxy, Σxx            — integer sums (map-side combinable)
    slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    intercept = (Σy·Σxx − Σx·Σxy) / (n·Σxx − Σx²)

emitted as parts-per-million integers with decimal(38,0) arithmetic
and truncating division (Spark ``DIV`` ≡ DuckDB ``//`` ≡ C integer
division — all truncate toward zero; verified for negative operands,
which slopes and intercepts CAN be).

Magnitude contract: |10^6 · n · Σxy| must fit decimal(38,0). With
per-row |x·y| ≤ 10^12 that holds to ~10^19 rows — past any real
corpus; the per-group sums themselves are emitted as decimal(38,0),
not long, for the same reason.

Scale shape: ONE map-side-combinable hash aggregate over the fact
table (5 integer sums), then pure per-group arithmetic on the bounded
group table. No window, no join, no second pass. This is the textbook
"sufficient statistics" decomposition that makes OLS
embarrassingly parallel.

NULL policy: rows with NULL x or NULL y are excluded (SQL regr_*
semantics — pairwise deletion). A group where the denominator
n·Σxx − Σx² = 0 (fewer than 2 points, or constant x) has NULL slope
and intercept. NULL group keys form their own group (groupBy
semantics, identical in both engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def ols_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """(group..., n, sx, sy, sxy, sxx, slope_ppm, intercept_ppm):
    exact per-group OLS of y on x. ``x_col``/``y_col`` must already be
    integral (LONG) columns."""
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    stats = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
    )
    den = F.expr("n * sxx - sx * sx")
    return stats.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast(_DEC).alias("sx"),
        F.col("sy").cast(_DEC).alias("sy"),
        F.col("sxy").cast(_DEC).alias("sxy"),
        F.col("sxx").cast(_DEC).alias("sxx"),
        F.when(den != 0, F.expr(f"CAST({int(ppm_scale)} AS {_DEC}) * (n * sxy - sx * sy) DIV (n * sxx - sx * sx)"))
        .cast("long")
        .alias("slope_ppm"),
        F.when(den != 0, F.expr(f"CAST({int(ppm_scale)} AS {_DEC}) * (sy * sxx - sx * sxy) DIV (n * sxx - sx * sx)"))
        .cast("long")
        .alias("intercept_ppm"),
    )
