"""Event-rate anomaly detection — "which (event_type, hour) buckets
spiked against their trailing day?" — the alerting primitive a log
pipeline runs on ingest rates, error rates, and crawler traffic.

Scale shape: ONE corpus-touching hash aggregate (events →
(type, hour, n) — partial+final, map-side combined), then windows over
the AGGREGATE only (types × hours rows, not events) — the same
histogram-first discipline as quality_quantiles. The trailing window
is RANGE-based on an integer epoch-hour index, so calendar gaps count
as zero traffic instead of silently stretching the window across a
quiet week (a ROWS window over observed hours would do exactly that).

Spike rule, exact integers end to end:

    n · window · den  >  num · sum_prev

i.e. n exceeds (num/den)× the trailing ``window``-hour MEAN (absent
hours contribute 0 to sum_prev and the denominator is the fixed
window length, so the mean is wall-clock-true). A bucket is eligible
only once its type has a full ``window`` hours of history span
(hour_idx - first_idx ≥ window) — young series never alert.

NULL policy: NULL-ts events carry no hour and are excluded up front;
NULL event_type is a normal series (groupBy semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_spikes(
    events: DataFrame,
    num: int = 2,
    den: int = 1,
    window: int = 24,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Flagged spike buckets: (event_type, hour, n, sum_prev) where n
    strictly exceeds (num/den)× the trailing ``window``-hour mean and
    the series has at least ``window`` hours of history."""
    hourly = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            type_col, F.date_trunc("hour", F.col(ts_col)).alias("hour")
        )
        .agg(F.count("*").alias("n"))
        .withColumn(
            "_idx", F.expr("CAST(CAST(hour AS LONG) DIV 3600 AS LONG)")
        )
    )
    by_type = Window.partitionBy(type_col)
    trail = (
        by_type.orderBy("_idx").rangeBetween(-window, -1)
    )
    flagged = (
        hourly.withColumn(
            "sum_prev",
            F.coalesce(F.sum("n").over(trail), F.lit(0)).cast("long"),
        )
        .withColumn("_first", F.min("_idx").over(by_type))
        .where(
            (F.col("_idx") - F.col("_first") >= window)
            & (F.col("n") * window * den > num * F.col("sum_prev"))
        )
    )
    return flagged.select(type_col, "hour", "n", "sum_prev")


def gap_fill_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Calendar densification — (event_type, hour, n) with a DENSE
    hourly spine per type between that type's first and last active
    hour, missing hours zero-filled. The gap-fill every dashboard /
    anomaly job needs (a window over sparse hours silently treats a
    dead hour as nonexistent; rate_spikes dodges that with RANGE
    frames — this materializes the honest spine instead).

    Scale shape: the corpus is touched ONCE by the (type, hour) hash
    agg (map-side combinable; output bounded by types x active hours).
    Everything after runs on aggregate-sized tables: per-type bounds
    from a types-sized agg, the spine via sequence+explode of epoch-
    hour indices (pure generation, no corpus scan), and one LEFT join
    spine <- hourly on (type, hour-index) — both sides aggregate-
    sized. A type spanning years costs |hours| spine rows, not corpus
    rows.

    Determinism/portability: the hour is reconstructed from the
    integer epoch-hour index (timestamp_seconds(idx*3600), session TZ
    pinned UTC) — never a float date op. NULL event_type is a real
    series (null-safe join key); NULL timestamps are excluded (no
    hour to bucket into).
    """
    hourly = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            type_col, F.date_trunc("hour", F.col(ts_col)).alias("_h")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_idx", F.expr("CAST(CAST(_h AS LONG) DIV 3600 AS LONG)"))
    )
    bounds = hourly.groupBy(type_col).agg(
        F.min("_idx").alias("_lo"), F.max("_idx").alias("_hi")
    )
    spine = bounds.select(
        F.col(type_col).alias("_st"),
        F.explode(F.sequence("_lo", "_hi")).alias("_sidx"),
    )
    return (
        spine.join(
            hourly,
            F.col("_st").eqNullSafe(F.col(type_col))
            & (F.col("_sidx") == F.col("_idx")),
            "left",
        )
        .select(
            F.col("_st").alias(type_col),
            F.timestamp_seconds(F.col("_sidx") * 3600).alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )
