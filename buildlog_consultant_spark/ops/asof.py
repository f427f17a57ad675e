"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key. Spark has no native ASOF JOIN (DuckDB and
pandas do); the naive range-join formulations either explode (inequality
join → BroadcastNestedLoop/cartesian) or shuffle per candidate pair.

This implementation is the scale-safe union + running-window form:

  1. union the two sides into one frame tagged by side,
  2. one shuffle keyed on the join key, sorted by (ts, side-tag, id),
  3. a running ``last(right_payload, ignorenulls=True)`` window carries
     the latest right row forward onto each left row.

Cost at 10^12 rows: exactly ONE shuffle of left+right (same as any keyed
join), no candidate expansion, and the window is rows-between-unbounded-
preceding — a streaming pass per key partition, no per-row rescans.
Skewed keys behave like any keyed shuffle (salt upstream if one user is
half the corpus).

Tie semantics match DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``:
a right row with ts equal to the left row's ts DOES match (the right side
sorts first at equal ts); among right rows sharing (key, ts) the one with
the greatest id wins deterministically — the window sort ends on the right
id, so the running ``last()`` lands on the max-id row with NO extra dedup
pass (DuckDB's ASOF leaves the choice among exact-tie right rows
unspecified, so the oracle dedupes explicitly to the same winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_payload: tuple = (),
) -> DataFrame:
    """Backward as-of join (left rows pick the latest right row with
    ``right.ts <= left.ts``, per ``on`` key). Returns all left columns plus
    ``asof_<right_id>`` and ``asof_gap_sec`` (seconds from the matched
    right row to the left row, tz-shift-invariant), NULL when no right row
    precedes. ``right_payload`` names extra right columns to carry, each
    surfaced as ``asof_<name>``."""
    payload = [right_id, *right_payload]

    # NULL-key rows never match (equality-join semantics: DuckDB ASOF's
    # l.k = r.k is NULL-rejecting, while a window partition would group
    # NULL keys together); NULL-key left rows are kept with NULL match
    # columns since their partition carries no right rows.
    # NULL-ts RIGHT rows likewise never match (DuckDB: l.ts >= NULL is
    # never true) — without the filter they'd sort nulls-first to the
    # start of the partition and be carried by last(ignorenulls) as a
    # spurious match for every left row with no earlier real right row.
    # NULL-ts LEFT rows are kept with NULL match columns: they sort
    # nulls-first too, ahead of every (filtered, non-NULL-ts) right row,
    # so the running last() sees nothing — same as DuckDB, where a NULL
    # left ts satisfies no l.ts >= r.ts predicate.
    # The right payload travels as ONE struct so every output row's
    # payload columns come from the SAME matched right row - per-column
    # last(ignorenulls) would skip a matched row's NULL payload value and
    # smear in an older row's.
    struct_type = (
        "struct<"
        + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload
        )
        + f", ts: {right.schema[ts_col].dataType.simpleString()}>"
    )
    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(left_id).alias("_lid"),
        F.lit(None).cast(struct_type).alias("_r"),
    )
    r_tagged = right.where(
        F.col(on).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        F.struct(
            *[F.col(c) for c in payload], F.col(ts_col).alias("ts")
        ).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (_side 0) sort before left rows at equal ts, so an
    # equal-ts right row is visible to the left row's running last();
    # the trailing right-id key makes last() land deterministically on
    # the greatest right id among exact-(key, ts) ties — no dedup pass,
    # so the whole operator costs exactly one exchange
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col("_lid").asc(),
            F.col(f"_r.{right_id}").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    matched = carried.where(F.col("_side") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(on),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in payload],
        (
            F.unix_timestamp(F.col(ts_col).cast("timestamp"))
            - F.unix_timestamp(F.col("_m.ts").cast("timestamp"))
        ).alias("asof_gap_sec"),
    )
    # rejoin the remaining left columns by left_id only if callers need
    # them; the id + key + match columns are the operator's contract
    return matched
