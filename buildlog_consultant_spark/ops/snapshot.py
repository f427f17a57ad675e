"""Latest-record-per-key snapshot compaction — the CDC/upsert view a
log pipeline materializes ("current state per user/url/device" from an
append-only event stream; the batch analog of a streaming state store,
and what an Iceberg MERGE target holds after compaction).

Scale shape: ONE partial+final aggregate — `max(struct(ts, tiebreak,
payload...))` exploits Spark's lexicographic struct ordering so the
whole argmax is a map-side-combinable agg. (Physically Spark plans it
as SortAggregate, not HashAggregate — struct isn't a mutable hash
buffer type; `max_by` plans identically. The per-partition map-side
sort is spillable and bounded by partition size; what matters at scale
is the partial combine: only the winner per key per partition crosses
the ONE exchange, so shuffle bytes ≈ keys, not events.) The
alternative (`row_number() OVER (PARTITION BY key ORDER BY ts DESC)
= 1`) shuffles every version of every key into a per-key sort — the
same single-task-per-hot-key shape the bucketed quota work exists to
avoid; for snapshot compaction the agg formulation is strictly better.

Determinism: ties on the timestamp are broken by ``tiebreak_col``
(an id) INSIDE the struct ordering, so the kept row is unique and
engine-portable as long as (ts, tiebreak) is unique per key — the SQL
oracle replays the same (ts DESC, id DESC) choice with QUALIFY.

NULL policy: NULL keys form a normal group (groupBy semantics). A NULL
ts orders BEFORE every non-NULL struct in Spark's max (NULL-first for
max means it can never win against a real row) — mirrored in oracles
with NULLS LAST under DESC. A key whose every ts is NULL still emits
its (tiebreak-max) row rather than disappearing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per key: the row with the greatest (ts, tiebreak),
    original schema preserved (column order too). Single partial+final
    agg — see module doc for why this beats the window formulation at
    100 TB."""
    payload = [c for c in df.columns if c != key_col]
    ordered = [ts_col, tiebreak_col] + [
        c for c in payload if c not in (ts_col, tiebreak_col)
    ]
    win = df.groupBy(key_col).agg(
        F.max(F.struct(*ordered)).alias("_w")
    )
    return win.select(
        key_col, *[F.col(f"_w.{c}").alias(c) for c in payload]
    ).select(*df.columns)
