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

from pyspark.sql import DataFrame, Window
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    hash_col: str = "text",
) -> DataFrame:
    """Snapshot reconciliation — the diff report a pipeline runs
    between two corpus versions (CDC validation, regression diff after
    a pipeline change): per key, 'added' / 'removed' / 'changed' /
    'same' judged by md5 of the payload column. Emits (key, status).

    Scale shape: ONE full-outer equi-join on the key — inherent (every
    key must meet its counterpart); payloads are reduced to md5 hashes
    MAP-SIDE BEFORE the join, so the shuffle carries 32-byte digests,
    not documents. NULL payloads hash as '' on both sides (repo
    coalesce policy — a NULL→NULL payload is 'same', NULL→'x' is
    'changed'). Keys must be non-NULL by contract: a full outer join
    NULL-rejects the key equality, so a NULL-key row would surface as
    a spurious added+removed pair; both sides filter them out
    (documented, mirrored by the oracle)."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.where(F.col(key_col).isNotNull()).select(
            F.col(key_col).alias(f"_k_{tag}"),
            F.md5(F.coalesce(F.col(hash_col), F.lit(""))).alias(
                f"_h_{tag}"
            ),
        )

    o, n = side(old, "o"), side(new, "n")
    joined = o.join(n, o["_k_o"] == n["_k_n"], "full_outer")
    status = (
        F.when(F.col("_k_o").isNull(), "added")
        .when(F.col("_k_n").isNull(), "removed")
        .when(F.col("_h_o") != F.col("_h_n"), "changed")
        .otherwise("same")
    )
    return joined.select(
        F.coalesce(F.col("_k_o"), F.col("_k_n")).alias(key_col),
        status.alias("status"),
    )


def history_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) history build — the
    complement of latest_by_key: EVERY version of a key, stamped with
    its validity interval [valid_from, valid_to); the newest version
    stays open (NULL valid_to). This is what an Iceberg/Hudi
    MERGE-with-history target or a point-in-time-join dimension holds.

    Scale shape: one window — lead(ts) over (key, ts ASC NULLS FIRST,
    tiebreak ASC). Unlike snapshot compaction (where the agg
    formulation avoids it), the per-key sort is INHERENT here: each
    version needs its successor, so every version of a key must meet
    in order. The partition is bounded by versions-per-key (small and
    roughly uniform for CDC streams); a pathologically hot key would
    need range-bucketed interval stitching, out of scope.

    Determinism/NULLs: ordering pins NULLS FIRST on ts (Spark's ASC
    default — the SQL oracle must say NULLS FIRST explicitly because
    DuckDB defaults NULLS LAST) and breaks ts ties by the id, so
    intervals are engine-portable whenever (ts, tiebreak) is unique
    per key. A NULL-ts version sorts oldest (valid_from NULL, closed
    by the first real version). NULL keys form one history group.

    Openness is signaled by ``is_current`` (the key's LAST version),
    NOT by ``valid_to IS NULL``: a version whose successor has NULL ts
    also gets NULL valid_to (= the successor's unknown valid_from), so
    a key with 2+ NULL-ts versions has several NULL-valid_to rows but
    exactly one is_current row."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc_nulls_first(), F.col(tiebreak_col).asc_nulls_first()
    )
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.lead(F.lit(1)).over(w).isNull())
    )
