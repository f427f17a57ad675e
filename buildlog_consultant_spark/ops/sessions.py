"""Batch sessionization + INCREMENTAL maintenance — the
incremental-view-maintenance shape that makes a 100 TB pipeline
affordable: each ingest recomputes sessions ONLY for users with new
events, from their session SUMMARIES + the new events, never
rescanning historical event rows.

Batch op (gaps-and-islands): a session is a maximal run of a user's
events with consecutive gaps <= gap_s (a gap of EXACTLY gap_s stays in
one session — the q_sessionization convention; note Spark's streaming
F.session_window uses the opposite boundary, splitting at gap >= gap_s
— the divergence is deliberate and documented, each query matches its
own oracle). One window over user partitions
(bounded by per-user history) assigns session ids via the running sum
of gap-breaks; one hash agg collapses to session grain.

Incremental op: under the APPEND-IN-TIME contract (every new event's
ts is strictly greater than all of that user's previous events — the
time-partitioned daily-ingest reality; late data violates it and needs
a wider re-window, documented), only a user's LAST session can be
affected by new events:

  * users absent from the batch: sessions pass through untouched
    (left_anti on the user key — no window, no rescans);
  * affected users: sessionize the NEW events alone (windows over the
    batch only), then stitch the boundary — the user's last old
    session merges with their first new session iff
    first_new.start - last_old.end <= gap_s (one max(struct)/
    min(struct) agg each + one user-keyed join; session summaries are
    sufficient statistics for the merge because the contract rules out
    events landing inside or before old sessions).

Equivalence to full recompute is the op's contract and is test-pinned
across split points, including splits that cut a session in half.

Scale shape: prev_sessions is SESSION-grain (orders of magnitude
smaller than events); every join/agg here is keyed on user or
session-grain rows; the only event-grain work is the window over the
NEW batch. NULL policy: NULL users and NULL timestamps are excluded
from sessionization up front (no key / no position — both engines
agree); ties on ts break by event id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user, session_start, session_end, n_events): gaps-and-islands
    sessions over non-NULL (user, ts) events."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    d = (
        events.where(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .withColumn("_prev", F.lag(ts_col).over(w))
        .withColumn(
            "_brk",
            (
                F.col("_prev").isNull()
                | (
                    # MICROSECOND grain on both engines: unix_timestamp
                    # truncates to whole seconds while DuckDB's epoch()
                    # is a fractional double, so a 1800.05 s gap would
                    # split in the oracle but merge here (review
                    # finding; unix_micros == epoch_us exactly)
                    # cast: parquet timestamps arrive TIMESTAMP_NTZ and
                    # unix_micros requires TIMESTAMP (session tz pinned
                    # UTC, so the cast is a pure reinterpretation)
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    - F.unix_micros(F.col("_prev").cast("timestamp"))
                    > F.lit(int(gap_s) * 1_000_000)
                )
            ).cast("long"),
        )
        .withColumn(
            "_sid",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        d.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .drop("_sid")
    )


def incremental_sessionize(
    prev_sessions: DataFrame,
    new_events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Merge a new (append-in-time) event batch into an existing
    session table; bit-equal to sessionize(old events + new events)
    under the contract. Only summaries and the new batch are read.
    The new batch's session table feeds three plan branches
    (first-session agg, rest anti-join, boundary stitch) — it is
    localCheckpointed (session-grain, bounded) so the batch window
    runs ONCE; checkpoint=False keeps the lazy plan for dumps/tests."""
    sess_cols = [user_col, "session_start", "session_end", "n_events"]
    affected = (
        new_events.where(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(user_col)
        .distinct()
    )
    untouched = prev_sessions.join(affected, user_col, "left_anti")
    old_aff = prev_sessions.join(affected, user_col, "left_semi")

    last_old = old_aff.groupBy(user_col).agg(
        F.max(
            F.struct("session_start", "session_end", "n_events")
        ).alias("_s")
    ).select(
        user_col,
        F.col("_s.session_start").alias("session_start"),
        F.col("_s.session_end").alias("session_end"),
        F.col("_s.n_events").alias("n_events"),
    )
    older = old_aff.join(
        last_old.select(
            F.col(user_col).alias("_lu"),
            F.col("session_start").alias("_ls"),
        ),
        (F.col(user_col) == F.col("_lu"))
        & (F.col("session_start") == F.col("_ls")),
        "left_anti",
    )

    new_sess = sessionize(new_events, gap_s, user_col, ts_col, id_col)
    if checkpoint:
        new_sess = new_sess.localCheckpoint(eager=True)
    first_new = new_sess.groupBy(user_col).agg(
        F.min(
            F.struct("session_start", "session_end", "n_events")
        ).alias("_s")
    ).select(
        F.col(user_col).alias("_fu"),
        F.col("_s.session_start").alias("_fs"),
        F.col("_s.session_end").alias("_fe"),
        F.col("_s.n_events").alias("_fn"),
    )
    rest_new = new_sess.join(
        first_new,
        (F.col(user_col) == F.col("_fu"))
        & (F.col("session_start") == F.col("_fs")),
        "left_anti",
    )

    # boundary stitch: last old session x first new session per user
    merged = last_old.join(
        first_new, F.col(user_col) == F.col("_fu"), "full_outer"
    )
    fuse = F.unix_micros(F.col("_fs").cast("timestamp")) - F.unix_micros(
        F.col("session_end").cast("timestamp")
    ) <= F.lit(int(gap_s) * 1_000_000)
    boundary = merged.select(
        F.coalesce(F.col(user_col), F.col("_fu")).alias(user_col),
        F.explode(
            F.when(
                F.col(user_col).isNull(),  # user new to the table
                F.array(F.struct(F.col("_fs").alias("session_start"),
                                 F.col("_fe").alias("session_end"),
                                 F.col("_fn").alias("n_events"))),
            )
            # no "_fu IS NULL" branch: the full_outer's right side is
            # always populated — last_old is semi-joined to `affected`,
            # and every affected user has >= 1 valid batch event and
            # therefore a first_new row (review finding: the branch was
            # unreachable)
            .when(
                fuse,
                F.array(
                    F.struct(
                        F.col("session_start"),
                        F.col("_fe").alias("session_end"),
                        (F.col("n_events") + F.col("_fn")).alias("n_events"),
                    )
                ),
            )
            .otherwise(
                F.array(
                    F.struct(F.col("session_start"), F.col("session_end"),
                             F.col("n_events")),
                    F.struct(F.col("_fs").alias("session_start"),
                             F.col("_fe").alias("session_end"),
                             F.col("_fn").alias("n_events")),
                )
            )
        ).alias("_r"),
    ).select(
        user_col,
        F.col("_r.session_start").alias("session_start"),
        F.col("_r.session_end").alias("session_end"),
        F.col("_r.n_events").cast("long").alias("n_events"),
    )

    return (
        untouched.select(*sess_cols)
        .unionByName(older.select(*sess_cols))
        .unionByName(boundary.select(*sess_cols))
        .unionByName(rest_new.select(*sess_cols))
    )
