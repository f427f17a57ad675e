"""Ordered funnel analysis over an append-only event stream — "of the
users who VIEWED, how many then CLICKED, then PURCHASED, in that
order?" — the conversion primitive every product/log pipeline computes.

Semantics (strict-order, earliest-completion): per user,
``t_1 = min(ts | type = step_1)`` and
``t_k = min(ts | type = step_k AND ts > t_{k-1})`` — each step must
happen STRICTLY after the earliest completion of the previous step.
Earliest-completion is the standard greedy funnel definition and is
what makes the whole computation aggregate-shaped: the greedy prefix
choice is optimal (if any ordered chain exists, one starting at the
earliest t_1 exists), so no per-user event-sequence scan is needed.

Scale shape: K conditional min-aggregates chained by K equi-joins on
the user key — NO window, NO per-user sort, NO collect_list. Each agg
is map-side combinable (a hot user partial-aggregates to one row per
partition before the exchange), and the step tables shrink
monotonically (step-k users ⊆ step-k-1 users), so every join after the
first is against a strictly smaller right side — AQE picks
broadcast/shuffle-hash as the survivor count allows. Contrast the
window formulation (sort every user's full event history) or a
sessionize-then-scan UDF: both shuffle and sort event-grain data per
key; this shape shuffles events once per step, pre-combined to
user-grain.

NULL policy: a NULL user id forms a group in step 1 (groupBy
semantics) but can never advance — equi-joins drop NULL keys on both
engines — so it reports as "entered, never converted". NULL timestamps
are ignored by min() on both engines and cannot satisfy ``ts > t``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user who completed step 1: (user, t_<step1>,
    t_<step2>, ...); t_<stepK> is NULL where the user never completed
    step K after t_<stepK-1>. Column names are ``t_<step>`` (steps must
    be distinct)."""
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    out_cols = [f"t_{s}" for s in steps]

    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(out_cols[0]))
    )
    acc = reached
    for step, prev_col, col in zip(steps[1:], out_cols, out_cols[1:]):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(reached.select(user_col, prev_col), user_col)
            .where(F.col(ts_col) > F.col(prev_col))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(col))
        )
        acc = acc.join(nxt, user_col, "left")
        # next step's "strictly after" anchor joins against the users
        # who reached THIS step (smaller table), not the step-1 set
        reached = acc.where(F.col(col).isNotNull()).select(user_col, col)
    return acc


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention — the activity triangle every product/log
    pipeline reports: users grouped by the DAY THEY FIRST APPEARED
    (cohort_day), counted on each later activity day as an offset
    (cohort_day, day_offset, n_users).

    Scale shape: collapse to DISTINCT (user, day) FIRST (retention
    counts users, not events — and it's also the cheapest possible
    projection: one hash agg over corpus rows); min-day per user is a
    second hash agg over those bounded pairs; one user-keyed equi-join
    stamps each pair with its cohort; the final (cohort, offset) agg
    counts users exactly (countDistinct within a group, two-phase hash
    agg). No window, no per-user sort.

    NULL policy: NULL ts rows can't date and NULL users can't cohort —
    both excluded up front (documented; countDistinct would silently
    skip NULL users anyway, so excluding them keeps the distinct pairs
    and the final count consistent)."""
    du = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        )
        .select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .distinct()
    )
    cohort = du.groupBy("u").agg(F.min("d").alias("cohort_day"))
    return (
        du.join(cohort, "u")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("u").alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling distinct-user counts (WAU when window_days=7): for every
    day with traffic, the EXACT count of distinct users active in the
    trailing ``window_days`` window — (day, active_users).

    Scale shape — fan out the AGGREGATE, not a distinct-over-window:
    a rolling COUNT(DISTINCT) can't be windowed (distinct doesn't
    decompose over frames) and a day×day range self-join explodes.
    Instead each DISTINCT (user, day) pair — already one corpus hash
    agg — is exploded to the ``window_days`` window-end days it
    contributes to (bounded ×7 map-side fan-out of the aggregate),
    semi-joined to days that actually have traffic, and counted with
    one exact countDistinct per day. Shuffle volume is
    window_days × |distinct pairs|, independent of event count.

    NULL ts/user excluded as in retention_cohorts."""
    du = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        )
        .select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .distinct()
    )
    days = du.select(F.col("d").alias("day")).distinct()
    fan = du.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("day"),
    )
    return (
        fan.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("u").alias("active_users"))
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per step with the number of users whose
    ordered chain reached it — the conversion table. A single count-agg
    over funnel_times' user-grain output (bounded by users, not
    events)."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    aggs = [
        F.count(f"t_{s}").alias(f"n_{s}") for s in steps
    ]
    wide = times.agg(*aggs)
    pairs = []
    for i, s in enumerate(steps):
        pairs.append(F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n_{s}").alias("n_users"),
        ))
    return (
        wide.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.step", "r.event_type", "r.n_users")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition table over per-user event
    sequences: (from_state, to_state, n, p_permille) where n counts
    consecutive pairs across all users and p_permille is the EXACT
    row-normalized probability floor(1000*n / total(from_state)) — the
    behavioral-model / anomalous-flow primitive of session analysis.

    Scale shape: ONE window (lag over user partitions — each partition
    is one user's history, bounded by per-user activity, never corpus-
    sized) feeding ONE map-side-combinable count agg; the permille
    normalization is a second window over the TRANSITION table, which
    is bounded by |state|^2 rows, not events. A per-user collect_list
    formulation would materialize whole histories per task; this never
    holds more than the lag's one-row lookback.

    Determinism: ties on ts are broken by the event id, so the lag
    order (ts, id) is total per user on both engines.

    NULL policy: NULL-user events are excluded up front (a NULL key
    would pool unrelated anonymous events into one fake user's
    "sequence" — PARTITION BY groups NULLs together on both engines,
    so the exclusion is semantic, not mechanical). A NULL event_type
    is a real state (groupBy groups NULLs; the permille window
    partitions them identically in Spark and DuckDB). Each user's
    first event has no predecessor and feeds no transition.
    """
    from pyspark.sql import Window

    # Row-position filter, not "from_state IS NOT NULL": lag() can't
    # distinguish "first event of the user" from "prior event's type is
    # genuinely NULL", and NULL is a real state here.
    seq = (
        events.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_t"),
            F.col(id_col).alias("_i"),
            F.col(type_col).alias("to_state"),
        )
        .withColumn("from_state", F.lag("to_state").over(
            Window.partitionBy("_u").orderBy("_t", "_i")
        ))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("_u").orderBy("_t", "_i")
        ))
        .where(F.col("_rn") >= 2)
    )
    counts = seq.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(1000 * n DIV SUM(n) OVER (PARTITION BY from_state) AS LONG)")
        .alias("p_permille"),
    )


def session_path_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(s1, s2, s3, n): counts of consecutive event-type TRIGRAMS per
    user history — the path-mining extension of event_transitions
    (common flows / anti-patterns like view->view->error). Same shape:
    one window over user partitions (two lags + row_number share ONE
    window spec, so Spark plans a single per-user sort bounded by that
    user's history), one map-side-combinable count agg over the
    bounded |states|^3 result. Same NULL policy: NULL users excluded,
    NULL type is a real state, row-position filter (rn >= 3) rather
    than lag-NULL filtering so leading NULL states aren't dropped."""
    from pyspark.sql import Window

    w = Window.partitionBy("_u").orderBy("_t", "_i")
    seq = (
        events.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_t"),
            F.col(id_col).alias("_i"),
            F.col(type_col).alias("s3"),
        )
        .withColumn("s1", F.lag("s3", 2).over(w))
        .withColumn("s2", F.lag("s3", 1).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") >= 3)
    )
    return seq.groupBy("s1", "s2", "s3").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
