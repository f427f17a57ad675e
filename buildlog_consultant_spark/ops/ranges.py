"""Point-in-interval RANGE JOIN via bucket expansion — the equi-join
rewrite of ``point BETWEEN lo AND hi``.

Spark has no native band/interval join: a naive
``points.join(ranges, point.between(lo, hi))`` plans a
BroadcastNestedLoopJoin (or a CartesianProduct once the ranges side
outgrows the broadcast threshold) — O(|points| x |ranges|) compares,
the classic scale-killer of IP-geolocation / value-band / calendar-
period lookups at crawl scale.

The rewrite (the standard trick range-join implementations ship —
e.g. Databricks' bin-based range join; same idea as the similarity
ops' LSH bucket joins in this repo):

  * pick a bucket width ``B``;
  * each interval [lo, hi] is exploded to its covered bucket ids
    ``lo DIV B .. hi DIV B`` (``1 + width/B`` rows — BOUNDED when
    interval width is bounded, the documented contract);
  * each point lands in the single bucket ``point DIV B``;
  * equi-join on the bucket id, then re-check the exact BETWEEN as a
    residual filter (bucket co-residence is necessary, not
    sufficient).

Scale shape: ONE hash-partitioned equi-join — both sides shuffle on
the bucket id (or broadcast when the exploded ranges side is small),
never a nested loop. Per-bucket work is |points in bucket| x |ranges
covering bucket|; pick B near the typical interval width so the
expansion factor stays ~2 and hot buckets stay bounded. A pathological
hot bucket (many intervals stacked on one value band) is a skew key —
AQE skew-join splitting applies because this IS a plain shuffle join.

Contracts:
  * coordinates are non-negative integers (DIV is floor only for
    non-negatives; a signed domain would need the exact-floor division
    of quota._div) — documented, not enforced row-by-row;
  * rows with NULL point / NULL lo / NULL hi and inverted intervals
    (hi < lo) match nothing and are dropped up front (inner-join
    semantics; ``sequence(lo DIV B, hi DIV B)`` would DESCEND on an
    inverted interval and silently invent buckets);
  * interval width should be bounded: a single interval spanning the
    whole domain explodes into domain/B bucket rows. That is the
    documented cost model, not a correctness issue.

Reference parity note: the reference engine has no interval join
either; this is part of the beyond-reference training-pipeline
surface (SURVEY.md §2c), built on public bin-based range-join
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval row of ``ranges`` with
    ``lo <= point <= hi``, as ONE bucket equi-join plus residual
    filter. Returns points columns followed by ranges columns (the
    caller keeps column names disjoint, as with any join)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    # sequence() over the DIV endpoints — spelled via expr so the
    # division is integral (DIV), not double (/).
    r = ranges.where(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    ).withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(CAST({lo_col} AS LONG) DIV {int(bucket_width)}, "
                f"CAST({hi_col} AS LONG) DIV {int(bucket_width)})"
            )
        ),
    )
    p = points.where(F.col(point_col).isNotNull()).withColumn(
        "_bucket",
        F.expr(f"CAST({point_col} AS LONG) DIV {int(bucket_width)}"),
    )
    return (
        p.join(r, "_bucket")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bucket")
    )


def naive_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Direct theta-join formulation — equivalence reference for tests
    only (plans a nested-loop; never on the query path)."""
    return points.where(F.col(point_col).isNotNull()).join(
        ranges,
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)),
    )
