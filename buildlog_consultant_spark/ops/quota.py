"""Per-key quotas — the domain/source budgeting pass of a web-scale
training-data pipeline (cap each domain's contribution so boilerplate-heavy
hosts don't dominate the corpus; CCNet/RefinedWeb-style source balancing).

The selection contract is EXACT and engine-portable: per key, keep the
``n_keep`` rows with the lowest (md5(id), id) — the same hash-spread order
deterministic_sample uses, so the kept set is identical on any cluster,
any partitioning, any engine, and a plain SQL oracle replays it.

The scale problem is the same one quality_quantiles solved for bounded
domains: the naive implementation (`row_number` over a per-key window)
sorts each key's ENTIRE row set in one task — a key holding 50% of a
10^12-row corpus is a single-task sort. This is the two-pass nearest-rank
selection generalized to an UNBOUNDED rank target:

  pass 1: bucket every row by a hash prefix (md5 is uniform, so buckets
          are balanced) and hash-aggregate per-(key, bucket) counts —
          the only operator that sees corpus rows, with map-side combine;
  pass 2: a cumulative window over the tiny (keys × buckets) count table
          locates each key's quota boundary; full buckets below the
          boundary keep every row with NO ranking, and only the single
          boundary bucket per key is ranked — a window over ~1/buckets of
          that key's rows (pick ``bucket_hex_chars`` so that slice fits a
          task: 2 → 256 buckets for moderate corpora, 4 → 65536 at crawl
          scale).

Because the bucket id is a PREFIX of the hash, (bucket, hash, id) order
equals (hash, id) order — the bucketed selection is bit-identical to the
naive global ranking (pinned by an equivalence test, including skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_quota(
    df: DataFrame,
    n_keep: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Keep at most ``n_keep`` rows per ``key_col``, selected as the
    lowest (md5(id), id) — deterministic, rerun-stable, oracle-replayable.
    Returns the input rows (original columns) that survive the quota.

    Shuffle shape: one hash-agg shuffle keyed on (key, bucket) for the
    counts; one broadcast of the (keys × buckets) boundary table; one
    window over ONLY the boundary buckets' rows (each ≈ key_rows /
    16^bucket_hex_chars). No task ever sorts a whole key."""
    if n_keep <= 0:
        return df.limit(0)
    h = F.md5(F.col(id_col).cast("string"))
    b = F.substring(h, 1, bucket_hex_chars)
    d = df.withColumn("_h", h).withColumn("_b", b)

    counts = d.groupBy(key_col, "_b").agg(F.count("*").alias("_cnt"))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # rows of this bucket to keep: clamp(n_keep - rows_before_bucket)
    meta = counts.select(
        key_col,
        "_b",
        "_cnt",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("_cnt"),
                F.lit(n_keep) - (F.sum("_cnt").over(w_cum) - F.col("_cnt")),
            ),
        ).alias("_kb"),
    )
    dd = d.join(F.broadcast(meta), [key_col, "_b"])
    keep_full = dd.where(F.col("_kb") == F.col("_cnt"))
    partial = dd.where((F.col("_kb") > 0) & (F.col("_kb") < F.col("_cnt")))
    w_rank = Window.partitionBy(key_col, "_b").orderBy("_h", id_col)
    keep_partial = (
        partial.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= F.col("_kb"))
        .drop("_rn")
    )
    return keep_full.unionByName(keep_partial).drop("_h", "_b", "_cnt", "_kb")


def key_quota_naive(
    df: DataFrame,
    n_keep: int,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The single-window formulation — kept ONLY as the equivalence
    reference for tests (it sorts each key's entire row set in one task;
    never on the query path)."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_keep)
        .drop("_rn")
    )
