"""The end-to-end pipeline: scan → classify → enrich → route → aggregate.

Scale design notes (local[32] is a stand-in for a 1000-executor cluster):

* **One wide UDF stage, no explode.** Classification happens per document
  inside Arrow batches; per-line rows never exist, so the only shuffles in
  the whole job are the fan-out repartition and the aggregate (both on
  columns with bounded cardinality).
* **Column pruning.** Only (url, text, lang) are selected before the UDF —
  `html` (the bulky column at crawl scale) never leaves the Parquet scan.
* **Broadcast enrich.** The kind lookup is ~160 rows; the join never
  shuffles the classified side.
* **Skew-aware fan-out.** problem_kind is Zipfian (a few missing-* kinds
  dominate); the fan-out repartition salts the key with a deterministic
  hash so one hot kind spreads over `salt_buckets` tasks instead of one.
* **Resume.** Work is split into `n_shards` deterministic url-hash shards;
  each shard commits its output and a lineage row atomically (directory
  rename semantics of the parquet committer + lineage append). A rerun
  skips shards already present in the lineage table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .classify import classify_documents
from .enrich import enrich_with_remediation


def load_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Table-format abstraction: parquet now, iceberg when the runtime jar is
    on the classpath (`fmt="iceberg"` + a table identifier)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def classify_and_enrich(pages: DataFrame, keep_cols=("url", "lang")) -> DataFrame:
    classified = classify_documents(pages, text_col="text", keep_cols=keep_cols)
    return enrich_with_remediation(classified)


def aggregate_counts(enriched: DataFrame) -> DataFrame:
    """Per-kind/per-lang counts — partial+final hash aggregate, one shuffle
    on a low-cardinality key."""
    return (
        enriched.groupBy("problem_kind", "lang")
        .agg(
            F.count("*").alias("n"),
            F.count("match_line").alias("n_matched"),
        )
    )


def route_fanout(
    enriched: DataFrame,
    out_dir: str,
    salt_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Fan-out to per-kind sinks with salted repartition before the shuffle."""
    salted = enriched.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    )
    sink_key = F.coalesce(F.col("problem_kind"), F.lit("__unmatched__"))
    (
        salted.withColumn("sink_kind", sink_key)
        .repartition(F.col("sink_kind"), F.col("_salt"))
        .drop("_salt")
        .write.mode(mode)
        .partitionBy("sink_kind")
        .parquet(out_dir)
    )


@dataclass
class ShardResult:
    shard: int
    input_count: int
    matched_count: int
    wall_ms: int


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 1,
    resume: bool = True,
    salt_buckets: int = 8,
) -> list[ShardResult]:
    """Classify → enrich → fan-out per shard, with lineage + resume.

    Shards are deterministic url-hash buckets. Lineage rows land in
    ``{out_dir}/_lineage`` (shard, input_count, matched_count, wall_ms);
    a resumed run skips committed shards — idempotent at shard granularity.
    """
    lineage_dir = f"{out_dir}/_lineage"
    done: set[int] = set()
    if resume:
        try:
            done = {
                r.shard for r in spark.read.parquet(lineage_dir).select("shard").collect()
            }
        except Exception:
            done = set()

    results = []
    for shard in range(n_shards):
        if shard in done:
            continue
        t0 = time.time()
        shard_pages = (
            pages
            if n_shards == 1
            else pages.where(F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards)) == shard)
        )
        enriched = classify_and_enrich(shard_pages)
        enriched = enriched.persist()
        try:
            input_count = enriched.count()
            matched_count = enriched.where(F.col("match_line").isNotNull()).count()
            route_fanout(
                enriched,
                f"{out_dir}/routed/shard={shard}",
                salt_buckets=salt_buckets,
            )
            (
                aggregate_counts(enriched)
                .write.mode("overwrite")
                .parquet(f"{out_dir}/counts/shard={shard}")
            )
        finally:
            enriched.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        res = ShardResult(shard, input_count, matched_count, wall_ms)
        results.append(res)
        # lineage commit marks the shard done (append of a single-row file)
        spark.createDataFrame(
            [(shard, input_count, matched_count, wall_ms)],
            schema="shard int, input_count long, matched_count long, wall_ms long",
        ).coalesce(1).write.mode("append").parquet(lineage_dir)
    return results


def routed_rows_equal(a: DataFrame, b: DataFrame) -> bool:
    """North-rule routed-row equality: exceptAll empty in both directions."""
    cols = sorted(set(a.columns) & set(b.columns))
    a2, b2 = a.select(*cols), b.select(*cols)
    return a2.exceptAll(b2).isEmpty() and b2.exceptAll(a2).isEmpty()
