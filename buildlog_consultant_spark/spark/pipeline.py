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
* **Resume, single-scan.** Work is split into `n_shards` deterministic
  url-hash shards, but the input is NOT re-scanned per shard: one classify
  pass computes the shard id as a column and writes shard-partitioned
  output with dynamic partition overwrite. Checkpoint granularity is the
  *wave* (a group of shards processed in one pass, `shards_per_wave`):
  each wave commits its outputs plus one lineage row per shard; a rerun
  skips committed shards and dynamic overwrite makes half-written waves
  idempotent. At 10^12 rows you pick shards_per_wave so a wave's output
  fits the commit budget — input scans = n_waves, never n_shards.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .classify import classify_documents
from .enrich import enrich_with_remediation


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath.

    The sandbox image ships no iceberg-spark-runtime jar and has no network
    to fetch one (attempt documented in BENCH/BASELINE.md), so locally this
    returns False and the pipeline runs on the parquet stand-in; on a real
    cluster (--packages org.apache.iceberg:iceberg-spark-runtime-...) it
    returns True and fmt="iceberg" reads the real table."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_pages(
    spark: SparkSession, path: str, fmt: str = "parquet", strict: bool = False
) -> DataFrame:
    """Table-format abstraction: parquet or an Iceberg table identifier/path.

    fmt="iceberg" requires the runtime jar; without it we raise (strict) or
    fall back to parquet with a warning (the sandbox default), keeping the
    calling code identical across both environments."""
    if fmt == "iceberg":
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(path)
        if strict:
            raise RuntimeError(
                "fmt='iceberg' requested but no iceberg-spark-runtime jar on "
                "the classpath (add --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<version>)"
            )
        import logging

        logging.getLogger(__name__).warning(
            "iceberg runtime not on classpath; falling back to parquet at %s", path
        )
    return spark.read.parquet(path)


def classify_and_enrich(pages: DataFrame, keep_cols=("url", "lang")) -> DataFrame:
    classified = classify_documents(pages, text_col="text", keep_cols=keep_cols)
    return enrich_with_remediation(classified)


def aggregate_counts(enriched: DataFrame, extra_keys: tuple = ()) -> DataFrame:
    """Per-kind/per-lang counts — partial+final hash aggregate, one shuffle
    on a low-cardinality key."""
    return (
        enriched.groupBy(*extra_keys, "problem_kind", "lang")
        .agg(
            F.count("*").alias("n"),
            F.count("match_line").alias("n_matched"),
        )
    )


def choose_salt_buckets(
    df: DataFrame,
    kind_col: str = "problem_kind",
    target_rows_per_task: int = 5_000_000,
    sample_fraction: float = 0.01,
    seed: int = 42,
    cap: int = 256,
) -> int:
    """Pick the fan-out salt factor from an approximate kind histogram
    probed on a sample (SURVEY §7 "Skew": real logs concentrate in a few
    `missing-*` kinds; without salting the fan-out shuffle hot-spots one
    task). The hot kind's estimated row count divided by the per-task row
    budget gives the number of tasks the hot kind NEEDS; clamp to
    [1, cap] so tiny corpora don't over-split files and a pathological
    probe can't explode the shuffle. One sampled hash-agg job — at crawl
    scale the 1% sample never leaves the scan stage's combiners."""
    import math

    sample_fraction = min(max(sample_fraction, 1e-6), 1.0)
    row = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(kind_col)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("hot"))
        .collect()
    )
    hot_sampled = row[0]["hot"] or 0
    est_hot = hot_sampled / sample_fraction
    return max(1, min(cap, math.ceil(est_hot / max(target_rows_per_task, 1))))


def route_fanout(
    enriched: DataFrame,
    out_dir: str,
    salt_buckets: int = 8,
    mode: str = "overwrite",
    extra_partition_cols: tuple = (),
    dynamic: bool = False,
) -> None:
    """Fan-out to per-kind sinks with salted repartition before the shuffle.

    With ``extra_partition_cols=("shard",)`` and ``dynamic=True`` the write
    lands in shard=K/sink_kind=X directories and overwrites only the
    partitions present in this pass (dynamic partition overwrite) — the
    idempotent-rerun primitive for the single-scan sharded pipeline."""
    salted = enriched.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    )
    sink_key = F.coalesce(F.col("problem_kind"), F.lit("__unmatched__"))
    writer = (
        salted.withColumn("sink_kind", sink_key)
        .repartition(*[F.col(c) for c in extra_partition_cols], F.col("sink_kind"), F.col("_salt"))
        .drop("_salt")
        .write.mode(mode)
        .partitionBy(*extra_partition_cols, "sink_kind")
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(out_dir)


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
    salt_buckets: Optional[int] = 8,
    shards_per_wave: Optional[int] = None,
    max_waves: Optional[int] = None,
) -> list[ShardResult]:
    """Classify → enrich → fan-out with shard lineage + resume, single-scan.

    Shards are deterministic url-hash buckets computed as a COLUMN (one scan
    for all of them), not per-shard input filters (which would re-scan the
    table n_shards times — the round-1 design's scale bug). Shards are
    processed in waves of ``shards_per_wave`` (default: all remaining in one
    wave); each wave is one classify pass whose routed/counts writes use
    dynamic partition overwrite keyed by shard, so a crashed wave reruns
    idempotently. Lineage rows (shard, input_count, matched_count, wall_ms)
    are appended to ``{out_dir}/_lineage`` after the wave's data commits; a
    resumed run skips committed shards.

    ``max_waves`` bounds how many waves THIS invocation processes — the
    budget-bounded operational shape (one cron slot / one spot-instance
    lease processes K waves, the next invocation resumes), and the
    partial-failure simulation tests use it to stop between waves.

    ``salt_buckets=None`` probes the per-wave kind histogram
    (choose_salt_buckets) instead of using a fixed factor — the probe runs
    on the persisted classified wave, so it costs one sampled hash-agg
    over cached rows.
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

    todo = [s for s in range(n_shards) if s not in done]
    wave_size = shards_per_wave or max(len(todo), 1)
    if max_waves is not None:
        todo = todo[: max_waves * wave_size]
    results = []
    for w0 in range(0, len(todo), wave_size):
        wave = todo[w0 : w0 + wave_size]
        t0 = time.time()
        shard_col = F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards)).cast("int")
        wave_pages = pages.withColumn("shard", shard_col)
        if len(wave) < n_shards:
            wave_pages = wave_pages.where(F.col("shard").isin(wave))
        enriched = classify_and_enrich(
            wave_pages, keep_cols=("url", "lang", "shard")
        ).persist()
        try:
            # one aggregation pass yields every shard's lineage stats
            stats = {
                r["shard"]: (r["n"], r["m"])
                for r in enriched.groupBy("shard")
                .agg(F.count("*").alias("n"), F.count("match_line").alias("m"))
                .collect()
            }
            sb = (
                salt_buckets
                if salt_buckets is not None
                else choose_salt_buckets(enriched, sample_fraction=1.0)
            )
            route_fanout(
                enriched,
                f"{out_dir}/routed",
                salt_buckets=sb,
                extra_partition_cols=("shard",),
                dynamic=True,
            )
            (
                aggregate_counts(enriched, extra_keys=("shard",))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("shard")
                .parquet(f"{out_dir}/counts")
            )
        finally:
            enriched.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        wave_rows = [
            ShardResult(shard, *stats.get(shard, (0, 0)), wall_ms) for shard in wave
        ]
        results.extend(wave_rows)
        # lineage commit marks the wave's shards done (single small append)
        spark.createDataFrame(
            [(r.shard, r.input_count, r.matched_count, r.wall_ms) for r in wave_rows],
            schema="shard int, input_count long, matched_count long, wall_ms long",
        ).repartition(1).write.mode("append").parquet(lineage_dir)
        # repartition(1), NOT coalesce(1): the lineage frame is a
        # python-parallelized collection spread over defaultParallelism
        # partitions, and coalesce makes ONE task pull every parent
        # partition through the Python worker SEQUENTIALLY (~0.13 s per
        # partition = ~4 s per commit at local[32]); repartition's tiny
        # shuffle runs the pulls in parallel (measured 4.3 s → 0.45 s).
    return results


def routed_rows_equal(a: DataFrame, b: DataFrame) -> bool:
    """North-rule routed-row equality: exceptAll empty in both directions."""
    cols = sorted(set(a.columns) & set(b.columns))
    a2, b2 = a.select(*cols), b.select(*cols)
    return a2.exceptAll(b2).isEmpty() and b2.exceptAll(a2).isEmpty()
