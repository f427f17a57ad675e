"""Micro-bench: bucketed key_quota vs the naive per-key window on a
skewed corpus (one key = 50% of rows) — the shape where the naive
formulation degenerates into a single-task sort of half the corpus.

Synthesizes N rows JVM-side, runs both implementations as count jobs
(min-of-reps), asserts the kept sets agree on a sampled key, and prints
one JSON line. Usage: python scripts/bench_quota.py [n_rows] [n_keep]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_keep = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("bench_quota")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from buildlog_consultant_spark.ops.quota import key_quota, key_quota_naive

    # 50% of rows under one hot key, the rest spread over 1000 keys
    # (cold rows have odd ids, so (id-1) div 2 walks every residue —
    # id % 1000 alone only ever hits the 500 odd residues)
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("k"), F.expr("CAST(((id - 1) DIV 2) % 1000 AS STRING)")
                )
            )
            .alias("source"),
        )
        .repartition(32)
    )
    df.persist().count()

    def timed(fn, reps: int = 3):
        best, out = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return out, round(best, 2)

    n_bucketed, t_bucketed = timed(
        lambda: key_quota(df, n_keep, bucket_hex_chars=2).count()
    )
    n_naive, t_naive = timed(lambda: key_quota_naive(df, n_keep).count())
    assert n_bucketed == n_naive, (n_bucketed, n_naive)
    # spot-check set equality on the hot key (full sets agree by the
    # equivalence tests; this guards the benched configuration too)
    hot_b = {
        r[0]
        for r in key_quota(df, n_keep, bucket_hex_chars=2)
        .where(F.col("source") == "hot")
        .select("doc_id")
        .collect()
    }
    hot_n = {
        r[0]
        for r in key_quota_naive(df, n_keep)
        .where(F.col("source") == "hot")
        .select("doc_id")
        .collect()
    }
    assert hot_b == hot_n

    print(
        json.dumps(
            {
                "n_rows": n,
                "n_keep": n_keep,
                "kept_rows": n_bucketed,
                "bucketed_sec": t_bucketed,
                "naive_sec": t_naive,
                "speedup": round(t_naive / t_bucketed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
