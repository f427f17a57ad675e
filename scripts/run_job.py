"""spark-submit entry point for the parse→classify→enrich→route→aggregate job.

Usage (cluster form factor; local stand-in shown):

    scripts/submit.sh --master local[32] \
        --input /path/to/pages_parquet --output /tmp/out --shards 8

The script is shipped with the package zip via --py-files, so executors
resolve `buildlog_consultant_spark` without a cluster-wide install.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path (parquet/iceberg)")
    ap.add_argument("--output", required=True, help="output root for routed/counts/_lineage")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("buildlog-consultant-pipeline").getOrCreate()

    from buildlog_consultant_spark.spark.pipeline import load_pages, run_pipeline

    pages = load_pages(spark, args.input, fmt=args.format)
    results = run_pipeline(
        spark,
        pages,
        args.output,
        n_shards=args.shards,
        resume=not args.no_resume,
        salt_buckets=args.salt_buckets,
    )
    print(
        json.dumps(
            {
                "shards_run": [r.shard for r in results],
                "input_count": sum(r.input_count for r in results),
                "matched_count": sum(r.matched_count for r in results),
                "wall_ms": sum(r.wall_ms for r in results),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
