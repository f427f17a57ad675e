"""Micro-bench (VERDICT r4 #6): the interpreted bigram HOF in
with_repetition_signals vs an Arrow pandas-UDF kernel computing the same
four integer counts.

The HOF path (`F.transform` over a sequence + array_distinct) runs
interpreted (HOFs never enter whole-stage codegen), but it is per-row
map-side work either way — the question is only the interpreter constant
at realistic doc lengths. This script synthesizes N docs of ~L words with
planted repetition, times

  - hof:    the production with_repetition_signals aggregate
  - kernel: a pandas UDF (strip/split/set in Python per Arrow batch)

as min-of-reps aggregate jobs whose outputs are asserted EQUAL, and
prints one JSON line. Decision rule from the verdict: adopt the kernel
only if it is ≥2× at realistic lengths; either way the numbers land in
BENCH/BASELINE.md.

Usage: python scripts/bench_bigrams.py [n_docs] [words_per_doc]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s is ASCII-only
_COUNT_COLS = ["n_words", "n_distinct_words", "n_bigrams", "n_distinct_bigrams"]


def _repetition_counts_udf():
    """Arrow kernel candidate: same counts as with_repetition_signals
    (trim ASCII space, ASCII-\\s normalize, lower, split, set-distinct)."""
    from pyspark.sql.functions import pandas_udf

    def counts(ts):
        out = []
        for s in ts.values:
            t = (s or "").strip(" ")
            if not t:
                out.append((0, 0, 0, 0))
                continue
            w = _WS.sub(" ", t).lower().split(" ")
            nw = len(w)
            ndw = len(set(w))
            if nw < 2:
                out.append((nw, ndw, 0, 0))
                continue
            out.append((nw, ndw, nw - 1, len(set(zip(w, w[1:])))))
        return pd.DataFrame(out, columns=_COUNT_COLS)

    counts.__annotations__ = {"ts": pd.Series, "return": pd.DataFrame}
    return pandas_udf(
        counts,
        "n_words long, n_distinct_words long, n_bigrams long, "
        "n_distinct_bigrams long",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("bench_bigrams")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from buildlog_consultant_spark.ops.text import with_repetition_signals

    # synthetic corpus: ~length words/doc from a 97-word vocabulary (real
    # repetition), built JVM-side
    word = lambda e: F.concat(F.lit("w"), ((F.col("id") * 31 + e) % 97).cast("string"))
    text = F.concat_ws(" ", F.array(*[word(j) for j in range(length)]))
    df = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(32)
    )
    df.persist().count()

    kernel = _repetition_counts_udf()
    # warm the Python workers off the timed path
    df.limit(64).select(kernel("text").alias("c")).count()

    def timed(fn, reps: int = 3):
        best, out = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return out, round(best, 2)

    agg = [F.sum(c).alias(c) for c in _COUNT_COLS]
    hof_row, t_hof = timed(
        lambda: with_repetition_signals(df).agg(*agg).collect()[0]
    )
    k_row, t_kernel = timed(
        lambda: df.select(kernel("text").alias("c"))
        .select("c.*")
        .agg(*agg)
        .collect()[0]
    )
    assert tuple(hof_row) == tuple(k_row), (hof_row, k_row)

    print(
        json.dumps(
            {
                "n_docs": n,
                "words_per_doc": length,
                "hof_sec": t_hof,
                "kernel_sec": t_kernel,
                "kernel_speedup": round(t_hof / t_kernel, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
