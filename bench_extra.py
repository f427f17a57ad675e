"""Extra benchmark harness (separate from the FROZEN bench.py): per-query
wall times over the declared `queries()` surface at an arbitrary scale
factor, with the same min-of-reps methodology the real bench uses.

Usage:
    python bench_extra.py [sf_dir] [reps] [query ...]

Prints one JSON line: {"sf_dir": ..., "reps": N, "queries": {name: sec}}.
Used for the round-7 optimization evidence (OPTIMIZATION_r07.md); the
driver-timed artifact remains bench.py, untouched.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])

    import __spark_entry__ as entry_mod
    from buildlog_consultant_spark.spark import get_spark

    spark = get_spark(f"local[32]", app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"[{name}] {best:.2f}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
