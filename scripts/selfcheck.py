"""Mimic the driver's correctness gate locally: run each queries() entry on
Spark at sf0.01 and its oracle_sql() in DuckDB, compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entry_mod
from buildlog_consultant_spark.spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def df_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(repr(norm(r[i])) for i in order) for r in rows)
    )


def main():
    spark = get_spark("local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(srows)} rows ({dt:.1f}s)")
            continue
        res = con.sql(oracles[name])
        ocols = res.columns
        orows = res.fetchall()
        # Driver hashes at the Arrow level, so a DuckDB HUGEINT (decimal128)
        # vs Spark int64 mismatch fails hash_match even when values are
        # numerically equal. Compare arrow types per column name.
        try:
            oarrow = {f.name: str(f.type) for f in con.sql(oracles[name]).arrow().schema}
            sarrow = {
                f.name: str(f.type)
                for f in __import__("pyarrow").Schema.from_pandas(
                    sdf.limit(0).toPandas()
                )
            }
        except Exception as exc:  # pragma: no cover
            oarrow = sarrow = None
            print(f"   (arrow-type check skipped: {exc})")
        # Driver hash (round-1 evidence): int width differences (int32 vs
        # int64) pass, but DuckDB HUGEINT → decimal128 → Decimal objects fail.
        ints = {"int8", "int16", "int32", "int64"}
        floats = {"float", "double", "halffloat", "float32", "float64"}
        type_notes = []
        if oarrow is not None:
            for c in ocols:
                ot = oarrow.get(c, "?")
                st = sarrow.get(c, "?") if sarrow else "?"
                if "decimal" in ot or "decimal" in st:
                    type_notes.append(f"{c}: oracle={ot} (HUGEINT?) spark={st}")
                elif (ot in ints and st in floats) or (ot in floats and st in ints):
                    type_notes.append(f"{c}: oracle={ot} spark={st}")
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = ok_cols and df_key(scols, srows) == df_key(ocols, orows)
        ok_types = not type_notes
        status = "OK" if (ok_cols and ok_count and ok_vals and ok_types) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"[{status:>9}] {name}: spark={len(srows)} oracle={len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} vals={'=' if ok_vals else 'DIFF'} "
            f"types={'=' if ok_types else 'DIFF'} ({dt:.1f}s)"
        )
        for note in type_notes:
            print("   type:", note)
        if not ok_vals and ok_cols:
            a = df_key(scols, srows)
            b = df_key(ocols, orows)
            diff_a = [r for r in a if r not in b][:3]
            diff_b = [r for r in b if r not in a][:3]
            print("   spark-only:", diff_a)
            print("   oracle-only:", diff_b)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
