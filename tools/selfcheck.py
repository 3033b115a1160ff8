"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and (column-name-sorted,
row-sorted) values exactly.

Usage: python tools/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith(("int", "uint", "Int")):
            df[c] = col.astype("int64")
        elif str(col.dtype).startswith("float"):
            df[c] = col.astype("float64")
        elif str(col.dtype).startswith("bool"):
            df[c] = col.astype(bool)
        else:
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from tika_wrap_spark.session import get_spark

    spark = get_spark(master="local[16]", driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = se.queries(), se.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.monotonic()-t0:.1f}s)")
            if len(sdf) == 0 and name != "noop":
                print(f"  WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            continue
        a, b = normalize(sdf), normalize(odf)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"row count differs: spark={len(a)} duck={len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1)
            status = (
                f"values differ in {bad_cols} ({int(idx.sum())} rows); first:\n"
                f"spark:\n{a[idx].head(3)}\nduck:\n{b[idx].head(3)}"
            )
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {status}")
        else:
            print(f"ok    {name}: {len(a)} rows ({time.monotonic()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
