"""Simulate the driver's correctness gate: run each __spark_entry__ query on
Spark and its oracle SQL on DuckDB, compare row counts + order-insensitive
values (columns sorted by name). Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    a = spark_pdf.reindex(sorted(spark_pdf.columns), axis=1)
    b = duck_pdf.reindex(sorted(duck_pdf.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"  {name}: SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  {name}: ROWCOUNT {len(a)} vs {len(b)}")
        return False
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    eq = a.equals(b)
    if not eq:
        for c in a.columns:
            if not a[c].equals(b[c]):
                diff = (a[c] != b[c])
                print(f"  {name}: col {c} differs in {int(diff.sum())} rows")
                print("   spark:", a.loc[diff, c].head(3).tolist())
                print("   duck :", b.loc[diff, c].head(3).tolist())
    return eq


def main(sf_dir: str, only: set | None = None):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from lucene_spark.session import get_spark

    spark = get_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except Exception:
            pass

    qs, os_ = e.queries(), e.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    fails = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in os_:
            print(f"  {name}: rows-only check, {len(sdf)} rows")
            continue
        ddf = con.execute(os_[name]).df()
        ok = compare(name, sdf, ddf)
        print(f"{'OK  ' if ok else 'FAIL'} {name} ({len(sdf)} rows)")
        fails += 0 if ok else 1
    if not only:
        print("entry():", e.entry(spark).count(), "rows")
    print("FAILS:", fails)
    return fails


if __name__ == "__main__":
    # usage: check_oracles.py [sf_dir] [gate1,gate2,...]
    raise SystemExit(main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None))
