"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` at the given sf_dir and compares with
``oracle_sql()[name]`` via DuckDB: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from elasticsearch_data_import_handler_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            if len(got) == 0:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(e.columns)}"))
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append((name, f"rows {len(g)} != {len(e)}"))
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            continue
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_rows = neq.any(axis=1)
            diff = pd.concat([g[bad_rows].head(3).add_suffix("_spark"),
                              e[bad_rows].head(3).add_suffix("_duck")], axis=1)
            failures.append((name, f"{int(bad_rows.sum())} mismatched rows"))
            print(f"FAIL {name}: {int(bad_rows.sum())}/{len(g)} rows differ\n{diff.to_string()[:1200]}")
            continue
        print(f"ok   {name}: {len(g)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
