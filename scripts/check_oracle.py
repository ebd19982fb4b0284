"""Local harness mirroring the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet dir; compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str = "/root/testdata/sf0.001", only: list[str] | None = None):
    import __spark_entry__ as e
    from crawlspark.session import get_spark

    spark = get_spark(cores=8)
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        a, b = norm(sdf), norm(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "OK" if ok_vals else "FAIL"
        if not ok_vals:
            fails += 1
            print(f"{name}: {status} rows spark={len(a)} duck={len(b)} "
                  f"cols spark={list(a.columns)} duck={list(b.columns)}")
            if ok_cols and ok_rows:
                neq = (a != b).any(axis=1)
                print("first diffs (spark vs duck):")
                print(a[neq].head(5))
                print(b[neq].head(5))
        else:
            print(f"{name}: OK ({len(a)} rows)")
    print("FAILURES:", fails)
    return fails


if __name__ == "__main__":
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001", only) else 0)
