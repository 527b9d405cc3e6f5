"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the given sf dir, compare row count + schema + order-
insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype("datetime64[us]").astype("int64")  # NaT -> int64 min
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  [{name}] ROWS mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        print(f"  [{name}] SCHEMA mismatch: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return False
    if not ok:
        return False
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == np.float64:
            same = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
        else:
            same = (av == bv).all()
        if not same:
            bad = np.nonzero(~(av == bv) if av.dtype != np.float64 else ~np.isclose(av, bv, equal_nan=True))[0][:5]
            print(f"  [{name}] VALUES mismatch col={c} at rows {bad.tolist()}:")
            print(f"    spark: {av[bad]}")
            print(f"    duck : {bv[bad]}")
            ok = False
    return ok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from torchestra_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_pdf = sdf.toPandas()
        if name not in oracles:
            print(f"PASS (rows-only) {name}: {len(spark_pdf)} rows")
            n_rows_only += 1
            continue
        duck_pdf = con.execute(oracles[name]).df()
        if compare(name, spark_pdf, duck_pdf):
            print(f"PASS {name}: {len(spark_pdf)} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
