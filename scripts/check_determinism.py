"""Determinism gate: run every __spark_entry__.queries() entry TWICE in
one session and assert canonically-identical results — catches
nondeterministic plans (unstable top-k ties, partition-dependent UDF
state, uncached non-deterministic sources) before the driver's
hash gate does.

Usage: python scripts/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype("datetime64[us]").astype("int64")
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def main() -> None:
    import __spark_entry__ as E
    from torchestra_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("determinism", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        a = canon(fn(spark, sf_dir).toPandas())
        b = canon(fn(spark, sf_dir).toPandas())
        if a.equals(b):
            print(f"DETERMINISTIC {name}: {len(a)} rows")
        else:
            bad += 1
            diff = (a != b).any(axis=1).sum() if len(a) == len(b) else "row-count"
            print(f"NONDETERMINISTIC {name}: {diff} differing rows")
    print(f"{bad} nondeterministic")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
