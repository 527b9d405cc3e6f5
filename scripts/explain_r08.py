"""Capture .explain('formatted') for every bench query into
plans/r08/<query>_<tag>.txt (tag = before/after, argv[1]).

Reuses bench.bench_queries verbatim by monkeypatching the noop sink:
each query closure resolves `_noop` from bench's module globals at call
time, so swapping it captures the exact DataFrame the bench times.
Queries that pin intermediates (near_dup_report etc.) still execute
their pinned sub-jobs — the captured plan is the final consumed frame.

Usage: python scripts/explain_r08.py before [query,query,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from torchestra_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
os.makedirs(OUT_DIR, exist_ok=True)

_current = {"name": None}


def _capture_noop(df):
    import contextlib
    import io

    name = _current["name"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    path = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
    # a query may sink several frames; append all to one file
    mode = "a" if _current.get("seen") == name else "w"
    _current["seen"] = name
    with open(path, mode) as fh:
        fh.write(plan + "\n")
    print(f"wrote {path}")


def main():
    spark = get_spark("explain_r08", master=f"local[{bench.CPUS}]", shuffle_partitions=bench.CPUS * 4)
    spark.sparkContext.setLogLevel("ERROR")
    bench._noop = _capture_noop
    qs = bench.bench_queries(spark)
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        _current["name"] = name
        _current["seen"] = None
        try:
            fn()
        except Exception as e:  # capture what we can, keep going
            print(f"FAILED {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
