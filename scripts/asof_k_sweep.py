"""Fused vs sequential multi-table as-of join as k (feature tables)
grows — the r7 evidence that the fused path's advantage scales ~linearly
in k while its plan stays 1 Exchange / 1 Sort / 1 Window (plan-gated in
tests/test_plan_quality.py::test_asof_multi_fused_plan_invariant_in_k).

Usage: python scripts/asof_k_sweep.py [ks] [iters]
  ks      comma list of table counts (default 2,4,8)
  iters   min-of-N iterations per cell (default 2)

Prints one JSON line:
{"rows": N, "cells": {"k=2": {"fused_sec": .., "seq_sec": .., ...}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from torchestra_spark.operators.temporal import asof_join, asof_join_multi  # noqa: E402
from torchestra_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
BENCH_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_benchdata"
)


def _cpu():
    # shared v1+v2 cgroup reader (bench.py) — a narrower local copy
    # would silently return None on cgroup-v2 hosts
    from bench import _cgroup_cpu_sec

    return _cgroup_cpu_sec()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,4,8").split(",")]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("asof_k_sweep", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4)
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark.read.parquet(os.path.join(BENCH_DATA, f"tokenized_{N_SEQ}"))
    feats = spark.read.parquet(os.path.join(BENCH_DATA, "features_20000"))

    def feat_tables(k):
        return [
            dict(
                name=f"f{i}",
                df=feats.select(
                    "user_id",
                    (F.col("feature_ts") + F.expr(f"INTERVAL {i * 7} SECONDS")).alias(
                        "feature_ts"
                    ),
                    (F.col("fval") * (i + 1)).alias(f"v{i}"),
                ),
                ts="feature_ts",
                value_cols=[f"v{i}"],
            )
            for i in range(k)
        ]

    # untimed warmup: JIT the window/join codegen once
    _noop(asof_join_multi(toks.limit(50_000), feat_tables(2), on="user_id", left_ts="ts"))

    cells = {}
    for k in ks:
        tables = feat_tables(k)

        def fused():
            _noop(asof_join_multi(toks, tables, on="user_id", left_ts="ts"))

        def seq():
            out = toks
            for sp in tables:
                out = asof_join(
                    out, sp["df"], on="user_id", left_ts="ts", right_ts="feature_ts",
                    value_cols=sp["value_cols"], keep_right_ts=False,
                )
            _noop(out)

        cell = {}
        for label, fn in (("fused", fused), ("seq", seq)):
            best = best_cpu = None
            for _ in range(iters):
                c0 = _cpu()
                t0 = time.time()
                fn()
                dt = time.time() - t0
                c1 = _cpu()
                if best is None or dt < best:
                    best = dt
                    if c0 is not None and c1 is not None:
                        best_cpu = round(c1 - c0, 1)
            cell[f"{label}_sec"] = round(best, 3)
            cell[f"{label}_cpu_sec"] = best_cpu
        cell["speedup"] = round(cell["seq_sec"] / cell["fused_sec"], 2)
        cells[f"k={k}"] = cell
        print(f"k={k}: {cell}", file=sys.stderr, flush=True)

    print(json.dumps({"rows": N_SEQ, "cpus": CPUS, "iters": iters, "cells": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
