"""ANN recall@k at production configurations vs exact brute force.

The driver-gate queries pin recall-1.0 configs (probe every bucket /
cell) so they oracle exactly; THIS script measures the quality/latency
knob the way a user would run it — partial probes — and publishes the
recall curve (BENCH.md "ANN recall").

Usage: python scripts/ann_recall.py [sf_dir]
Prints one JSON line: {"sf_dir": ..., "k": 10, "recall": {cfg: r}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torchestra_spark.functions.similarity import (  # noqa: E402
    ann_topk,
    ivf_topk,
    recall_at_k,
    train_ivf_centroids,
)
from torchestra_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ann_recall", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    C = train_ivf_centroids(em, "embedding", n_centroids=16, sample=10_000, seed=42)

    fns = {}
    for n_planes, n_probes, tables in [
        (6, 1, 1), (6, 2, 1), (6, 4, 1),          # single-table multi-probe
        (6, 2, 4), (6, 2, 8), (8, 4, 8),          # multi-table OR-probe
    ]:
        fns[f"lsh_pl{n_planes}_p{n_probes}_t{tables}"] = (
            lambda df, q, p=n_probes, pl=n_planes, t=tables: ann_topk(
                df, "embedding", q, k=10, n_planes=pl, n_probes=p, tables=t
            )
        )
    for n_probes in (1, 2, 4, 8):
        fns[f"ivf_p{n_probes}_c16"] = (
            lambda df, q, p=n_probes: ivf_topk(df, "embedding", q, C, k=10, n_probes=p)
        )

    recall = recall_at_k(em, "embedding", "vec_id", k=10, search_fns=fns, n_queries=20)
    for name, r in recall.items():
        print(f"{name:24s} recall@10 = {r:.3f}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "k": 10, "n_queries": 20, "recall": recall}))


if __name__ == "__main__":
    main()
