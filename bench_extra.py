"""Noop-sink isolation benchmarks (guide §1.4) — r8 optimization round.

NOT the graded bench (bench.py is frozen); this file isolates the
stages inside the heavy bench suites so OPTIMIZATION_r08.md can cite
where the seconds go.  Usage:

    python bench_extra.py [stage ...]

Stages: scan, sketch, simpairs, winpairs, report, pack, decon, probe.
Each prints one JSON line with min-of-N wall + cgroup-CPU seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from torchestra_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_benchdata")
ITERS = int(os.environ.get("SPARK_GRAFT_EXTRA_ITERS", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _cpu():
    for path, scale in (
        ("/sys/fs/cgroup/cpuacct/cpuacct.usage", 1e9),  # v1, ns
        ("/sys/fs/cgroup/cpu.stat", 1e6),  # v2, usage_usec
    ):
        try:
            with open(path) as fh:
                txt = fh.read()
            if path.endswith("cpu.stat"):
                for line in txt.splitlines():
                    if line.startswith("usage_usec"):
                        return int(line.split()[1]) / scale
                continue
            return int(txt.strip()) / scale
        except OSError:
            continue
    return None


def main():
    only = set(sys.argv[1:])
    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4)
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark.read.parquet(os.path.join(BENCH_DATA, f"tokenized_{N_SEQ}"))
    sub = toks.filter(F.pmod(F.xxhash64("doc_id"), F.lit(32)) == 0)
    probe = toks.filter(F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(2)) == 0)

    from torchestra_spark.functions.dedup import (
        build_simhash_index,
        mark_contaminated,
        mark_near_dups_indexed,
        near_dup_report,
        near_dup_sketches,
        release_pinned,
        simhash_hamming_pairs,
        winnow_near_dups,
        _pin,
    )
    from torchestra_spark.operators.sequences import pack_sequences

    def stage_scan():
        _noop(sub.select("doc_id", "tokens"))

    def stage_scan_full():
        _noop(toks.select("doc_id", "tokens"))

    def stage_sketch():
        _noop(near_dup_sketches(sub, "tokens", "doc_id", k=5, w=4))

    def stage_simpairs():
        sk = _pin(near_dup_sketches(sub, "tokens", "doc_id", k=5, w=4))
        p = simhash_hamming_pairs(
            sk.select("doc_id", "simhash"), "doc_id", max_hamming=4,
            prefix_bits=20, tables=4, max_bucket_size=1000,
        )
        _noop(p)
        release_pinned(p)
        release_pinned(sk)

    def stage_winpairs():
        sk = _pin(near_dup_sketches(sub, "tokens", "doc_id", k=5, w=4))
        p = winnow_near_dups(
            sk, "winnow_fps", "doc_id", min_shared=2, max_fp_freq=1000,
            fingerprints=F.col("winnow_fps"),
        )
        _noop(p)
        release_pinned(p)
        release_pinned(sk)

    def stage_report():
        rep = near_dup_report(
            sub, "tokens", "doc_id", max_hamming=4, prefix_bits=20,
            tables=4, max_bucket_size=1000, k=5, w=4, min_shared=2, max_fp_freq=1000,
        )
        _noop(rep)
        release_pinned(rep)

    def stage_pack():
        half = toks.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
        _noop(pack_sequences(half.select("doc_id", "tokens"), "tokens", "doc_id", block_len=2048))

    def stage_decon():
        evald = toks.filter(F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(1024)) == 0)
        _noop(mark_contaminated(probe, "tokens", "doc_id", evald, n=8, min_hits=1))

    def stage_probe():
        ref = toks.filter(F.pmod(F.xxhash64("doc_id", F.lit(5)), F.lit(1024)) == 0)
        idx = build_simhash_index(ref, "tokens", "doc_id", prefix_bits=20, tables=4)
        _noop(mark_near_dups_indexed(probe, "tokens", "doc_id", idx, max_hamming=4))

    stages = {
        "scan": stage_scan,
        "scan_full": stage_scan_full,
        "sketch": stage_sketch,
        "simpairs": stage_simpairs,
        "winpairs": stage_winpairs,
        "report": stage_report,
        "pack": stage_pack,
        "decon": stage_decon,
        "probe": stage_probe,
    }
    out = {}
    for name, fn in stages.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"extra:{name}")
        best, best_cpu = None, None
        for _ in range(ITERS):
            c0 = _cpu()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            c1 = _cpu()
            if best is None or dt < best:
                best = dt
                best_cpu = (c1 - c0) if (c0 is not None and c1 is not None) else None
        out[name] = {"wall": round(best, 3), "cpu": round(best_cpu, 3) if best_cpu else None}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
