"""SparkSession factory with the engine's recommended configuration.

Tuned for correctness tests on local[*] but with the switches that
matter at cluster scale: AQE (runtime re-planning, skew-join splitting),
Arrow for every pandas-UDF crossing, and partition sizing knobs that are
explicit rather than inherited defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "torchestra_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # Shuffle/spill scratch dir (guide §2.1: local disk can be the
    # tighter limit for shuffle files).  On this sandbox the root fs
    # pays ~0.8 s of file create/sync latency PER tiny shuffle
    # (measured: 250k-row groupBy 1.27 s on ext4 vs 0.47 s on tmpfs),
    # so default to RAM-backed /dev/shm when present.  On a real
    # cluster set SPARK_GRAFT_LOCAL_DIR (or spark.local.dir via
    # extra_conf) to the NVMe scratch array instead — tmpfs shuffle
    # space competes with executor memory and is a local-mode choice.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        try:
            st = os.statvfs("/dev/shm")
            # only default to tmpfs when it is big enough to hold real
            # shuffle output — container /dev/shm defaults (64 MB) or a
            # nearly-full tmpfs keep the disk-backed Spark default
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:
                local_dir = "/dev/shm"
        except OSError:  # pragma: no cover - statvfs is best-effort
            pass
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # byte-bound Arrow batches (guide §4.2: lower for wide rows):
        # token-array rows batch at ~4-5k rows for better JVM->Python
        # pipelining (measured: 1M-doc sketch 1.50 -> 1.25 s), while
        # narrow rows keep hitting the 10k record cap unchanged
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
