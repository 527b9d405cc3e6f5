"""SparkSession factory with the engine's recommended configuration.

Tuned for correctness tests on local[*] but with the switches that
matter at cluster scale: AQE (runtime re-planning, skew-join splitting),
Arrow for every pandas-UDF crossing, and partition sizing knobs that are
explicit rather than inherited defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _apply_malloc_tuning() -> None:
    """Raise the glibc mmap/trim thresholds (and pin PyArrow to the
    system allocator) for the JVM gateway and its forked Python
    workers.  Defaults only — pre-existing values are respected and
    ``SPARK_GRAFT_MALLOC_TUNING=0`` disables entirely."""
    if os.environ.get("SPARK_GRAFT_MALLOC_TUNING", "1") == "0":
        return
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1024**3))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1024**3))
    # route PyArrow buffers through the same tamed glibc heap rather
    # than the bundled pool's own madvise purging
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


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
    # Allocator churn at the Python boundary (guide §4): every numpy /
    # Arrow temp above glibc's default 128 KB mmap threshold pays an
    # mmap+munmap per buffer — page faults plus a cgroup memory
    # charge/uncharge on every batch, in every worker.  Under memcg
    # accounting that kernel path serializes across cores (profiled on
    # this sandbox: 32 threads at ~100 % SYSTEM time inside
    # charge_memcg during Arrow stages; probe suite steady-state
    # 2.5-2.8 s -> 1.8-2.1 s with the thresholds raised).  Raising the
    # thresholds makes workers reuse heap arenas instead; the cost is
    # freed blocks being retained up to each worker's peak — already
    # the budget spark.python.worker.memory plans for.  Set before the
    # JVM launches so the gateway and its forked Python workers
    # inherit; existing values are respected, and
    # SPARK_GRAFT_MALLOC_TUNING=0 disables.
    _apply_malloc_tuning()
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
