"""Per-partition checkpointed output with lineage + metrics — resumable
batch jobs (north rule: "resumable from per-partition checkpoints
carrying lineage and metrics").

Design (Spark-idiomatic, no custom commit protocol):

* The output is hash-bucketed on a key column into ``n_buckets``
  directory partitions (``bucket=<i>/``).
* Buckets are processed in **waves**; each wave is one filtered write
  with Spark's *dynamic partition overwrite* — a retried/duplicated wave
  overwrites exactly its own partitions, so writes are idempotent under
  speculative re-execution.
* After a wave commits, one manifest JSON per bucket is written to
  ``_manifest/`` recording lineage (input fingerprint, source, app id)
  and metrics (rows, bytes, wall ms).  The manifest — not _SUCCESS — is
  the unit of completion.
* Resume = list the manifest, skip completed buckets, process the rest.
  If the input table is partitioned/bucketed on the same key (Iceberg
  layout), the bucket filter prunes at the scan and resume does zero
  redundant I/O; otherwise each wave re-scans the input (the standard
  granularity/scan tradeoff, tune ``wave_size``).

At 1000 executors: one wave = one normal distributed write; the driver
loop only sequences waves and writes tiny JSON files.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__ckpt_bucket"


def input_fingerprint(paths: Sequence[str]) -> str:
    """Cheap lineage fingerprint of input files: name+size+mtime hash."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            files = sorted(
                os.path.join(dp, f) for dp, _, fs in os.walk(p) for f in fs if not f.startswith("_")
            )
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


@dataclass
class CheckpointStatus:
    n_buckets: int
    completed: List[int]

    @property
    def is_complete(self) -> bool:
        return len(self.completed) == self.n_buckets

    @property
    def remaining(self) -> List[int]:
        done = set(self.completed)
        return [b for b in range(self.n_buckets) if b not in done]


class CheckpointedWriter:
    """Resumable bucketed parquet writer with a JSON manifest."""

    def __init__(
        self,
        path: str,
        key_col: str,
        n_buckets: int = 64,
        wave_size: int = 16,
        fingerprint: Optional[str] = None,
    ):
        self.path = path
        self.key_col = key_col
        self.n_buckets = int(n_buckets)
        self.wave_size = int(wave_size)
        self.fingerprint = fingerprint or ""
        self.manifest_dir = os.path.join(path, "_manifest")

    # ------------------------------------------------------------- manifest
    def status(self) -> CheckpointStatus:
        completed: List[int] = []
        if os.path.isdir(self.manifest_dir):
            for f in os.listdir(self.manifest_dir):
                if f.startswith("bucket-") and f.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, f)) as fh:
                        m = json.load(fh)
                    if self.fingerprint and m.get("fingerprint") not in ("", self.fingerprint):
                        continue  # stale manifest from different input
                    completed.append(int(m["bucket"]))
        return CheckpointStatus(self.n_buckets, sorted(completed))

    def clear_manifests(self) -> None:
        """Drop all bucket manifests so the next run() rewrites every
        bucket — the non-resume entry point (a fresh run must not
        silently reuse stale bucket outputs, especially with
        fingerprinting disabled)."""
        if os.path.isdir(self.manifest_dir):
            for f in os.listdir(self.manifest_dir):
                if f.startswith("bucket-") and f.endswith(".json"):
                    os.remove(os.path.join(self.manifest_dir, f))

    def _write_manifest(self, bucket: int, rows: int, nbytes: int, wall_ms: float, app_id: str) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        rec = {
            "bucket": bucket,
            "rows": rows,
            "bytes": nbytes,
            "wall_ms": round(wall_ms, 1),
            "fingerprint": self.fingerprint,
            "app_id": app_id,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(self.manifest_dir, f".bucket-{bucket}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(self.manifest_dir, f"bucket-{bucket}.json"))

    def _bucket_stats(self, bucket: int) -> tuple:
        """Rows/bytes of a written bucket from parquet footers (no scan)."""
        import pyarrow.parquet as pq

        bdir = os.path.join(self.path, f"{BUCKET_COL}={bucket}")
        rows = 0
        nbytes = 0
        if os.path.isdir(bdir):
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    fp = os.path.join(bdir, f)
                    rows += pq.read_metadata(fp).num_rows
                    nbytes += os.stat(fp).st_size
        return rows, nbytes

    # ----------------------------------------------------------------- write
    def run(self, df: DataFrame, progress: bool = False) -> CheckpointStatus:
        """Write all remaining buckets in waves; safe to re-run any time."""
        spark = df.sparkSession
        status = self.status()
        remaining = status.remaining
        if not remaining:
            return status
        bucketed = df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))
        )
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        app_id = spark.sparkContext.applicationId
        try:
            for i in range(0, len(remaining), self.wave_size):
                wave = remaining[i : i + self.wave_size]
                t0 = time.time()
                (
                    bucketed.filter(F.col(BUCKET_COL).isin(wave))
                    .write.mode("overwrite")
                    .partitionBy(BUCKET_COL)
                    .parquet(self.path)
                )
                wall = (time.time() - t0) * 1000.0
                for b in wave:
                    rows, nbytes = self._bucket_stats(b)
                    self._write_manifest(b, rows, nbytes, wall / len(wave), app_id)
                if progress:
                    print(f"checkpoint wave committed: buckets={wave}")
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        return self.status()

    # ------------------------------------------------------------------ read
    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path).drop(BUCKET_COL)

    def metrics(self) -> List[dict]:
        out = []
        if os.path.isdir(self.manifest_dir):
            for f in sorted(os.listdir(self.manifest_dir)):
                if f.startswith("bucket-") and f.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, f)) as fh:
                        out.append(json.load(fh))
        return out


class IncrementalMaterializer:
    """Manifest-driven incremental refresh of a derived table over a
    hive-partitioned input — the Iceberg-snapshot read pattern on plain
    parquet: the manifest records each input partition's file
    fingerprint, and ``refresh()`` recomputes ONLY partitions that are
    new or whose fingerprint changed.

    The feature-store daily loop this completes::

        delta = spark.read.parquet(f"{input}/ds=2026-08-16")
        pipe.fit_update(delta)                       # merge delta stats
        mat.refresh(spark, pipe.transform)           # rewrites ONLY new
                                                     # /changed partitions

    Untouched partitions keep their files (dynamic partition overwrite
    rewrites exactly the refreshed directories), so a daily append to a
    year-long table does 1/365th of the write — and, because the filter
    on the partition column prunes at the scan, 1/365th of the read.
    Note the standard incremental-view caveat: partitions NOT refreshed
    keep outputs computed with the params in force when they were
    written — pair with the refit-safe ``fit_update`` (frozen upstream
    params) for an exactly-consistent table, or ``clear()`` to force a
    full rebuild after a param-shifting refit.

    Partition values are compared as directory-name strings (use string
    partition columns, e.g. ``ds='2026-08-16'``).
    """

    def __init__(self, input_path: str, output_path: str, partition_col: str):
        self.input_path = input_path
        self.output_path = output_path
        self.partition_col = partition_col
        self.manifest_dir = os.path.join(output_path, "_manifest")

    # ---------------------------------------------------------------- state
    def _input_partitions(self) -> dict:
        """{partition value -> current input fingerprint}."""
        prefix = f"{self.partition_col}="
        out = {}
        if os.path.isdir(self.input_path):
            for d in sorted(os.listdir(self.input_path)):
                full = os.path.join(self.input_path, d)
                if d.startswith(prefix) and os.path.isdir(full):
                    out[d[len(prefix):]] = input_fingerprint([full])
        return out

    def _manifest(self) -> dict:
        """{partition value -> fingerprint it was materialized from}."""
        out = {}
        if os.path.isdir(self.manifest_dir):
            for f in os.listdir(self.manifest_dir):
                if f.startswith("part-") and f.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, f)) as fh:
                        m = json.load(fh)
                    out[m["value"]] = m["fingerprint"]
        return out

    def changed_partitions(self) -> List[str]:
        """Input partitions that are new or whose files changed since
        they were last materialized."""
        seen = self._manifest()
        return [v for v, fp in self._input_partitions().items() if seen.get(v) != fp]

    def clear(self) -> None:
        """Drop the manifest: the next refresh() rebuilds everything."""
        if os.path.isdir(self.manifest_dir):
            for f in os.listdir(self.manifest_dir):
                if f.startswith("part-") and f.endswith(".json"):
                    os.remove(os.path.join(self.manifest_dir, f))

    # -------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession, transform=None) -> List[str]:
        """Recompute only new/changed partitions through ``transform``
        (DataFrame -> DataFrame, must keep the partition column); write
        with dynamic partition overwrite; update the manifest.  Returns
        the partition values refreshed ([] when already current)."""
        fps = self._input_partitions()
        changed = self.changed_partitions()
        if not changed:
            return []
        src = spark.read.parquet(self.input_path).filter(
            F.col(self.partition_col).isin(changed)
        )
        out = transform(src) if transform is not None else src
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy(self.partition_col).parquet(
                self.output_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        os.makedirs(self.manifest_dir, exist_ok=True)
        for v in changed:
            rec = {
                "value": v,
                "fingerprint": fps[v],
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            safe = "".join(c if c.isalnum() or c in "-._" else "_" for c in v)
            tmp = os.path.join(self.manifest_dir, f".part-{safe}.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(rec, fh)
            os.replace(tmp, os.path.join(self.manifest_dir, f"part-{safe}.json"))
        return changed

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.output_path)


class SnapshotStore:
    """Iceberg-style snapshot log + time travel on plain parquet.

    ``IncrementalMaterializer`` refreshes in place (copy-on-write
    overwrite), so history is gone after a refresh.  SnapshotStore
    keeps it: every refresh writes changed partitions into a NEW
    version directory ``<part>=<v>/ver=<n>/`` (append-only, nothing is
    overwritten) and commits a snapshot JSON pinning, for every
    partition, the version that snapshot sees::

        _snapshots/v000007.json = {"id": 7, "parent": 6,
                                   "pins": {"2026-08-16": 3, ...}}

    * ``refresh(spark, transform)``   — recompute only new/changed input
      partitions (same fingerprint diff as IncrementalMaterializer),
      write them as ver=N, commit snapshot N.
    * ``load(spark, snapshot_id=None)`` — read the table AS OF any
      retained snapshot: a partition-column predicate
      ``(part=a AND ver=x) OR ...`` built from the pins, so Spark's
      partition pruning selects exactly the pinned directories at plan
      time — no data files outside the snapshot are touched.
    * ``expire(keep_last=k)``         — delete version directories no
      retained snapshot references (Iceberg's expire_snapshots).

    The snapshot commit is a single atomic ``os.replace`` of one small
    JSON — the same O(1)-metadata commit Iceberg uses; data writes are
    append-only so a failed refresh never corrupts a committed
    snapshot.  At cluster scale the JSON lives on the shared store and
    the pin predicate is built driver-side from KBs of metadata.

    Assumptions (document them because the failure mode is silent):
    ONE writer at a time — refresh/expire are not mutually safe across
    processes (expire does skip ver dirs newer than the last committed
    snapshot, so maintenance beside one in-flight refresh is fine, but
    two concurrent refreshes can still interleave version numbers); and
    a POSIX-semantics filesystem (atomic ``os.replace``, directory
    listing) — NFS/local/POSIX-mounted stores, not bare object stores
    (S3 needs an Iceberg/Delta-style commit service instead).
    """

    def __init__(self, input_path: str, output_path: str, partition_col: str):
        self.input_path = input_path
        self.output_path = output_path
        self.partition_col = partition_col
        self.snap_dir = os.path.join(output_path, "_snapshots")
        self._inner = IncrementalMaterializer(input_path, output_path, partition_col)

    # ---------------------------------------------------------------- state
    def snapshots(self) -> List[dict]:
        out = []
        if os.path.isdir(self.snap_dir):
            for f in sorted(os.listdir(self.snap_dir)):
                if f.startswith("v") and f.endswith(".json"):
                    with open(os.path.join(self.snap_dir, f)) as fh:
                        out.append(json.load(fh))
        return out

    def current(self) -> Optional[dict]:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _fingerprints_of(self, snap: Optional[dict]) -> dict:
        return dict(snap["fingerprints"]) if snap else {}

    # -------------------------------------------------------------- refresh
    def _drop_version_dirs(self, snap_id: int) -> None:
        """Remove leftover ver=<snap_id> directories from a refresh that
        crashed between data write and snapshot commit — snap_id is not
        referenced by any committed snapshot, so this only ever deletes
        uncommitted data (a retried refresh would otherwise append a
        SECOND copy into the same directories and commit duplicates)."""
        import shutil

        prefix = f"{self.partition_col}="
        if os.path.isdir(self.output_path):
            for d in os.listdir(self.output_path):
                if d.startswith(prefix):
                    vd = os.path.join(self.output_path, d, f"ver={snap_id}")
                    if os.path.isdir(vd):
                        shutil.rmtree(vd)

    def refresh(self, spark: SparkSession, transform=None) -> List[str]:
        """Write new/changed input partitions as a new version and
        commit the next snapshot.  Input partitions DELETED since the
        last snapshot are unpinned from the new snapshot (their data
        files stay, so older snapshots still time-travel to them).
        Returns refreshed partition values ([] = input unchanged; no
        snapshot is committed)."""
        cur = self.current()
        fps = self._inner._input_partitions()
        for v in fps:
            # partition values become directory names; Spark escapes
            # specials (space, ':', '%'), which would break the
            # name-vs-column comparisons below — require safe values
            if not all(c.isalnum() or c in "-._" for c in v):
                raise ValueError(
                    f"partition value {v!r} needs path escaping; use "
                    "alphanumeric/-/._ values (e.g. ds=2026-08-16)"
                )
        pinned_fps = self._fingerprints_of(cur)
        changed = [v for v, fp in fps.items() if pinned_fps.get(v) != fp]
        removed = [v for v in (cur["pins"] if cur else {}) if v not in fps]
        if not changed and not removed:
            return []
        snap_id = (cur["id"] + 1) if cur else 0
        pins = {v: p for v, p in (cur["pins"] if cur else {}).items() if v in fps}
        fingerprints = {v: f for v, f in pinned_fps.items() if v in fps}
        if changed:
            self._drop_version_dirs(snap_id)  # crash-retry hygiene
            src = spark.read.parquet(self.input_path).filter(
                F.col(self.partition_col).isin(changed)
            )
            out = transform(src) if transform is not None else src
            out = out.withColumn("ver", F.lit(snap_id))
            # append-only: ver=<snap_id> directories are new, nothing of
            # any committed snapshot is touched
            out.write.mode("append").partitionBy(self.partition_col, "ver").parquet(
                self.output_path
            )
            for v in changed:
                pins[v] = snap_id
                fingerprints[v] = fps[v]
        rec = {
            "id": snap_id,
            "parent": cur["id"] if cur else None,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "refreshed": sorted(changed),
            "removed": sorted(removed),
            "pins": pins,
            "fingerprints": fingerprints,
        }
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(self.snap_dir, f".v{snap_id:06d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(self.snap_dir, f"v{snap_id:06d}.json"))
        return sorted(changed)

    # ----------------------------------------------------------------- read
    def load(self, spark: SparkSession, snapshot_id: Optional[int] = None) -> DataFrame:
        """The table as of ``snapshot_id`` (default: current).  The pin
        predicate is on partition columns only, so planning prunes to
        exactly the pinned directories."""
        snaps = {s["id"]: s for s in self.snapshots()}
        if not snaps:
            raise ValueError("no committed snapshots")
        snap = snaps[max(snaps)] if snapshot_id is None else snaps.get(snapshot_id)
        if snap is None:
            raise ValueError(
                f"snapshot {snapshot_id} not found (retained: {sorted(snaps)})"
            )
        df = spark.read.parquet(self.output_path)
        pred = None
        for v, ver in snap["pins"].items():
            clause = (F.col(self.partition_col) == v) & (F.col("ver") == ver)
            pred = clause if pred is None else (pred | clause)
        if pred is None:
            return df.limit(0)
        return df.filter(pred).drop("ver")

    # --------------------------------------------------------------- expire
    def expire(self, keep_last: int = 1) -> List[str]:
        """Drop all but the last ``keep_last`` snapshots and delete
        version directories no retained snapshot pins (data files of
        retained snapshots are never touched).

        Version directories NEWER than the latest committed snapshot
        are left alone: they belong to an in-flight refresh that has
        written ver=N but not yet committed its snapshot JSON — the one
        concurrent shape (maintenance alongside a refresh) the
        single-writer model still allows."""
        import shutil

        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return []
        drop, keep = snaps[:-keep_last], snaps[-keep_last:]
        live = {(v, ver) for s in keep for v, ver in s["pins"].items()}
        latest = snaps[-1]["id"]
        removed = []
        prefix = f"{self.partition_col}="
        if os.path.isdir(self.output_path):
            for d in os.listdir(self.output_path):
                if not d.startswith(prefix):
                    continue
                pv = d[len(prefix):]
                part_dir = os.path.join(self.output_path, d)
                for vd in os.listdir(part_dir):
                    if vd.startswith("ver="):
                        ver = int(vd[len("ver="):])
                        if ver > latest:
                            continue  # uncommitted in-flight refresh
                        if (pv, ver) not in live:
                            shutil.rmtree(os.path.join(part_dir, vd))
                            removed.append(f"{d}/{vd}")
        for s in drop:
            p = os.path.join(self.snap_dir, f"v{s['id']:06d}.json")
            if os.path.exists(p):
                os.remove(p)
        return sorted(removed)
