"""Checkpointed writer: idempotent bucketed writes, manifest-driven
resume, lineage fingerprints, per-bucket metrics."""

import json
import os

import pytest

from torchestra_spark.checkpoint import CheckpointedWriter, input_fingerprint


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_full_write_and_load(spark, events, tmp_path):
    path = str(tmp_path / "out")
    w = CheckpointedWriter(path, key_col="user_id", n_buckets=8, wave_size=3)
    status = w.run(events)
    assert status.is_complete
    assert len(w.metrics()) == 8
    assert sum(m["rows"] for m in w.metrics()) == events.count()
    back = w.load(spark)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(events.columns)


def test_resume_skips_completed(spark, events, tmp_path):
    path = str(tmp_path / "out")
    w = CheckpointedWriter(path, key_col="user_id", n_buckets=8, wave_size=8)
    w.run(events)
    # simulate a partially-failed job: drop two manifests
    for b in (2, 5):
        os.remove(os.path.join(w.manifest_dir, f"bucket-{b}.json"))
    w2 = CheckpointedWriter(path, key_col="user_id", n_buckets=8, wave_size=8)
    st = w2.status()
    assert st.remaining == [2, 5]
    st = w2.run(events)
    assert st.is_complete
    assert w2.load(spark).count() == events.count()


def test_rerun_is_noop(spark, events, tmp_path):
    path = str(tmp_path / "out")
    w = CheckpointedWriter(path, key_col="user_id", n_buckets=4, wave_size=4)
    w.run(events)
    before = {m["bucket"]: m["committed_at"] for m in w.metrics()}
    apps = {m["app_id"] for m in w.metrics()}
    w.run(events)  # nothing remaining -> no writes, manifests untouched
    after = {m["bucket"]: m["committed_at"] for m in w.metrics()}
    assert before == after and len(apps) == 1


def test_fingerprint_invalidation(spark, events, tmp_path):
    path = str(tmp_path / "out")
    fp = input_fingerprint(["/root/testdata/sf0.001/events.parquet"])
    w = CheckpointedWriter(path, key_col="user_id", n_buckets=4, fingerprint=fp)
    w.run(events)
    assert w.status().is_complete
    # same path, different input fingerprint -> manifests don't count
    w2 = CheckpointedWriter(path, key_col="user_id", n_buckets=4, fingerprint="different")
    assert w2.status().remaining == [0, 1, 2, 3]


def test_manifest_contents(spark, events, tmp_path):
    path = str(tmp_path / "out")
    w = CheckpointedWriter(path, key_col="user_id", n_buckets=2, fingerprint="abc")
    w.run(events)
    m = json.load(open(os.path.join(w.manifest_dir, "bucket-0.json")))
    assert m["fingerprint"] == "abc"
    assert m["rows"] > 0 and m["bytes"] > 0 and m["wall_ms"] > 0
    assert m["app_id"].startswith("local-")


def test_incremental_materializer_feature_refresh(spark, tmp_path):
    """The feature-store daily loop: append a delta partition, merge its
    stats with the refit-safe fit_update, refresh — ONLY the new
    partition is read+written (old output files untouched), and the
    materialized table equals a from-scratch transform of the full
    input because the upstream params were frozen by the delta."""
    import pandas as pd
    import numpy as np

    from torchestra_spark import Feature, MinMaxScale, Pipeline
    from torchestra_spark.checkpoint import IncrementalMaterializer

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    rng = np.random.RandomState(6)
    d1 = pd.DataFrame({
        "ds": ["2026-01-01"] * 50 + ["2026-01-02"] * 50,
        "x": np.r_[0.0, 100.0, rng.uniform(0, 100, 98)],
    })
    spark.createDataFrame(d1).write.partitionBy("ds").parquet(inp)

    pipe = Pipeline({"xs": Feature("x", [MinMaxScale()])})
    pipe.fit(spark.read.parquet(inp))

    def tf(df):
        return pipe.transform(df).select("ds", "x", "xs")

    mat = IncrementalMaterializer(inp, outp, "ds")
    assert sorted(mat.refresh(spark, tf)) == ["2026-01-01", "2026-01-02"]
    assert mat.refresh(spark, tf) == []  # current -> no-op

    def part_files(base, v):
        d = os.path.join(base, f"ds={v}")
        return {f: os.stat(os.path.join(d, f)).st_mtime for f in os.listdir(d)
                if f.endswith(".parquet")}

    old1 = part_files(outp, "2026-01-01")
    old2 = part_files(outp, "2026-01-02")

    # append a delta day (inside the fitted range -> params frozen)
    d3 = pd.DataFrame({"ds": ["2026-01-03"] * 40, "x": rng.uniform(5, 95, 40)})
    spark.createDataFrame(d3).write.mode("append").partitionBy("ds").parquet(inp)
    pipe.fit_update(spark.read.parquet(inp).filter("ds = '2026-01-03'"))
    assert mat.refresh(spark, tf) == ["2026-01-03"]
    # untouched partitions keep their exact files
    assert part_files(outp, "2026-01-01") == old1
    assert part_files(outp, "2026-01-02") == old2
    # materialized view == from-scratch transform over the full input
    got = mat.load(spark).toPandas().sort_values(["ds", "x"], ignore_index=True)
    exp = tf(spark.read.parquet(inp)).toPandas().sort_values(["ds", "x"], ignore_index=True)
    assert np.allclose(got["xs"].to_numpy(), exp["xs"].to_numpy())
    assert len(got) == 140

    # in-place change of one historical partition -> only it refreshes
    d2fix = pd.DataFrame({"ds": ["2026-01-02"] * 10, "x": rng.uniform(0, 100, 10)})
    import shutil
    shutil.rmtree(os.path.join(inp, "ds=2026-01-02"))
    spark.createDataFrame(d2fix).write.mode("append").partitionBy("ds").parquet(inp)
    assert mat.changed_partitions() == ["2026-01-02"]
    assert mat.refresh(spark, tf) == ["2026-01-02"]
    assert part_files(outp, "2026-01-01") == old1
    assert mat.load(spark).count() == 100


def test_snapshot_store_time_travel_and_expire(spark, tmp_path):
    """Iceberg-style log: append-only version dirs + snapshot pins.
    Time travel reproduces every committed snapshot exactly even after
    later refreshes rewrite a partition; expire removes only versions
    no retained snapshot pins."""
    import os
    import pandas as pd

    from torchestra_spark.checkpoint import SnapshotStore

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    d1 = pd.DataFrame({"ds": ["d1"] * 3 + ["d2"] * 3, "x": [1.0, 2, 3, 4, 5, 6]})
    spark.createDataFrame(d1).write.partitionBy("ds").parquet(inp)

    st = SnapshotStore(inp, outp, "ds")
    assert st.refresh(spark) == ["d1", "d2"]          # snapshot 0
    assert st.refresh(spark) == []                    # unchanged: no commit
    v0 = st.load(spark).groupBy("ds").sum("x").collect()
    v0 = {r["ds"]: r["sum(x)"] for r in v0}
    assert v0 == {"d1": 6.0, "d2": 15.0}

    # rewrite partition d2 in the input -> snapshot 1 pins d2@1, d1@0
    spark.createDataFrame(
        pd.DataFrame({"ds": ["d2"] * 2, "x": [100.0, 200.0]})
    ).write.mode("overwrite").parquet(os.path.join(inp, "ds=d2"))
    assert st.refresh(spark) == ["d2"]
    cur = {r["ds"]: r["sum(x)"] for r in st.load(spark).groupBy("ds").sum("x").collect()}
    assert cur == {"d1": 6.0, "d2": 300.0}
    # time travel: snapshot 0 still reads the ORIGINAL d2
    old = {r["ds"]: r["sum(x)"] for r in st.load(spark, 0).groupBy("ds").sum("x").collect()}
    assert old == {"d1": 6.0, "d2": 15.0}

    # expire to the latest snapshot: d2@0 files removed, d1@0 kept
    removed = st.expire(keep_last=1)
    assert removed == ["ds=d2/ver=0"]
    cur2 = {r["ds"]: r["sum(x)"] for r in st.load(spark).groupBy("ds").sum("x").collect()}
    assert cur2 == cur
    import pytest as _pt
    with _pt.raises(ValueError):
        st.load(spark, 0)  # expired snapshot is gone

    # in-flight refresh protection: a ver dir NEWER than the last
    # committed snapshot (written but not yet committed) must survive
    # an expire that does real work (snapshot 2 makes snapshot 1 drop)
    import shutil as _sh

    import pandas as _pd
    spark.createDataFrame(
        _pd.DataFrame({"ds": ["d2"] * 2, "x": [7.0, 8.0]})
    ).write.mode("overwrite").parquet(os.path.join(inp, "ds=d2"))
    assert st.refresh(spark) == ["d2"]                # snapshot 2
    inflight = os.path.join(outp, "ds=d1", "ver=99")
    os.makedirs(inflight)
    removed2 = st.expire(keep_last=1)
    assert "ds=d2/ver=1" in removed2
    assert os.path.isdir(inflight)
    _sh.rmtree(inflight)


def test_snapshot_store_retry_and_removed_partitions(spark, tmp_path):
    import os
    import shutil
    import pandas as pd
    import pytest as _pt

    from torchestra_spark.checkpoint import SnapshotStore

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    d1 = pd.DataFrame({"ds": ["d1"] * 2 + ["d2"] * 2, "x": [1.0, 2, 3, 4]})
    spark.createDataFrame(d1).write.partitionBy("ds").parquet(inp)
    st = SnapshotStore(inp, outp, "ds")
    assert st.refresh(spark) == ["d1", "d2"]

    # simulate a crash between data write and snapshot commit: leftover
    # uncommitted ver=1 data must NOT be double-counted by the retry
    spark.createDataFrame(
        pd.DataFrame({"ds": ["d2"], "x": [99.0]})
    ).write.mode("overwrite").parquet(os.path.join(inp, "ds=d2"))
    os.makedirs(os.path.join(outp, "ds=d2", "ver=1"), exist_ok=True)
    spark.createDataFrame(pd.DataFrame({"x": [99.0]})).write.mode("overwrite").parquet(
        os.path.join(outp, "ds=d2", "ver=1")
    )
    assert st.refresh(spark) == ["d2"]  # the "retry"
    cur = {r["ds"]: r["sum(x)"] for r in st.load(spark).groupBy("ds").sum("x").collect()}
    assert cur == {"d1": 3.0, "d2": 99.0}  # exactly one copy

    # deleting an input partition unpins it in the NEXT snapshot while
    # older snapshots still time-travel to it
    shutil.rmtree(os.path.join(inp, "ds=d1"))
    assert st.refresh(spark) == []  # nothing rewritten...
    assert st.current()["removed"] == ["d1"]
    assert {r["ds"] for r in st.load(spark).select("ds").distinct().collect()} == {"d2"}
    assert {r["ds"] for r in st.load(spark, 1).select("ds").distinct().collect()} == {"d1", "d2"}

    # unsafe partition values are rejected up front
    spark.createDataFrame(pd.DataFrame({"ds": ["bad value"], "x": [1.0]})).write.mode(
        "append"
    ).partitionBy("ds").parquet(inp)
    with _pt.raises(ValueError, match="escaping"):
        st.refresh(spark)
