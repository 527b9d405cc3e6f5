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
