"""Structured Streaming: fit-in-batch/serve-on-stream, watermarked
session windows, tumbling windows — verified against batch oracles on
a bounded parquet stream (availableNow trigger, memory sink)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from torchestra_spark import Feature, IndexLookup, Pipeline, StandardScore
from torchestra_spark.streaming import (
    apply_pipeline,
    run_to_memory,
    stream_sessionize,
    stream_windowed_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    # file-stream sources need a directory
    import shutil

    d = tmp_path_factory.mktemp("events_dir")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    batch = spark.read.parquet(f"{SF}/events.parquet")
    return spark.readStream.schema(batch.schema).parquet(str(d))


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_fitted_pipeline_on_stream(spark, events_stream, events_batch):
    pipe = Pipeline(
        {
            "value_z": Feature("value", [StandardScore()]),
            "etype_idx": Feature("event_type", [IndexLookup()]),
        }
    )
    pipe.fit(events_batch)  # batch fit
    out = apply_pipeline(events_stream, pipe)  # stream serve
    assert out.isStreaming
    got = run_to_memory(out.select("event_id", "value_z", "etype_idx"), "t_pipe", spark)
    gpd = got.toPandas().sort_values("event_id", ignore_index=True)
    exp = (
        pipe.transform(events_batch)
        .select("event_id", "value_z", "etype_idx")
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert np.allclose(gpd["value_z"], exp["value_z"])
    assert (gpd["etype_idx"] == exp["etype_idx"]).all()


def test_stream_sessionize_matches_batch_sessions(spark, events_stream, events_batch):
    gap = 6 * 3600.0
    out = stream_sessionize(events_stream, "user_id", "ts", gap_sec=gap, agg_col="value")
    got = run_to_memory(out, "t_sess", spark, output_mode="complete").toPandas()
    # batch oracle: session count per user from the cumulative-gap engine
    from torchestra_spark.operators.temporal import sessionize

    b = sessionize(events_batch, "user_id", ["ts", "event_id"], gap_sec=gap)
    exp_sessions = (
        b.groupBy("user_id").agg(F.countDistinct("session_id").alias("n")).toPandas()
    )
    got_sessions = got.groupby("user_id").size().reset_index(name="n")
    m = exp_sessions.merge(got_sessions, on="user_id", how="outer")
    assert (m["n_x"] == m["n_y"]).all()
    # event conservation
    assert got["n_events"].sum() == events_batch.count()


def test_stream_windowed_stats(spark, events_stream, events_batch):
    out = stream_windowed_stats(events_stream, "user_id", "ts", "value",
                                window_sec=86400.0, watermark_sec=86400.0)
    got = run_to_memory(out, "t_win", spark, output_mode="complete").toPandas()
    exp = (
        events_batch.groupBy("user_id", F.window("ts", "86400 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    assert got["n"].sum() == len(events_batch.toPandas())
    assert len(got) == len(exp)


def test_stream_sessionize_ids_match_batch(spark, tmp_path_factory):
    """Per-event stream session ids == batch sessionize ids, across
    MULTIPLE micro-batches (state carries last_ts/session_id between
    them).  Files are written in time order so the bounded source
    replays an in-order stream."""
    import time as _time

    import pandas as pd

    from torchestra_spark.operators.temporal import sessionize
    from torchestra_spark.streaming import stream_sessionize_ids

    batch = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id", "ts")
    pdf = batch.toPandas().sort_values("ts", ignore_index=True)
    d = tmp_path_factory.mktemp("sess_dir")
    # 3 time-sliced files, written oldest-first (file source orders by mtime)
    cuts = np.array_split(np.arange(len(pdf)), 3)
    for i, idx in enumerate(cuts):
        spark.createDataFrame(pdf.iloc[idx]).coalesce(1).write.parquet(str(d / f"s{i}"))
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    gap = 6 * 3600.0
    out = stream_sessionize_ids(stream, "user_id", "ts", gap_sec=gap)
    got = run_to_memory(out, "t_sess_ids", spark).toPandas().sort_values(
        "event_id", ignore_index=True
    )
    exp = (
        sessionize(batch, "user_id", ["ts", "event_id"], gap_sec=gap)
        .select("event_id", "session_id")
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert len(got) == len(exp)
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()


def test_streaming_asof_feature_serving(spark, events_stream, events_batch):
    """Point-in-time feature serving ON A STREAM: the broadcast as-of
    strategy is a pandas-UDF match against a static feature table, so it
    applies to a streaming probe unchanged — parity with batch."""
    from torchestra_spark.io.sources import feature_events
    from torchestra_spark.operators.temporal import asof_join

    feats = spark.createDataFrame(
        feature_events(spark, n_entities=60, seed=7, partitions=2).toPandas()
    )
    out = asof_join(
        events_stream, feats, on="user_id", left_ts="ts", right_ts="feature_ts",
        value_cols=["fval"], strategy="broadcast",
    )
    assert out.isStreaming
    got = (
        run_to_memory(out.select("event_id", "fval", "matched_feature_ts"), "t_asof", spark)
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    exp = (
        asof_join(events_batch, feats, on="user_id", left_ts="ts",
                  right_ts="feature_ts", value_cols=["fval"], strategy="broadcast")
        .select("event_id", "fval", "matched_feature_ts")
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(
        got["fval"].to_numpy(dtype=float), exp["fval"].to_numpy(dtype=float), equal_nan=True
    )
    assert got["matched_feature_ts"].isna().equals(exp["matched_feature_ts"].isna())


def test_stream_dedup_exact_bounded_state(spark, tmp_path):
    # two copies of each doc inside the horizon -> one survivor each;
    # whitespace/case-normalized variants collapse too
    from torchestra_spark.streaming import stream_dedup_exact

    rows = [
        (1, "Alpha beta gamma", "2024-01-01 00:00:00"),
        (2, "alpha  beta   gamma", "2024-01-01 00:10:00"),  # normalized dup of 1
        (3, "delta epsilon", "2024-01-01 00:20:00"),
        (4, "delta epsilon", "2024-01-01 00:30:00"),        # exact dup of 3
        (5, "unique document", "2024-01-01 00:40:00"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = tmp_path / "docs_stream"
    batch.coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = stream_dedup_exact(stream, "text", "ts", watermark_sec=3600.0)
    assert out.isStreaming
    got = run_to_memory(out.select("doc_id"), "t_dedup", spark).toPandas()
    kept = sorted(got["doc_id"])
    # one survivor per fingerprint group {1,2}, {3,4}, {5}
    assert len(kept) == 3
    assert kept[0] in (1, 2) and kept[1] in (3, 4) and kept[2] == 5


def test_quality_filters_and_sampling_on_stream(spark, tmp_path):
    # the text gates and deterministic sampling are stateless Catalyst
    # predicates -> they apply to a streaming frame unchanged, and the
    # streamed result equals the batch result row-for-row
    from torchestra_spark.functions.sampling import deterministic_sample
    from torchestra_spark.functions.text import c4_doc_filter, gopher_filter

    rows = [
        (i, "the quick brown foxes jumped over the fence and the hounds "
            "chased them through that field today again")
        for i in range(40)
    ] + [(100 + i, "junk { code }") for i in range(10)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    d = tmp_path / "docs_stream2"
    batch.coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))

    def gate(df):
        kept = df.filter(gopher_filter(F.col("text")) & c4_doc_filter(F.col("text")))
        return deterministic_sample(kept, "doc_id", 0.5, seed=4)

    got = sorted(
        r.doc_id for r in run_to_memory(gate(stream).select("doc_id"), "t_gate", spark).collect()
    )
    exp = sorted(r.doc_id for r in gate(batch).select("doc_id").collect())
    assert got == exp and 0 < len(got) < 40
    assert all(i < 100 for i in got)  # junk docs never pass


def test_simhash_sketch_on_stream_matches_batch(spark, tmp_path):
    # the mapInArrow sketch is stateless -> valid on streams; the
    # streamed sketch table equals the batch sketch bit-for-bit
    from torchestra_spark.functions.dedup import simhash_tokens

    rows = [(i, [j * 7 + i for j in range(1 + i % 9)]) for i in range(300)]
    batch = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    d = tmp_path / "tok_stream"
    batch.coalesce(2).write.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    got = run_to_memory(simhash_tokens(stream, "tokens", "doc_id"), "t_sketch", spark)
    gp = {r.doc_id: r.simhash for r in got.collect()}
    ep = {r.doc_id: r.simhash for r in simhash_tokens(batch, "tokens", "doc_id").collect()}
    assert gp == ep and len(gp) == 300


def test_fused_near_dup_sketches_on_stream_matches_batch(spark, tmp_path):
    # the fused simhash+winnow kernel is stateless too -> streams get
    # BOTH sketches in one pass, equal to the batch result
    from torchestra_spark.functions.dedup import near_dup_sketches

    rows = [(i, [j * 5 + i for j in range(1 + i % 11)]) for i in range(200)]
    batch = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    d = tmp_path / "fused_stream"
    batch.coalesce(2).write.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    got = run_to_memory(
        near_dup_sketches(stream, "tokens", "doc_id", k=3, w=4), "t_fused", spark
    )
    gp = {r.doc_id: (r.simhash, tuple(sorted(r.winnow_fps))) for r in got.collect()}
    ep = {r.doc_id: (r.simhash, tuple(sorted(r.winnow_fps)))
          for r in near_dup_sketches(batch, "tokens", "doc_id", k=3, w=4).collect()}
    assert gp == ep and len(gp) == 200


def test_featurestore_serve_stream_matches_batch(spark, events_stream, events_batch):
    """FeatureStore.serve_stream: broadcast point-in-time joins + the
    batch-fitted pipeline applied to a live stream == the same serving
    path run in batch (per-row parity on values and matched ts)."""
    from torchestra_spark.featurestore import FeatureStore
    from torchestra_spark.io.sources import feature_events
    from torchestra_spark.plans.pipeline import Feature, Pipeline
    from torchestra_spark import StandardScore

    feats = spark.createDataFrame(
        feature_events(spark, n_entities=60, seed=7, partitions=2).toPandas()
    )
    store = (
        FeatureStore(entity="user_id", ts="ts")
        .add_feature_table(feats, ts="feature_ts", name="f", value_cols=["fval"])
        .add_pipeline(Pipeline({"value_z": Feature("value", [StandardScore()])}))
    )
    store.build(events_batch)  # batch fit freezes pipeline state

    out = store.serve_stream(events_stream)
    assert out.isStreaming
    cols = ["event_id", "fval", "f_matched_ts", "value_z"]
    got = (
        run_to_memory(out.select(*cols), "t_fs_serve", spark)
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    exp = (
        store.serve_stream(events_batch)  # same path, batch frame
        .select(*cols)
        .toPandas().sort_values("event_id", ignore_index=True)
    )
    assert len(got) == len(exp)
    for c in ("fval", "value_z"):
        assert np.allclose(
            got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float), equal_nan=True
        )
    assert got["f_matched_ts"].isna().equals(exp["f_matched_ts"].isna())
