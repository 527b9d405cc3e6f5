"""Structured Streaming integration.

The reference is batch-only (fit/transform over in-memory shards;
/root/reference/src/torchestra/README.md:74 delegates distribution).
The engine's streaming story follows the feature-store pattern:

* **fit in batch, serve on stream** — a fitted ``Pipeline``'s transform
  is pure Column expressions / Arrow UDFs over frozen state, so it
  applies to a streaming DataFrame unchanged (``apply_pipeline``);
* **watermarked session windows** — gap-based sessionization on a
  stream uses Spark's native ``session_window`` with a watermark for
  late data (the batch engine's cumulative-sum ``sessionize`` assigns
  per-event ids; the streaming form aggregates per session);
* **windowed aggregates** — tumbling-window per-entity stats with
  late-data handling.

All sinks are the caller's choice; helpers return the streaming
DataFrame so tests can use a memory sink with ``trigger(availableNow)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torchestra_spark.plans.pipeline import Pipeline


def apply_pipeline(stream_df: DataFrame, pipeline: Pipeline, keep_input: bool = True) -> DataFrame:
    """Apply a batch-fitted pipeline's transforms to a streaming frame.

    Works because fitted transforms are stateless expressions (literals
    + broadcast dicts) — the fit happened in batch; nothing here blocks
    streaming execution.
    """
    return pipeline.transform(stream_df, keep_input=keep_input)


def stream_sessionize(
    stream_df: DataFrame,
    entity: str,
    ts: str,
    gap_sec: float,
    watermark_sec: float = 3600.0,
    agg_col: str = "value",
) -> DataFrame:
    """Session aggregates per entity with a late-data watermark:
    (entity, session start/end, n_events, sum(agg_col))."""
    gap = f"{int(gap_sec)} seconds"
    wm = f"{int(watermark_sec)} seconds"
    # watermarks require TIMESTAMP (not NTZ); lossless under UTC session tz
    stream_df = stream_df.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        stream_df.withWatermark(ts, wm)
        .groupBy(F.col(entity), F.session_window(F.col(ts), gap).alias("session"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(agg_col)).alias(f"sum_{agg_col}"),
        )
        .select(
            entity,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            f"sum_{agg_col}",
        )
    )


def stream_windowed_stats(
    stream_df: DataFrame,
    entity: str,
    ts: str,
    value: str,
    window_sec: float = 3600.0,
    watermark_sec: float = 3600.0,
) -> DataFrame:
    """Tumbling-window per-entity mean/min/max/count with watermark."""
    win = f"{int(window_sec)} seconds"
    wm = f"{int(watermark_sec)} seconds"
    stream_df = stream_df.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        stream_df.withWatermark(ts, wm)
        .groupBy(F.col(entity), F.window(F.col(ts), win).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.avg(value).alias("mean"),
            F.min(value).alias("min"),
            F.max(value).alias("max"),
        )
        .select(entity, F.col("w.start").alias("window_start"), "n", "mean", "min", "max")
    )


def run_to_memory(
    stream_df: DataFrame, name: str, spark=None, output_mode: str = "append"
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table with
    trigger(availableNow) and return the result — test/demo helper.
    Use output_mode='complete' for aggregated streams (the watermark
    never passes the final windows of a bounded source, so append would
    withhold them)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    session = spark or stream_df.sparkSession
    return session.table(name)
