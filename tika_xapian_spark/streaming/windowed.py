"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference is batch-only (SURVEY.md §2.6: the TUI re-executes full
queries per keystroke), but a training-data ingest pipeline consumes event
streams; this module provides the standard streaming shape:

  readStream (file source) -> withWatermark -> window(ts) groupBy ->
  append-mode parquet sink with checkpoint.

``run_finalized_window_counts`` demonstrates — and the driver oracle-checks —
the full watermark lifecycle across a checkpointed restart:

  1. an ``availableNow`` run ingests the real events; the trailing no-data
     batch advances the watermark to max(ts) - delay, so append mode emits
     every window EXCEPT the open tail (windows ending inside the delay) —
     those are withheld awaiting possible late data;
  2. a far-future sentinel event is appended to the input directory;
  3. a second ``availableNow`` run resumes from the same checkpoint, the
     watermark jumps past the tail windows, and the remaining aggregation
     state recovered from the checkpoint is finalized and emitted.

The emitted result therefore equals the batch aggregation exactly
(plans/rel_queries.py::q_events_windowed semantics), which is what makes a
plain-SQL oracle possible for a streaming query. At scale the same plan runs
continuously with a processing-time trigger; state size is bounded by
(open windows x event types) and the shuffle key is (window, event_type).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SENTINEL_TYPE = "__watermark_sentinel__"


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over an events directory (schema pinned — file
    streams cannot infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def windowed_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time windows per event_type with late-data tolerance
    ``watermark_delay``; works on a stream or a batch frame (watermark is a
    no-op in batch)."""
    return (
        events.withWatermark("ts", watermark_delay)
        # group on the window struct itself — projecting .start before the
        # aggregation severs the watermark association and Spark rejects
        # append mode
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def _run_available_now(stream_out: DataFrame, out_dir: str, ckpt_dir: str) -> None:
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_finalized_window_counts(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    window_len: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Two-phase availableNow run (see module docstring): returns the
    finalized windows, equal to the batch aggregation over the input."""
    inp = os.path.join(work_dir, "input")
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    os.makedirs(inp, exist_ok=True)
    shutil.copy(events_parquet, os.path.join(inp, "events-000.parquet"))

    stream = windowed_counts(
        read_event_stream(spark, inp), window_len, watermark_delay
    )
    _run_available_now(stream, out, ckpt)  # phase 1: ingest, windows open

    max_ts = (
        spark.read.parquet(events_parquet).agg(F.max("ts").alias("m")).collect()
    )[0]["m"]
    sentinel = spark.createDataFrame(
        [(int(-1), max_ts, int(-1), SENTINEL_TYPE, 0.0, "{}")], EVENTS_SCHEMA
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    sentinel.write.mode("append").parquet(inp)

    stream2 = windowed_counts(
        read_event_stream(spark, inp), window_len, watermark_delay
    )
    _run_available_now(stream2, out, ckpt)  # phase 2: watermark jumps, emit

    return spark.read.parquet(out).filter(F.col("event_type") != SENTINEL_TYPE)
