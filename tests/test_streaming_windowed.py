"""Watermarked streaming windowed aggregation (streaming/windowed.py):
append-mode emission is gated on the watermark, state survives a
checkpointed restart, and the finalized result equals the batch plan."""

import os
import shutil

from pyspark.sql import functions as F

from tika_xapian_spark.streaming.windowed import (
    EVENTS_SCHEMA,
    SENTINEL_TYPE,
    _run_available_now,
    read_event_stream,
    run_finalized_window_counts,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


def test_phase1_withholds_tail_then_restart_finalizes(spark, tmp_path):
    """Append mode withholds windows still inside the watermark delay
    (possible late data); the second availableNow run (same checkpoint)
    finalizes them from recovered state."""
    work = str(tmp_path)
    inp, out, ckpt = (os.path.join(work, d) for d in ("input", "out", "ckpt"))
    os.makedirs(inp)
    shutil.copy(EVENTS, os.path.join(inp, "events-000.parquet"))

    _run_available_now(windowed_counts(read_event_stream(spark, inp)), out, ckpt)
    phase1 = spark.read.parquet(out)
    batch = windowed_counts(spark.read.parquet(EVENTS))
    n_total = batch.count()
    # the trailing no-data batch advances the watermark to max(ts) - delay:
    # everything before the tail is emitted, the open tail is withheld
    assert 0 < phase1.count() < n_total
    max_ts = spark.read.parquet(EVENTS).agg(F.max("ts").alias("m")).collect()[0]["m"]
    withheld = batch.join(phase1, ["window_start", "event_type"], "left_anti")
    late_cutoff = F.lit(max_ts) - F.expr("INTERVAL 90 MINUTES")  # delay + window
    assert withheld.filter(F.col("window_start") < late_cutoff).count() == 0

    sentinel = spark.createDataFrame(
        [(-1, max_ts, -1, SENTINEL_TYPE, 0.0, "{}")], EVENTS_SCHEMA
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    sentinel.write.mode("append").parquet(inp)

    _run_available_now(windowed_counts(read_event_stream(spark, inp)), out, ckpt)
    emitted = spark.read.parquet(out).filter(F.col("event_type") != SENTINEL_TYPE)
    assert sorted(map(tuple, emitted.collect())) == sorted(map(tuple, batch.collect()))


def test_run_finalized_equals_batch(spark, tmp_path):
    res = run_finalized_window_counts(spark, EVENTS, str(tmp_path / "w"))
    batch = windowed_counts(spark.read.parquet(EVENTS))
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, batch.collect()))
