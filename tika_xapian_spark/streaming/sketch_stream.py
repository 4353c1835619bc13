"""Streaming KMV distinct-count sketch (``applyInPandasWithState``).

The batch KMV sketch (operators/sketches.py::kmv_distinct) run as a LIVE
stream: per event-type group the state is the k smallest distinct 60-bit
hashes seen so far — CONSTANT size (k longs) per group, which is the whole
point: a distinct-user count over an unbounded 10^12-event stream needs
unbounded dedup state, the sketch needs k longs, and k-min sets merge
associatively so cross-batch accumulation is exact (the final sketch equals
the batch sketch over the union of all batches, hence the plain-SQL oracle).

Mechanics (same two-phase availableNow machinery as sessionize.py):

  1. time-ordered chunk files consumed with maxFilesPerTrigger=1 — the
     k-min state genuinely accumulates across micro-batch boundaries;
  2. a sentinel row per event type is appended and a checkpointed restart
     lets every group emit its FINAL estimate exactly once.

Hashing happens JVM-side in the stream projection (the same conv(md5)
60-bit hash as the batch operator / DuckDB oracle) — Python only maintains
the k-element state.
"""

from __future__ import annotations

import math
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import KMV_K, KMV_SPACE, _hash60
from .sessionize import _stage_time_ordered
from .windowed import EVENTS_SCHEMA, _run_available_now

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("kmv_estimate", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("mins", ArrayType(LongType()))])

_SENTINEL_ID = -1


def _kmv_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold the batch's hashes into the k-min set; on the sentinel, emit
    the group's final estimate. The merge is exact: the k smallest
    distinct hashes of (state ∪ batch) — order of arrival cannot matter."""
    (etype,) = key
    mins = list(state.get[0]) if state.exists else []
    seen = set(mins)
    finalize = False
    for pdf in pdfs:
        if (pdf["event_id"] == _SENTINEL_ID).any():
            finalize = True
        seen.update(
            int(h) for h in pdf.loc[pdf["event_id"] != _SENTINEL_ID, "h"]
        )
    mins = sorted(seen)[:KMV_K]
    state.update((mins,))
    if finalize:
        n = len(mins)
        est = (
            n
            if n < KMV_K
            else int(math.floor((KMV_K - 1) * KMV_SPACE / mins[-1]))
        )
        yield pd.DataFrame({"event_type": [etype], "kmv_estimate": [est]})


def run_two_phase_by_type(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    projection: list,
    fn,
    output_schema: StructType,
    state_schema: StructType,
    n_chunks: int = 3,
) -> DataFrame:
    """Shared two-phase availableNow harness for per-event-type stateful
    sketches (KMV, CMS, and any future exactly-mergeable state): stage
    time-ordered chunk files (maxFilesPerTrigger=1 so state genuinely
    accumulates across micro-batches), run phase 1, append one sentinel
    row per event type, then a checkpointed restart (phase 2) finalizes
    every group exactly once. ``projection`` is the extra JVM-side columns
    the stateful ``fn`` reads beyond (event_type, event_id) — hashing
    stays in the stream projection, Python only folds state. ONE copy of
    the sentinel/restart machinery; sketch modules supply only their
    state fold."""
    inp = os.path.join(work_dir, "input")
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    _stage_time_ordered(spark, events_parquet, inp, n_chunks)

    def make_query():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
            .select("event_type", "event_id", *projection)
        )
        sketches = stream.groupBy("event_type").applyInPandasWithState(
            fn,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        _run_available_now(sketches, out, ckpt)

    make_query()  # phase 1: state accumulates across batches

    ev = spark.read.parquet(events_parquet)
    sentinel = ev.select("event_type").distinct().select(
        F.lit(_SENTINEL_ID).cast("long").alias("event_id"),
        F.expr("timestamp'2099-01-01 00:00:00'").alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.col("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(inp)

    make_query()  # phase 2: every group sees its sentinel and finalizes

    return spark.read.parquet(out)


def run_stream_kmv(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    n_chunks: int = 3,
) -> DataFrame:
    """Two-phase availableNow run; returns (event_type, kmv_estimate) equal
    to the batch KMV sketch over the same input."""
    return run_two_phase_by_type(
        spark,
        events_parquet,
        work_dir,
        [F.expr(_hash60("cast(user_id as string)")).alias("h")],
        _kmv_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        n_chunks,
    )
