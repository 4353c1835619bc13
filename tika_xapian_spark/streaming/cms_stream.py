"""Streaming count-min sketch (``applyInPandasWithState``).

The batch CMS (operators/sketches.py::cms_heavy_hitters) run as a LIVE
stream: per event-type group the state is the depth x width counter matrix
— CONSTANT size (d*w longs) per group. Counter matrices merge by plain
addition, so cross-batch accumulation is exact: the final sketch equals
the batch sketch over the union of all batches, hence the plain-SQL
oracle. The emitted table IS the sketch (nonzero cells), which both gates
the streaming path end-to-end and is the production hand-off format — a
downstream consumer probes it with min-over-rows for any key.

Mechanics are sketch_stream.py's: time-ordered chunk files with
maxFilesPerTrigger=1 (state genuinely accumulates across micro-batches),
then a sentinel row per event type across a checkpointed restart lets
every group emit its final cells exactly once. Hashing happens JVM-side in
the stream projection (the shared conv(md5) 60-bit hash); Python only adds
into the counter array.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import CMS_DEPTH, CMS_WIDTH, _hash60
from .sessionize import _stage_time_ordered
from .windowed import EVENTS_SCHEMA, _run_available_now

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("r", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("cell", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("cells", ArrayType(LongType()))])

_SENTINEL_ID = -1


def _cms_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Add the batch's bucket hits into the d*w counter matrix; on the
    sentinel, emit the group's nonzero cells. Addition commutes — arrival
    order cannot matter."""
    (etype,) = key
    cells = (
        np.array(state.get[0], dtype=np.int64)
        if state.exists
        else np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    )
    finalize = False
    for pdf in pdfs:
        if (pdf["event_id"] == _SENTINEL_ID).any():
            finalize = True
        live = pdf[pdf["event_id"] != _SENTINEL_ID]
        for r in range(CMS_DEPTH):
            cells[r * CMS_WIDTH : (r + 1) * CMS_WIDTH] += np.bincount(
                live[f"b{r}"].to_numpy(dtype=np.int64), minlength=CMS_WIDTH
            )
    state.update(([int(x) for x in cells],))
    if finalize:
        nz = np.flatnonzero(cells)
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(nz),
                "r": (nz // CMS_WIDTH).astype(np.int32),
                "bucket": (nz % CMS_WIDTH).astype(np.int32),
                "cell": cells[nz],
            }
        )


def run_stream_cms(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    n_chunks: int = 3,
) -> DataFrame:
    """Two-phase availableNow run; returns (event_type, r, bucket, cell)
    equal to the batch CMS counter table over the same input (user_id is
    the counted key)."""
    inp = os.path.join(work_dir, "input")
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    _stage_time_ordered(spark, events_parquet, inp, n_chunks)

    bucket_cols = [
        F.expr(
            f"CAST(pmod({_hash60(f'''concat('{r}:', cast(user_id as string))''')},"
            f" {CMS_WIDTH}) AS INT)"
        ).alias(f"b{r}")
        for r in range(CMS_DEPTH)
    ]

    def make_query():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
            .select("event_type", "event_id", *bucket_cols)
        )
        sketches = stream.groupBy("event_type").applyInPandasWithState(
            _cms_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        _run_available_now(sketches, out, ckpt)

    make_query()  # phase 1: counters accumulate across batches

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
