"""Streaming count-min sketch (``applyInPandasWithState``).

The batch CMS (operators/sketches.py::cms_heavy_hitters) run as a LIVE
stream: per event-type group the state is the depth x width counter matrix
— CONSTANT size (d*w longs) per group. Counter matrices merge by plain
addition, so cross-batch accumulation is exact: the final sketch equals
the batch sketch over the union of all batches, hence the plain-SQL
oracle. The emitted table IS the sketch (nonzero cells), which both gates
the streaming path end-to-end and is the production hand-off format — a
downstream consumer probes it with min-over-rows for any key.

Mechanics come entirely from ``sketch_stream.run_two_phase_by_type`` (the
ONE copy of the time-ordered-chunk / sentinel-finalize machinery shared
with the KMV sketch): this module contributes only the JVM-side bucket
projection and the counter fold; Python only adds into the counter array.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import CMS_DEPTH, CMS_WIDTH, _hash60
from .sketch_stream import _SENTINEL_ID, run_two_phase_by_type

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("r", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("cell", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("cells", ArrayType(LongType()))])


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
    bucket_cols = [
        F.expr(
            f"CAST(pmod({_hash60(f'''concat('{r}:', cast(user_id as string))''')},"
            f" {CMS_WIDTH}) AS INT)"
        ).alias(f"b{r}")
        for r in range(CMS_DEPTH)
    ]
    return run_two_phase_by_type(
        spark,
        events_parquet,
        work_dir,
        bucket_cols,
        _cms_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        n_chunks,
    )
