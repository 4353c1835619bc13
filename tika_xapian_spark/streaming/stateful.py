"""Custom stateful streaming operator: cross-batch exact deduplication with
``applyInPandasWithState`` (the task-level "custom stateful operator" surface
of Structured Streaming).

``streaming_dedup`` keeps one state cell per content hash group and emits
each first-seen document exactly once across micro-batches — the streaming
form of the exact-dedup operator (operators/dedup.py), as a training-data
ingest pipeline needs when the crawl arrives incrementally: re-crawled or
mirrored pages must not re-enter the corpus.

State is keyed by ``content_hash`` (md5 of the payload), so state size is
bounded by the number of *distinct* documents, and the shuffle key is the
hash — uniformly distributed by construction, no skew. A GroupStateTimeout
can bound retention for unbounded streams (not enabled here: the tests use
finite availableNow runs).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("url", StringType()),  # first url seen with this content
        StructField("n_duplicates_so_far", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("seen", LongType()),
        StructField("first_url", StringType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the group's row only the first time the hash is seen; afterwards
    just count duplicates into state."""
    (content_hash,) = key
    seen, first_url = state.get if state.exists else (0, None)
    total_new = 0
    for pdf in pdfs:
        if first_url is None and len(pdf):
            # deterministic representative: lexicographically smallest url
            first_url = min(pdf["url"])
        total_new += len(pdf)
    emit_first = seen == 0 and total_new > 0
    state.update((seen + total_new, first_url))
    if emit_first:
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "url": [first_url],
                "n_duplicates_so_far": [total_new - 1],
            }
        )


def streaming_dedup(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Run the stateful dedup over whatever is currently in ``source_path``
    (availableNow) and append first-seen docs to ``out_dir/unique``. State
    persists in the checkpoint, so re-crawled content in later runs is
    suppressed too."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_state_checkpoint")
    static = spark.read.parquet(source_path)
    stream = spark.readStream.schema(static.schema).parquet(source_path)

    hashed = stream.select(
        F.md5(F.col("html")).alias("content_hash"), "url"
    )
    deduped = hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    q = (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "unique"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_unique(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "unique"))
