"""Scale-adaptive scan spreading for row-group-monolithic parquet inputs.

A Parquet scan task only reads the row groups whose start offset falls
inside its split, so a single-row-group file is read by ONE task no matter
how many splits Spark cuts (`maxPartitionBytes` cannot help) — and every
downstream map-side stage (tokenize, shingle explode, per-doc HOF folds,
the persisted postings carrier) inherits that single partition.  Measured
at sf1.0 (50k docs, one 5.9 MB row group): the whole "zero-shuffle
embarrassingly parallel" text_char_entropy pass ran on 1 of 32 cores, and
every cached index/shingle frame was pinned at 1 partition for all later
consumers.

Fix per the optimization guide §2.5 ("input skew: one huge unsplittable
file — repartition immediately after the read"): one hash exchange of the
compressed base table (documents @ sf1.0 ≈ 6 MB) keyed on the table's
primary key (deterministic placement, no round-robin pre-sort), buying
full-cluster parallelism for everything after it.

Scale-adaptive, not a local[32] constant: the target partition count
follows the session's core count, and inputs whose row-group layout
already feeds that many tasks (any real multi-file table at cluster
scale) are returned untouched, so the exchange disappears exactly when
the storage layout makes it redundant.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# row-group counts are immutable storage metadata (NOT query results): one
# driver-side footer peek per path per process
_RG_CACHE: dict[str, int] = {}


def _row_groups(path: str) -> int:
    if path not in _RG_CACHE:
        try:
            import pyarrow.parquet as pq

            files = (
                [path]
                if os.path.isfile(path)
                else glob.glob(os.path.join(path, "*.parquet"))
            )
            _RG_CACHE[path] = (
                sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
                or 1
            )
        except Exception:
            # non-local / unreadable layout: assume splittable, don't spread
            _RG_CACHE[path] = 1 << 30
    return _RG_CACHE[path]


def spread_parallelism(spark: SparkSession) -> int:
    # Match the session's shuffle partition count so downstream
    # groupBy/join on the spread key REUSE the reader's partitioning
    # (guide §2.4: same key + same partition count = no second exchange;
    # a mismatched count forces ENSURE_REQUIREMENTS to re-shuffle).
    # Scale-adaptive by construction — it follows whatever the deployment
    # sets `spark.sql.shuffle.partitions` to; env knob for tuning without
    # code edits.
    env = os.environ.get("SPARK_GRAFT_SPREAD_N")
    if env:
        return max(int(env), 1)
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n = spark.sparkContext.defaultParallelism
    return max(n, 1)


def read_spread(spark: SparkSession, path: str, key: str) -> DataFrame:
    """``spark.read.parquet(path)`` + hash-repartition on ``key`` iff the
    file's row-group layout would otherwise serialize the scan (see module
    docstring).  Filters/pruning still reach the parquet scan: Catalyst
    pushes deterministic predicates through RepartitionByExpression."""
    df = spark.read.parquet(path)
    n = spread_parallelism(spark)
    if _row_groups(path) >= n:
        return df
    return df.repartition(n, F.col(key))
