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

# row-group/row counts are immutable storage metadata (NOT query results):
# one driver-side footer peek per path per process
_META_CACHE: dict[str, tuple[int, int]] = {}


def _table_meta(path: str) -> tuple[int, int]:
    """(total row groups, total rows) from parquet footers."""
    if path not in _META_CACHE:
        try:
            import pyarrow.parquet as pq

            files = (
                [path]
                if os.path.isfile(path)
                else glob.glob(os.path.join(path, "*.parquet"))
            )
            metas = [pq.ParquetFile(f).metadata for f in files]
            _META_CACHE[path] = (
                sum(m.num_row_groups for m in metas) or 1,
                sum(m.num_rows for m in metas),
            )
        except Exception:
            # non-local / unreadable layout: assume splittable, don't spread
            _META_CACHE[path] = (1 << 30, 1 << 60)
    return _META_CACHE[path]


def _row_groups(path: str) -> int:
    return _table_meta(path)[0]


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


DEFAULT_SPREAD_MIN_ROWS = 20_000


def read_spread(
    spark: SparkSession, path: str, key: str, min_rows: int = 0
) -> DataFrame:
    """``spark.read.parquet(path)`` + hash-repartition on ``key`` iff the
    file's row-group layout would otherwise serialize the scan (see module
    docstring).  Filters/pruning still reach the parquet scan: Catalyst
    pushes deterministic predicates through RepartitionByExpression.

    ``min_rows``: below this row count the table is returned raw — for
    consumers whose per-row work is light-to-moderate, a small table's
    single scan task finishes in O(100 ms) and the exchange plus the
    extra n-task stages cost more than the parallelism buys (measured:
    dsir_importance at 5k docs is 1.7 s raw vs 2.2 s spread, while at 50k
    docs spread wins 4.5 s vs 6.8 s).  Consumers with genuinely heavy
    per-row folds (char-trigram entropy, gopher repetition, shingle
    explode) pass ``min_rows=0`` — they win from the spread even at 5k
    rows (2.2 s -> 0.4 s)."""
    df = spark.read.parquet(path)
    n = spread_parallelism(spark)
    rgs, rows = _table_meta(path)
    if rgs >= n or rows < min_rows:
        return df
    return df.repartition(n, F.col(key))
