"""Watermarked stream-stream INTERVAL join (Structured Streaming).

The one first-class Structured Streaming operator the registry lacked:
joining two live streams on an equi key plus an event-time range —
here last-touch-style attribution pairs, every (click, purchase) of the
same user with the purchase inside ``max_gap`` after the click.

Shape:

  readStream(clicks)    -> rename -> withWatermark(click_ts)    \
                                                                 join on
  readStream(purchases) -> rename -> withWatermark(purchase_ts) /  user +
                                                             time range
  -> append-mode parquet sink

(renames happen BEFORE withWatermark — renaming the event-time column
after the watermark is attached severs the association, the same trap as
projecting window.start before a windowed aggregation.)

Mechanics this module demonstrates (and the driver oracle-checks):

- both sides buffer rows in join state keyed by user_id; an INNER
  interval join emits a pair the moment both rows have arrived, so a
  single ``availableNow`` pass over the input emits the complete result —
  no finalization restart is needed (unlike the windowed-agg/sessionize
  modules, where append mode withholds open aggregates);
- the watermarks plus the range condition bound the state: Spark can
  evict a buffered click once the purchase-side watermark passes
  click_ts + max_gap (no future purchase can match it), and a purchase
  once the click-side watermark passes purchase_ts — this is what makes
  the operator runnable indefinitely at scale instead of buffering the
  whole history;
- the input is staged as time-ordered chunk files consumed with
  ``maxFilesPerTrigger=1``, so pairs whose click and purchase fall in
  different micro-batches genuinely cross batch boundaries through the
  join state (a single-batch run would never exercise the buffer).

The emitted pairs equal the batch range join over the same input, so a
plain-SQL oracle gates the whole path (plans/rel_queries.py::
events_stream_interval_join).

Watermark delay == max_gap: with time-ordered chunks nothing ever
arrives late, so any delay >= 0 yields the same OUTPUT; the delay only
moves the state-eviction horizon. Using the join's own range keeps the
safety argument one line: a click is evicted only when even the newest
possible purchase is out of range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessionize import _stage_time_ordered
from .windowed import EVENTS_SCHEMA, _run_available_now


def _click_side(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )


def _purchase_side(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )


def _join_pairs(clicks: DataFrame, purchases: DataFrame, max_gap: str) -> DataFrame:
    """Join pre-shaped sides (from _click_side/_purchase_side): every
    same-user pair with click_ts <= purchase_ts <= click_ts + max_gap.
    Identical expressions for the batch frame and the two-stream case."""
    return (
        purchases.join(
            clicks,
            F.expr(
                f"""user_id = c_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {max_gap}"""
            ),
        )
        .select(
            "user_id",
            "click_id",
            "click_ts",
            "purchase_id",
            "purchase_ts",
            F.expr(
                "timestampdiff(MICROSECOND, click_ts, purchase_ts)"
            ).alias("gap_us"),
        )
    )


def interval_join_pairs(events: DataFrame, max_gap: str = "1 hour") -> DataFrame:
    """Batch form over one events frame — the oracle shape."""
    return _join_pairs(_click_side(events), _purchase_side(events), max_gap)


def run_stream_interval_join(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    max_gap: str = "1 hour",
    n_chunks: int = 3,
) -> DataFrame:
    """One availableNow pass of the watermarked stream-stream interval
    join over time-ordered chunk files; returns the emitted pairs (equal
    to the batch interval_join_pairs over the same input)."""
    inp = os.path.join(work_dir, "input")
    _stage_time_ordered(spark, events_parquet, inp, n_chunks)
    return run_stream_interval_join_on_dir(spark, inp, work_dir, max_gap)


def run_stream_interval_join_on_dir(
    spark: SparkSession,
    inp: str,
    work_dir: str,
    max_gap: str = "1 hour",
) -> DataFrame:
    """Core runner over an ALREADY-staged input dir of time-ordered chunk
    files (tests stage a split that deterministically puts a known pair's
    click and purchase in different micro-batches)."""
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")

    def stream() -> DataFrame:
        # two independent readStream handles: each side tracks files on
        # its own (a shared handle would make this a self-join, which
        # file-source streams handle less predictably across restarts)
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        )

    clicks = _click_side(stream()).withWatermark("click_ts", max_gap)
    purchases = _purchase_side(stream()).withWatermark("purchase_ts", max_gap)
    pairs = _join_pairs(clicks, purchases, max_gap)
    _run_available_now(pairs, out, ckpt)
    return spark.read.parquet(out)
