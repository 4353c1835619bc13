"""Cross-batch stateful gap-sessionization (``applyInPandasWithState``).

The batch form (plans/rel_queries.py::q_events_sessionized) computes per-user
session counts with window functions; an ingest pipeline consuming an event
stream needs the same semantics incrementally. This module runs the gap rule
(new session when the inactivity gap exceeds ``gap_sec``) as a custom
stateful operator: one state cell per user carrying (last event time,
sessions so far, current/max session size), updated per micro-batch.

SQL-checkable finalization (the windowed.py trick, adapted to state):

  1. the events are staged as K time-range files and streamed with
     ``maxFilesPerTrigger=1``, so micro-batches arrive in event-time order
     and the cross-batch state transitions are the real ones (a session can
     span a batch boundary);
  2. a sentinel file with one flagged row per user is appended; a second
     ``availableNow`` run resumes from the checkpoint and each group emits
     its finalized (user_id, n_sessions, max_session_events) row on seeing
     its sentinel.

The emitted result equals the batch window-function aggregation exactly, so
the same DuckDB oracle gates both. State is one small tuple per active user,
shuffled by user_id.

Two finalization forms, both implemented:

  run_finalized_sessions   sentinel rows + checkpointed restart (test
                           harness: deterministic, every user finalizes);
  run_timeout_sessions     ``GroupStateTimeout.EventTimeTimeout`` — the
                           AT-SCALE form: an idle user's state emits and
                           retires when the event-time watermark passes
                           last_event + idle_sec, exactly how a continuous
                           ingest pipeline bounds its state store. A user
                           reappearing after retirement starts a fresh
                           epoch (per-user-epoch rows downstream).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from .windowed import EVENTS_SCHEMA

SENTINEL_TYPE = "__finalize_sentinel__"
_NO_TS = -(10**15)  # state slot for "no event seen yet"

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("max_session_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),  # epoch seconds
        StructField("n_sessions", LongType()),
        StructField("cur_n", LongType()),
        StructField("max_n", LongType()),
    ]
)


def make_session_fn(gap_sec: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        finalize = (batch["event_type"] == SENTINEL_TYPE).any()
        data = batch[batch["event_type"] != SENTINEL_TYPE]
        last_ts, n_sessions, cur_n, max_n = (
            state.get if state.exists else (_NO_TS, 0, 0, 0)
        )
        if len(data):
            # within-batch order by event time; cross-batch order comes from
            # the time-range staged files (see run_finalized_sessions)
            secs = (
                data["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
            ).sort_values()
            for t in secs:
                if last_ts == _NO_TS or t - last_ts > gap_sec:
                    n_sessions += 1
                    cur_n = 1
                else:
                    cur_n += 1
                if cur_n > max_n:
                    max_n = cur_n
                last_ts = int(t)
        if finalize:
            state.remove()
            if n_sessions > 0:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_sessions": [n_sessions],
                        "max_session_events": [max_n],
                    }
                )
        else:
            state.update((last_ts, n_sessions, cur_n, max_n))

    return _fn


def make_timeout_session_fn(gap_sec: int, idle_sec: int):
    """EventTimeTimeout variant: same gap-rule state transitions, but
    finalization comes from the state TIMEOUT — when the event-time
    watermark passes last_event + idle_sec the group fires with
    ``state.hasTimedOut`` and no rows, emits its aggregate, and retires.
    No sentinel rows anywhere in the data."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, n_sessions, cur_n, max_n = state.get
            state.remove()
            if n_sessions > 0:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_sessions": [n_sessions],
                        "max_session_events": [max_n],
                    }
                )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        last_ts, n_sessions, cur_n, max_n = (
            state.get if state.exists else (_NO_TS, 0, 0, 0)
        )
        secs = (
            batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        ).sort_values()
        for t in secs:
            if last_ts == _NO_TS or t - last_ts > gap_sec:
                n_sessions += 1
                cur_n = 1
            else:
                cur_n += 1
            if cur_n > max_n:
                max_n = cur_n
            last_ts = int(t)
        state.update((last_ts, n_sessions, cur_n, max_n))
        state.setTimeoutTimestamp((last_ts + idle_sec) * 1000)

    return _fn


def _stage_time_ordered(spark: SparkSession, events_parquet: str, inp: str, k: int = 3):
    """Split the events into k contiguous time-range files, written in
    ascending order (FileStreamSource processes by mtime, so batches arrive
    in event-time order; boundary ties land in the earlier file, which the
    gap rule is insensitive to — gap 0 joins the same session). Cut points
    come from percentile_approx over epoch seconds — correctness does not
    depend on WHERE the cuts fall, only that the ranges are contiguous, so
    an approximate quantile at constant driver cost is exactly right."""
    os.makedirs(inp, exist_ok=True)
    ev = spark.read.parquet(events_parquet)
    qs = [(i + 1) / k for i in range(k - 1)]
    cuts = ev.agg(
        F.percentile_approx(F.unix_timestamp("ts"), qs, 10_000).alias("c")
    ).collect()[0]["c"]
    lo = None
    for i in range(k):
        hi = int(cuts[i]) if i < k - 1 else None
        part = ev
        if lo is not None:
            part = part.filter(F.unix_timestamp("ts") > lo)
        if hi is not None:
            part = part.filter(F.unix_timestamp("ts") <= hi)
        tmp = os.path.join(inp, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src_file = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        shutil.move(os.path.join(tmp, src_file), os.path.join(inp, f"chunk-{i:03d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        lo = hi


def run_finalized_sessions(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    gap_sec: int = 1800,
    n_chunks: int = 3,
) -> DataFrame:
    """Two-phase availableNow run (module docstring): returns finalized
    (user_id, n_sessions, max_session_events), equal to the batch
    sessionization over the same input."""
    inp = os.path.join(work_dir, "input")
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    _stage_time_ordered(spark, events_parquet, inp, n_chunks)

    from .windowed import _run_available_now

    def make_query():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
            .select("user_id", "ts", "event_type")
        )
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            make_session_fn(gap_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        _run_available_now(sessions, out, ckpt)

    make_query()  # phase 1: state built across time-ordered batches

    users = spark.read.parquet(events_parquet).select("user_id").distinct()
    max_ts = spark.read.parquet(events_parquet).agg(F.max("ts").alias("m")).collect()[
        0
    ]["m"]
    sentinel = users.select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.col("user_id"),
        F.lit(SENTINEL_TYPE).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(inp)

    make_query()  # phase 2: every group sees its sentinel and finalizes

    return spark.read.parquet(out)


def run_timeout_sessions(
    spark: SparkSession,
    events_parquet: str,
    work_dir: str,
    gap_sec: int = 1800,
    idle_sec: int = 7 * 24 * 3600,
    n_chunks: int = 3,
) -> DataFrame:
    """The at-scale finalization: users retire by EventTimeTimeout when the
    watermark passes last_event + idle_sec — no sentinel data rows. The
    trailing watermark-advancer event (user_id=-1, far-future ts) plays the
    role live traffic plays in a continuous pipeline: the stream's own
    progress retires idle users. Equal to the batch aggregation whenever
    ``idle_sec`` exceeds every within-user inactivity gap (otherwise a user
    legitimately finalizes mid-stream and a reappearance starts a new
    epoch — per-user-epoch semantics, documented above)."""
    inp = os.path.join(work_dir, "input")
    out = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    _stage_time_ordered(spark, events_parquet, inp, n_chunks)

    from .windowed import _run_available_now

    def make_query():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
            .select("user_id", "ts", "event_type")
            .withWatermark("ts", "0 seconds")  # staged chunks are time-ordered
        )
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            make_timeout_session_fn(gap_sec, idle_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        _run_available_now(sessions, out, ckpt)

    make_query()  # phase 1: state built across time-ordered batches

    max_ts = spark.read.parquet(events_parquet).agg(
        F.max("ts").alias("m")
    ).collect()[0]["m"]
    advancer = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        (
            F.lit(max_ts)
            + F.expr(f"INTERVAL {idle_sec} SECONDS")
            + F.expr("INTERVAL 1 DAYS")
        ).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("__watermark_advancer__").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    advancer.coalesce(1).write.mode("append").parquet(inp)

    make_query()  # phase 2: the watermark passes every timeout -> all emit

    return spark.read.parquet(out).filter(F.col("user_id") >= 0)
