"""N-step ordered conversion funnel over an event stream.

The classic product-analytics funnel: step k counts users whose first
qualifying step-k event is STRICTLY AFTER their step-(k-1) timestamp and
within a conversion window of it — ordering + recency, not mere set
intersection. Expressed as a fold over the step list: every step is the
same keyed join + filter + min-aggregation against the previous step's
first-timestamp frame, so funnel-of-N costs N identical-shaped stages and
per-user state never leaves the executors (each stage shuffles on the
user key only; the events scan is filtered to one event type per stage, a
pushed-down predicate).

Scale shape at 10^12 events: each stage's join is user-keyed (no skew
beyond per-user event counts), each aggregation is map-side combinable,
and the step frames shrink monotonically (step k is a subset of step
k-1's users), so later stages broadcast naturally under AQE.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def step_frames(
    events: DataFrame,
    steps: Sequence[str],
    window: str = "24 hours",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> list[DataFrame]:
    """One (user, t) first-qualifying-timestamp frame per step, folded
    left to right. ``steps`` are event-type values in funnel order."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    frames: list[DataFrame] = []
    win = F.expr(f"INTERVAL {window}")
    prev: DataFrame | None = None
    for etype in steps:
        stage = events.filter(F.col(type_col) == etype)
        if prev is not None:
            stage = stage.join(prev, user_col).filter(
                (F.col(ts_col) > F.col("t"))
                & (F.col(ts_col) <= F.col("t") + win)
            ).drop("t")
        cur = stage.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        frames.append(cur)
        prev = cur
    return frames


def conversion_funnel(
    events: DataFrame,
    steps: Sequence[str],
    window: str = "24 hours",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, n_users) counts per funnel stage, labeled ``<k>_<type>`` in
    funnel order (1-based), sorted by label."""
    frames = step_frames(events, steps, window, user_col, type_col, ts_col)
    out = None
    for k, (etype, frame) in enumerate(zip(steps, frames), start=1):
        counted = frame.agg(
            F.count(F.lit(1)).cast("long").alias("n_users")
        ).select(F.lit(f"{k}_{etype}").alias("step"), "n_users")
        out = counted if out is None else out.unionByName(counted)
    return out.orderBy("step")


def funnel_oracle_sql(
    steps: Sequence[str],
    window: str = "24 HOUR",
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """The mechanically-generated ANSI-SQL mirror of ``conversion_funnel``
    (DuckDB dialect): one CTE per step, chained exactly like the
    DataFrame fold."""
    ctes = []
    for k, etype in enumerate(steps, start=1):
        if k == 1:
            ctes.append(
                f"s1 AS (\n  SELECT {user_col}, min({ts_col}) AS t FROM {table}\n"
                f"  WHERE {type_col} = '{etype}' GROUP BY {user_col}\n)"
            )
        else:
            ctes.append(
                f"s{k} AS (\n  SELECT e.{user_col}, min(e.{ts_col}) AS t\n"
                f"  FROM {table} e JOIN s{k - 1} USING ({user_col})\n"
                f"  WHERE e.{type_col} = '{etype}' AND e.{ts_col} > s{k - 1}.t\n"
                f"    AND e.{ts_col} <= s{k - 1}.t + INTERVAL {window}\n"
                f"  GROUP BY e.{user_col}\n)"
            )
    selects = [
        f"SELECT '{k}_{etype}' AS step, count(*)::BIGINT AS n_users FROM s{k}"
        for k, etype in enumerate(steps, start=1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY step"
    )
