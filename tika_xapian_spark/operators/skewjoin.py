"""Skew-safe count-table joins: the hot/cold split pattern.

Joining a row stream against a per-key count/statistics table on a
Zipf-distributed key (tokens, line hashes, hosts) concentrates the hot
keys' rows on a few reducers — the classic web-corpus skew. The fix used
across this engine (unigram perplexity, corpus line dedup):

* the Zipf HEAD joins via a BOUNDED broadcast — the top-K keys by count
  (a top-K, never the whole table: vocabularies are unbounded at web
  scale, and a blanket broadcast is the forced-broadcast anti-pattern);
* the TAIL joins by shuffle after a broadcast anti-join strips hot keys
  from the probe side, so every surviving key has count <= the K-th hot
  count — no reducer can be hot by construction.

AQE's skew-join splitting handles residual imbalance in the tail; the
head never shuffles at all, which on Zipf data is the majority of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_safe_count_join(
    rows: DataFrame,
    key: str,
    counts: DataFrame,
    count_col: str,
    hot_k: int = 65536,
) -> DataFrame:
    """Inner-join ``rows`` with ``counts`` on ``key``, skew-safely.

    ``counts`` must have one row per key (a groupBy(key) aggregate).
    Result columns = rows' columns + counts' non-key columns, exactly as
    ``rows.join(counts, key)`` would produce — only the physical strategy
    differs. Keys missing from ``counts`` drop (inner-join semantics).
    """
    hot = F.broadcast(
        counts.orderBy(F.desc(count_col), key).limit(hot_k)
    )
    hot_rows = rows.join(hot, key)
    cold_rows = rows.join(hot.select(key), key, "left_anti").join(counts, key)
    return hot_rows.unionByName(cold_rows)
