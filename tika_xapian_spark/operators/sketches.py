"""Streaming-style sketch operators: count-min sketch (heavy hitters) and
KMV / theta-style distinct-count estimation.

Both sketches are computed with deterministic md5-derived hash functions so
the DuckDB oracle reproduces them bit-for-bit — every compared value is an
exact integer (the KMV estimate's one double division is of exact integers,
identically rounded by both engines).

Why sketches at 10^12 rows: an exact token-frequency table or a
count(DISTINCT) forces a full shuffle of the key space; the sketch is a
CONSTANT-size summary (d*w counters / k hashes per group) built with
map-side partial aggregation, which is the only shape that survives a
corpus whose key cardinality itself doesn't fit an executor. The exact
columns ride along here purely as the oracle's truth reference — at scale
you would keep only the sketch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import doc_term_tf, hash60_sql

CMS_DEPTH = 3
CMS_WIDTH = 32
KMV_K = 16
# hash space: 15 hex chars = 60 bits; exactly representable as a double
KMV_SPACE = float(16**15)


# one shared definition with the classifier/DSIR feature hash — the DuckDB
# mirrors of all of them must stay bit-identical (textstats.hash60_sql)
_hash60 = hash60_sql


def cms_heavy_hitters(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    top_k: int = 20,
) -> DataFrame:
    """(token, exact_count, cms_count, overcount): corpus token counts
    through a count-min sketch (Cormode & Muthukrishnan 2005) — depth
    independent hash rows x width counters; estimate = min over rows of
    the hit counter. CMS never undercounts, so ``overcount >= 0`` always.

    Scale shape: the sketch update stream is built from the map-side
    (doc, token, tf) RLE table (occurrences never shuffle); the counter
    table aggregates to depth*width cells with map-side combine and then
    BROADCASTS to the estimate probe, so the only unbounded shuffle is the
    vocabulary-bounded exact-count aggregate that serves as the oracle's
    truth column. Returns the top_k tokens by exact count (count desc,
    token asc)."""
    tf = doc_term_tf(docs, key, text_col)
    hash_of = lambda r: _hash60("concat('" + str(r) + ":', token)")  # noqa: E731
    rows = ", ".join(
        f"{r}, pmod({hash_of(r)}, {width})" for r in range(depth)
    )
    updates = tf.selectExpr(f"stack({depth}, {rows}) AS (r, bucket)", "tf")
    cells = updates.groupBy("r", "bucket").agg(F.sum("tf").alias("cell"))
    exact = tf.groupBy("token").agg(F.sum("tf").alias("exact_count"))
    probes = exact.selectExpr(
        "token",
        "exact_count",
        f"stack({depth}, {rows}) AS (r, bucket)",
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cell").cast("long").alias("cms_count"))
    )
    return (
        est.select(
            "token",
            F.col("exact_count").cast("long").alias("exact_count"),
            "cms_count",
            (F.col("cms_count") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(top_k)
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """(group, n_exact, kmv_estimate, err_micro): distinct-count estimation
    per group via the k-minimum-values sketch (Bar-Yossef et al. 2002; the
    theta-sketch family): hash every value into a 60-bit space, keep the k
    smallest DISTINCT hashes, estimate ndv as (k-1) * SPACE / kth_min.
    Groups with fewer than k distinct values report exactly.

    Scale shape: the (group, hash) dedup is one shuffle whose output is
    bounded by the true ndv; the k-th minimum comes from a rank window over
    that deduped table (per-group rows = ndv(group)). The exact
    count(DISTINCT) column is the oracle truth reference — in production
    only the sketch side runs, and a k-mins sketch merges associatively
    across partitions/days, which is the point: a 10^12-row stream folds to
    k longs per group."""
    hashed = df.selectExpr(
        f"{group_col} AS grp",
        f"{_hash60(f'cast({value_col} as string)')} AS h",
    )
    dedup = hashed.distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = dedup.select("grp", "h", F.row_number().over(w).alias("rn"))
    agg = ranked.filter(F.col("rn") <= k).groupBy("grp").agg(
        F.max(F.col("h")).alias("h_k"), F.count(F.lit(1)).alias("n_mins")
    )
    exact = dedup.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(F.col("n_mins") < k, F.col("n_mins").cast("double")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("h_k"))
    )
    return (
        agg.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_exact").cast("long").alias("n_exact"),
            est.cast("long").alias("kmv_estimate"),
            F.floor(
                F.abs(est.cast("long") - F.col("n_exact")) * 1_000_000.0
                / F.col("n_exact")
            )
            .cast("long")
            .alias("err_micro"),
        )
        .orderBy(group_col)
    )
