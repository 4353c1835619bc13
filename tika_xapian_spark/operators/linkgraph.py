"""Host-level link-graph analytics for crawl pipelines: PageRank-style
centrality and anchor-text aggregation.

Crawl curation ranks HOSTS before it ranks pages: a link-graph centrality
score per host drives both crawl-frontier priority and corpus quality
weighting (Common Crawl publishes exactly this as its host-level web
graph), and the anchor text pointing AT a url is a classic relevance /
quality signal aggregated per target. Both are plain DataFrame algebra:

- ``pagerank`` is the canonical distributed formulation — contributions
  flow along edges (join ranks on src, groupBy dst) for a FIXED number of
  rounds. All arithmetic is scaled-integer (rank micros, floor division)
  so the result is bit-identical across engines and partition orders —
  floating-point PageRank is summation-order-dependent and can never be
  hash-gated. Per round: ONE join on src + ONE groupBy(dst) shuffle; the
  (edges ⋈ out-degree) frame is localCheckpoint'ed once up front and
  reused every round, and each round's rank frame is checkpointed to keep
  lineage flat (same discipline as dedup.connected_components). Dangling
  mass (hosts with no out-links) is dropped, the standard simplified
  variant; ranks therefore sum to slightly under 1e6.

- ``anchor_profile`` is a two-level aggregation (dst,anchor) → dst, so the
  per-target top-anchor pick is an algebraic max(struct(count, anchor))
  with map-side combine — no window, no sort. Tie rule: equal counts pick
  the lexicographically GREATEST anchor (struct comparison semantics,
  identical in Spark and DuckDB — pinned by test).

Reference parity: the reference engine has no link graph (single-node
filesystem corpus), but its Common-Crawl-style input contract
(BASELINE.json input_hint) makes host centrality the canonical add-on the
brief's "large-scale training-data pipeline" clause asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Fixed-iteration integer PageRank over a weighted edge list.

    ``edges`` holds one row per (src, dst) with a positive integer weight
    (duplicate links pre-aggregated by the caller or not — duplicates are
    re-aggregated here). Returns (host, rank_micro) — rank scaled by 1e6,
    every operation integer floor arithmetic:

        base       = (100 - d) * 1e6 div (100 * N)
        contrib(e) = rank(src) * w(e) div out_w(src)
        rank'(v)   = base + d * sum(contrib into v) div 100

    ``n_iter`` is fixed (not convergence-tested): at web scale a bounded
    round count is the operational choice (Common Crawl's host ranks use
    a fixed iteration budget), and it keeps the op oracle-expressible.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.groupBy(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).agg(F.sum(w_col).cast("bigint").alias("w"))

    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # (edges ⋈ out-degree) is consumed once per round — flatten it once
    e_n = e.join(out_w, "src").localCheckpoint(eager=False)

    # N rides every row as a broadcast scalar (zero-job literal pattern)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    nodes = nodes.crossJoin(F.broadcast(n_nodes)).localCheckpoint(eager=False)

    base = F.expr(f"{(100 - damping_pct) * MICRO} div (100 * n_nodes)")
    ranks = nodes.select(
        "host", "n_nodes", F.expr(f"{MICRO} div n_nodes").alias("rank_micro")
    )
    for _ in range(n_iter):
        contrib = (
            e_n.join(ranks.select("host", "rank_micro"),
                     e_n["src"] == F.col("host"))
            .groupBy("dst")
            .agg(F.expr("sum((rank_micro * w) div out_w)").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .select(
                "host",
                "n_nodes",
                (base + F.expr(
                    f"{damping_pct} * coalesce(c, 0L) div 100"
                )).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("host", "rank_micro")


def anchor_profile(
    links: DataFrame,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text rollup over a (src, dst_url, anchor) link
    table: total in-links, distinct anchor strings, and the most frequent
    anchor (ties → lexicographically greatest). Two hash aggregations,
    both with map-side combine; the second runs on already-reduced
    (dst, anchor) rows so a url with millions of identical-anchor
    in-links costs one row after level 1."""
    per_anchor = links.groupBy(
        F.col(dst_col).alias("dst_url"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_anchor.groupBy("dst_url")
        .agg(
            F.sum("cnt").alias("n_links"),
            F.count(F.lit(1)).alias("n_anchors"),
            F.max(F.struct(F.col("cnt"), F.col("anchor"))).alias("_top"),
        )
        .select(
            "dst_url",
            "n_links",
            "n_anchors",
            F.col("_top.anchor").alias("top_anchor"),
            F.col("_top.cnt").alias("top_anchor_links"),
        )
    )
