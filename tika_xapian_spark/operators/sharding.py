"""Rendezvous (highest-random-weight) shard assignment for output
bucketing.

A 100 TB corpus is written as N shards (index buckets, training-data
files). Naive ``hash(key) % N`` reassigns ~(N-1)/N of ALL documents when
N changes — every resharding is a full rewrite. Rendezvous hashing
(Thaler & Ravishankar 1996, the scheme behind consistent object routers)
assigns each key to ``argmax over shard s of hash(key, s)``: growing
N → N+1 moves only the keys whose new-shard draw beats every old one —
an expected 1/(N+1) of the corpus, all of it moving TO the new shard —
so an incremental reshard touches one new file, not N.

Shape: entirely map-side column algebra — the per-shard draws live in ONE
array literal per row and the argmax is ``array_max`` over (hash, shard)
structs (ties break to the higher shard id, struct-comparison order —
same rule in the DuckDB oracle). Zero shuffle, zero Python, pipelines
with any scan; the shard id is then exactly what a writer passes to
``partitionBy``/``bucketBy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _draw(key: Column, shard: int, seed: str) -> Column:
    """60-bit deterministic draw for (key, shard) — same md5 arithmetic
    as sampling.sample_hash_micro, reproducible bit-for-bit in SQL."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.lit(str(shard)),
                              key.cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def shard_of(key: Column | str, n_shards: int, seed: str = "shard") -> Column:
    """Rendezvous shard id in [0, n_shards) for ``key`` — a pure column
    expression usable directly in a writer's partition column."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = F.col(key) if isinstance(key, str) else key
    draws = F.array(*[
        F.struct(_draw(k, s, seed).alias("h"), F.lit(s).alias("s"))
        for s in range(n_shards)
    ])
    return F.array_max(draws)["s"].cast("int")


def shard_assignment(
    docs: DataFrame,
    key: str,
    n_shards: int,
    seed: str = "shard",
) -> DataFrame:
    """Per-row manifest (key, shard, shard_next, moved): the assignment at
    ``n_shards`` and at ``n_shards + 1``, with the movement flag. The
    rendezvous invariant — every moved row lands on the NEW shard — makes
    ``moved`` a per-shard "rows leaving" count when aggregated."""
    k = docs[key]
    cur = shard_of(k, n_shards, seed)
    nxt = shard_of(k, n_shards + 1, seed)
    return docs.select(
        k.alias("key"),
        cur.alias("shard"),
        nxt.alias("shard_next"),
        (cur != nxt).cast("int").alias("moved"),
    )
