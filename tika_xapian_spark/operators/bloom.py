"""Distributed Bloom-filter prefilter in pure JVM column algebra.

Spark injects runtime bloom filters into shuffle joins on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the sketch
expressions (``bloom_filter_agg`` / ``might_contain``) are not in the
public function registry, so a *user-directed* bloom — "prefilter this
10^13-row shingle stream against the eval set before the exact join" —
has to be built from registered builtins. This module does exactly that:

- the bitmap is a table of 64-bit WORDS, ``(seed, word, bits)``, built by
  ``groupBy(word).agg(bit_or(mask))`` over the probe side — one tiny
  shuffle per build, no driver round-trip, no Python;
- membership is k BROADCAST equi-joins on the word index plus a bitwise
  AND — map-side only, so the corpus stream is never shuffled to be
  tested. A missing word row means "no bit set": the inner join drops the
  row, which is the correct bloom answer.

Why not just broadcast the distinct probe keys and semi-join? Memory: a
hash relation of n strings costs tens of bytes per key PLUS the key bytes
themselves (a 40-char shingle ≈ 80 UTF-16 bytes). The bitmap's
information content is ``m/8`` bytes (m ≈ 16n bits → ~2 bytes/key at
fpp ≈ 0.5%), but it ships row-encoded as (word, bits) pairs in k
broadcast hash relations — at 16 bits/key most words are populated, so
the realized footprint is ~0.75n rows/seed × two longs + relation
overhead ≈ tens of bytes per key. The honest win over broadcasting the
keys is therefore the KEY BYTES (a few× for long shingles, not 20×) plus
key-length independence; a packed-array bitmap in a scalar UDF would
realize the full m/8 but leave the JVM. The price is false positives —
callers MUST re-verify survivors with an exact join (hint-free:
AQE broadcasts it while the probe side fits, shuffles only the surviving
fraction otherwise). ``contamination_hits_bloom`` composes both halves and
is therefore exactly equal to ``dedup.contamination_hits`` — the oracle is
shared.

Hash family: ``xxhash64(key, seed)`` with k distinct seeds; bit position
is ``hash & (m-1)`` (m forced to a power of two so the modulo is one AND).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEEDS = (1, 2, 3)
BITS_PER_KEY = 16  # m = 16n with k=3 → fpp = (1 - e^(-3/16))^3 ≈ 0.5%


def _pos(col: str, seed: int, m_bits: int):
    return F.xxhash64(F.col(col), F.lit(int(seed))).bitwiseAND(F.lit(m_bits - 1))


def _mask(pos):
    # F.shiftleft only takes a literal shift count; call_function passes
    # the column form straight through to the same JVM builtin
    return F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))


def next_pow2(n: int) -> int:
    return 1 << max(6, (int(n) - 1).bit_length())


def _check_m(m_bits: int) -> None:
    """Build AND probe must agree on a power-of-two m: a mismatched or
    non-pow2 probe m computes different word/bit positions than the build
    did, and the word-join then silently drops TRUE members (false
    negatives) — the one failure mode a bloom must never have."""
    if m_bits & (m_bits - 1) or m_bits <= 0:
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")


def bloom_words(
    probe: DataFrame,
    col: str,
    m_bits: int,
    seeds: Sequence[int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Build the bitmap: (seed, word, bits) with ``bits`` the OR of the
    1-bit masks every probe key sets in that 64-bit word. Single scan of
    the probe side (the per-seed entries fan out in one explode) + one
    tiny groupBy."""
    _check_m(m_bits)
    entries = [
        F.struct(
            F.lit(int(s)).alias("seed"),
            F.shiftright(_pos(col, s, m_bits), 6).alias("word"),
            _mask(_pos(col, s, m_bits)).alias("mask"),
        )
        for s in seeds
    ]
    return (
        probe.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .groupBy("seed", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    seeds: Sequence[int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only rows the bloom MIGHT contain: k broadcast word-joins, each
    a map-side hash probe + one bitwise AND. Never drops a true member
    (same hash family as the build); passes a false-positive fraction the
    caller's exact verify join removes."""
    _check_m(m_bits)
    out = df
    for s in seeds:
        pos = _pos(col, s, m_bits)
        w, b, ww = f"__bw{s}", f"__bm{s}", f"__bwj{s}"
        side = bloom.filter(F.col("seed") == int(s)).select(
            F.col("word").alias(ww), F.col("bits").alias(f"__bits{s}")
        )
        out = (
            out.withColumn(w, F.shiftright(pos, 6))
            .withColumn(b, _mask(pos))
            .join(F.broadcast(side), F.col(w) == F.col(ww))
            .filter(F.col(f"__bits{s}").bitwiseAND(F.col(b)) != 0)
            .drop(w, b, ww, f"__bits{s}")
        )
    return out


def bloom_flag(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    seeds: Sequence[int] = DEFAULT_SEEDS,
    flag: str = "might_contain",
) -> DataFrame:
    """Like ``bloom_prefilter`` but NON-destructive: adds a boolean
    ``flag`` column instead of dropping misses — the form a DROP-list
    needs (a definite bloom MISS means "keep immediately"; only bloom
    hits need the exact membership check). k broadcast LEFT word-joins;
    a missing word row means no bit set, i.e. false."""
    _check_m(m_bits)
    out = df
    per_seed = []
    for s in seeds:
        pos = _pos(col, s, m_bits)
        w, ww, bb = f"__bw{s}", f"__bwj{s}", f"__bits{s}"
        side = bloom.filter(F.col("seed") == int(s)).select(
            F.col("word").alias(ww), F.col("bits").alias(bb)
        )
        out = (
            out.withColumn(w, F.shiftright(pos, 6))
            .join(F.broadcast(side), F.col(w) == F.col(ww), "left")
            .withColumn(
                f"__hit{s}",
                F.coalesce(F.col(bb).bitwiseAND(_mask(pos)) != 0, F.lit(False)),
            )
            .drop(w, ww, bb)
        )
        per_seed.append(f"__hit{s}")
    might = F.lit(True)
    for h in per_seed:
        might = might & F.col(h)
    return out.withColumn(flag, might).drop(*per_seed)


def contamination_hits_bloom(
    corpus_shingles: DataFrame,
    probe_shingles: DataFrame,
    m_bits: int | None = None,
    seeds: Sequence[int] = DEFAULT_SEEDS,
) -> DataFrame:
    """`dedup.contamination_hits` semantics behind a bloom prefilter: the
    corpus shingle stream is bloom-tested map-side (k broadcast word
    joins), and only the surviving sliver reaches the exact, hint-free
    verify join — so the probe set no longer has to fit a broadcast hash
    relation of full strings, only its ``m/8``-byte bitmap does.

    Result is EXACTLY ``contamination_hits(corpus, probe)`` (the verify
    join removes bloom false positives) — the DuckDB oracle is shared.

    ``m_bits=None`` sizes the bitmap from an eager count of the distinct
    probe keys (one tiny job over the checkpointed probe frame; bitmap
    sizing needs the count before the plan is built)."""
    probes = probe_shingles.select("shingle").distinct().localCheckpoint()
    if m_bits is None:
        m_bits = next_pow2(BITS_PER_KEY * max(probes.count(), 1))
    bloom = bloom_words(probes, "shingle", m_bits, seeds).localCheckpoint()
    surv = bloom_prefilter(corpus_shingles, "shingle", bloom, m_bits, seeds)
    return (
        surv.join(probes, "shingle")
        .groupBy("doc")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_probe_hits"),
            F.min("shingle").alias("first_hit"),
        )
    )
