"""BPE merge training over the corpus word-frequency dictionary.

The first stage of byte-pair-encoding tokenizer training (Sennrich et al.
2016, the algorithm behind GPT-2/LLaMA-style tokenizers): count adjacent
symbol pairs over the word-frequency dict, merge the most frequent pair,
repeat. This is the piece of tokenizer training that actually touches the
100 TB corpus — everything after the word count runs on the compact
dictionary.

Scale shape:
- ONE corpus-scale shuffle: ``explode(tokens) -> groupBy(word).count()``
  (map-side partial aggregation; the dict is vocabulary-bounded, ~10^7
  rows at web scale, independent of corpus size).
- Each merge round is a tiny aggregation over the dict plus a map-only
  rewrite; rounds chain lazily with the winning pair riding a broadcast
  1-row crossJoin (zero driver collects), and each round's dict is
  lazily ``localCheckpoint``-ed so round k+1 does not replay rounds 1..k
  (the branching best/dict reuse would otherwise replay the base dict
  2^k times).

Symbol strings use a double-pipe encoding so plain ``replace`` (identical
left-to-right non-overlapping semantics in Spark and DuckDB — the oracle
mirrors it exactly) is a correct greedy BPE merge application:

  word "hello" -> ``||h||e||l||l||o||``; merging pair (l, l) replaces
  ``|l||l|`` with ``|ll|``. The single outer pipe in the pattern anchors
  a symbol START (a multi-char symbol's tail can never false-match), and
  the unconsumed second delimiter pipe lets back-to-back occurrences
  ("aaa" with pair (a,a) -> "aa","a") merge greedily left-to-right —
  byte-for-byte the classic BPE merge order.

Reference anchor: the reference engine's tokenizer is rule-based
(xapian-core termgen); BPE training is the modern-pipeline counterpart the
brief asks for beyond the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

N_MERGES = 6


def word_freq_dict(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(word, cnt) corpus word-frequency dictionary — the one shuffle."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _encode(word_col: str) -> F.Column:
    """word -> ``||c1||c2||...||`` initial symbol string (one symbol per
    character)."""
    chars = F.filter(F.split(F.col(word_col), ""), lambda c: c != "")
    return F.concat(F.lit("||"), F.array_join(chars, "||"), F.lit("||"))


def _pair_counts(dict_df: DataFrame) -> DataFrame:
    """(l, r, pc) adjacent-symbol-pair counts weighted by word frequency.

    Pairs come from zip-shifted slices of the symbol array — the lambda
    touches only its own element (never an outer array), per the
    HOF-inlining rule (see textstats.py module docstring).
    """
    staged = dict_df.select(
        F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|").alias("syms"),
        "cnt",
    )
    n = F.size(F.col("syms")) - 1
    pairs = staged.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, n).alias("l"),
                F.slice(F.col("syms"), 2, n).alias("r"),
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("p.l").alias("l"), F.col("p.r").alias("r")
    ).agg(F.sum("cnt").alias("pc"))


def _best_pair(pair_counts: DataFrame) -> DataFrame:
    """1-row (l, r, pc): highest count, ties to the lexicographically
    smallest (l, r) — single aggregation, no sort, no collect."""
    best = pair_counts.agg(
        F.min(F.struct((-F.col("pc")).alias("neg"), "l", "r")).alias("b")
    )
    return best.select(
        F.col("b.l").alias("l"), F.col("b.r").alias("r"),
        (-F.col("b.neg")).alias("pc"),
    )


def _apply_merge(dict_df: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite every symbol string with the winning pair merged. The 1-row
    winner rides a broadcast crossJoin — map-only, zero driver round-trips."""
    merged = dict_df.crossJoin(F.broadcast(best)).select(
        F.replace(
            F.col("s"),
            F.concat(F.lit("|"), F.col("l"), F.lit("||"), F.col("r"), F.lit("|")),
            F.concat(F.lit("|"), F.col("l"), F.col("r"), F.lit("|")),
        ).alias("s"),
        "cnt",
    )
    # Lazy checkpoint: round k+1's pair count and ITS dict rewrite both
    # reference this frame — without the cut, each round replays all prior
    # rounds twice over (2^k replays of the base dict by round k).
    return merged.localCheckpoint(eager=False)


def bpe_merges(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> DataFrame:
    """(merge_rank, lhs, rhs, pair_count): the first ``n_merges`` BPE merge
    rules learned from the corpus, in merge order."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wf = word_freq_dict(docs, key, text_col).select(
        _encode("word").alias("s"), "cnt"
    )
    # The dict is the root of every round's branch — materialize it once.
    wf = wf.localCheckpoint(eager=False)
    rounds = []
    for rank in range(1, n_merges + 1):
        best = _best_pair(_pair_counts(wf))
        rounds.append(
            best.select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.col("pc").alias("pair_count"),
            )
        )
        if rank < n_merges:
            wf = _apply_merge(wf, best)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    # A round past pair exhaustion aggregates an empty frame to a NULL
    # struct (the oracle's LIMIT 1 yields zero rows instead) — drop it, and
    # every later round is null-poisoned through the replace chain too, so
    # this is exactly "stop when dry".
    out = out.filter(F.col("lhs").isNotNull())
    return out.repartition(1).sortWithinPartitions("merge_rank")


def _trained_vocab(
    docs: DataFrame, key: str, text_col: str, n_merges: int
) -> DataFrame:
    """(token, n_sub, cnt): the word dict rewritten under the first
    ``n_merges`` trained rules — the word -> subword-count lookup both
    encode-side consumers share. A merge round past pair exhaustion
    yields a NULL winner and keeps the dict unchanged (encode-side
    equivalent of training's "stop when dry")."""
    wf = word_freq_dict(docs, key, text_col)
    d = wf.select(
        F.col("word").alias("token"), _encode("word").alias("s"), "cnt"
    ).localCheckpoint(eager=False)
    for _ in range(n_merges):
        best = _best_pair(_pair_counts(d.select("s", "cnt")))
        d = (
            d.crossJoin(F.broadcast(best))
            .select(
                "token",
                F.when(F.col("l").isNull(), F.col("s"))
                .otherwise(
                    F.replace(
                        F.col("s"),
                        F.concat(F.lit("|"), F.col("l"), F.lit("||"),
                                 F.col("r"), F.lit("|")),
                        F.concat(F.lit("|"), F.col("l"), F.col("r"),
                                 F.lit("|")),
                    )
                )
                .alias("s"),
                "cnt",
            )
            .localCheckpoint(eager=False)
        )
    return d.select(
        "token",
        F.expr(r"size(split(trim(BOTH '|' FROM s), '\\|\\|'))")
        .cast("long").alias("n_sub"),
        "cnt",
    )


def bpe_encode(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> DataFrame:
    """(doc, n_words, n_bpe_tokens, tokens_per_word_micro): encode the
    corpus with its own first-``n_merges``-rules BPE tokenizer and report
    the per-document subword token count — the number every packing /
    cost / context-length decision downstream actually consumes.

    Scale shape — the corpus is touched exactly twice, both times with
    vocabulary-bounded join sides:

    * merges are trained AND applied on the word-frequency dict (one
      corpus word-count shuffle; every merge round is dict-sized work,
      the ``word`` column rides through the rewrite chain so the final
      dict doubles as the word → n_subwords lookup);
    * per-doc counts come from the map-side RLE (doc, token, tf) table
      joined to that lookup through the hot/cold skew split (stop words
      carry their subword counts via bounded broadcast, the tail
      shuffles with no hot key left) — never an occurrence-level join.

    A merge round past pair exhaustion yields a NULL winner; the rewrite
    keeps the dict unchanged in that case (encode-side equivalent of
    training's "stop when dry")."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from .skewjoin import skew_safe_count_join
    from .textstats import doc_term_tf

    vocab = _trained_vocab(docs, key, text_col, n_merges)
    tf = doc_term_tf(docs, key, text_col)
    joined = skew_safe_count_join(tf, "token", vocab, "cnt")
    return (
        joined.groupBy("doc")
        .agg(
            F.sum("tf").alias("n_words"),
            F.expr("CAST(sum(tf * n_sub) AS BIGINT)").alias("n_bpe_tokens"),
            F.expr(
                "CAST(sum(tf * n_sub) * 1000000 div sum(tf) AS BIGINT)"
            ).alias("tokens_per_word_micro"),
        )
    )


def bpe_fertility(
    docs: DataFrame,
    key: str,
    group_col: str,
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> DataFrame:
    """(group, n_words, n_bpe_tokens, n_chars, subwords_per_word_micro,
    chars_per_subword_micro): tokenizer FERTILITY profile per corpus slice
    (language, source, domain): how many subwords the trained BPE spends
    per word and how many characters each subword carries — the numbers a
    tokenizer-budget review reads before fixing a vocab size (fertility
    gaps across languages are the classic multilingual-tokenizer failure).

    Composition of the bpe_encode machinery: merges train once on the
    word-frequency dict; the per-slice rollup rides the same map-side RLE
    (doc, token, tf) table through the same hot/cold skew join — the
    grouping column is CARRIED in the doc key struct, so no corpus-scale
    join-back is ever needed (the source_quality_profile carry-column
    pattern). Integer-exact: floor-div micros of exact bigint sums."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from .skewjoin import skew_safe_count_join
    from .textstats import doc_term_tf

    vocab = _trained_vocab(docs, key, text_col, n_merges)
    carried = docs.select(
        F.struct(F.col(key).alias("id"), F.col(group_col).alias("grp")).alias(
            "_dockey"
        ),
        F.col(text_col).alias(text_col),
    )
    tf = doc_term_tf(carried, "_dockey", text_col)
    joined = skew_safe_count_join(tf, "token", vocab, "cnt")
    return (
        joined.groupBy(F.col("doc.grp").alias(group_col))
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.expr("CAST(sum(tf * n_sub) AS BIGINT)").alias("n_bpe_tokens"),
            F.expr("CAST(sum(tf * length(token)) AS BIGINT)").alias("n_chars"),
            F.expr(
                "CAST(sum(tf * n_sub) * 1000000 div sum(tf) AS BIGINT)"
            ).alias("subwords_per_word_micro"),
            F.expr(
                "CAST(sum(tf * length(token)) * 1000000 div sum(tf * n_sub)"
                " AS BIGINT)"
            ).alias("chars_per_subword_micro"),
        )
        .orderBy(group_col)
    )
