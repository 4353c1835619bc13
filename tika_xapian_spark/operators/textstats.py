"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Every operator is pure JVM-side column algebra (whole-stage codegen; no
Python), deterministic, and SQL-expressible — each has a DuckDB oracle in
plans/doc_queries.py. At 10^12 rows these are embarrassingly parallel map
stages with zero shuffles.

Each operator stages the tokenize-split into its own projection first
(``_with_tokens``): the split is the expensive expression, every feature
references it repeatedly, and Catalyst will not re-collapse a projection
when doing so would duplicate a non-cheap expression — measured 2x on the
quality scorer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# Tiny per-language stopword profiles (n-gram-heuristic language ID). Word
# lists are the most frequent function words of each language — the classic
# stopword-profile approach (Cavnar & Trenkle-style, word-level).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "no", "por", "una", "para", "que"),
    "zh": ("de", "shi", "bu", "le", "zai", "wo", "you", "he", "ta", "zhe"),
}


def _with_tokens(docs: DataFrame, key: str, text_col: str) -> DataFrame:
    """(doc, text, toks) staging projection — tokenize once per row."""
    return docs.select(
        F.col(key).alias("doc"),
        F.col(text_col).alias("text"),
        tokens_col(text_col).alias("toks"),
    )


def _lang_score(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that hit the language's stopword profile."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(
    docs: DataFrame, key: str, text_col: str = "text", default: str = "und"
) -> DataFrame:
    """(doc, predicted_lang, lang_hits): argmax of stopword-profile hits;
    deterministic tie-break by language code; 'und' when nothing matches."""
    toks = F.col("toks")
    scored = _with_tokens(docs, key, text_col).select(
        "doc",
        *[
            _lang_score(toks, words).alias(f"s_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit(default)
    # first language (code order) achieving the max — deterministic
    for lang in reversed(langs):
        pred = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit(default))
    return scored.select("doc", pred.alias("predicted_lang"), best.alias("lang_hits"))


def quality_features(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score (length/stopword/word-length
    heuristics; punctuation ratio for corpora that have punctuation):

      n_chars, n_tokens, mean_word_len_micro, stopword_ratio_micro,
      alnum_ratio_micro, quality_micro
    """
    staged = _with_tokens(docs, key, text_col)
    toks = F.col("toks")
    text = F.col("text")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.when(n_tokens > 0, token_chars / n_tokens).otherwise(F.lit(0.0))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))) / n_tokens,
    ).otherwise(F.lit(0.0))
    alnum_chars = n_chars - F.length(F.regexp_replace(text, "[a-zA-Z0-9]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum_chars / n_chars).otherwise(F.lit(0.0))
    # composite: length band + prose-ness; bounded [0, 1]
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.least(mean_wl / F.lit(8.0), F.lit(1.0)) * 0.3
    )
    m = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    return staged.select(
        "doc",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        m(mean_wl).alias("mean_word_len_micro"),
        m(stop_ratio).alias("stopword_ratio_micro"),
        m(alnum_ratio).alias("alnum_ratio_micro"),
        m(quality).alias("quality_micro"),
    )


def token_counts(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(doc, ws_tokens, subword_est): whitespace tokens plus a BPE-ish
    subword estimate — alpha runs contribute ceil(len/4) pieces (~4 chars per
    BPE token for English-like text), digit runs and isolated symbols one
    each."""
    toks = F.col("toks")
    subword = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )
    return _with_tokens(docs, key, text_col).select(
        "doc",
        F.size(toks).cast("long").alias("ws_tokens"),
        subword.cast("long").alias("subword_est"),
    )


def fingerprints(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(doc, fp_full, fp_shape, fp_bucket):
      fp_full   md5 of the normalized token stream (exact content identity
                modulo whitespace)
      fp_shape  md5 of the sorted distinct token set (bag-of-words identity)
      fp_bucket first 15 hex chars of fp_full as int64 — a stable shard key
    """
    toks = F.col("toks")
    norm = F.concat_ws(" ", toks)
    shape = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    fp_full = F.md5(norm)
    return _with_tokens(docs, key, text_col).select(
        "doc",
        fp_full.alias("fp_full"),
        F.md5(shape).alias("fp_shape"),
        F.conv(F.substring(fp_full, 1, 15), 16, 10).cast("long").alias("fp_bucket"),
    )
