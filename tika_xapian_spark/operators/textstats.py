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
from pyspark.sql.window import Window

from .dedup import tokens_col
from .skewjoin import skew_safe_count_join

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


def _with_tokens(
    docs: DataFrame, key: str, text_col: str, *carry: str
) -> DataFrame:
    """(doc, text, toks, *carry) staging projection — tokenize once per
    row; ``carry`` columns pass through untouched (e.g. a source/domain
    grouping key for corpus rollups)."""
    return docs.select(
        F.col(key).alias("doc"),
        F.col(text_col).alias("text"),
        tokens_col(text_col).alias("toks"),
        *[F.col(c) for c in carry],
    )


def _lang_score(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that hit the language's stopword profile."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    default: str = "und",
    *carry: str,
) -> DataFrame:
    """(doc, predicted_lang, lang_hits): argmax of stopword-profile hits;
    deterministic tie-break by language code; 'und' when nothing matches."""
    toks = F.col("toks")
    scored = _with_tokens(docs, key, text_col, *carry).select(
        "doc",
        *[
            _lang_score(toks, words).alias(f"s_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
        *carry,
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit(default)
    # first language (code order) achieving the max — deterministic
    for lang in reversed(langs):
        pred = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit(default))
    return scored.select(
        "doc", pred.alias("predicted_lang"), best.alias("lang_hits"), *carry
    )


def quality_features(
    docs: DataFrame, key: str, text_col: str = "text", *carry: str
) -> DataFrame:
    """Per-doc quality features + composite score (length/stopword/word-length
    heuristics; punctuation ratio for corpora that have punctuation):

      n_chars, n_tokens, mean_word_len_micro, stopword_ratio_micro,
      alnum_ratio_micro, quality_micro

    ``carry`` columns ride through unchanged (rollup keys)."""
    staged = _with_tokens(docs, key, text_col, *carry)
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
        *carry,
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


# ------------------------------------------------- Gopher repetition rules
# Rae et al. 2021 ("Scaling Language Models: ... Gopher"), Table A1: the
# repetition signals (duplicate lines, most-frequent n-gram coverage,
# duplicated n-gram coverage) and the quality-filter rules every production
# pretraining pipeline applies. All pure per-row column algebra: each doc's
# lines/tokens already sit in one array, so duplicate detection is a
# LINEAR fold over the SORTED array (duplicates become adjacent) — no
# shuffle, no O(n^2) membership probes, embarrassingly parallel at 10^12
# rows. Cross-engine determinism notes:
#   - "duplicate line fraction" counts EXTRA occurrences (n - n_distinct),
#     the Dolma/RedPajama convention;
#   - "top n-gram coverage" is max over grams of count*len(gram) (coverage
#     directly, sidestepping the most-frequent-tie ambiguity — documented
#     variant);
#   - "duplicate n-gram coverage" sums count*len(gram) over grams with
#     count > 1, capped at 1 (overlap-occupancy ignored, the standard
#     approximation).

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _lines_sql(text_col: str) -> str:
    """SQL text: non-empty lines of the text."""
    return f"filter(split({text_col}, '\\n'), l -> length(trim(l)) > 0)"


def _lines_col(text_col: str) -> Column:
    """Non-empty lines of the text."""
    return F.expr(_lines_sql(text_col))


def _word_ngrams(toks_sql: str, n: int) -> str:
    """SQL text: space-joined word n-grams as a string array (empty when
    < n tokens).

    The lambda must NEVER reference the tokens array itself — grams are
    built by arrays_zip-ping n shifted slices, so the transform lambda
    touches only its own element. The previous form probed
    ``element_at({toks_sql}, i + j)`` inside the lambda; when Catalyst
    collapses the staging projection into the consumer (it does in the
    composed curation plan even though it does not standalone — column
    pruning rebuilds the Projects and the duplicate-expression guard
    stops protecting references inside lambda bodies), {toks_sql} becomes
    the raw tokenize-split and the full text regex re-runs PER GRAM
    POSITION: O(len^2) per doc, 29/30 executor threads in java.util.regex
    on the 600k-page curate bench. With the zip form the array expression
    sits only in outer (once-per-row) positions, so even a collapsed plan
    evaluates the split O(n) times per row."""
    ll = f"greatest(size({toks_sql}) - {n - 1}, 0)"
    slices = ", ".join(f"slice({toks_sql}, {j}, {ll})" for j in range(1, n + 1))
    parts = ", ' ', ".join(f"x['{j}']" for j in range(n))
    return f"transform(arrays_zip({slices}), x -> concat({parts}))"


def _run_stat_exprs(ss_sql: str) -> dict[str, str]:
    """The four duplicate-run statistics over a SORTED string array, as SQL
    expression texts keyed by name:

      extra_chars  chars in occurrences beyond each value's first
      extra_count  number of such extra occurrences
      top_cover    max over values of count * len(value)
      dup_cover    sum over values with count > 1 of count * len(value)

    Two performance rules shaped this form (both measured at sf0.1):

    * SQL strings, not Column-by-Column lambda construction — building the
      equivalent tree through py4j costs ~0.3s PER FOLD at
      DataFrame-construction time (the simhash lesson, round 5).
    * Native array ops over a minimal interpreted fold: HOF lambdas run
      interpreted, so a 6-field named_struct accumulator per element
      dominated the wall. extra_count/extra_chars/dup_cover reduce to
      ``array_distinct`` + ``array_join`` length arithmetic (JVM-native,
      zero lambdas: dup_cover = extra_chars + chars of the values that
      recur, and the recurring values are the sorted array's elements that
      equal their predecessor); only top_cover keeps a fold, with a 3-field
      accumulator. 1.9s -> 1.1s end-to-end on the gopher_repetition query.

    ``ss_sql`` should name a STAGED pre-sorted column (each stat references
    it several times; a staged column reference is free, an inlined
    ``array_sort`` would re-sort per reference).
    """
    d = f"array_distinct({ss_sql})"
    chars = f"length(array_join({ss_sql}, ''))"
    dchars = f"length(array_join({d}, ''))"
    # values occurring >1 time, each once: sorted elements equal to their
    # predecessor, deduped. Built by zipping the array against its shifted
    # self — NOT `(x, i) -> x = element_at({ss_sql}, i)`, whose lambda
    # references the array and re-evaluates the whole upstream expression
    # per element if a composed plan ever collapses the staging projection
    # (the _word_ngrams hazard class).
    ll = f"greatest(size({ss_sql}) - 1, 0)"
    dupvals = (
        f"array_distinct(filter("
        f"zip_with(slice({ss_sql}, 2, {ll}), slice({ss_sql}, 1, {ll}),"
        f" (x, p) -> IF(x = p, x, CAST(NULL AS STRING))),"
        f" v -> v IS NOT NULL))"
    )
    top = (
        f"aggregate({ss_sql}, "
        f"named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        f"(acc, e) -> named_struct("
        f"'prev', e, "
        f"'run', IF(e = acc.prev, acc.run + 1L, 1L), "
        f"'best', greatest(acc.best, IF(e = acc.prev, acc.run + 1L, 1L) * length(e))), "
        f"acc -> acc.best)"
    )
    return {
        "extra_count": f"CAST(size({ss_sql}) - size({d}) AS LONG)",
        "extra_chars": f"CAST({chars} - {dchars} AS LONG)",
        "dup_cover": f"CAST({chars} - {dchars} + length(array_join({dupvals}, '')) AS LONG)",
        "top_cover": top,
    }


def _dup_run_stats(arr_sql: str) -> str:
    """SQL text: struct(extra_chars, extra_count, top_cover, dup_cover) of
    ``_run_stat_exprs`` over ``array_sort(arr_sql)`` — the assembled form
    the property test exercises against a plain-Python reference. Callers
    on hot paths should stage the sort and use ``_run_stat_exprs``
    directly (see gopher_repetition)."""
    s = _run_stat_exprs(f"array_sort({arr_sql})")
    return (
        f"named_struct('extra_chars', {s['extra_chars']}, "
        f"'extra_count', {s['extra_count']}, "
        f"'top_cover', {s['top_cover']}, "
        f"'dup_cover', {s['dup_cover']})"
    )


def gopher_repetition(
    docs: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc Gopher repetition signals (micro-integerized ratios):

      n_lines, dup_line_frac_micro, dup_line_char_frac_micro,
      top_2gram_char_frac_micro, dup_5gram_char_frac_micro
    """
    staged = _with_tokens(docs, key, text_col).withColumn(
        "lines", _lines_col("text")
    )
    # stage each sort once: the stats reference their sorted array several
    # times, and only a staged column makes those references free (the
    # projections can't collapse — toks/lines/ls are multiply referenced
    # non-cheap expressions)
    sorted_stage = staged.selectExpr(
        "doc",
        "length(text) AS _n_chars",
        "CAST(size(lines) AS LONG) AS n_lines",
        "array_sort(lines) AS ls",
        f"array_sort({_word_ngrams('toks', 2)}) AS g2s",
        f"array_sort({_word_ngrams('toks', 5)}) AS g5s",
    )

    def mfrac(num: str, den: str, name: str) -> str:
        return (
            f"CAST(round(IF({den} > 0, least({num} / {den}, 1.0D), 0.0D)"
            f" * 1000000) AS LONG) AS {name}"
        )

    sl = _run_stat_exprs("ls")
    s2 = _run_stat_exprs("g2s")
    s5 = _run_stat_exprs("g5s")
    line_chars = "length(array_join(ls, ''))"
    return sorted_stage.selectExpr(
        "doc",
        "n_lines",
        mfrac(sl["extra_count"], "n_lines", "dup_line_frac_micro"),
        mfrac(sl["extra_chars"], line_chars, "dup_line_char_frac_micro"),
        mfrac(s2["top_cover"], "_n_chars", "top_2gram_char_frac_micro"),
        mfrac(s5["dup_cover"], "_n_chars", "dup_5gram_char_frac_micro"),
    )


def gopher_quality(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop: int = 2,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 A1.1) as per-doc
    signals + the composite pass flag:

      n_words in [min_words, max_words]; mean word length in [3, 10];
      symbol-to-word ratio ('#' or '...') <= 0.1; <= 90% of lines start
      with a bullet; <= 30% end with an ellipsis; >= 80% of words contain
      an alphabetic character; >= ``min_stop`` distinct Gopher stopwords
      present (the paper uses 2; corpora whose vocabulary carries fewer
      function words parameterize it down rather than silently passing
      nothing).

    Columns: doc, n_words, mean_word_len_micro, symbol_ratio_micro,
    bullet_line_frac_micro, ellipsis_line_frac_micro,
    alpha_word_frac_micro, n_stop_hits, passes (int 0/1).
    """
    staged = _with_tokens(docs, key, text_col).withColumn(
        "lines", _lines_col("text")
    )
    toks = F.col("toks")
    text = F.col("text")
    lines = F.col("lines")
    n_words = F.size(toks)
    token_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_wl = F.when(n_words > 0, token_chars / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.")) - 1
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("- ")
            | F.trim(l).startswith("* ")
            | F.trim(l).startswith("•"),
        )
    )
    ellipsis_end = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    # distinct stopwords present = |profile ∩ toks| (profile is distinct).
    # NOT filter(profile, w -> array_contains(toks, w)): a lambda that
    # references ``toks`` re-evaluates the tokenize-split once per profile
    # word when Catalyst collapses the staging projection into the
    # composed curation plan (see _word_ngrams) — array_intersect keeps
    # the array in a once-per-row position.
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(stop_arr, toks))
    frac = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    m = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    bullet_frac = frac(bullet, n_lines)
    ellipsis_frac = frac(ellipsis_end, n_lines)
    alpha_frac = frac(alpha_words, n_words)
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= min_stop)
    )
    return staged.select(
        "doc",
        n_words.cast("long").alias("n_words"),
        m(mean_wl).alias("mean_word_len_micro"),
        m(symbol_ratio).alias("symbol_ratio_micro"),
        m(bullet_frac).alias("bullet_line_frac_micro"),
        m(ellipsis_frac).alias("ellipsis_line_frac_micro"),
        m(alpha_frac).alias("alpha_word_frac_micro"),
        n_stop.cast("long").alias("n_stop_hits"),
        passes.cast("int").alias("passes"),
    )


def doc_term_tf(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(doc, token, tf) — the per-doc term-frequency table, built entirely
    MAP-SIDE so occurrences never shuffle: tokens are sorted per row and
    run-length encoded (boundary indices → (start, end) pairs → one struct
    per distinct token). The output is one row per (doc, distinct token),
    the minimal join/aggregate input for any downstream frequency op —
    at web scale this is the difference between shuffling 10^12 occurrence
    rows and ~10^11 (doc, term) rows.

    localCheckpoint'ed: every caller fans it into ≥2 consumers (a
    corpus-count aggregate plus one or two join probes), and a
    multi-consumer frame re-executes per reference otherwise."""
    staged = _with_tokens(docs, key, text_col).selectExpr(
        "doc", "array_sort(toks) AS ts"
    )
    return _rle_tf(staged).localCheckpoint(eager=False)  # lazy:
    # materializes inside the first consuming job instead of as its own
    # construct-time job (serving latency), still evaluated once for all
    # consumers


def _rle_tf(staged: DataFrame) -> DataFrame:
    """Run-length encode a (doc, ts) frame — ``ts`` a SORTED string array —
    into (doc, token, tf) rows, entirely map-side: boundary indices →
    (start, end) pairs → one struct per distinct value."""
    bounded = staged.selectExpr(
        "doc",
        "ts",
        "IF(size(ts) = 0, CAST(array() AS ARRAY<INT>), "
        "filter(sequence(0, size(ts) - 1), "
        "i -> i = 0 OR element_at(ts, i + 1) != element_at(ts, i))) AS bounds",
    )
    return bounded.selectExpr(
        "doc",
        "inline(zip_with(bounds, "
        "concat(slice(bounds, 2, size(bounds)), array(size(ts))), "
        "(st, en) -> named_struct("
        "'token', element_at(ts, st + 1), 'tf', CAST(en - st AS BIGINT))))",
    )


def doc_bigram_tf(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(doc, token, tf) where token is a space-joined word BIGRAM — the
    map-side run-length shape of ``doc_term_tf`` applied to adjacent-pair
    strings. Bigrams are built by zipping the token array against its own
    1-shifted slice so the lambda touches ONLY its zipped elements — never
    the backing array (the round-6 HOF rule: Catalyst re-inlines a staged
    array into lambda bodies under column pruning, turning an
    element_at(toks, i) lambda into an O(len^2) per-doc regex storm)."""
    staged = _with_tokens(docs, key, text_col).selectExpr(
        "doc",
        "array_sort(zip_with("
        "slice(toks, 1, greatest(size(toks) - 1, 0)), "
        "slice(toks, 2, greatest(size(toks) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))) AS ts",
    )
    return _rle_tf(staged).localCheckpoint(eager=False)


def bigram_logppl(
    docs: DataFrame, key: str, text_col: str = "text", hot_vocab: int = 65536
) -> DataFrame:
    """(doc, n_bigrams, logppl2_micro): per-doc mean bits-per-bigram under
    the corpus's OWN bigram model — the order-sensitive upgrade of
    ``unigram_logppl`` (a doc of common words in an uncommon ORDER scores
    high here and low there; scrambled/templated text separates):

      bits(w1 w2) = log2 c_ctx(w1) - log2 c(w1, w2),
      c_ctx(w1)   = sum over bigrams starting with w1 of their count

    Self-scoring means every doc bigram exists in the model (count >= 1),
    so no smoothing term is needed and the op stays exactly
    SQL-expressible. Scale shape mirrors the unigram op: bigram
    occurrences never shuffle (map-side RLE → one row per (doc, distinct
    bigram)), BOTH count joins go through the hot/cold skew split (bigram
    counts are Zipf too — "of the" is a web-scale hot key), and context
    counts derive from the bigram count table itself (one extra tiny
    shuffle over distinct bigrams, never over occurrences)."""
    tf = doc_bigram_tf(docs, key, text_col)
    counts = (
        tf.groupBy("token")
        .agg(F.sum("tf").alias("_c"))
        .localCheckpoint(eager=False)  # consumers: ctx derivation + join
    )
    ctx = (
        counts.select(
            F.split_part(F.col("token"), F.lit(" "), F.lit(1)).alias("_w1"),
            "_c",
        )
        .groupBy("_w1")
        .agg(F.sum("_c").alias("_cc"))
    )
    joined = skew_safe_count_join(tf, "token", counts, "_c", hot_k=hot_vocab)
    joined = joined.withColumn(
        "_w1", F.split_part(F.col("token"), F.lit(" "), F.lit(1))
    )
    joined = skew_safe_count_join(joined, "_w1", ctx, "_cc", hot_k=hot_vocab)
    bits = F.col("tf") * (F.log2(F.col("_cc")) - F.log2(F.col("_c")))
    return joined.groupBy("doc").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.round(F.sum(bits) / F.sum("tf") * 1_000_000)
        .cast("long")
        .alias("logppl2_micro"),
    )


def source_profile(
    docs: DataFrame,
    key: str,
    source_col: str = "source",
    text_col: str = "text",
    low_decile: float = 0.1,
    high_quality_micro: int = 500_000,
) -> DataFrame:
    """Per-source (domain) corpus rollup — the domain-level view every
    web-pipeline curation pass ranks before per-document filtering (a few
    spam domains contribute most low-quality bytes; dropping them is
    cheaper than scoring their documents):

      (source, n_docs, total_chars, avg_quality_micro, n_high_quality,
       low_quality)

    One shuffle on the source key with full map-side partial aggregation
    (count/sum are algebraic — a hot domain combines locally before the
    exchange, so Zipf domain skew can't pile rows on one reducer).
    ``avg_quality_micro`` divides two exact integers, so it is
    summation-order-independent across engines; the low-quality flag
    compares against the corpus's ``low_decile`` quantile of source
    averages, computed over the (bounded: one row per domain) rollup and
    broadcast back — the ppl_buckets threshold pattern."""
    qf = quality_features(docs, key, text_col, source_col)
    per = (
        qf.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("quality_micro") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_quality_micro"),
            F.sum(
                (F.col("quality_micro") >= high_quality_micro).cast("long")
            ).alias("n_high_quality"),
        )
        .localCheckpoint(eager=False)  # consumers: threshold agg + output
    )
    thr = F.broadcast(
        per.agg(
            F.round(
                F.percentile(
                    F.col("avg_quality_micro").cast("double"), F.lit(low_decile)
                )
            )
            .cast("long")
            .alias("_thr")
        )
    )
    return per.crossJoin(thr).select(
        "source",
        "n_docs",
        "total_chars",
        "avg_quality_micro",
        "n_high_quality",
        (F.col("avg_quality_micro") <= F.col("_thr")).cast("int").alias(
            "low_quality"
        ),
    )


def char_ngram_entropy(
    docs: DataFrame, key: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc, n_ngrams, entropy_micro): per-doc Shannon entropy of the
    character n-gram distribution — low entropy flags repetitive /
    template / keyboard-mash text, high entropy flags encrypted or
    base64-ish blobs; both are standard web-corpus hygiene cuts.

      H = log2(N) - (1/N) * sum over distinct grams of c * log2(c)

    Zero shuffle: the gram array is built by zipping the char array
    against its own shifted slices (lambdas touch only zipped elements —
    the HOF re-inlining rule), sorted, and folded in ONE linear
    ``aggregate`` pass whose accumulator run-length-encodes adjacent
    duplicates and accumulates c*log2(c) at each run flush (the Gopher
    fold pattern, 4-arg finish flushes the last run). The whole operator
    is one ``F.expr`` string — constant Catalyst analysis cost, no
    column-by-column construction (the round-5 latency lesson)."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    # fold the shifted slices pairwise into n-gram strings
    gram = f"slice(cs, 1, greatest(size(cs) - {n - 1}, 0))"
    for i in range(1, n):
        gram = (
            f"zip_with({gram}, slice(cs, {i + 1}, greatest(size(cs) - {n - 1}, 0)), "
            "(a, b) -> concat(a, b))"
        )
    staged = docs.selectExpr(
        f"{key} AS doc",
        f"filter(split({text_col}, ''), c -> c != '') AS cs",
    ).selectExpr("doc", f"array_sort({gram}) AS ts")
    fold = """
aggregate(
  ts,
  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 's', CAST(0.0 AS DOUBLE)),
  (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
    named_struct('prev', x, 'run', acc.run + 1L, 's', acc.s),
    named_struct('prev', x, 'run', 1L,
      's', acc.s + IF(acc.run > 0, CAST(acc.run AS DOUBLE) * log2(acc.run), CAST(0.0 AS DOUBLE)))),
  acc -> acc.s + IF(acc.run > 0, CAST(acc.run AS DOUBLE) * log2(acc.run), CAST(0.0 AS DOUBLE))
)"""
    return staged.selectExpr(
        "doc",
        "CAST(size(ts) AS BIGINT) AS n_ngrams",
        f"CAST(round(IF(size(ts) > 0, "
        f"(log2(size(ts)) - ({fold}) / size(ts)) * 1000000, 0)) AS BIGINT) "
        "AS entropy_micro",
    )


def tfidf_top_terms(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 3,
    hot_vocab: int = 65536,
) -> DataFrame:
    """(doc, token, tf, tfidf_micro, rank): the top-``k`` TF-IDF terms per
    document — the per-doc keyword signal curation pipelines use for topic
    profiling and cluster labeling.

      tfidf(d, t) = tf(d, t) * (log2 N_docs − log2 df(t))

    Scale shape mirrors ``unigram_logppl``: the (doc, token, tf) input is
    built map-side (``doc_term_tf`` — no occurrence shuffle), document
    frequency is one row per token (``count(*)`` over the tf table, which
    is already distinct per (doc, token)), the df join goes through the
    hot/cold split so stop-tokens can't skew a reducer, and N_docs rides
    as a broadcast 1-row aggregate. Ranking is a row_number window over
    ``doc`` — the one unavoidable by-doc shuffle — ordered by the ROUNDED
    integer micro score (then token) so the cutoff between rank k and k+1
    can never depend on sub-micro float noise that could differ across
    engines."""
    tf = doc_term_tf(docs, key, text_col)
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .localCheckpoint(eager=False)  # consumers: hot top-K + tail join
    )
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).cast("double").alias("_nd")))
    joined = skew_safe_count_join(tf, "token", dfreq, "_df", hot_k=hot_vocab)
    score = (
        F.round(
            F.col("tf") * (F.log2(F.col("_nd")) - F.log2(F.col("_df"))) * 1_000_000
        ).cast("long")
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("tfidf_micro"), F.asc("token")
    )
    return (
        joined.crossJoin(n_docs)
        .select("doc", "token", "tf", score.alias("tfidf_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def unigram_logppl(
    docs: DataFrame, key: str, text_col: str = "text", hot_vocab: int = 65536
) -> DataFrame:
    """(doc, n_tokens, logppl_micro): per-doc mean bits-per-token under the
    corpus's OWN unigram model — the CCNet/RedPajama perplexity-filter
    signal with a fully transparent LM (no external model): documents whose
    token distribution diverges from the corpus (gibberish, boilerplate,
    wrong language) score high; formulaic text scores low.

      logppl(d) = avg over tokens t of  log2(N_total) - log2(count(t))
                = sum_t tf(d,t)*(log2 N - log2 c_t) / sum_t tf(d,t)

    Skew-safe shape for a 10^12-token corpus (r5 verdict: the naive
    occurrence-level token equi-join concentrates stop-token rows on a
    few reducers — "the" alone is ~5% of web-scale occurrences):

    * occurrences never shuffle: the per-doc (token, tf) table is built
      MAP-SIDE from the sorted token array (run-length boundaries), so
      the join input is one row per (doc, distinct token), not per
      occurrence;
    * the token-count join goes through the hot/cold split
      (operators/skewjoin.py): the ``hot_vocab`` highest-count tokens
      carry their counts via a bounded broadcast, the tail shuffles with
      no hot key left on the probe side.

    Shuffles: groupBy(token) for the unigram table, the tail equi-join,
    and the final groupBy(doc). Corpus total rides as a broadcast 1-row
    aggregate — no eager count, no Python."""
    tf = doc_term_tf(docs, key, text_col)
    counts = tf.groupBy("token").agg(
        F.sum("tf").alias("_c")
    ).localCheckpoint(eager=False)  # consumers: total, hot top-K, tail join
    total = F.broadcast(counts.agg(F.sum("_c").cast("double").alias("_total")))
    joined = skew_safe_count_join(tf, "token", counts, "_c", hot_k=hot_vocab)
    bits = F.col("tf") * (F.log2(F.col("_total")) - F.log2(F.col("_c")))
    return (
        joined.crossJoin(total)
        .groupBy("doc")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(bits) / F.sum("tf") * 1_000_000)
            .cast("long")
            .alias("logppl_micro"),
        )
    )


def ppl_buckets(
    docs: DataFrame, key: str, text_col: str = "text", hot_vocab: int = 65536
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): every doc
    assigned to the ``head`` / ``middle`` / ``tail`` tercile of the
    corpus's own perplexity distribution — the partitioning CCNet uses to
    stratify Common Crawl by LM quality before sampling. Here the LM is
    the transparent corpus-unigram model of ``unigram_logppl``, so the
    whole op is oracle-checkable with no external artifacts.

    Shape: the per-doc logppl frame computes ONCE (localCheckpoint — it
    feeds both the tercile aggregate and the output rows), the two
    thresholds ride as a broadcast 1-row aggregate (exact interpolated
    ``F.percentile``; at 10^12 rows swap percentile_approx with a
    documented error bound), and bucket assignment is a map-side
    comparison of the ROUNDED integer micro values — no float boundary
    can disagree across engines."""
    lp = unigram_logppl(docs, key, text_col, hot_vocab).localCheckpoint(eager=False)
    thr = F.broadcast(
        lp.agg(
            *[
                F.round(
                    F.percentile(F.col("logppl_micro").cast("double"), F.lit(p))
                ).cast("long").alias(name)
                for name, p in (("_t1", 1 / 3), ("_t2", 2 / 3))
            ]
        )
    )
    return lp.crossJoin(thr).select(
        "doc",
        "n_tokens",
        "logppl_micro",
        F.when(F.col("logppl_micro") <= F.col("_t1"), F.lit("head"))
        .when(F.col("logppl_micro") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def encoding_anomalies(
    docs: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """Encoding-anomaly profile: the mechanical signals every web-corpus
    hygiene pass screens before training (broken decoders are a top source
    of garbage text in Common-Crawl-derived corpora):

    - ``n_replacement``: U+FFFD replacement characters — a decoder already
      gave up on those bytes;
    - ``n_control``: C0 control characters other than tab/newline/CR —
      binary junk that survived text extraction;
    - ``n_mojibake``: 'Ã' followed by a Latin-1 supplement character, the
      signature of UTF-8 bytes re-decoded as Latin-1/cp1252 (every 2-byte
      UTF-8 sequence for Latin letters turns into exactly that pair);
    - ``n_nonascii``: total non-ASCII codepoints (legitimate for most
      languages — a *rate* signal, not a defect by itself);
    - ``clean``: 1 iff the three defect counters are all zero.

    Map-only JVM ``regexp_count`` passes, zero shuffle, pipeline-fused with
    whatever scan feeds it at any scale."""
    c = F.col(text_col)
    n_repl = F.regexp_count(c, F.lit("�")).cast("long")
    n_ctrl = F.regexp_count(
        c, F.lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
    ).cast("long")
    n_moji = F.regexp_count(c, F.lit("Ã[\\x80-\\xBF]")).cast("long")
    n_nonascii = F.regexp_count(c, F.lit("[^\\x00-\\x7F]")).cast("long")
    return docs.select(
        F.col(key).alias("doc"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        n_nonascii.alias("n_nonascii"),
        ((n_repl == 0) & (n_ctrl == 0) & (n_moji == 0))
        .cast("int")
        .alias("clean"),
    )


def vocab_coverage(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
) -> DataFrame:
    """Top-k vocabulary token-coverage curve: for each k in ``ks``, the
    fraction of all corpus token occurrences covered by the k most frequent
    terms (ties broken by term) — the curve a tokenizer/vocab-size decision
    reads off ("32k entries cover 99.x% of occurrences").

    Shape: ONE corpus-scale shuffle (the word count with map-side partial
    agg, output bounded by vocabulary size, independent of corpus rows);
    the rank/cumulative-sum window then sorts the vocabulary on a single
    partition — fine because a vocab is ~10^7 rows at web scale, and
    deliberate: a global rank needs a total order anyway. The corpus
    token total rides as a broadcast 1-row aggregate; the k-filter runs
    BEFORE the crossJoin so only |ks| rows move.

    ``covered_micro`` divides in double then rounds — identical IEEE ops
    in both engines; above 2^53 total tokens the last micro digit is a
    measurement, which is what a coverage curve is for."""
    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # consumers: ranked rows + the total
    )
    win = Window.orderBy(F.desc("cnt"), F.asc("w"))
    ranked = counts.select(
        F.col("w"),
        F.row_number().over(win).alias("k"),
        F.sum("cnt")
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_tokens"),
    )
    total = F.broadcast(counts.agg(F.sum("cnt").alias("_n")))
    return (
        ranked.filter(F.col("k").isin(list(ks)))
        .crossJoin(total)
        .select(
            "k",
            F.col("w").alias("kth_term"),
            "cum_tokens",
            F.round(
                F.col("cum_tokens").cast("double") * 1_000_000 / F.col("_n")
            )
            .cast("long")
            .alias("covered_micro"),
        )
        .repartition(1)
        .sortWithinPartitions("k")
    )


def bigram_novelty(
    docs: DataFrame, key: str, text_col: str = "text", hot_vocab: int = 65536
) -> DataFrame:
    """Per-doc n-gram novelty: the fraction of a doc's DISTINCT bigrams
    whose corpus-wide first occurrence (minimum doc id) is this doc — the
    repetition-research signal separating template-echo documents
    (novelty → 0) from original text, and the cheap upper-bound screen a
    substring-dedup pass runs first.

    Scale shape mirrors ``bigram_logppl``: occurrences never shuffle
    (map-side RLE gives one row per (doc, distinct bigram)); the
    first-seen table is an algebraic min/count aggregation (map-side
    combine absorbs stop-bigram skew); the join back goes through the
    hot/cold split so no reducer sees a full stop-bigram's posting list."""
    bt = doc_bigram_tf(docs, key, text_col)
    firsts = (
        bt.groupBy("token")
        .agg(
            F.min("doc").alias("_first_doc"),
            F.count(F.lit(1)).alias("_df"),
        )
        .localCheckpoint(eager=False)  # consumers: hot head + cold tail
    )
    joined = skew_safe_count_join(bt, "token", firsts, "_df", hot_k=hot_vocab)
    novel = (F.col("_first_doc") == F.col("doc")).cast("long")
    return joined.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(novel).alias("n_novel"),
        F.round(F.sum(novel) * 1_000_000.0 / F.count(F.lit(1)))
        .cast("long")
        .alias("novelty_micro"),
    )


def cooccurrence_pmi(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-k word-pair PMI over a +-``window`` co-occurrence count — the
    co-occurrence-matrix construction under count-based embeddings
    (GloVe/SGNS preprocessing) and the collocation detector for
    tokenizer-merge candidates:

      pmi(a,b) = log2( (c_ab / N_p) / ((c_a / N_u) * (c_b / N_u)) )

    with c_ab the UNORDERED within-window pair count, c_* unigram counts,
    N_p / N_u the respective totals. Pure function of integer counts, so
    the micro rounding agrees engine-to-engine.

    Scale shape: pair extraction is map-side (one zip of shifted slices
    per offset — lambdas touch only their zipped elements, the HOF rule);
    ONE corpus-scale shuffle counts pairs (map-side combine, output
    bounded by realized-pair vocabulary); the two unigram attachments are
    dict-level joins of post-aggregation tables (vocabulary-bounded on
    both sides — never corpus rows); totals ride as broadcast 1-row
    aggregates; the final top-k is a TakeOrderedAndProject on the integer
    micro score."""
    staged = _with_tokens(docs, key, text_col).select("doc", "toks")
    n = F.size(F.col("toks"))
    per_offset = [
        F.zip_with(
            F.slice(F.col("toks"), 1, F.greatest(n - d, F.lit(0))),
            F.slice(F.col("toks"), 1 + d, F.greatest(n - d, F.lit(0))),
            lambda a, b: F.concat_ws(" ", F.least(a, b), F.greatest(a, b)),
        )
        for d in range(1, window + 1)
    ]
    pairs = staged.select(
        F.explode(F.flatten(F.array(*per_offset))).alias("pair")
    )
    pair_counts = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    uni = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # consumers: both sides + the total
    )
    n_u = F.broadcast(uni.agg(F.sum("c").alias("_nu")))
    n_p = F.broadcast(
        pairs.groupBy().agg(F.count(F.lit(1)).alias("_np"))
    )
    split = pair_counts.select(
        "pair",
        "c_ab",
        F.split_part(F.col("pair"), F.lit(" "), F.lit(1)).alias("_wa"),
        F.split_part(F.col("pair"), F.lit(" "), F.lit(2)).alias("_wb"),
    )
    joined = (
        split.join(uni.withColumnRenamed("w", "_wa").withColumnRenamed("c", "c_a"), "_wa")
        .join(uni.withColumnRenamed("w", "_wb").withColumnRenamed("c", "c_b"), "_wb")
        .crossJoin(n_u)
        .crossJoin(n_p)
    )
    pmi = F.log2(
        (F.col("c_ab").cast("double") / F.col("_np"))
        / (
            (F.col("c_a").cast("double") / F.col("_nu"))
            * (F.col("c_b").cast("double") / F.col("_nu"))
        )
    )
    return (
        joined.select(
            "pair",
            "c_ab",
            "c_a",
            "c_b",
            F.round(pmi * 1_000_000).cast("long").alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), F.asc("pair"))
        .limit(top_k)
    )


# ------------------------------------------------------- quality classifier
def hash60_sql(col_sql: str) -> str:
    """SQL fragment: uniform 60-bit hash of a string expression (the
    conv(md5) trick). The DuckDB oracle mirror is
    ``('0x'||substr(md5(x),1,15))::BIGINT`` — the two must stay
    bit-identical, so every operator shares this one definition."""
    return f"cast(conv(substr(md5({col_sql}),1,15),16,10) as bigint)"



CLF_BUCKETS = 64
CLF_WEIGHT_MOD = 2001  # weights land in [-1000, 1000]


def _clf_weight_sql(term_sql: str, n_buckets: int) -> str:
    """SQL fragment: the classifier weight of one token — feature bucket by
    md5, weight by a second md5 of the bucket id. Identical algebra runs in
    the DuckDB oracle (conv(hex,16,10) == ('0x'||hex)::BIGINT)."""
    bucket = f"pmod({hash60_sql(term_sql)}, {n_buckets})"
    return (
        f"(pmod(cast(conv(substr(md5(concat('w', cast({bucket} as string))),"
        f"1,8),16,10) as bigint), {CLF_WEIGHT_MOD}) - 1000)"
    )


def quality_classifier(
    docs: DataFrame, key: str, text_col: str = "text", n_buckets: int = CLF_BUCKETS
) -> DataFrame:
    """(doc, n_tokens, clf_score, clf_margin_micro, keep): fasttext-style
    linear quality classifier over hashed bag-of-words features — the
    model-based filter stage of GPT-3/LLaMA-style curation (a classifier
    scores every page; pages below the margin are dropped). The weight
    vector here is a deterministic hash stand-in for shipped trained
    weights, which keeps the op oracle-checkable; the DEPLOYMENT shape is
    what matters and is exactly this: scoring is embarrassingly parallel
    map-side column algebra (feature-hash each token, add its weight), so
    at 10^12 rows the stage has ZERO shuffles — no weight-table join (the
    weight function inlines; a real model would broadcast its coefficient
    array the same way) and whole-stage codegen end to end.

      bucket(t)  = int(md5(t)[:15]) mod n_buckets
      w(b)       = int(md5('w'||b)[:8]) mod 2001 - 1000
      score(doc) = sum over tokens of w(bucket(t));  keep = score >= 0

    The per-doc sum is a single ``aggregate`` fold over the staged token
    array (one F.expr string — the r5 lesson: column-by-column construction
    of wide expressions costs seconds of py4j/analysis time per query).
    """
    staged = _with_tokens(docs, key, text_col).select("doc", "toks")
    wexpr = _clf_weight_sql("w", n_buckets)
    score = f"aggregate(toks, 0L, (acc, w) -> acc + {wexpr})"
    return staged.select(
        F.col("doc"),
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(score).cast("long").alias("clf_score"),
    ).select(
        "doc",
        "n_tokens",
        "clf_score",
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("clf_score") * 1_000_000.0 / F.col("n_tokens")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("clf_margin_micro"),
        (F.col("clf_score") >= 0).cast("int").alias("keep"),
    )


# --------------------------------------------------- DSIR importance weights

DSIR_BUCKETS = 256


def dsir_importance(
    docs: DataFrame,
    key: str,
    target: Column,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc, n_feats, dsir_logw_micro, dsir_per_feat_micro): hashed-ngram
    importance weights for Data Selection via Importance Resampling (DSIR,
    Xie et al. 2023): score every raw doc by how much more likely its
    hashed bigram features are under the TARGET distribution (rows where
    ``target`` is true — e.g. a trusted domain or language slice) than
    under the raw corpus, then resample by the weight:

      logw(d) = sum over features f of  log2 p_tgt(f) - log2 p_raw(f)

    with Laplace-smoothed bucket probabilities p(b) = (c_b + 1)/(N + B).

    Scale shape for 10^12 docs: feature extraction is map-side (bigrams by
    zipping shifted slices — the HOF rule — then run-length encoding, so
    occurrences never shuffle); both bucket-count aggregations have
    B-bounded output with map-side combine; the per-bucket log-ratio table
    (B rows) joins back as a BROADCAST, so the only corpus-scale shuffle is
    the final groupBy(doc). Docs with < 2 tokens carry no features and are
    omitted (both engines agree)."""
    staged = docs.select(
        F.struct(F.col(key).alias("id"), target.alias("tgt")).alias("doc"),
        tokens_col(text_col).alias("toks"),
    ).selectExpr(
        "doc",
        "array_sort(zip_with("
        "slice(toks, 1, greatest(size(toks) - 1, 0)), "
        "slice(toks, 2, greatest(size(toks) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))) AS ts",
    )
    feats = (
        _rle_tf(staged)
        .select(
            F.col("doc.id").alias("doc"),
            F.col("doc.tgt").alias("tgt"),
            F.expr(f"pmod({hash60_sql('token')}, {n_buckets})").alias(
                "bucket"
            ),
            "tf",
        )
        .localCheckpoint(eager=False)  # consumers: raw counts, target
        # counts, and the per-doc probe — one evaluation for all three
    )
    cr = (
        feats.groupBy("bucket")
        .agg(F.sum("tf").alias("c_r"))
        .localCheckpoint(eager=False)  # consumers: spine join + total
    )
    ct = (
        feats.filter(F.col("tgt"))
        .groupBy("bucket")
        .agg(F.sum("tf").alias("c_t"))
        .localCheckpoint(eager=False)
    )
    r_tot = F.broadcast(cr.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("_rt")))
    t_tot = F.broadcast(ct.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("_tt")))
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    # per-bucket log ratio quantized to integer NANO units in one
    # deterministic per-row expression (B rows): the per-doc accumulation
    # then sums exact bigints, so no cross-row double summation whose
    # order could flip a rounded micro between engines (the
    # embedding_label_similarity rule — log2's last ulp stays confined to
    # the single scalar quantization)
    lr = (
        spine.join(cr, "bucket", "left")
        .join(ct, "bucket", "left")
        .crossJoin(r_tot)
        .crossJoin(t_tot)
        .select(
            "bucket",
            F.round(
                (
                    F.log2(F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    - F.log2(F.col("_tt") + n_buckets)
                    - F.log2(F.coalesce(F.col("c_r"), F.lit(0)) + 1)
                    + F.log2(F.col("_rt") + n_buckets)
                )
                * 1_000_000_000
            )
            .cast("long")
            .alias("w_nano"),
        )
    )
    return (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc")
        .agg(
            F.sum("tf").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("tf") * F.col("w_nano")) / 1_000.0)
            .cast("long")
            .alias("dsir_logw_micro"),
            F.round(
                F.sum(F.col("tf") * F.col("w_nano"))
                / (F.lit(1_000.0) * F.sum("tf"))
            )
            .cast("long")
            .alias("dsir_per_feat_micro"),
        )
    )


# ------------------------------------------------------------- readability


def readability(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(doc, n_words, n_sentences, n_syllables, flesch_micro): Flesch
    reading-ease with the standard crawl-filter approximations — sentences
    are [.!?]+ runs (floor 1), syllables are [aeiouy]+ vowel-group runs:

      flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    The readability band is a cheap complexity prior used alongside the
    Gopher/C4 rules when stratifying a pretraining mix. Pure map-side
    column algebra: two regexp run-counts and one token count per row,
    zero shuffles, whole-stage codegen."""
    staged = _with_tokens(docs, key, text_col)
    return staged.select(
        "doc",
        F.size("toks").cast("long").alias("n_words"),
        F.greatest(
            F.expr("size(regexp_extract_all(text, '[.!?]+', 0))"), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
        .cast("long")
        .alias("n_syllables"),
    ).select(
        "doc",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            F.round(
                (
                    F.lit(206.835)
                    - F.lit(1.015)
                    * (F.col("n_words").cast("double") / F.col("n_sentences"))
                    - F.lit(84.6)
                    * (F.col("n_syllables").cast("double") / F.col("n_words"))
                )
                * 1_000_000
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flesch_micro"),
    )


# ------------------------------------------------------------------ C4 rules

# Page-level blocklist stand-in: the C4 release filters against the public
# "List of Dirty, Naughty, Obscene..." list; shipping that list is neither
# useful nor possible here, so the default carries the two C4 literals the
# paper names explicitly ("lorem ipsum" placeholder text; pages are also
# dropped on a curly brace). Callers substitute their corpus's list.
C4_BADWORDS: tuple[str, ...] = ("lorem", "ipsum")
C4_LINE_BADWORDS: tuple[str, ...] = ("javascript",)


def c4_signals(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    badwords: tuple[str, ...] = C4_BADWORDS,
    line_badwords: tuple[str, ...] = C4_LINE_BADWORDS,
    min_line_words: int = 3,
    min_sentences: int = 5,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) as per-doc signals
    plus the composite pass flag.

    Line rules (a line is *kept* when all hold): ends in a terminal
    punctuation mark (``.!?"``; disable with
    ``require_terminal_punct=False`` for corpora without punctuation — the
    gopher_quality ``min_stop`` precedent), has at least ``min_line_words``
    words, and contains no ``line_badwords`` substring (the paper drops
    lines with the word "javascript").

    Page rules: at least ``min_sentences`` sentences ([.!?]+ runs), no
    "lorem ipsum", no curly brace, no ``badwords`` token, and at least one
    kept line.

    Columns: doc, n_lines, n_kept_lines, kept_char_frac_micro,
    n_sentences, has_lorem, has_brace, n_badword_hits, passes.

    Signals are computed over the raw text (the paper filters then
    re-assembles; this table is the review/filter stage, so it reports
    per-page fractions instead of rewriting the text). Pure map-side
    column algebra — two linear folds over the line array plus three
    regexp/token counts per row, zero shuffles.
    """
    line_conds = []
    if require_terminal_punct:
        line_conds.append("rtrim(l) RLIKE '[.!?\"]$'")
    line_conds.append(f"size(split(trim(l), ' +')) >= {min_line_words}")
    for w in line_badwords:
        line_conds.append(f"NOT contains(lower(l), '{w}')")
    cond = " AND ".join(line_conds)
    lines_sql = _lines_sql(text_col)
    # one fold computes kept-line count and kept chars together; a second
    # computes total line chars — both reference the line array only in
    # outer (once-per-row) positions per the HOF-inlining rule
    kept_sql = (
        f"aggregate({lines_sql}, named_struct('n', 0L, 'c', 0L), "
        f"(acc, l) -> IF({cond}, "
        f"named_struct('n', acc.n + 1L, 'c', acc.c + length(l)), acc))"
    )
    total_sql = f"aggregate({lines_sql}, 0L, (acc, l) -> acc + length(l))"
    staged = _with_tokens(docs, key, text_col).select(
        "doc",
        "text",
        "toks",
        F.expr(kept_sql).alias("_kept"),
        F.expr(total_sql).alias("_total_chars"),
        F.expr(f"size({lines_sql})").cast("long").alias("n_lines"),
    )
    bad_arr = F.array(*[F.lit(w) for w in badwords])
    n_bad = F.size(F.array_intersect(bad_arr, F.col("toks")))
    n_sentences = F.expr("size(regexp_extract_all(text, '[.!?]+', 0))")
    has_lorem = F.expr("contains(lower(text), 'lorem ipsum')")
    has_brace = F.expr("contains(text, '{')")
    n_kept = F.col("_kept.n")
    kept_frac = F.when(
        F.col("_total_chars") > 0,
        F.col("_kept.c").cast("double") / F.col("_total_chars"),
    ).otherwise(F.lit(0.0))
    passes = (
        (n_sentences >= min_sentences)
        & ~has_lorem
        & ~has_brace
        & (n_bad == 0)
        & (n_kept > 0)
    )
    return staged.select(
        "doc",
        "n_lines",
        n_kept.cast("long").alias("n_kept_lines"),
        F.round(kept_frac * 1_000_000).cast("long").alias("kept_char_frac_micro"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        n_bad.cast("long").alias("n_badword_hits"),
        passes.cast("int").alias("passes"),
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution: OLS of
    log(frequency) on log(rank). A natural-text corpus fits slope ~ -1
    with high R^2; templated/boilerplate or synthetic corpora deviate, so
    the (slope, r2) pair is a cheap corpus-level quality fingerprint the
    curation dashboards of web-scale pipelines report per snapshot/domain.

    Exactness: each (rank, count) point is quantized to integer micros
    (x = round(ln rank * 1e6), y = round(ln count * 1e6)); every OLS sum
    (Sx, Sy, Sxx, Sxy, Syy) accumulates in DECIMAL(38,0) — Spark's
    decimal sum and DuckDB's HUGEINT sum are both exact, so the closed-form
    numerators/denominators are identical integers in both engines and the
    only float ops are the final divisions (deterministic given identical
    exact operands). Never sum raw doubles across rows in an oracle-gated
    op — partial-aggregation order would leak into the last ulp.

    Scale shape: one groupBy(term) shuffle for counts; the rank window is
    vocabulary-bounded (not corpus-bounded) like vocab_coverage; the OLS
    aggregation is a map-side-combined global agg to ONE row. Returns
    (n_terms, slope_micro, intercept_micro, r2_micro)."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ranked = counts.select(
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("w")))
        .alias("k"),
        "cnt",
    )
    pts = ranked.select(
        F.round(F.log(F.col("k").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    # exact integer numerators/denominators, THEN one double division each
    staged = agg.select(
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE)").alias("num"),
        F.expr("CAST(n * sxx - sx * sx AS DOUBLE)").alias("den"),
        F.expr("CAST(n * syy - sy * sy AS DOUBLE)").alias("deny"),
    ).select(
        F.col("n").cast("long").alias("n_terms"),
        # nullif keeps the division row-safe under ANSI mode even if the
        # projection is evaluated before the outer CASE guards
        F.expr("num / nullif(den, CAST(0 AS DOUBLE))").alias("slope"),
        F.col("num"),
        F.col("den"),
        F.col("deny"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("n").cast("double").alias("nd"),
    )
    # degenerate variances: den = 0 (a single rank — no x spread) leaves
    # the slope undefined -> NULL row; deny = 0 (every count identical —
    # flat y) is fit exactly by slope 0 -> R^2 := 1. Guarded in BOTH
    # engines; an unguarded division is a hard error under ANSI mode.
    return staged.select(
        "n_terms",
        F.when(F.col("den") == 0, F.lit(None))
        .otherwise(F.round(F.col("slope") * 1_000_000))
        .cast("long")
        .alias("slope_micro"),
        F.when(F.col("den") == 0, F.lit(None))
        .otherwise(
            F.round((F.col("syd") - F.col("slope") * F.col("sxd")) / F.col("nd"))
        )
        .cast("long")
        .alias("intercept_micro"),
        F.when(F.col("den") == 0, F.lit(None))
        .when(F.col("deny") == 0, F.lit(1_000_000))
        .otherwise(
            F.round(
                F.col("num")
                * F.col("num")
                / (F.col("den") * F.col("deny"))
                * 1_000_000
            )
        )
        .cast("long")
        .alias("r2_micro"),
    )


def kn_bigram_probs(
    docs: DataFrame, key: str, text_col: str = "text", top: int = 20
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (absolute discount
    D = 3/4) — the smoothing that made count-based LMs competitive and
    still the reference scorer for corpus LM statistics:

        P(w2|w1) = (c(w1 w2) - D) / c(w1 .)
                 + D * N1+(w1 .) / c(w1 .) * N1+(. w2) / T

    where N1+(w1 .) = distinct continuations of w1, N1+(. w2) = distinct
    left contexts of w2 (the "how many ways can w2 start a novel bigram"
    count that distinguishes KN from Katz), T = distinct bigram types.
    With D = 3/4 the probability is the exact rational
    ((4c-3)*T + 3*n1p*dl) / (4*cctx*T); all factors are exact per-row
    integers, combined in ONE double expression per row (no cross-row
    float summation anywhere), so both engines produce the identical
    micro-rounded value.

    Scale shape: corpus bigram counts are the map-side RLE shuffle of
    doc_bigram_tf; every stats frame after that is VOCABULARY-bounded
    (groupBy w1 / groupBy w2 over distinct bigrams); T rides as a
    broadcast 1-row aggregate; and the output join broadcasts the bounded
    top-``top`` list into the stats frames, never the reverse. Returns
    (w1, w2, c, prob_micro) for the ``top`` most frequent bigrams."""
    bc = (
        doc_bigram_tf(docs, key, text_col)
        .groupBy("token")
        .agg(F.sum("tf").cast("long").alias("c"))
        .select(
            F.split("token", " ")[0].alias("w1"),
            F.split("token", " ")[1].alias("w2"),
            "c",
        )
        .localCheckpoint(eager=False)  # consumers: stats x2, T, top list
    )
    stats1 = bc.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cctx"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    stats2 = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    t = F.broadcast(bc.agg(F.count(F.lit(1)).cast("long").alias("t")))
    top_bc = bc.orderBy(F.desc("c"), "w1", "w2").limit(top)
    picked = stats1.join(F.broadcast(top_bc), "w1").crossJoin(t)
    joined = stats2.join(F.broadcast(picked), "w2")
    return joined.select(
        "w1",
        "w2",
        "c",
        F.expr(
            "CAST(round((CAST(4*c - 3 AS DOUBLE) * CAST(t AS DOUBLE)"
            " + CAST(3*n1p*dl AS DOUBLE)) * 1000000"
            " / (CAST(4*cctx AS DOUBLE) * CAST(t AS DOUBLE))) AS BIGINT)"
        ).alias("prob_micro"),
    ).orderBy(F.desc("c"), "w1", "w2")
