"""Path-agnostic corpus-curation chain — the library/CLI surface behind the
oracle-gated driver queries (plans/data_queries.py q_curate_corpus*).

Stages (each an independently oracle-checked operator):

  language filter (en)
    -> quality gate ('classic' composite score, or 'gopher' rule set +
       top-2-gram repetition cap)
    -> exact-duplicate canonical only (md5 groups, min-id canonical)
    -> near-duplicate removal (minhash-LSH banded candidates over the
       exact-dedup canonicals — provably the same kept set, see the
       inline note — with STAR pairing for jumbo buckets (default
       star_above=100), exact Jaccard verify, drop the higher doc id of
       each pair)

Jumbo buckets (boilerplate-template clusters) emit linear star pairs
(member vs bucket-min) instead of the quadratic all-pairs join, so a
36k-doc template cluster costs 36k verified candidates, not 6*10^8 —
and still gets DEDUPED down to its representative (a hard bucket drop
would silently keep the whole cluster; measured on the 600k-page corpus:
cap mode kept all 75 000 gate survivors, star mode keeps the cluster
representatives). Neither control fires at the oracle scales (max bucket
is 4 docs at sf0.001), so CLI output == the driver queries' kept ids
there.

Returns the KEPT rows of the input frame, all original columns intact, so
the output parquet is a drop-in curated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import textstats as T

QUALITY_MIN = 450_000
JACCARD_MIN = 500_000
TOP2_MAX = 250_000


STAR_ABOVE = 100


def curate_docs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    gate: str = "gopher",
    min_stop: int = 1,
    quality_min: int = QUALITY_MIN,
    jaccard_min: int = JACCARD_MIN,
    top2_max: int = TOP2_MAX,
    max_bucket_size: int | None = None,
    star_above: int | None = STAR_ABOVE,
) -> DataFrame:
    if gate not in ("classic", "gopher", "ccnet", "clf"):
        raise ValueError(
            f"gate must be 'classic', 'gopher', 'ccnet' or 'clf', got {gate!r}"
        )
    lang = T.lang_id(docs, key=key, text_col=text_col).select(
        F.col("doc").alias(key), "predicted_lang"
    )
    kept = (
        docs.join(lang, key)
        .filter(F.col("predicted_lang") == "en")
        .drop("predicted_lang")
    )
    if gate == "ccnet":
        # CCNet (Wenzek et al. 2020): exact-dup canonical only, then keep
        # the head/middle perplexity terciles of the corpus-own unigram LM
        # (terciles over the FULL input — the standalone ppl_buckets
        # semantics). No minhash stage: CCNet's dedup is exact.
        exact = D.exact_duplicates(docs, key=key, text_col=text_col).select(
            F.col("doc").alias(key), "canonical_id"
        )
        ppl = T.ppl_buckets(docs, key=key, text_col=text_col).select(
            F.col("doc").alias(key), "bucket"
        )
        return (
            kept.join(exact, key)
            .filter(F.col(key) == F.col("canonical_id"))
            .drop("canonical_id")
            .join(ppl, key)
            .filter(F.col("bucket") != "tail")
            .drop("bucket")
        )
    if gate == "clf":
        # model-based filter (GPT-3/LLaMA style): hashed linear classifier
        # score >= 0 stands in for the trained quality model's margin
        clf = T.quality_classifier(docs, key=key, text_col=text_col).select(
            F.col("doc").alias(key), "clf_score"
        )
        kept = (
            kept.join(clf, key)
            .filter(F.col("clf_score") >= 0)
            .drop("clf_score")
        )
    elif gate == "classic":
        qual = T.quality_features(docs, key=key, text_col=text_col).select(
            F.col("doc").alias(key), "quality_micro"
        )
        kept = (
            kept.join(qual, key)
            .filter(F.col("quality_micro") >= quality_min)
            .drop("quality_micro")
        )
    else:
        gq = T.gopher_quality(
            docs, key=key, text_col=text_col, min_stop=min_stop
        ).select(F.col("doc").alias(key), "passes")
        rep = T.gopher_repetition(docs, key=key, text_col=text_col).select(
            F.col("doc").alias(key), "top_2gram_char_frac_micro"
        )
        kept = (
            kept.join(gq, key)
            .filter(F.col("passes") == 1)
            .drop("passes")
            .join(rep, key)
            .filter(F.col("top_2gram_char_frac_micro") <= top2_max)
            .drop("top_2gram_char_frac_micro")
        )
    exact = D.exact_duplicates(docs, key=key, text_col=text_col).select(
        F.col("doc").alias(key), "canonical_id"
    )
    kept = (
        kept.join(exact, key)
        .filter(F.col(key) == F.col("canonical_id"))
        .drop("canonical_id")
    )
    # Near-dup runs over exact-dedup CANONICALS only — provably the same
    # kept set as running it over all docs: if a non-canonical a < b is a
    # near-dup of b, a's canonical a' <= a < b has *identical* text, hence
    # identical shingles, identical minhash signature and the same band
    # buckets, so the pair (a', b) is generated with the same jaccard and
    # still drops b. What the restriction buys is that an identical-text
    # cluster of 10k docs contributes ONE bucket row instead of 10k —
    # at 600k synthetic pages the unrestricted self-join emitted ~10^10
    # pair rows (7 clusters of ~10.7k docs each) and filled the disk.
    canon = docs.join(
        exact.filter(F.col(key) == F.col("canonical_id")).select(key), key
    )
    # localCheckpoint, not persist: both frames have multiple consumers
    # (exact_jaccard reads sh twice, cand twice), but a per-call persist in
    # a reusable library entry leaks cached partitions for the session's
    # lifetime — checkpoint blocks are released when the RDD is GC'd
    sh = D.shingles_df(canon, key=key, text_col=text_col).localCheckpoint()
    cand = D.lsh_candidates(
        D.band_buckets(D.minhash_signatures(sh)),
        max_bucket_size=max_bucket_size,
        star_above=star_above,
    ).localCheckpoint()
    nd_drop = (
        D.exact_jaccard(cand, sh)
        .filter(F.col("jaccard_micro") >= jaccard_min)
        .select(F.col("doc_b").alias(key))
        .distinct()
    )
    return kept.join(nd_drop, key, "left_anti")
