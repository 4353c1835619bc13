"""BM25 retrieval + the reference's query-operator algebra.

Maps the Xapian match layer (SURVEY.md §2.4 Q1-Q17, §2.5 R1-R11) onto
DataFrame algebra over the InvertedIndex tables. All scoring is JVM-side
column math (whole-stage codegen); the only Python was upstream in the
tokenizer UDF.

BM25 (exact formula of xapian-core-1.4.17.tar.xz!weight/bm25weight.cc):
  init (lines 45-129, no relevance set):
      tw = (N - df + 0.5) / (df + 0.5);  if tw < 2: tw = tw*0.5 + 1
      termweight = ln(tw) * (k3+1)*wqf/(k3+wqf) * (k1+1)
  per-posting (lines 163-174):
      normlen = max(doclen/avg_len, min_normlen)
      score   = termweight * wdf / (k1*(normlen*b + (1-b)) + wdf)
  defaults k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5
  (include/xapian/weight.h:585-587; installed as the default scheme by
  /root/reference/omenquire.cc:565-567).

Weights sum across matched terms (R4); ties break by ascending doc key (R6,
Enquire::ASCENDING — omenquire.cc:524-528); page size 100 matches the
reference's get_mset(0, 100) (/root/reference/src/xapian_utils.rs:700).

Scale notes: query-term statistics are tiny (q terms) — they broadcast-join
against postings; the postings side is bucket-partitioned by term so the scan
prunes. Top-k is TakeOrderedAndProject — the distributed analogue of the
reference's bounded result heap (XC matcher/multimatch.cc:794-830).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.porter2 import stem as porter2_stem
from .index import InvertedIndex

K1 = 1.0
K2 = 0.0
K3 = 1.0
B = 0.5
MIN_NORMLEN = 0.5
PAGE_SIZE = 100  # get_mset(0, 100)


def stem_query_term(term: str, prefix: str = "") -> str:
    """Free query terms match the Z-stemmed index forms, as the reference's
    QueryParser does with STEM_SOME (golden `Zfoo@1` trees,
    /root/reference/src/xapian_utils.rs:504-508).

    Terms whose first codepoint is not a letter (e.g. ``2024``) are never
    stemmed by the TermGenerator (should_stem), so the index holds no Z-form
    for them — STEM_SOME queries must use the raw ``prefix+term`` or they
    silently match nothing. Prefixed stemmable terms follow the QueryParser
    form ``Z<prefix><stem>``. Every StemTerm-lowering site (Executor,
    leaf-term fusion, explain, get_description) routes through here so the
    compiled plan, the debug dump, and the index agree."""
    t = term.lower()
    from ..functions.tokenizer import _should_stem

    return "Z" + prefix + porter2_stem(t) if _should_stem(t) else prefix + t


def _literal_qterms(spark, terms: dict[str, int]):
    """(term, wqf) rows as a PURE-PLAN literal relation: createDataFrame on
    a Python list runs a driver RDD job per call (~0.4s of serial latency on
    every query); exploding a literal array costs nothing until the
    broadcast build and never touches the Python-RDD path."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"), F.lit(int(w)).cast("int").alias("wqf")
            )
            for t, w in terms.items()
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(entries).alias("e"))
        .select("e.term", "e.wqf")
    )


def _termweight(df_col: Column, n_docs: int, wqf: Column) -> Column:
    tw = (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5)
    tw = F.when(tw < 2.0, tw * 0.5 + 1.0).otherwise(tw)
    wqf_factor = (F.lit(K3 + 1) * wqf) / (F.lit(K3) + wqf)
    return F.log(tw) * wqf_factor * F.lit(K1 + 1)


def score_terms(
    index: InvertedIndex,
    terms: list[str] | dict[str, int],
    with_nsub: bool = False,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """BM25 match set for a bag of index terms -> (doc, score).

    ``terms`` maps term -> wqf (within-query frequency); a list means wqf=1
    each. Terms are index-vocabulary terms (callers pre-stem free text with
    stem_query_term / prefix field terms).

    ``with_nsub=True`` adds an ``n_sub`` column — the number of query terms
    the doc matched — which with_percent() needs for the reference's
    matched-subquery percent scaling (multimatch.cc:913-914). Off by default
    so boolean combinators keep a uniform (doc, score) shape.

    ``candidates``: optional (doc) DataFrame; when given, scoring is
    restricted to these docs via a semi-join on the postings scan (the WAND
    candidate-pruning hook — see top_k_wand).
    """
    if isinstance(terms, list):
        terms = {t: 1 for t in terms}
    if not terms:
        out = _empty_matches(index)
        return out.withColumn("n_sub", F.lit(0)) if with_nsub else out
    term_list = list(terms)
    qdf = _literal_qterms(index.postings.sparkSession, terms)
    # tiny build side: broadcast term stats + query terms into the postings
    # scan. The static IN filter is semantically redundant with the join but
    # REACHES THE PARQUET SCAN as a pushed filter (the join key alone never
    # pushes), so over a written term-sorted index the row-group stats skip
    # every non-matching group — the B-tree-seek analogue; without it every
    # query is a full postings scan.
    weights = (
        index.term_stats.filter(F.col("term").isin(term_list))
        .join(F.broadcast(qdf), "term")
        .withColumn("termweight", _termweight(F.col("df"), index.n_docs, F.col("wqf")))
        .select("term", "termweight")
    )
    avg_len = index.avg_len if index.avg_len > 0 else 1.0
    normlen = F.greatest(F.col("doclen") / F.lit(avg_len), F.lit(MIN_NORMLEN))
    denom = F.lit(K1) * (normlen * F.lit(B) + F.lit(1 - B)) + F.col("wdf")
    part = F.col("termweight") * (F.col("wdf") / denom)
    aggs = [F.sum("part").alias("score")]
    if with_nsub:
        aggs.append(F.count(F.lit(1)).cast("int").alias("n_sub"))
    postings = index.postings.filter(F.col("term").isin(term_list))
    if candidates is not None:
        postings = postings.join(candidates.select("doc"), "doc", "left_semi")
    scored = postings.join(F.broadcast(weights), "term")
    if "doclen" not in postings.columns:
        # legacy layout without denormalized doclen: join doc_stats
        scored = scored.join(index.doc_stats, "doc")
    return scored.withColumn("part", part).groupBy("doc").agg(*aggs)


def score_terms_all(
    index: InvertedIndex, terms: list[str] | dict[str, int]
) -> DataFrame:
    """AND of leaf terms in ONE postings scan: same (doc, score) as folding
    op_and over per-term match sets — score is the sum of per-term BM25
    parts, docs restricted to those matching every term — but the postings
    table is scanned once (filter term IN (...), groupBy doc, HAVING
    count = |terms|) instead of once per term. The Executor fuses Bool AND
    over term leaves into this plan."""
    if isinstance(terms, list):
        terms = {t: 1 for t in terms}
    if not terms:
        return _empty_matches(index)
    scored = score_terms(index, terms, with_nsub=True)
    return scored.filter(F.col("n_sub") == len(terms)).select("doc", "score")


def score_free_text(index: InvertedIndex, text: str) -> DataFrame:
    """Free-text query: tokenize+stem each word, OR-fold (Q13/Q20)."""
    from ..functions.tokenizer import scan_terms

    terms: dict[str, int] = {}
    for t in scan_terms(text):
        zt = stem_query_term(t)
        terms[zt] = terms.get(zt, 0) + 1
    return score_terms(index, terms)


def _empty_matches(index: InvertedIndex) -> DataFrame:
    return index.doc_stats.select("doc", F.lit(0.0).alias("score")).limit(0)


# ---------------------------------------------------------------- boolean ops
# Match sets are (doc, score) DataFrames. Engine semantics per
# XC include/xapian/query.h:84-230 (SURVEY.md §2.4).


def op_and(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q1: intersection, weights summed."""
    r = right.withColumnRenamed("score", "rscore")
    return left.join(r, "doc").select(
        "doc", (F.col("score") + F.col("rscore")).alias("score")
    )


def op_or(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q2: union, weights summed."""
    return (
        left.unionByName(right).groupBy("doc").agg(F.sum("score").alias("score"))
    )


def op_and_not(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q3: left minus right, left weights."""
    return left.join(right, "doc", "left_anti")


def op_xor(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q4: symmetric difference; the surviving side's weight."""
    l = left.select("doc", F.col("score").alias("lscore"))
    r = right.select("doc", F.col("score").alias("rscore"))
    j = l.join(r, "doc", "full_outer")
    return j.filter(
        F.col("lscore").isNull() != F.col("rscore").isNull()
    ).select("doc", F.coalesce("lscore", "rscore").alias("score"))


def op_and_maybe(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q5: docs of left; weight left + right-if-matched."""
    r = right.select("doc", F.col("score").alias("rscore"))
    return left.join(r, "doc", "left_outer").select(
        "doc", (F.col("score") + F.coalesce(F.col("rscore"), F.lit(0.0))).alias("score")
    )


def op_filter(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q6: intersection, weight from left only."""
    return left.join(right.select("doc"), "doc", "left_semi")


def op_scale(m: DataFrame, factor: float) -> DataFrame:
    """Q10: multiply weights."""
    return m.select("doc", (F.col("score") * F.lit(float(factor))).alias("score"))


def op_max(left: DataFrame, right: DataFrame) -> DataFrame:
    """OP_MAX (XC include/xapian/query.h OP_MAX, matcher/maxpostlist.cc):
    union of the match sets, weight = MAX of the matching subqueries'
    weights — the operator modern Xapian uses for wildcard expansion so a
    document matching many expansions isn't over-rewarded. Linked by the
    reference's engine; exposed here as a first-class combinator."""
    return (
        left.unionByName(right).groupBy("doc").agg(F.max("score").alias("score"))
    )


def op_max_terms(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Multi-way OP_MAX over term leaves in ONE postings scan: union of the
    per-term match sets, weight = MAX single-term BM25 score — an
    alternative combiner Xapian supports for wildcard expansion (the
    queryparser's default for OP_WILDCARD is OP_SYNONYM; OP_MAX is the
    opt-in variant that stops a doc hitting many expansions being
    over-rewarded; XC matcher/maxpostlist.cc). The per-posting BM25 part IS
    the single-term score, so groupBy(doc).max(part) beats folding op_max
    over |expansion| separate scans — scan volume constant in expansion
    width, one shuffle total."""
    if not terms:
        return _empty_matches(index)
    term_list = list(dict.fromkeys(terms))
    qdf = _literal_qterms(index.postings.sparkSession, {t: 1 for t in term_list})
    weights = (
        index.term_stats.filter(F.col("term").isin(term_list))
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "termweight", _termweight(F.col("df"), index.n_docs, F.lit(1))
        )
        .select("term", "termweight")
    )
    avg_len = index.avg_len if index.avg_len > 0 else 1.0
    normlen = F.greatest(F.col("doclen") / F.lit(avg_len), F.lit(MIN_NORMLEN))
    denom = F.lit(K1) * (normlen * F.lit(B) + F.lit(1 - B)) + F.col("wdf")
    scored = index.postings.filter(F.col("term").isin(term_list)).join(
        F.broadcast(weights), "term"
    )
    if "doclen" not in index.postings.columns:
        scored = scored.join(index.doc_stats, "doc")
    part = F.col("termweight") * (F.col("wdf") / denom)
    return scored.withColumn("part", part).groupBy("doc").agg(
        F.max("part").alias("score")
    )


def value_weight_matches(
    docs: DataFrame, key: str, value_col: str, scale: float = 1.0
) -> DataFrame:
    """ValueWeightPostingSource (XC api/postingsource.cc ValueWeightPostingSource,
    include/xapian/postingsource.h): a match set whose weight IS a document
    value — every doc whose value casts to a number matches, scored
    scale*value (uncastable/null values drop, the TRY_CAST semantics the
    oracle mirrors). Combined with a text query via AND_MAYBE this is
    Xapian's standard recency/popularity boost; pure map over the docs
    scan, no shuffle."""
    c = F.col(value_col).cast("double")
    return docs.filter(c.isNotNull()).select(
        F.col(key).alias("doc"), (F.lit(float(scale)) * c).alias("score")
    )


def op_pure_not(index: InvertedIndex, m: DataFrame) -> DataFrame:
    """Q17: all docs minus matches, weight 0 (boolean)."""
    return index.doc_stats.select("doc").join(m, "doc", "left_anti").select(
        "doc", F.lit(0.0).alias("score")
    )


# ----------------------------------------------------------- positional ops


def _positions_for(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """doc rows carrying one positions array column per query term (p0..pn-1),
    restricted to docs containing ALL terms — as ONE postings scan
    (term IN (...) + groupBy doc with a per-term positions pivot) instead of
    one filtered scan per term chained through M-1 self-joins: scan volume
    is constant in M and a single aggregation replaces the join shuffles.
    Duplicate query terms (e.g. a repeated phrase word) share the scanned
    positions array, exactly as the join form duplicated it."""
    uniq = list(dict.fromkeys(terms))
    sub = index.postings.filter(F.col("term").isin(uniq)).select(
        "doc", "term", "positions"
    )
    aggs = [
        F.first(
            F.when(F.col("term") == t, F.col("positions")), ignorenulls=True
        ).alias(f"u{i}")
        for i, t in enumerate(uniq)
    ]
    # postings are unique per (doc, term), so count(*) == matched term count
    agg = (
        sub.groupBy("doc")
        .agg(*aggs, F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == len(uniq))
    )
    pos_of = {t: f"u{i}" for i, t in enumerate(uniq)}
    return agg.select(
        "doc", *[F.col(pos_of[t]).alias(f"p{i}") for i, t in enumerate(terms)]
    )


def match_phrase(index: InvertedIndex, terms: list[str], score: bool = True) -> DataFrame:
    """Q8 PHRASE: consecutive positions in order (exactphrasepostlist
    semantics). The position check is a chain of shifted array_intersects —
    term k's positions shifted by -k, all intersected with term 0's: a doc
    matches iff the intersection is non-empty. Each pairwise intersect is a
    hash build over the smaller array, so per-doc cost is linear in total
    positions (the sorted-merge cost profile of Xapian's phrase postlist),
    not |p0| x sum|pk| as a nested exists/array_contains would be."""
    if not terms:
        raise ValueError("empty phrase")
    j = _positions_for(index, terms)
    if j is None:
        raise ValueError("empty phrase")
    if len(terms) == 1:
        matched = j.select("doc")
    else:
        # closure factory, not a default-arg lambda: pyspark derives HOF
        # arity from the signature, so a 2-param lambda would get (elem, idx)
        def shift_by(off: int):
            return lambda x: x - off

        inter = F.col("p0")
        for k in range(1, len(terms)):
            inter = F.array_intersect(
                inter, F.transform(F.col(f"p{k}"), shift_by(k))
            )
        matched = j.filter(F.size(inter) > 0).select("doc")
    if not score:
        return matched.select("doc", F.lit(0.0).alias("score"))
    scored = score_terms(index, list(dict.fromkeys(terms)))
    return scored.join(matched, "doc", "left_semi")


def match_near(
    index: InvertedIndex, terms: list[str], window: int | None = None,
    score: bool = True,
) -> DataFrame:
    """Q7 NEAR: all terms within a ``window``-wide span, any order
    (nearpostlist semantics: max(pos)-min(pos) < window). The default
    reproduces the QueryParser's sizing: "a NEAR b" means "a within 10 terms
    of b" = window 11, plus one per extra term — w = (10-1) + n_terms
    (XC queryparser/queryparser.lemony:1722-1730, as_opwindow_query :1655-1658).
    """
    if window is None:
        window = 9 + len(terms)
    if len(terms) < 2:
        raise ValueError("NEAR needs >= 2 terms")
    j = _positions_for(index, terms)
    k = len(terms)

    # Sorted-merge sweep (the plan Xapian's nearpostlist runs): merge all
    # terms' positions into one sorted (pos, term) list, then one aggregate()
    # pass tracking the last-seen position per term; a span [min(last),
    # current] < window at any step means a valid selection exists. Linear in
    # total positions — replaces the nested exists whose cost was
    # O(prod |positions|) on long documents.
    def tag_with(i: int):
        return lambda x: F.struct(
            x.cast("long").alias("pos"), F.lit(i).cast("int").alias("t")
        )

    tagged = [F.transform(F.col(f"p{i}"), tag_with(i)) for i in range(k)]
    merged = F.sort_array(F.concat(*tagged))
    init = F.struct(
        F.lit(False).alias("found"),
        *[F.lit(None).cast("long").alias(f"l{i}") for i in range(k)],
    )

    def step(acc: Column, e: Column) -> Column:
        lasts = [
            F.when(e["t"] == i, e["pos"]).otherwise(acc[f"l{i}"]) for i in range(k)
        ]
        all_seen = lasts[0].isNotNull()
        for l in lasts[1:]:
            all_seen = all_seen & l.isNotNull()
        hit = all_seen & ((e["pos"] - F.least(*lasts)) < F.lit(window))
        return F.struct(
            (acc["found"] | hit).alias("found"),
            *[l.alias(f"l{i}") for i, l in enumerate(lasts)],
        )

    matched = j.filter(F.aggregate(merged, init, step)["found"]).select("doc")
    if not score:
        return matched.select("doc", F.lit(0.0).alias("score"))
    scored = score_terms(index, list(dict.fromkeys(terms)))
    return scored.join(matched, "doc", "left_semi")


def match_adj(
    index: InvertedIndex, terms: list[str], window: int | None = None,
    score: bool = True,
) -> DataFrame:
    """ADJ: all terms IN ORDER within a ``window``-wide span — Xapian lowers
    ADJ to OP_PHRASE with a widened window (queryparser.lemony:1732-1740
    as_adj_query), whose matcher semantics (XC matcher/phrasepostlist.cc
    test_doc) are: there exist strictly-increasing positions q0 < q1 < ... <
    q_{k-1}, one per term in query order, with q_{k-1} - q0 < window.
    Default window mirrors NEAR's sizing: "a ADJ b" = "a at most 10 terms
    before b" = (10 - 1) + n_terms.

    Same fused single-postings-scan shape as NEAR/PHRASE (_positions_for),
    with one linear aggregate() pass over the doc's merged sorted positions:
    for each prefix of the term sequence we track the MAXIMUM chain start
    q0 among in-order chains ending before the current position (the only
    cross-position state the span check needs — intermediate gaps are
    unconstrained), and test the span when the final term extends a chain.
    Ties in position (a term ADJ itself) sort the HIGHER term index first,
    so a single occurrence can never chain with itself."""
    if window is None:
        window = 9 + len(terms)
    if len(terms) < 2:
        raise ValueError("ADJ needs >= 2 terms")
    j = _positions_for(index, terms)
    k = len(terms)

    def tag_with(i: int):
        # rt = k-1-i: descending term index within a position tie, so the
        # fold consumes m_{i-1} from strictly-earlier positions only
        return lambda x: F.struct(
            x.cast("long").alias("pos"), F.lit(k - 1 - i).cast("int").alias("rt")
        )

    tagged = [F.transform(F.col(f"p{i}"), tag_with(i)) for i in range(k)]
    merged = F.sort_array(F.concat(*tagged))
    init = F.struct(
        F.lit(False).alias("found"),
        *[F.lit(None).cast("long").alias(f"m{i}") for i in range(k)],
    )

    def step(acc: Column, e: Column) -> Column:
        t = F.lit(k - 1) - e["rt"]
        # m_i = max start q0 over in-order chains of terms 0..i seen so far
        new_m = [F.when(t == 0, F.greatest(F.coalesce(acc["m0"], e["pos"]), e["pos"])).otherwise(acc["m0"])]
        for i in range(1, k):
            ext = F.when(
                (t == i) & acc[f"m{i - 1}"].isNotNull(),
                F.greatest(F.coalesce(acc[f"m{i}"], acc[f"m{i - 1}"]), acc[f"m{i - 1}"]),
            ).otherwise(acc[f"m{i}"])
            new_m.append(ext)
        hit = (
            (t == k - 1)
            & acc[f"m{k - 2}"].isNotNull()
            & ((e["pos"] - acc[f"m{k - 2}"]) <= F.lit(window - 1))
        )
        return F.struct(
            (acc["found"] | hit).alias("found"),
            *[m.alias(f"m{i}") for i, m in enumerate(new_m)],
        )

    matched = j.filter(F.aggregate(merged, init, step)["found"]).select("doc")
    if not score:
        return matched.select("doc", F.lit(0.0).alias("score"))
    scored = score_terms(index, list(dict.fromkeys(terms)))
    return scored.join(matched, "doc", "left_semi")


# ------------------------------------------------------------- synonym/elite


def op_synonym(index: InvertedIndex, terms: list[str], wqf: int = 1) -> DataFrame:
    """Q12 SYNONYM: match like OR but weight as a single pseudo-term whose
    postings are the merged member postings (synonympostlist.cc semantics,
    with df = docs matching any member, wdf summed)."""
    sub = index.postings.filter(F.col("term").isin(terms))
    has_doclen = "doclen" in sub.columns
    aggs = [F.sum("wdf").cast("int").alias("wdf")]
    if has_doclen:  # denormalized doclen: no doc_stats join below
        aggs.append(F.max("doclen").alias("doclen"))
    merged = sub.groupBy("doc").agg(*aggs)
    # The pseudo-term's df (docs matching any member) is folded into the plan
    # as a broadcast 1-row scalar instead of an eager .count(): no extra
    # driver-synchronized job per query, and no re-execution of the merge
    # subplan in the returned DataFrame (FLAG_PARTIAL hits this per keystroke).
    syn_df = merged.agg(F.count(F.lit(1)).cast("double").alias("_syn_df"))
    tw = _termweight(F.col("_syn_df"), index.n_docs, F.lit(float(wqf)))
    avg_len = index.avg_len if index.avg_len > 0 else 1.0
    normlen = F.greatest(F.col("doclen") / F.lit(avg_len), F.lit(MIN_NORMLEN))
    denom = F.lit(K1) * (normlen * F.lit(B) + F.lit(1 - B)) + F.col("wdf")
    out = merged.crossJoin(F.broadcast(syn_df))
    if not has_doclen:
        out = out.join(index.doc_stats, "doc")
    return out.select("doc", (tw * (F.col("wdf") / denom)).alias("score"))


def expand_wildcard(index: InvertedIndex, prefix: str, limit: int = 1000) -> list[str]:
    """Q15: term-dictionary expansion of a trailing-* pattern. Bounded collect
    of matching vocabulary terms (ordered by df desc, then term, for a
    deterministic cap)."""
    rows = (
        index.term_stats.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def op_elite_set(index: InvertedIndex, terms: list[str], n: int) -> DataFrame:
    """Q11 ELITE: keep the N subterms with the highest max-weight estimate,
    then OR them — Xapian ranks elite candidates by each subquery's
    ``get_maxweight()`` (XC api/queryinternal.cc QueryEliteSet::done), which
    for a term is the BM25 ceiling we already store for WAND
    (term_stats.max_wdf → _term_upper_bounds), NOT raw rarity: a common but
    bursty term (huge max_wdf) can outrank a rare flat one. Ties break by
    term asc for determinism."""
    ubs = _term_upper_bounds(index, {t: 1 for t in terms})
    keep = [t for t in sorted(ubs, key=lambda t: (-ubs[t], t))[:n]]
    return score_terms(index, keep)


def spelling_query_fragments(w: str) -> list[str]:
    """Query-side spelling fragments — the probe set
    GlassSpellingTable::open_termlist builds (glass_spelling.cc): the H/T/
    B/M fragments of the word itself, plus for 3-char words the two
    single-transposition middle forms (ABC -> BAC, ACB) and for 2-char
    words the transposed head/tail, so one-transposition misspellings of
    short words still block to their correction. Index-side fragments are
    generated by operators/index.py::_FRAG_EXPR."""
    if len(w) < 2:  # Xapian asserts word.size() > 1
        return []
    frags = {"H" + w[:2], "T" + w[-2:]}
    if len(w) <= 4:
        frags.add("B" + w[0] + w[-1])
    if len(w) > 2:
        for i in range(len(w) - 2):
            frags.add("M" + w[i : i + 3])
    if len(w) == 3:
        frags.add("M" + w[1] + w[0] + w[2])  # ABC -> BAC
        frags.add("M" + w[0] + w[2] + w[1])  # ABC -> ACB
    if len(w) == 2:
        frags.add("H" + w[1] + w[0])
        frags.add("T" + w[1] + w[0])
    return sorted(frags)


def osa_distance(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment): adjacent
    transposition costs 1 — Xapian's spelling metric
    (XC spelling/editdistance.cc), unlike plain levenshtein where a swap
    costs 2 ('teh' -> 'the' is distance 1 here, 2 there)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb]


def _osa_udf_impl(word, term):
    import pandas as pd

    return pd.Series(
        [osa_distance(w, t) for w, t in zip(word, term)], dtype="int32"
    )


# DataType instance (not a DDL string) so the UDF registers at import time
# without an active SparkSession. Marked non-deterministic although it is
# pure: Catalyst substitutes deterministic expressions through projections,
# so a filter + an aggregate both referencing the distance column would each
# get their own ArrowEvalPython stage (two Python round trips per query);
# the marker pins a single evaluation.
from pyspark.sql.types import IntegerType as _IntegerType  # noqa: E402

_osa_udf = F.pandas_udf(_osa_udf_impl, _IntegerType()).asNondeterministic()


def spelling_suggestions(
    index: InvertedIndex,
    words: list[str],
    max_distance: int = 2,
    min_df: int = 1,
) -> DataFrame:
    """Q19 for real: the reference sets FLAG_SPELLING_CORRECTION but never
    populates a spelling dictionary, so it is a silent no-op
    (SURVEY.md §2.3 K12 / §2.4 Q19). Here the term dictionary IS the
    spelling dictionary: candidate vocabulary terms are blocked by sharing a
    spelling fragment with the query word — xapian's own H/T/B/M fragment
    scheme (glass_spelling.cc: head, tail, bookends for <=4-char words,
    middle trigrams, plus the transposed-form probes open_termlist adds for
    2- and 3-char query words, so 'teh' finds 'the') — then ranked by
    restricted Damerau-Levenshtein distance (transposition costs 1 —
    XC spelling/editdistance.cc, computed by an Arrow-batched pandas UDF
    over the bounded fragment-blocked candidate set), then collection
    frequency.

    Returns (word, suggestion, distance, df): the best suggestion per query
    word (distance <= max_distance, most frequent on ties, lexicographic
    final tie-break). Scales: the PERSISTENT fragment table
    (index.spelling_table() — written by InvertedIndex.write, xapian's
    spelling-B-tree analogue) replaces the former per-query full-vocabulary
    explode; the query words' fragments are known driver-side, so the probe
    is a pushed frag IN (...) point lookup over the fragment-clustered
    table. Everything else is JVM-side; the distance UDF only ever sees the
    fragment-blocked candidates.
    """
    spark = index.postings.sparkSession

    qfrags = sorted({f for w in words for f in spelling_query_fragments(w)})
    vocab_frag = index.spelling_table().filter(F.col("frag").isin(qfrags))
    if min_df > 1:
        vocab_frag = vocab_frag.filter(F.col("df") >= min_df)
    # literal relation (no per-keystroke driver RDD job — cf. _literal_qterms)
    pairs = F.array(
        *[
            F.struct(F.lit(w).alias("word"), F.lit(f).alias("frag"))
            for w in words
            for f in spelling_query_fragments(w)
        ]
    )
    q_frag = (
        spark.range(1)
        .select(F.explode(pairs).alias("e"))
        .select("e.word", "e.frag")
    )
    # Best suggestion per word as ONE aggregation: min of a sort-key struct
    # (distance asc, df desc via negation, term asc) — lexicographic struct
    # ordering IS the ranking rule, so no distinct (duplicate candidate
    # rows from shared fragments collapse in the min), no window, no extra
    # exchanges: join -> UDF projection -> groupBy(word). An earlier
    # distinct+row_number() shape planned 6 stages and re-evaluated the
    # Arrow UDF in each window pass — 10-20x this plan's serving latency.
    cand = (
        vocab_frag.join(F.broadcast(q_frag), "frag")
        .select("word", "term", "df")
        .withColumn("distance", _osa_udf("word", "term"))
        .filter(
            (F.col("distance") <= max_distance) & (F.col("distance") > 0)
        )
    )
    best = cand.groupBy("word").agg(
        F.min(
            F.struct(
                F.col("distance"),
                (-F.col("df")).alias("neg_df"),
                F.col("term"),
                F.col("df"),
            )
        ).alias("b")
    )
    return best.select(
        "word",
        F.col("b.term").alias("suggestion"),
        F.col("b.distance").alias("distance"),
        F.col("b.df").alias("df"),
    )


# ------------------------------------------------------------------- ranking


def top_k(matches: DataFrame, k: int = PAGE_SIZE, key: str = "doc") -> DataFrame:
    """R5/R6: bounded ranked page; ties break by ascending doc key."""
    return matches.orderBy(F.desc("score"), F.asc(key)).limit(k)


def _term_upper_bounds(index: InvertedIndex, terms: dict[str, int]) -> dict[str, float]:
    """Per-term BM25 score ceiling from the stored term_stats.max_wdf (the
    WAND max-score bound — Broder et al. CIKM'03; Xapian stores the same
    bound as wdf_upper_bound). The per-posting part is increasing in wdf and
    decreasing in normlen, so the max is at wdf=max_wdf, normlen=MIN_NORMLEN."""
    import math

    rows = (
        index.term_stats.filter(F.col("term").isin(list(terms)))
        .select("term", "df", "max_wdf")
        .collect()  # bounded: |query terms| rows, same dictionary read Xapian does
    )
    ubs: dict[str, float] = {}
    for r in rows:
        tw = (index.n_docs - r["df"] + 0.5) / (r["df"] + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        wqf = terms[r["term"]]
        termweight = math.log(tw) * ((K3 + 1) * wqf / (K3 + wqf)) * (K1 + 1)
        denom = K1 * (MIN_NORMLEN * B + (1 - B)) + r["max_wdf"]
        ubs[r["term"]] = termweight * r["max_wdf"] / denom
    return ubs


def top_k_wand(
    index: InvertedIndex,
    terms: list[str] | dict[str, int],
    k: int = PAGE_SIZE,
) -> DataFrame:
    """Exact top-k OR query with WAND-style candidate pruning — the batch
    analogue of Xapian's matcher max-weight short-circuiting
    (XC matcher/multimatch.cc min_weight management), using the max_wdf
    bound the index already stores (operators/index.py term_stats).

    Two phases, both exact:
      1. threshold: score ONLY the highest-ceiling term and take its k-th
         best score tau. Every doc's final score >= its partial score, so
         the true k-th best final score >= tau.
      2. prune: order terms by ceiling desc, keep the minimal prefix P with
         sum(ceilings outside P) < tau. A doc matching no term of P scores
         < tau and cannot reach the page; docs matching P are the candidate
         set (semi-join), scored fully over all terms.

    On skewed queries (rare term + stopword-ish terms) this turns the
    groupBy over the stopword's full posting list into one over the rare
    term's candidates.

    ONE driver round-trip (r4 verdict #8): only the bounded
    ``_term_upper_bounds`` dictionary read collects (Xapian reads the same
    term stats from its B-tree headers). tau is NOT collected — it rides
    the plan as a broadcast 1-row aggregate (k-th best partial score of the
    highest-ceiling term), and prefix membership becomes a per-term
    CONSTANT: in ceiling-descending order, term t is in the prune prefix
    iff ``rest_from[t]`` (the driver-known sum of ceilings from t onward)
    ``>= tau - margin``. The candidate branch joins each posting to its
    term's rest_from literal, cross-joins broadcast tau, and filters —
    non-prefix postings die map-side right after the broadcast joins, so
    the candidate DISTINCT and the scoring groupBy still shuffle only
    prefix-matched docs. Trade vs the two-job form: the candidate branch
    map-scans all query terms' postings instead of only the prefix's (the
    prefix isn't known at plan time), but that scan is shuffle-free and the
    pushed ``term IN`` filter still skips every non-query row group; the
    saved ~0.3s driver sync dominates at serving latency. When tau
    resolves to 0 (fewer than k matches) or every ceiling is needed, the
    filter passes everything and the plan degrades to the exact OR — same
    results, no special-case fallback."""
    if isinstance(terms, list):
        terms = {t: 1 for t in terms}
    ubs = _term_upper_bounds(index, terms)
    if not ubs:
        return top_k(_empty_matches(index), k)
    live = {t: w for t, w in terms.items() if t in ubs}
    best = max(ubs, key=lambda t: ubs[t])
    order = sorted(ubs, key=lambda t: ubs[t], reverse=True)
    rest_from: dict[str, float] = {}
    rest = sum(ubs.values())
    for t in order:
        rest_from[t] = rest
        rest -= ubs[t]
    spark = index.postings.sparkSession
    # k-th best single-term partial score as a broadcast scalar: a valid
    # lower bound on the true k-th best final score (every doc's final
    # score >= its partial). Fewer than k matches -> tau = 0 (no pruning).
    tau_df = (
        score_terms(index, {best: live[best]})
        .orderBy(F.desc("score"))
        .limit(k)
        .agg(
            F.coalesce(
                F.when(F.count(F.lit(1)) == k, F.min("score")), F.lit(0.0)
            ).alias("_tau")
        )
    )
    rf_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.lit(float(rest_from[t])).alias("_rest_from"),
            )
            for t in order
        ]
    )
    rf_df = (
        spark.range(1)
        .select(F.explode(rf_entries).alias("e"))
        .select("e.term", "e._rest_from")
    )
    # float-accumulation safety margin on the bound, as an expression of tau
    margin = F.lit(1e-9) * (F.lit(1.0) + F.abs(F.col("_tau")))
    cand = (
        index.postings.filter(F.col("term").isin(order))
        .select("doc", "term")
        .join(F.broadcast(rf_df), "term")
        .crossJoin(F.broadcast(tau_df))
        .filter(F.col("_rest_from") >= F.col("_tau") - margin)
        .select("doc")
        .distinct()
    )
    return top_k(score_terms(index, live, candidates=cand), k)


# 100 * DBL_EPSILON — the excess-precision nudge of omenquire.cc:338
_PCT_EPS = 100.0 * 2.220446049250313e-16


def with_percent(matches: DataFrame, total_subqs: int | None = None) -> DataFrame:
    """R8: the reference's exact percent conversion (omenquire.cc:332-347 +
    multimatch.cc:902-916):

        percent_factor = (subqs matched by the top doc / total_subqs)
                         / greatest_wt * 100
        pcent = clamp(int(wt * percent_factor + 100*DBL_EPSILON), 0, 100)
        pcent == 0 and wt > 0  ->  1

    Truncation (floor), not ceil; the top document only reaches 100 if it
    matched every subquery. The matched-subquery fraction needs an ``n_sub``
    column (score_terms(..., with_nsub=True)) and ``total_subqs``; without
    them the fraction is 1 (single-term queries are unaffected).

    Scale: the top row (greatest weight + its n_sub) is a bounded
    TakeOrdered(1) broadcast-cross-joined into the plan — no global window,
    no single-partition shuffle of the match set.
    """
    use_frac = total_subqs and "n_sub" in matches.columns
    top1 = matches.orderBy(F.desc("score"), F.asc("doc")).limit(1)
    if use_frac:
        top1 = top1.select(
            F.col("score").alias("_max_score"),
            (F.col("n_sub").cast("double") / F.lit(float(total_subqs))).alias("_frac"),
        )
    else:
        top1 = top1.select(
            F.col("score").alias("_max_score"), F.lit(1.0).alias("_frac")
        )
    v = (
        F.col("score") * F.lit(100.0) * F.col("_frac") / F.col("_max_score")
        + F.lit(_PCT_EPS)
    )
    pcent = F.least(F.lit(100), F.floor(v).cast("int"))
    pcent = F.when((pcent <= 0) & (F.col("score") > 0), F.lit(1)).otherwise(
        F.greatest(pcent, F.lit(0))
    )
    return (
        matches.crossJoin(F.broadcast(top1))
        .withColumn("percent", pcent)
        .drop("_max_score", "_frac")
    )


def collapse(
    matches: DataFrame, key_col: str, collapse_max: int = 1, salt: int = 0
) -> DataFrame:
    """R9: keep <= collapse_max best docs per key value (collapser.cc).

    ``salt > 0`` enables the skew-safe two-phase form for hot collapse keys
    (one host dominating a crawl slice): phase 1 takes the per-(key, salt)
    top rows — spreading a hot key over ``salt`` partitions — and phase 2
    collapses the <= salt * collapse_max survivors per key. Identical
    results (top-m of a union of per-part top-ms is the global top-m);
    equality is pinned in tests."""
    from pyspark.sql.window import Window

    out = matches
    if salt > 0:
        w1 = Window.partitionBy(key_col, "_salt").orderBy(
            F.desc("score"), F.asc("doc")
        )
        out = (
            out.withColumn(
                "_salt", F.pmod(F.xxhash64("doc"), F.lit(salt)).cast("int")
            )
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= collapse_max)
            .drop("_rn", "_salt")
        )
    w = Window.partitionBy(key_col).orderBy(F.desc("score"), F.asc("doc"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= collapse_max)
        .drop("_rn")
    )


def cutoff(
    matches: DataFrame,
    weight_cutoff: float = 0.0,
    percent_cutoff: int = 0,
    total_subqs: int | None = None,
) -> DataFrame:
    """R11: drop matches below thresholds (percent per with_percent)."""
    out = matches
    if weight_cutoff > 0:
        out = out.filter(F.col("score") >= weight_cutoff)
    if percent_cutoff > 0:
        out = (
            with_percent(out, total_subqs=total_subqs)
            .filter(F.col("percent") >= percent_cutoff)
            .drop("percent")
        )
    return out


def fetch_documents(matches: DataFrame, docs: DataFrame, key: str) -> DataFrame:
    """S6: join the (small) ranked page back to the docs table — Catalyst
    broadcasts the top-k side."""
    return docs.join(F.broadcast(matches), on=docs[key] == matches["doc"]).drop("doc")


def expand_terms(
    index: InvertedIndex,
    rset: DataFrame,
    max_esize: int = 10,
    expand_k: float = 1.0,
    exclude: list[str] | None = None,
    min_wt: float = 0.0,
    scheme: str = "trad",
) -> DataFrame:
    """ESet query expansion — ``Enquire::get_eset`` (XC api/omenquire.cc:
    586-640, expand loop esetinternal.cc:150-210) with BOTH of Xapian's
    expansion schemes, reproduced exactly:

    ``scheme="trad"`` (the default, tradeweight.cc:31-41):
      per relevant doc containing t (expandweight.h ExpandStats::accumulate):
        multiplier += (k+1)*wdf / (k*doclen/avlen + wdf)   [wdf 0 -> 1]
      per candidate term:
        tw = ln( (r+0.5)(N - n - (R-r) + 0.5) / ((n-r+0.5)(R-r+0.5)) )
        wt = multiplier * tw
      r = relevant docs containing t, n = df(t), N = collection size,
      R = |rset|.

    ``scheme="bo1"`` (Bose-Einstein 1, bo1eweight.cc:31-41):
        mean = cf(t) / N
        wt = rcf * log2((1 + mean) / mean) + log2(1 + mean)
      rcf = sum of wdf of t over the relevant docs
      (ExpandStats.rcollection_freq).

    Both: keep wt > min_wt; query terms excluded
    (ExpandDeciderFilterTerms) via ``exclude``.

    The reference links this engine op but never surfaces it in the TUI;
    exposed here as the relevance-feedback operator a retrieval pipeline
    needs. Plan shape: the rset is a broadcast semi-join into one postings
    scan, the aggregation is map-side-combined per term, and the result is
    a bounded top-``max_esize`` — no driver-side iteration over candidates
    (Xapian walks a termlist tree; the DataFrame form is the same math as
    one scan + one groupBy)."""
    rel = F.broadcast(rset.select("doc").distinct())  # RSet semantics: a SET
    # R = |rset| rides the plan as a broadcast 1-row scalar — the op_synonym
    # pattern: no eager driver-synchronized count per query. An empty rset
    # yields an empty contrib/cand chain, hence an empty result.
    rsize_df = rel.agg(F.count(F.lit(1)).cast("double").alias("_rsize"))
    avg_len = index.avg_len if index.avg_len > 0 else 1.0
    wdf_adj = F.greatest(F.col("wdf"), F.lit(1))
    m = (F.lit(expand_k + 1) * wdf_adj) / (
        F.lit(expand_k) * F.col("doclen") / F.lit(avg_len) + wdf_adj
    )
    contrib = index.postings.join(rel, "doc", "left_semi")
    if "doclen" not in contrib.columns:
        contrib = contrib.join(index.doc_stats, "doc")
    # aggregate only what the chosen scheme reads (a dead crossJoin or
    # aggregate is not pruned by Catalyst once multiplicity changes)
    if scheme == "bo1":
        contrib = contrib.select(
            "term", F.greatest(F.col("wdf"), F.lit(1)).alias("w")
        )
        cand = contrib.groupBy("term").agg(F.sum("w").alias("rcf"))
    elif scheme == "trad":
        contrib = contrib.select("term", m.alias("m"))
        cand = contrib.groupBy("term").agg(
            F.sum("m").alias("multiplier"), F.count(F.lit(1)).alias("r")
        )
    else:
        raise ValueError(f"unknown expansion scheme {scheme!r}")
    if exclude:
        cand = cand.filter(~F.col("term").isin(list(exclude)))
    if scheme == "bo1":
        # log2 via ln(x) * (1/ln 2) with an identical literal on the SQL
        # side: Spark's and DuckDB's log2 intrinsics disagree in the last
        # ulp ~400x more often than their ln does, which matters for the
        # exact-integer micro comparison
        inv_ln2 = 1.4426950408889634
        mean = F.col("cf").cast("double") / F.lit(float(index.n_docs))
        wt_expr = (
            F.col("rcf").cast("double") * (F.log((1.0 + mean) / mean) * inv_ln2)
            + F.log(1.0 + mean) * inv_ln2
        )
        scored = cand.join(index.term_stats.select("term", "cf"), "term")
    else:
        n_col = F.col("df").cast("double")
        r_col = F.col("r").cast("double")
        rel_without = F.col("_rsize") - r_col
        tw = F.log(
            ((r_col + 0.5) * (F.lit(float(index.n_docs)) - n_col - rel_without + 0.5))
            / ((n_col - r_col + 0.5) * (rel_without + 0.5))
        )
        wt_expr = F.col("multiplier") * tw
        scored = cand.join(
            index.term_stats.select("term", "df"), "term"
        ).crossJoin(F.broadcast(rsize_df))
    # top-N by the micro-integerized weight (repo convention: integerize
    # before any cross-engine comparison) with the lexical tie-break — raw
    # double ordering could disagree with the SQL oracle at the cutoff when
    # two candidates' weights differ by less than the rounding grain
    return (
        scored.select("term", wt_expr.alias("wt"))
        .filter(F.col("wt") > F.lit(float(min_wt)))
        .orderBy(F.desc(F.round(F.col("wt") * 1_000_000)), F.asc("term"))
        .limit(max_esize)
    )


def facet_counts(
    matches: DataFrame, docs: DataFrame, key: str, facet_col: str
) -> DataFrame:
    """Faceting over the FULL match set (Xapian ValueCountMatchSpy:
    api/matchspy.cc ValueCountMatchSpy::operator()) — each distinct value of
    ``facet_col`` with the number of matching documents carrying it.

    One semi-join (match set restricts the docs scan; no score shuffle — the
    spy never looks at weights) + one partial-aggregated groupBy on the
    facet value: the plan a 10^12-row corpus wants, since facet cardinality,
    not match count, bounds the final shuffle."""
    matched = docs.join(
        matches.select("doc"), on=docs[key] == matches["doc"], how="left_semi"
    )
    return matched.groupBy(F.col(facet_col).alias("value")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    k0: int = 60,
    limit: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) of BOUNDED
    ranked lists — the standard hybrid-retrieval combiner for a BM25
    keyword ranking and an embedding-ANN ranking. Each input is
    ``(name, df)`` where ``df`` has columns ``(doc_id, rank)`` and is
    already cut to a constant pool (top-POOL rows), so every join side
    here is O(pool), not corpus-scale: the fold of full-outer joins and
    the final sort all run over a few dozen rows regardless of corpus
    size — the expensive work happened inside each retriever.

    Scores are exact integers: contribution = ``10^9 div (k0 + rank)``
    summed over the lists that ranked the doc (missing list -> 0), so the
    fused ordering is engine-independent (no float summation anywhere).
    Output: ``(doc_id, <name>_rank ..., rrf_score)`` by descending fused
    score, ties to the lowest doc_id.

    The fuse itself is ONE union + ONE groupBy(doc_id) over null-padded
    rank columns (max ignores nulls), NOT a fold of full-outer joins: a
    full outer join cannot broadcast either side, so each fused list would
    add a shuffle exchange + an AQE replanning pause — measured ~3s of
    pure stage overhead on the composed hybrid plan for 40 rows of data.
    """
    assert ranked, "rrf_fuse needs at least one ranked list"
    sides = []
    for i, (_, df) in enumerate(ranked):
        cols = [F.col("doc_id")]
        for j, (n2, _) in enumerate(ranked):
            cols.append(
                (F.col("rank") if j == i else F.lit(None))
                .cast("int")
                .alias(f"{n2}_rank")
            )
        sides.append(df.select(*cols))
    allr = sides[0]
    for side in sides[1:]:
        allr = allr.unionByName(side)
    fused = allr.groupBy("doc_id").agg(
        *[F.max(f"{n}_rank").alias(f"{n}_rank") for n, _ in ranked]
    )
    score = None
    for name, _ in ranked:
        c = F.coalesce(
            F.expr(f"1000000000 div ({k0} + {name}_rank)"), F.lit(0).cast("long")
        )
        score = c if score is None else score + c
    return (
        fused.withColumn("rrf_score", score.cast("long"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(limit)
    )
