"""Deduplication operators for large-scale training-data pipelines.

All four families are pure DataFrame algebra (JVM-side, whole-stage codegen) —
no Python in the hot path. Hash primitives are md5-based so every result is
reproducible across engines (the DuckDB oracles recompute them bit-for-bit).

  exact          md5(text) grouping -> canonical doc per group
  minhash + LSH  word-shingles -> 16-permutation minhash signature -> banded
                 bucket join -> candidate pairs -> exact Jaccard verify
  simhash        60-bit sign-of-weighted-bits fingerprint from token tf
  ngram-Jaccard  shared-shingle candidate join -> exact Jaccard top pairs

Scale notes (10^12 docs):
  - minhash signature build is one explode + one groupBy(doc, seed): the
    shuffle is bounded by n_docs * n_perms rows, not by shingle count
    (map-side partial min); band join is an equi-join on (band, band_key),
    AQE handles bucket skew; hot shingles are dropped by a df cap before the
    candidate join (standard "stop-shingle" pruning).
  - simhash is ONE groupBy(doc) with 60 literal-shift conditional sums (no
    per-bit row explode, no tf pre-shuffle): the single Exchange carries one
    60-column partial row per (partition, doc), all inside codegen and
    oracle-checkable.

Tokenization here uses the SQL-expressible split (lowercase + non-alnum
separators), which equals the engine tokenizer on simple text; plug
operators.index's tokenizer UDF for full Unicode corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .skewjoin import skew_safe_count_join

N_PERMS = 16
N_BANDS = 4  # 4 bands x 4 rows
SHINGLE_K = 3


def tokens_col(text_col: str = "text") -> Column:
    """lowercase word tokens, SQL-split (matches the engine tokenizer on
    plain text; see module docstring)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), lambda x: x != ""
    )


def exact_duplicates(docs: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(key, content_hash, canonical_id, group_size): canonical = min key of
    each identical-text group. One shuffle on the content hash."""
    h = docs.select(F.col(key).alias("doc"), F.md5(F.col(text_col)).alias("content_hash"))
    groups = h.groupBy("content_hash").agg(
        F.min("doc").alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return h.join(groups, "content_hash").select(
        "doc", "content_hash", "canonical_id", "group_size"
    )


def shingles_df(
    docs: DataFrame, key: str, text_col: str = "text", k: int = SHINGLE_K
) -> DataFrame:
    """(doc, shingle): distinct k-word shingles; texts shorter than k words
    contribute their whole token sequence as one shingle.

    The tokenize-split is STAGED in its own projection before the shingle
    transform references it (the textstats._with_tokens /
    window_gram_positions rule): referenced directly inside the lambda,
    the regex split is inlined into the per-element body and the whole
    text is re-split once per shingle POSITION — O(len^2) regex work per
    doc. A jstack of the 600k-page curate bench showed 29/30 executor
    threads inside java.util.regex for exactly this reason."""
    staged = docs.select(F.col(key).alias("doc"), tokens_col(text_col).alias("toks"))
    toks = F.col("toks")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return (
        staged.select("doc", F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def minhash_signatures(
    shingles: DataFrame, n_perms: int = N_PERMS
) -> DataFrame:
    """(doc, seed, minhash): minhash = lexicographic min of md5('<seed>:'||shingle)
    over the doc's shingles. A fixed-width hex string is an order-isomorphic
    128-bit hash — engine-portable.

    Plan shape: ONE wide groupBy(doc) of n_perms min-aggregates, then a
    post-aggregation unpivot — the simhash lesson applied to minhash. The
    naive form explodes every shingle row n_perms times BEFORE its
    groupBy(doc, seed), so the aggregation shuffle carries 16x the corpus
    shingle stream; here the shuffle input is the (doc, shingle) rows
    themselves and the unpivot runs on docs x n_perms rows (post-agg,
    negligible). Values are IDENTICAL to the naive form — min per seed
    commutes with how rows are laid out — so the SQL oracle keeps the
    readable CROSS JOIN formulation."""
    mins = [
        F.min(F.md5(F.concat_ws(":", F.lit(s), F.col("shingle")))).alias(f"m{s}")
        for s in range(n_perms)
    ]
    wide = shingles.groupBy("doc").agg(*mins)
    pairs = ", ".join(f"{s}, m{s}" for s in range(n_perms))
    return wide.select(
        "doc", F.expr(f"stack({n_perms}, {pairs}) AS (seed, minhash)")
    ).select("doc", F.col("seed").cast("int").alias("seed"), "minhash")


def band_buckets(signatures: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc, band, band_key): band_key hashes the band's minhashes in seed
    order (zero-padded seed keeps string sort == numeric sort)."""
    rows_per_band = N_PERMS // n_bands
    return (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .withColumn("tagged", F.concat(F.lpad(F.col("seed").cast("string"), 2, "0"), F.lit(":"), F.col("minhash")))
        .groupBy("doc", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("tagged")))).alias("band_key"))
    )


def lsh_candidates(
    buckets: DataFrame,
    max_bucket_size: int | None = None,
    star_above: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b): pairs sharing at least one band bucket.

    The pair count of a bucket is quadratic in its size, so one
    boilerplate-template cluster of 10k docs emits ~5*10^7 pairs per band
    and the shuffle diverges — the curation CLI measured exactly that
    (disk-full at 600k pages). Two scale controls:

    ``star_above``: buckets holding more than this many docs emit STAR
    pairs — every member against the bucket's min doc id — instead of all
    pairs: n-1 candidates per bucket, linear. The candidates are still
    exact-Jaccard-verified downstream, so precision is untouched; the
    recall trade is that two non-min members of a jumbo bucket are never
    compared directly (they usually meet again in another band, and for
    drop-the-higher-id dedup everything similar to the representative is
    caught). This is how a giant near-identical cluster actually gets
    DEDUPED at scale, where a hard cap would silently keep all of it.

    ``max_bucket_size``: drop buckets above this size outright (the
    hot-gram-df-cap discipline of ``substring_dup_spans``, Lee et al.
    2022) — the safety valve when even linear star pairs are unwanted.
    Applied after star_above when both are set.

    ``None`` (the defaults) keeps the exact all-pairs behavior."""
    for name, v in (("max_bucket_size", max_bucket_size), ("star_above", star_above)):
        if v is not None and v < 1:
            raise ValueError(f"{name} must be >= 1, got {v}")
    stats = None
    if max_bucket_size is not None or star_above is not None:
        stats = buckets.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("_n"), F.min("doc").alias("_min_doc")
        )
        buckets = buckets.join(stats, ["band", "band_key"])
        if max_bucket_size is not None:
            buckets = buckets.filter(F.col("_n") <= max_bucket_size)
    star = None
    if star_above is not None:
        jumbo = buckets.filter(F.col("_n") > star_above)
        star = (
            jumbo.filter(F.col("doc") != F.col("_min_doc"))
            .select(F.col("_min_doc").alias("doc_a"), F.col("doc").alias("doc_b"))
        )
        buckets = buckets.filter(F.col("_n") <= star_above)
    if stats is not None:
        buckets = buckets.drop("_n", "_min_doc")
    a = buckets.select(F.col("doc").alias("doc_a"), "band", "band_key")
    b = buckets.select(F.col("doc").alias("doc_b"), "band", "band_key")
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def exact_jaccard(candidates: DataFrame, shingles: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard_micro): exact Jaccard over distinct shingle
    sets, verified against per-doc shingle ARRAYS.

    Round-7 shape (was: candidates joined against the flat shingle table
    twice — the second join re-shuffled the whole shingle stream by
    (doc, shingle), twice more for sizes): group the shingle table ONCE
    into per-doc arrays (reuses the reader's hash(doc) partitioning — no
    exchange of the big side), attach the two arrays to each candidate
    pair (two joins whose big side is already partitioned by doc; only
    the bounded candidate rows move), and compute the intersection
    map-side with `array_intersect` (sets are distinct by construction,
    so its size IS n_inter and the array sizes ARE n_a/n_b — the sizes
    joins are gone). Candidate pairs whose doc has no shingles drop on
    the inner join, exactly as the old sizes inner-join dropped them."""
    arrs = shingles.groupBy("doc").agg(
        F.collect_list("shingle").alias("_sh_arr")
    )
    return (
        candidates.join(
            arrs.select(F.col("doc").alias("doc_a"), F.col("_sh_arr").alias("_sa")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc").alias("doc_b"), F.col("_sh_arr").alias("_sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(round(CAST(size(array_intersect(_sa, _sb)) AS DOUBLE)"
                " * 1000000.0 / CAST(size(_sa) + size(_sb)"
                " - size(array_intersect(_sa, _sb)) AS DOUBLE)) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )


def minhash_calibration(
    shingles: DataFrame, n_perms: int = N_PERMS
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard_micro, jaccard_micro, abs_err_micro):
    MinHash's own error measurement — for every banded candidate pair, the
    signature-agreement Jaccard ESTIMATE (matching positions / n_perms)
    next to the EXACT shingle Jaccard and their absolute gap. This is the
    "measure, don't guess" table a pipeline owner reads before trusting a
    signature-only threshold at 10^12 docs (where exact verification of
    every pair is unaffordable and the estimate IS the decision).

    Scale shape: signatures stay as one wide array per doc (the single
    wide-agg shuffle of ``minhash_signatures``), the estimate is a
    zip-compare of two broadcast-free equi-joined arrays (the lambda
    touches only zipped elements — HOF rule), candidates materialize once
    (localCheckpoint: three consumers)."""
    mins = [
        F.min(F.md5(F.concat_ws(":", F.lit(s), F.col("shingle")))).alias(f"m{s}")
        for s in range(n_perms)
    ]
    wide = (
        shingles.groupBy("doc")
        .agg(*mins)
        .select(
            "doc",
            F.array(*[F.col(f"m{s}") for s in range(n_perms)]).alias("sig"),
        )
        .localCheckpoint(eager=False)  # consumers: bands + both pair sides
    )
    sig_long = wide.select(
        "doc", F.posexplode("sig").alias("seed", "minhash")
    )
    cand = lsh_candidates(band_buckets(sig_long)).localCheckpoint(
        eager=False
    )  # consumers: estimate join + exact_jaccard's two references
    wa = wide.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    wb = wide.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    est = (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(n_match * 1_000_000.0 / n_perms)
            .cast("long")
            .alias("est_jaccard_micro"),
        )
    )
    ex = exact_jaccard(cand, shingles)
    return est.join(ex, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard_micro",
        "jaccard_micro",
        F.abs(F.col("est_jaccard_micro") - F.col("jaccard_micro")).alias(
            "abs_err_micro"
        ),
    )


def _shingle_candidates(
    sh: DataFrame, max_shingle_df: int
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate machinery for the exact shingle-overlap scorers:
    one groupBy(shingle) collects each shingle's (capped) doc list, the
    hot-shingle prune falls out of the grouped row for free, and ordered
    candidate pairs are generated map-side from the sorted list — never a
    cartesian. Returns (inter(doc_a, doc_b, n_inter, n_a, n_b),
    sizes(doc, n_sh)) — per-doc sizes ride the pair rows (see below), so
    consumers score without re-joining the pair stream.

    Round-7 shape (was: df-count agg + join-back + self equi-join): the old
    plan shuffled the shingle table three times (df agg, join-back, both
    self-join sides) before the pair aggregation; at sf1.0 the candidate
    volume is ~127M pair rows with ~114M DISTINCT pairs (avg n_inter 1.1),
    so map-side partial aggregation buys nothing and every extra pass over
    the pair stream is pure cost. Now: Exchange(shingle) -> collect_list
    (the df cap is size(list)) -> staged array_sort (own projection — the
    HOF re-inlining rule) -> flatten/transform pair explode (map-side) ->
    ONE Exchange + aggregation keyed (doc_a, doc_b). 2 exchanges of the
    (small) shingle table replaced by 1, and the pair stream crosses the
    wire once. Per-shingle pair arrays are bounded by the df cap
    (<= cap^2/2 structs) before exploding."""
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    # per-doc size rides each (doc, shingle) row INTO the grouped pair
    # generation, so the scorers never join the (corpus-sized: one row per
    # doc) sizes table onto the pair stream — at sf1.0 the planner ran
    # those as two extra sort-merge shuffles of the ~114M-row pair table
    # (~8s); here the only size join is shingle-table-level and
    # co-partitioned with the groupBy(doc) that produced it.
    sh_n = sh.join(sizes, "doc")
    grouped = sh_n.groupBy("shingle").agg(
        F.collect_list(F.struct("doc", "n_sh")).alias("ds0")
    )
    small = grouped.filter(F.size("ds0") <= max_shingle_df).select(
        F.array_sort("ds0").alias("ds")  # struct sort: by doc, then n_sh
    )
    pairs = small.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (a, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "b -> named_struct('a', a.doc, 'b', b.doc,"
                " 'na', a.n_sh, 'nb', b.n_sh))))"
            )
        ).alias("p")
    ).select(
        F.col("p.a").alias("doc_a"),
        F.col("p.b").alias("doc_b"),
        F.col("p.na").alias("na"),
        F.col("p.nb").alias("nb"),
    )
    # (A 4x-partition explicit repartition of the pair exchange was
    # A/B-tested here — ABAB interleave at sf1.0 read 11.8/14.3 vs
    # 12.5/12.4 — within host noise, and it would disable map-side partial
    # aggregation, which dup-heavy corpora need; rejected.)
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.max("na").alias("n_a"),  # constant per doc_a: max == the value
        F.max("nb").alias("n_b"),
    )
    return inter, sizes


def ngram_jaccard_top_pairs(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 2,
    max_shingle_df: int = 10_000,
    top: int = 20,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup: candidates = pairs sharing any (non-hot)
    k-shingle; exact Jaccard; top pairs by similarity. ``max_shingle_df``
    drops stop-shingles so the candidate join stays bounded at scale. Pass a
    pre-persisted ``shingles`` frame to share it across queries (it is read
    four times in this plan)."""
    sh = shingles if shingles is not None else shingles_df(docs, key, text_col, k)
    inter, _sizes = _shingle_candidates(sh, max_shingle_df)
    # sizes ride the pair rows (_shingle_candidates) — no join on the pair
    # stream
    scored = inter.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_inter") * 1_000_000.0
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).cast("long").alias("jaccard_micro"),
    )
    return scored.orderBy(F.desc("jaccard_micro"), "doc_a", "doc_b").limit(top)


def containment_top_pairs(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 2,
    max_shingle_df: int = 1_000,
    top: int = 20,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT (Broder's resemblance sibling):
    containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|.
    Jaccard misses the quote/subset case — a short doc wholly embedded in
    a long one scores near-zero Jaccard but containment 1.0 — and that
    directed signal is what boilerplate-quotation and subset-dedup passes
    act on (drop the contained side, keep the superset).

    Same scale shape as ``ngram_jaccard_top_pairs``: candidate pairs come
    from the shared-shingle equi-join with the hot-shingle df cap (never a
    cartesian), sizes join back per side, and BOTH directions of each
    unordered candidate pair are emitted before the bounded top-k. The
    score is exact integer arithmetic: (n_inter * 10^6) div |A|.

    The df cap defaults to 1000 (the ExactSubstr hot-gram bound, not
    Jaccard's 10k): the pair join is sum(df^2) over surviving shingles, and
    a contained doc is still found unless EVERY one of its shingles is
    hot — all-hot-shingle docs are pure boilerplate, which upstream
    boilerplate/dedup stages own. Measured at the 5000-doc bench corpus
    the 10k cap admits df~5000 stop-shingles and costs 20s+; 1000 keeps
    the join bounded.

    Returns (src_doc, dst_doc, containment_micro): top pairs by descending
    containment of src in dst, ties (src, dst) ascending."""
    sh = shingles if shingles is not None else shingles_df(docs, key, text_col, k)
    inter, _sizes = _shingle_candidates(sh, max_shingle_df)
    # Round-7: both directions come from ONE pass over the aggregated pair
    # table (the previous union-of-two-selects referenced `inter` twice, so
    # the ~114M-group pair aggregation above the (reused) exchange executed
    # TWICE — once per union branch), and the per-doc sizes already ride
    # the pair rows (see _shingle_candidates), so there is no join on the
    # pair stream at all before the bounded top-k.
    scored = inter.select(
        F.explode(
            F.expr(
                "array(named_struct('src_doc', doc_a, 'dst_doc', doc_b,"
                " 'containment_micro',"
                " CAST((n_inter * 1000000) div n_a AS BIGINT)),"
                " named_struct('src_doc', doc_b, 'dst_doc', doc_a,"
                " 'containment_micro',"
                " CAST((n_inter * 1000000) div n_b AS BIGINT)))"
            )
        ).alias("d")
    ).select("d.src_doc", "d.dst_doc", "d.containment_micro")
    return scored.orderBy(
        F.desc("containment_micro"), "src_doc", "dst_doc"
    ).limit(top)


def simhash(docs: DataFrame, key: str, text_col: str = "text", bits: int = 60) -> DataFrame:
    """(doc, simhash): 60-bit simhash. Token hash = first 15 md5 hex chars as
    int; each bit accumulates +tf/-tf; positive sums set the bit.

    Shuffle shape (the 100 TB concern): ONE groupBy(doc) whose aggregate is
    ``bits`` literal-shift conditional sums — per bit,
    ``sum(if((h >> b) & 1, 1, -1))`` over raw token occurrences. Summing ±1
    per occurrence equals summing ±tf per distinct token, so the historical
    ``groupBy(doc, token)`` tf pre-pass AND the per-bit row explode (×bits
    amplification of the corpus's full token stream before its shuffle) are
    both gone: map-side partial aggregation reduces each partition to one
    ``bits``-column row per doc before the single Exchange. All shifts are
    literals, so the whole aggregate stays codegen-friendly.

    The whole fingerprint is ONE ``F.expr`` string (60 nested aggregate
    terms folded into the final sum): building it Column-by-Column costs
    ~1.3s of py4j round-trips PER QUERY at construction time — measured
    3.5x the entire execution wall on a small corpus — while a single
    expression parse is ~0.1s. Catalyst extracts the 60 aggregates into the
    same single HashAggregate either way."""
    occ = docs.select(
        F.col(key).alias("doc"),
        F.explode(tokens_col(text_col)).alias("token"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    )
    fingerprint = " + ".join(
        f"IF(sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) > 0,"
        f" {1 << b}L, 0L)"
        for b in range(bits)
    )
    return occ.groupBy("doc").agg(F.expr(fingerprint).alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, n_bands: int = 4, bits: int = 60, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming): near-duplicate pairs from banded simhash LSH.

    Each signature splits into ``n_bands`` equal bit-slices; docs sharing any
    band value are candidates (pigeonhole: a pair with hamming < n_bands must
    agree on at least one band, so recall is exact for
    ``max_hamming < n_bands``); candidates verify with
    ``bit_count(xor)``. The candidate join is an equi-join on
    (band, band_val) — no cartesian, AQE splits hot buckets."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sims.select(
        "doc",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("band_val", F.expr(f"(simhash >> (band * {band_bits})) & {mask}"))
    a = bands.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "band_val"
    )
    b = bands.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(sh_a ^ sh_b)").cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"): for every node u, connect each strictly-larger
    neighbor v > u to m = min(N(u) ∪ {u}). Output edges are canonical
    (u > v) since the new source v exceeds u >= m."""
    adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        adj.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        adj.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: direct every edge large -> small; for each node
    u, connect u and all its not-larger neighbors to m = min(N<=(u) ∪ {u})."""
    dd = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = dd.groupBy("u").agg(F.min("v").alias("m"))  # m < u by direction
    neighbor_edges = (
        dd.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        neighbor_edges.unionByName(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    max_iter: int = 25,
    mode: str = "propagate",
) -> DataFrame:
    """Near-duplicate components: (v, component) for every vertex, where
    component = the MINIMUM vertex id reachable through the undirected edge
    set — the step after pair generation in a production dedup pipeline
    (pairs alone don't dedup; transitive clusters with one canonical doc per
    cluster do).

    ``mode="propagate"`` (default): iterative min-label propagation — each
    round every vertex takes the min of its own label and its neighbors'
    labels — one equi-join + one map-side-combining groupBy(min) per round,
    converging in graph-diameter rounds (near-dup clusters are shallow:
    diameter is small even when clusters are large, since near-dups of
    near-dups share shingles). This is the doubling-free variant of Kiveris
    et al.'s star contractions — the right trade at near-dup graph shapes,
    where diameter ~ O(1).

    ``mode="star"``: alternating large-star/small-star contraction (Kiveris
    et al. 2014) — the documented escape hatch for chain-shaped components:
    each round halves star depth, so an L-deep chain converges in O(log L)
    rounds instead of L. Two equi-join+groupBy rounds per iteration (~2x
    propagate's per-round cost), worth it exactly when diameter is deep; at
    the fixpoint the edge set is a forest of depth-1 stars rooted at each
    component's minimum, from which labels read off directly (a belt-and-
    braces groupBy(min) guards the read).

    Scale hygiene (both modes): state is localCheckpoint()ed each round, so
    the plan stays one round deep instead of growing with the iteration
    count, and the convergence probe reuses the checkpointed frame.
    ``edges``: (doc_a, doc_b) pairs; ``vertices``: one column of ids.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if mode not in ("propagate", "star"):
        raise ValueError(f"mode must be 'propagate' or 'star', got {mode!r}")
    vcol = vertices.columns[0]
    if mode == "star":
        return _connected_components_star(edges, vertices, vcol, max_iter)
    sym = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vcol).alias("v"), F.col(vcol).alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        prop = sym.join(
            labels.select(F.col("v").alias("u"), "component"), "u"
        ).select("v", "component")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "_old"), "v"
            )
            .filter(F.col("component") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Loud, not silent: a component deeper than max_iter rounds would
        # return partially-propagated labels. Near-dup graphs converge in
        # diameter rounds (O(1) in practice), so hitting the cap means the
        # graph is chain-shaped — the caller should raise max_iter or swap
        # in large-star/small-star contraction (mode="star").
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or use "
            'mode="star" (large-star/small-star contraction, O(log diameter) '
            "rounds) for chain-shaped components"
        )
    return labels


def _connected_components_star(
    edges: DataFrame, vertices: DataFrame, vcol: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star contraction (see
    connected_components mode="star"). Converged when one full LS+SS round
    leaves the canonical edge set unchanged; at that fixpoint every edge
    points a node at its component's minimum id."""
    cur = (
        edges.select(
            F.greatest(F.col("doc_a"), F.col("doc_b")).alias("u"),
            F.least(F.col("doc_a"), F.col("doc_b")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        new = _small_star(_large_star(cur)).localCheckpoint()
        changed = (
            new.exceptAll(cur).unionByName(cur.exceptAll(new)).limit(1).count()
        )
        if changed == 0:
            cur = new
            break
        cur = new
    else:
        raise RuntimeError(
            f"connected_components(mode='star') did not converge in "
            f"{max_iter} alternating rounds; raise max_iter"
        )
    roots = (
        cur.select(F.col("u").alias("v"), F.col("v").alias("component"))
        .groupBy("v")
        .agg(F.min("component").alias("component"))
    )
    return (
        vertices.select(F.col(vcol).alias("v"))
        .join(roots, "v", "left")
        .select("v", F.coalesce("component", "v").alias("component"))
    )


# ----------------------------------------------------- corpus-hygiene ops
# Two more stages every large-scale training-data pipeline runs alongside
# dedup: benchmark decontamination (drop training docs that overlap the
# eval set) and boilerplate profiling (find n-grams so over-represented
# they are template text, the df-cap idea surfaced as its own report).


def contamination_hits(
    corpus_shingles: DataFrame, probe_shingles: DataFrame
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing an n-gram shingle
    with the eval-set probe docs (the n-gram-overlap decontamination used for
    LLM training corpora, e.g. GPT-3 appendix C / PaLM's 'contaminated if
    any 8-gram overlaps'). Inputs are two (doc, shingle) frames from
    shingles_df. Returns (doc, n_probe_hits, first_hit): matched docs only,
    with how many DISTINCT probe shingles hit and the lexicographically
    first one (the audit trail a removal pass logs).

    Scale: the probe side (eval sets: thousands of docs) is broadcast into
    the corpus shingle stream — one map-side semi-join + one groupBy(doc),
    no corpus-sized shuffle of text. For probe sets too big to broadcast,
    the same plan with a plain equi-join shuffles on the shingle key."""
    probes = probe_shingles.select("shingle").distinct()
    return (
        corpus_shingles.join(F.broadcast(probes), "shingle")
        .groupBy("doc")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_probe_hits"),
            F.min("shingle").alias("first_hit"),
        )
    )


def contamination_overlap(
    corpus_shingles: DataFrame, probe_shingles: DataFrame
) -> DataFrame:
    """Graded decontamination: per-doc FRACTION of distinct shingles shared
    with the probe/eval set — ``contamination_hits`` answers "touched at
    all?", this answers "how much?", which is what a removal threshold
    (e.g. PaLM's "drop if >70% of 8-grams seen") actually cuts on.

    Returns (doc, n_grams, n_probe_hits, overlap_micro) for EVERY corpus
    doc (zero-hit docs included — the threshold scan needs the full
    distribution).

    Scale: same shape as contamination_hits — probe side broadcast into
    the corpus shingle stream, plus one groupBy(doc) for the totals; the
    corpus shingle frame is expected to be shared/persisted by the caller
    (plans cache it), so both consumers read one materialization."""
    probes = probe_shingles.select("shingle").distinct()
    hits = (
        corpus_shingles.join(F.broadcast(probes), "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
    )
    totals = corpus_shingles.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hit_n = F.coalesce(F.col("n_probe_hits"), F.lit(0)).cast("long")
    return totals.join(hits, "doc", "left").select(
        "doc",
        F.col("n_grams").cast("long").alias("n_grams"),
        hit_n.alias("n_probe_hits"),
        F.round(hit_n * 1_000_000.0 / F.col("n_grams"))
        .cast("long")
        .alias("overlap_micro"),
    )


def boilerplate_shingles(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = SHINGLE_K,
    min_frac: float = 0.05,
    limit: int = 50,
) -> DataFrame:
    """Boilerplate profile: shingles present in >= min_frac of documents,
    with document frequency and fraction — template/navigation text shows up
    here long before any individual pair looks like a duplicate (and these
    are exactly the shingles the stop-shingle df cap drops before the
    candidate joins above). One explode + one groupBy(shingle) with map-side
    partial counts; the bounded top-`limit` report is all that reaches the
    driver. The corpus size rides the plan as a broadcast 1-row aggregate
    (the op_synonym scalar-fold pattern) instead of an eager docs.count(),
    so the whole profile is a single job."""
    n_docs = F.broadcast(
        docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    )
    sh = shingles_df(docs, key, text_col, k)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(n_docs)
        .filter(F.col("df") >= F.lit(float(min_frac)) * F.col("_n_docs"))
        .withColumn(
            "frac_micro",
            F.round(F.col("df") / F.col("_n_docs") * 1_000_000).cast("long"),
        )
        .drop("_n_docs")
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(limit)
    )


# ----------------------------------------------- exact-substring spans
# The ExactSubstr primitive of Lee et al. 2022 ("Deduplicating Training
# Data Makes Language Models Better"): find long token spans SHARED
# VERBATIM between documents (the signal minhash misses when a copied
# paragraph hides inside an otherwise-different page). The reference
# implementation builds a corpus suffix array; relationally the same spans
# fall out of a window-gram inverted index + a gaps-and-islands merge:
#
#   1. hash every WIDTH-token window per position (map-side slice+md5 —
#      one row per token position, no amplification beyond the stream);
#   2. drop grams shared by more than max_gram_df docs (boilerplate — the
#      same stop-shingle cap the minhash path applies, and exactly what
#      keeps the candidate join from going quadratic on template text);
#   3. equi-join positions on the gram hash (doc_a < doc_b): matches on a
#      shared span of length S produce S - WIDTH + 1 hits along ONE
#      diagonal (pos_b - pos_a constant);
#   4. merge each diagonal's consecutive runs (pa - row_number constant —
#      gaps-and-islands) into maximal spans: span_tokens = run + WIDTH - 1.
#
# Shuffles: gram-df cap (1), candidate equi-join (1), per-(pair, diagonal)
# window + span groupBy (1) — all keyed, no cartesian anywhere.


def window_gram_positions(
    docs: DataFrame, key: str, text_col: str = "text", width: int = 10
) -> DataFrame:
    """(doc, pos, g): md5 of the WIDTH-token window starting at pos.

    The tokenize-split is STAGED in its own projection before the window
    transform references it (the textstats._with_tokens rule): inlined, the
    split expression is re-evaluated per window element — measured ~10x on
    this operator's scan."""
    staged = docs.select(
        F.col(key).alias("doc"), tokens_col(text_col).alias("toks")
    )
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= width,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - width),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i + 1, width))).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,g:string>>"))
    return (
        staged.select("doc", F.explode(grams).alias("e"))
        .select("doc", F.col("e.pos").alias("pos"), F.col("e.g").alias("g"))
    )


def shared_substring_spans(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    width: int = 10,
    min_tokens: int | None = None,
    top: int = 50,
    max_gram_df: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_tokens): maximal verbatim
    token spans of >= min_tokens (default: width) shared between document
    pairs, longest first (ties by ids then start).

    Worst-case shapes (r5 verdict #8, pinned by
    tests/test_properties.py::TestExactSubstrAdversarial):

    * A very long shared span of DISTINCT tokens (10k+) stays linear end
      to end: a span of L tokens yields L-width+1 gram positions per doc,
      each gram matches exactly one position on the other side, and all
      hits land on ONE (pair, diagonal) window partition of L-width+1
      rows that the gaps-and-islands merge collapses to a single span.
      Bounded by the longest real span, never by corpus size.
    * SELF-repetitive documents (the same token repeated k times) are the
      quadratic hazard: every gram is identical, so the gram equi-join
      fans k_a * k_b within the pair. ``max_gram_df`` caps cross-document
      frequency, not within-document position multiplicity — at true
      adversarial scale, bound it upstream by masking docs whose
      top-gram multiplicity explodes (gopher_repetition's
      top_2gram_char_frac flags exactly these) before running span
      dedup; dropping high-multiplicity grams here instead would
      silently lose legitimate spans in repetitive-but-honest text.
    """
    from pyspark.sql import Window

    if min_tokens is None:
        min_tokens = width
    # Round-7 shape (was: localCheckpoint of the gram table + df agg +
    # semi-join back + a/b self-join = 1 materialization and 4 passes over
    # the gram stream): ONE groupBy(g) collects each gram's occurrence
    # list; the df cap reads off the grouped row (distinct docs in the
    # list), and cross-document (pos_a, pos_b) hit pairs explode MAP-SIDE
    # from the sorted list — same rows the self-join produced, one shuffle
    # of the gram stream instead of four, no checkpoint (single consumer).
    # Per-gram pair fan-out stays bounded by the df cap exactly as before
    # (within-doc multiplicity bounded upstream — see docstring).
    g = window_gram_positions(docs, key, text_col, width)
    occ = (
        g.groupBy("g")
        .agg(F.collect_list(F.struct("doc", "pos")).alias("os0"))
        .filter(
            F.expr(
                f"size(array_distinct(transform(os0, s -> s.doc)))"
                f" <= {int(max_gram_df)}"
            )
        )
        .select(F.array_sort("os0").alias("os"))  # (doc, pos) ascending
    )
    hits = (
        occ.select(
            F.explode(
                F.expr(
                    "flatten(transform(os, (a, i) -> "
                    "transform(filter(slice(os, i + 2, size(os) - i - 1), "
                    "b -> b.doc > a.doc), "
                    "b -> named_struct('doc_a', a.doc, 'doc_b', b.doc,"
                    " 'pa', a.pos, 'pb', b.pos))))"
                )
            ).alias("h")
        )
        .select(
            "h.doc_a", "h.doc_b", "h.pa", "h.pb",
            (F.col("h.pb") - F.col("h.pa")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = hits.withColumn("_run", F.col("pa") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "_run")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + width - 1).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )
    return spans.orderBy(
        F.desc("span_tokens"), "doc_a", "doc_b", "start_a"
    ).limit(top)


# -------------------------------------------- corpus-level line dedup (CCNet)


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9 ]', ''),"
    " ' +', ' '))"
)


def line_dedup_corpus(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    max_line_df: int = 5,
    hot_k: int = 65536,
) -> DataFrame:
    """CCNet-style corpus-level boilerplate-line removal (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data"): a line whose NORMALIZED form (lowercased, non-alnum
    stripped, whitespace collapsed) appears in more than ``max_line_df``
    distinct documents is boilerplate (nav bars, cookie banners, footers)
    and is dropped from every document; remaining lines are stitched back
    in original order.

    Output: (doc, n_lines, n_kept, n_dropped, text_clean) — one row per
    input document, text_clean = '' when everything was boilerplate.
    Lines whose normalized form is empty are never candidates (they carry
    no content signal) and are always kept.

    Scale shape for 10^12 documents: posexplode + normalize are map-side;
    the line-frequency table is one groupBy(norm-hash) with map-side
    combine; the frequency join back goes through the hot/cold split
    (operators/skewjoin.py — boilerplate lines ARE the hot keys, so the
    naive join would put every cookie-banner occurrence on one reducer);
    reconstruction is one groupBy(doc) whose per-key size is bounded by a
    document's own line count. Lines join on xxhash64(norm) — an internal
    key choice the oracle does not need to mirror, since the output is
    the reconstructed text.
    """
    lines = docs.selectExpr(
        f"{key} AS doc",
        f"posexplode(split({text_col}, '\\n')) AS (pos, line)",
    ).withColumn("_norm", F.expr(_NORM_SQL.format(x="line")))
    keep_always = lines.filter(F.col("_norm") == "").select("doc", "pos", "line")
    cand = (
        lines.filter(F.col("_norm") != "")
        .withColumn("_nh", F.xxhash64("_norm"))
        .select("doc", "pos", "line", "_nh")
    )
    cand = cand.localCheckpoint()  # consumers: df table + both join branches
    line_df = cand.groupBy("_nh").agg(
        F.countDistinct("doc").alias("_df")
    )
    kept_cand = (
        skew_safe_count_join(cand, "_nh", line_df, "_df", hot_k=hot_k)
        .filter(F.col("_df") <= max_line_df)
        .select("doc", "pos", "line")
    )
    kept = kept_cand.unionByName(keep_always)
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    totals = docs.selectExpr(
        f"{key} AS doc",
        f"CAST(size(split({text_col}, '\\n')) AS LONG) AS n_lines",
    )
    return totals.join(rebuilt, "doc", "left_outer").select(
        "doc",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def within_doc_line_dedup(
    docs: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """Within-document repetition removal (the Gopher/Dolma in-doc pass,
    complementing the corpus-level ``line_dedup_corpus``): every line whose
    NORMALIZED form already appeared earlier in the SAME document is
    dropped; first occurrences and empty-norm lines keep, order preserved.

    Zero shuffle at any scale: the whole pass is one per-row ``aggregate``
    fold over the split lines. The fold's lambda references ONLY its
    accumulator and element (the round-6 HOF rule: an outer array-valued
    expression inside a lambda gets re-inlined per element by column
    pruning in composed plans — ``dedup.py`` module note), and the seen-set
    scan is bounded by the document's own distinct-line count.

    Output: (doc, n_lines, n_kept, n_dropped, text_clean).
    """
    norm_x = _NORM_SQL.format(x="x")
    staged = docs.selectExpr(
        f"{key} AS doc",
        # coalesce: a NULL text row must behave as empty text, not
        # propagate NULL through the fold into size()=-1 counters
        f"split(coalesce({text_col}, ''), '\\n') AS _lines",
    )
    # pre-normalize ONCE per line (the fold's CASE would otherwise
    # re-evaluate the regexp chain up to 3x per line); the transform
    # lambda touches only its own element, per the module HOF rule
    fold = f"""
aggregate(
  transform(_lines, x -> named_struct('line', x, 'norm', {norm_x})),
  named_struct('seen', cast(array() as array<string>),
               'kept', cast(array() as array<string>)),
  (acc, x) -> CASE
    WHEN x.norm = '' THEN
      named_struct('seen', acc.seen, 'kept', array_append(acc.kept, x.line))
    WHEN array_contains(acc.seen, x.norm) THEN acc
    ELSE named_struct('seen', array_append(acc.seen, x.norm),
                      'kept', array_append(acc.kept, x.line)) END,
  acc -> acc.kept
)"""
    return staged.selectExpr(
        "doc",
        "size(_lines) AS _n",
        f"{fold} AS _kept",
    ).selectExpr(
        "doc",
        "CAST(_n AS BIGINT) AS n_lines",
        "CAST(size(_kept) AS BIGINT) AS n_kept",
        "CAST(_n - size(_kept) AS BIGINT) AS n_dropped",
        "array_join(_kept, '\\n') AS text_clean",
    )


# ----------------------------------------------------------- winnowing (MOSS)


def winnow_fingerprints(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(doc, fp): the distinct winnowing-selected fingerprints of each doc
    (Schleimer, Wilkerson & Aiken 2003, the MOSS local algorithm): hash
    every k-token gram, slide a window of w consecutive hashes, select each
    window's minimum. The winnowing guarantee: any token run of length
    >= w + k - 1 shared by two documents contributes at least one COMMON
    selected fingerprint, at ~2/(w+1) the density of indexing every gram —
    the scale path for substring-dedup candidate generation
    (shared_substring_spans indexes every window gram; winnowing indexes a
    provably-sufficient 2/(w+1) sample).

    Fingerprints are md5 hex digests compared lexicographically (the
    minhash convention — identical semantics in Spark and DuckDB, no
    integer conversion needed). Selection is entirely map-side: grams and
    window minima are built by arrays_zip over shifted slices so every
    lambda touches only its own element (the HOF re-inlining rule); the
    only shuffle is the caller's.

    Docs shorter than k + w - 1 tokens yield no windows and therefore no
    fingerprints (the paper's t-guarantee threshold; callers route short
    docs to exact dedup, which covers them outright).
    """
    staged = docs.select(
        F.col(key).alias("doc"), tokens_col(text_col).alias("toks")
    )
    lg = f"greatest(size(toks) - {k - 1}, 0)"
    gslices = ", ".join(f"slice(toks, {j}, {lg})" for j in range(1, k + 1))
    gparts = ", ' ', ".join(f"x['{j}']" for j in range(k))
    grams = f"transform(arrays_zip({gslices}), x -> md5(concat({gparts})))"
    hashed = staged.select("doc", F.expr(grams).alias("hs"))
    lw = f"greatest(size(hs) - {w - 1}, 0)"
    wslices = ", ".join(f"slice(hs, {j}, {lw})" for j in range(1, w + 1))
    wmin = ", ".join(f"x['{j}']" for j in range(w))
    fps = f"array_distinct(transform(arrays_zip({wslices}), x -> least({wmin})))"
    return hashed.select("doc", F.explode(F.expr(fps)).alias("fp"))


def winnow_pairs(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    top: int = 100,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing >= min_shared
    winnowing fingerprints, strongest first — the MOSS candidate report.

    Same scale discipline as shared_substring_spans: the fingerprint table
    is materialized once for its three consumers, boilerplate fingerprints
    are dropped by a cross-document df cap BEFORE the equi-join (a
    fingerprint in >max_fp_df docs is template text, not evidence), and
    the pair join is a keyed equi-join — no cartesian anywhere.
    """
    fps = winnow_fingerprints(docs, key, text_col, k, w).localCheckpoint()
    rare = (
        fps.groupBy("fp")
        .agg(F.countDistinct("doc").alias("_df"))
        .filter(F.col("_df") <= max_fp_df)
        .select("fp")
    )
    fps = fps.join(rare, "fp", "left_semi")
    a = fps.select(F.col("doc").alias("doc_a"), "fp")
    b = fps.select(F.col("doc").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(top)
    )
