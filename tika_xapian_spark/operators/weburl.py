"""URL canonicalization and host-level profiling for web-crawl pipelines.

The first dedup any crawl corpus runs is BY URL (the same page fetched
twice, tracking params, fragment anchors), and the first partitioning
decision is BY HOST (a handful of giant hosts skew every shuffle keyed on
url/host — the reference's Common-Crawl-style input calls this out
explicitly). Both are pure JVM column algebra here: regexp/split/array
builtins, zero Python, zero shuffle for the canonical form itself.

Canonical form (documented, deterministic):
  - scheme and host lowercased; ``www.`` prefix dropped
  - default ports stripped (``:80`` for http, ``:443`` for https)
  - fragment (``#...``) dropped
  - tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``)
  - remaining query params sorted byte-wise (param order never changes
    content); empty query dropped
  - trailing slash stripped from non-root paths

At 10^12 pages: url_duplicates is one hash-groupBy shuffle on the
canonical string (same shape as exact text dedup); host_profile is one
groupBy(host) with map-side combine, and its output IS the salting input —
hosts whose share exceeds the skew threshold are the keys a url-keyed job
should salt (or hand to AQE skew-join handling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# "utm_" matches any utm-prefixed NAME; the others must match the param
# name exactly (a prefix rule would silently eat refresh=/referrer=/
# gclid_extra= params and merge distinct pages)
TRACKING_PREFIXES = ("utm_",)
TRACKING_NAMES = ("fbclid", "gclid", "ref")


def host_of(url: str | Column) -> Column:
    """Lowercased host (authority minus userinfo/port), ``www.`` stripped."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url: str | Column) -> Column:
    """Deterministic canonical form (see module doc). Unparseable strings
    (no scheme) pass through lowercased-scheme-less as-is."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = host_of(c)
    port = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:([0-9]+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # strip trailing slash on non-root paths
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    # query must come from the PRE-fragment portion: r"\?..." alone would
    # match a '?' living inside the fragment and leak it into the canon
    query = F.regexp_extract(c, r"^[^#]*?\?([^#]*)", 1)

    def _is_tracking(p: Column) -> Column:
        name = F.split(p, "=")[0]
        by_prefix = F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
            lambda t: name.startswith(t),
        )
        by_name = F.exists(
            F.array(*[F.lit(t) for t in TRACKING_NAMES]),
            lambda t: name == t,
        )
        return by_prefix | by_name

    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~_is_tracking(p),
    )
    sorted_q = F.concat_ws("&", F.array_sort(params))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", c).otherwise(canon)


def url_duplicates(
    pages: DataFrame, url_col: str = "url", ts_col: str | None = None
) -> DataFrame:
    """(url, canonical_url, canonical_of_group, group_size): exact URL
    dedup on the canonical form — one hash-groupBy shuffle, the url-level
    sibling of dedup.exact_duplicates. The canonical row per group is the
    lexicographically-smallest original url (or the earliest ``ts_col``
    when given, ties by url) so re-crawls keep the first fetch."""
    with_canon = pages.select(
        F.col(url_col).alias("url"),
        canonical_url(url_col).alias("canonical_url"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    )
    pick = (
        F.struct(F.col("_ts"), F.col("url")) if ts_col else F.struct(F.col("url"))
    )
    groups = with_canon.groupBy("canonical_url").agg(
        F.min(pick).alias("_best"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    ).select(
        "canonical_url",
        F.col("_best.url").alias("canonical_of_group"),
        "group_size",
    )
    return (
        with_canon.select("url", "canonical_url")
        .join(groups, "canonical_url")
        .select("url", "canonical_url", "canonical_of_group", "group_size")
    )


def host_profile(
    pages: DataFrame, url_col: str = "url", skew_share: float = 0.01
) -> DataFrame:
    """(host, n_pages, share_micro, skewed): per-host page counts and
    corpus share — the salting input for url/host-keyed shuffles. One
    groupBy(host) with map-side combine; the total rides the plan as a
    broadcast 1-row aggregate (no eager count)."""
    hosts = pages.select(host_of(url_col).alias("host"))
    total = F.broadcast(
        hosts.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    )
    return (
        hosts.groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
        .crossJoin(total)
        .select(
            "host",
            "n_pages",
            F.round(F.col("n_pages") / F.col("_total") * 1_000_000)
            .cast("long")
            .alias("share_micro"),
            (F.col("n_pages") / F.col("_total") > F.lit(float(skew_share)))
            .cast("int")
            .alias("skewed"),
        )
        .orderBy(F.desc("n_pages"), "host")
    )


def host_blocklist_filter(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop every page whose host is on a blocklist (the UT1/adult-domains
    pass every Common-Crawl curation pipeline runs) — keep-side bloom
    composition:

    - the blocklist's hosts compress to an ``m/8``-byte bloom bitmap
      (operators/bloom.py), so a list far past the broadcast threshold
      still rides map-side;
    - every page gets a ``might_contain`` flag from k broadcast LEFT
      word-joins (``bloom_flag``) — a bloom MISS is a definite keep, no
      shuffle, and that's ~all rows when the blocklist hits a small
      corpus fraction;
    - only the bloom-HIT sliver takes the exact ``left_anti`` join that
      removes false positives, so the anti-join shuffles a fraction of
      the corpus bounded by (true hit rate + fpp ≈ 0.5%).

    The two branches each re-run the map-only scan+flag (pipelined,
    no materialization); the alternatives are strictly worse at 10^12
    rows — a localCheckpoint materializes the full corpus, a plain
    anti-join shuffles it.

    ``blocklist`` must have a ``host`` column. Returns the kept pages
    with their ``host`` appended."""
    from .bloom import BITS_PER_KEY, bloom_flag, bloom_words, next_pow2

    hosts = blocklist.select("host").distinct().localCheckpoint()
    m_bits = next_pow2(BITS_PER_KEY * max(hosts.count(), 1))
    bloom = bloom_words(hosts, "host", m_bits).localCheckpoint()
    flagged = bloom_flag(
        pages.withColumn("host", host_of(url_col)), "host", bloom, m_bits
    )
    fast_keep = flagged.filter(~F.col("might_contain")).drop("might_contain")
    verified_keep = (
        flagged.filter(F.col("might_contain"))
        .drop("might_contain")
        .join(hosts, "host", "left_anti")
    )
    return fast_keep.unionByName(verified_keep)


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl delta: per url, classify the new snapshot against the old —
    ``added`` / ``gone`` / ``modified`` / ``unchanged``. This is exactly
    the input an incremental index maintenance run consumes (the MERGE
    plan: added+modified -> upsert, gone -> delete, unchanged -> skip),
    and at 10^12 urls it is the difference between re-extracting the
    whole crawl and touching the ~few-percent that moved.

    ONE full-outer equi-join on the url key (both sides reduced map-side
    to (url, content-md5) first — text never shuffles, only 32-byte
    digests), status from null-ness + digest compare. Returns
    (url, status)."""
    o = old.select(
        F.col(key_col).alias("url"), F.md5(F.col(text_col)).alias("_ho")
    )
    n = new.select(
        F.col(key_col).alias("url"), F.md5(F.col(text_col)).alias("_hn")
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("gone"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select("url", status.alias("status"))


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Latest-crawl-wins snapshot dedup: per CANONICAL url, keep the row
    with the newest crawl timestamp (ties to the highest id) — the first
    reduction any multi-snapshot Common-Crawl-style corpus applies before
    content processing (the same url is fetched in many monthly crawls;
    training on all of them is pure duplication).

    Returns (canonical_url, n_snapshots, kept_id, kept_ts): one row per
    canonical url. ONE shuffle — an algebraic max(struct(ts, id)) +
    count aggregation on the canonical key; no window, no sort, map-side
    combine absorbs hot-url skew (a url crawled in every snapshot still
    reduces partially per partition)."""
    c = pages.select(
        canonical_url(url_col).alias("canonical_url"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    return c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.max(F.struct(F.col("_ts"), F.col("_id"))).alias("_best"),
    ).select(
        "canonical_url",
        "n_snapshots",
        F.col("_best._id").alias("kept_id"),
        F.col("_best._ts").alias("kept_ts"),
    )


def robots_filter(
    urls: DataFrame, url_col: str, rules: DataFrame
) -> DataFrame:
    """(url, canonical_url, host, matched_prefix, allowed): robots-exclusion
    evaluation per URL under Google's published longest-match semantics
    (REP, RFC 9309): among the host's rules whose path prefix matches the
    canonical path+query, the LONGEST prefix wins; on a length tie Allow
    beats Disallow; no matching rule means allowed.

    ``rules`` is (host, path_prefix, allow) — one row per robots.txt line.
    Scale shape: a crawl's rule table is bounded by the host count, so it
    BROADCASTS; the prefix match is a broadcast equi-join on host plus a
    startswith filter, and the winner is one map-side-combined
    max(struct(len, allow)) per url — a single corpus-scale shuffle on the
    url, no regex engine in the loop."""
    canon = urls.select(
        F.col(url_col).alias("url"),
        canonical_url(url_col).alias("canonical_url"),
        host_of(url_col).alias("host"),
    ).withColumn(
        # path+query extracted STRUCTURALLY from the canonical form (first
        # '/' after the authority — which may keep a non-default port and
        # any scheme), never by skipping a hardcoded 'https://'+host
        # prefix: an http or :8080 canonical would misalign that skip and
        # silently report every rule as non-matching
        "path_q",
        F.regexp_extract(
            F.col("canonical_url"),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$",
            1,
        ),
    )
    matched = canon.join(F.broadcast(rules), "host", "left").withColumn(
        "_hit",
        F.when(
            F.col("path_prefix").isNotNull()
            & F.col("path_q").startswith(F.col("path_prefix")),
            F.struct(
                F.length("path_prefix").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("path_prefix").alias("p"),
            ),
        ),
    )
    won = matched.groupBy("url").agg(
        F.first("canonical_url").alias("canonical_url"),
        F.first("host").alias("host"),
        F.max("_hit").alias("w"),
    )
    return won.select(
        "url",
        "canonical_url",
        "host",
        F.coalesce(F.col("w.p"), F.lit("")).alias("matched_prefix"),
        F.coalesce(F.col("w.a") == 1, F.lit(True)).cast("int").alias("allowed"),
    ).orderBy("url")


def crawl_schedule_profile(
    pages: DataFrame,
    url_col: str = "url",
    probe_waves: tuple[int, ...] = tuple(2**i for i in range(20)),
) -> DataFrame:
    """Politeness-constrained crawl progress profile. A polite crawler
    fetches at most ONE url per host per wave (per politeness interval),
    so a host of size s finishes in exactly s waves and the crawl's
    makespan is the LARGEST host — the same host-skew that dominates
    url-keyed shuffles shows up as wall-clock here. For each probe wave w
    this reports how far the crawl has progressed:

      active_hosts(w) = hosts with >= w urls (still fetching at wave w)
      done_urls(w)    = sum over hosts of min(size, w)  (urls fetched)
      done_micro      = exact integer fraction of the corpus fetched

    Probes are FIXED powers of two — the output is ~20 rows at any corpus
    size (a per-wave row set would be makespan-sized, i.e. unbounded), and
    the plan is one groupBy(host) with map-side combine plus a constant
    |probes| fan-out of the host-size table; the corpus total rides as a
    broadcast 1-row aggregate. No window over the hot host anywhere: the
    per-url wave assignment would serialize on the biggest host, the
    profile never needs it."""
    sizes = (
        pages.select(host_of(url_col).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
    )
    per = sizes.select(
        "sz",
        F.explode(
            F.array(*[F.lit(int(w)).cast("long") for w in probe_waves])
        ).alias("wave"),
    )
    total = F.broadcast(sizes.agg(F.sum("sz").cast("long").alias("_total")))
    return (
        per.groupBy("wave")
        .agg(
            F.sum((F.col("sz") >= F.col("wave")).cast("long")).alias(
                "active_hosts"
            ),
            F.sum(F.least(F.col("sz"), F.col("wave"))).cast("long").alias(
                "done_urls"
            ),
        )
        .crossJoin(total)
        .select(
            "wave",
            "active_hosts",
            "done_urls",
            F.expr("CAST(done_urls * 1000000 div _total AS BIGINT)").alias(
                "done_micro"
            ),
        )
        .orderBy("wave")
    )
