"""URL canonicalization + host profiling goldens: the normalization rules
are pinned pair-by-pair (no oracle view carries URLs, so this suite is the
gate, tokenizer-style), and the dedup/profile operators are checked on a
crafted crawl slice."""

import pytest
from pyspark.sql import functions as F

from tika_xapian_spark.operators import weburl as W


CANON_CASES = [
    # scheme/host case + www + default port
    ("HTTP://WWW.Example.COM:80/Path", "http://example.com/Path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # fragment dropped
    ("https://example.com/a#section-2", "https://example.com/a"),
    # tracking params dropped, rest sorted
    (
        "https://example.com/a?z=1&utm_source=tw&a=2&fbclid=xyz",
        "https://example.com/a?a=2&z=1",
    ),
    ("https://example.com/a?utm_campaign=x", "https://example.com/a"),
    # trailing slash (non-root) stripped; root kept
    ("https://example.com/dir/", "https://example.com/dir"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    # userinfo ignored for host; param order irrelevant
    ("https://user@example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
    # schemeless passes through untouched
    ("not a url", "not a url"),
    # tracking NAMES match exactly: ref/refresh/referrer are distinct
    ("https://shop.com/item?refresh=1", "https://shop.com/item?refresh=1"),
    ("https://shop.com/item?referrer=x&a=1", "https://shop.com/item?a=1&referrer=x"),
    ("https://shop.com/item?ref=tw&a=1", "https://shop.com/item?a=1"),
    ("https://shop.com/item?ref", "https://shop.com/item"),
    # a '?' INSIDE the fragment is fragment text, not a query
    ("https://a.com/p#sec?x=1", "https://a.com/p"),
    ("https://a.com/p?x=1#sec?y=2", "https://a.com/p?x=1"),
]


class TestCanonicalUrl:
    def test_golden_pairs(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "id long, url string"
        )
        got = {
            r["id"]: r["c"]
            for r in df.select("id", W.canonical_url("url").alias("c")).collect()
        }
        for i, (u, want) in enumerate(CANON_CASES):
            assert got[i] == want, (u, got[i], want)

    def test_host_of(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTPS://WWW.Sub.Example.com:8080/x?q=1")], "id long, url string"
        )
        assert df.select(W.host_of("url").alias("h")).collect()[0]["h"] == "sub.example.com"

    def test_canonical_is_idempotent(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "id long, url string"
        )
        once = df.select("id", W.canonical_url("url").alias("c"))
        twice = once.select("id", W.canonical_url("c").alias("c2"), "c")
        for r in twice.collect():
            assert r["c2"] == r["c"]


class TestUrlDuplicates:
    @pytest.fixture(scope="class")
    def crawl(self, spark):
        rows = [
            (1, "https://example.com/a?utm_source=x", 100),
            (2, "https://example.com/a", 50),
            (3, "HTTP://WWW.other.com:80/b#frag", 10),
            (4, "http://other.com/b", 20),
            (5, "https://unique.com/c", 5),
        ]
        return spark.createDataFrame(rows, "doc long, url string, ts long")

    def test_groups_and_canonical_pick(self, crawl):
        out = {r["url"]: r for r in W.url_duplicates(crawl, "url").collect()}
        assert out["https://example.com/a"]["group_size"] == 2
        # lexicographically smallest original url wins without ts
        assert (
            out["https://example.com/a?utm_source=x"]["canonical_of_group"]
            == "https://example.com/a"
        )
        assert out["HTTP://WWW.other.com:80/b#frag"]["group_size"] == 2
        assert out["https://unique.com/c"]["group_size"] == 1

    def test_earliest_ts_wins_when_given(self, crawl):
        out = {
            r["url"]: r
            for r in W.url_duplicates(crawl, "url", ts_col="ts").collect()
        }
        # other.com group: ts 10 row is the HTTP://WWW... one -> it wins
        assert (
            out["http://other.com/b"]["canonical_of_group"]
            == "HTTP://WWW.other.com:80/b#frag"
        )

    def test_no_cartesian(self, crawl):
        plan = (
            W.url_duplicates(crawl, "url")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestHostProfile:
    def test_shares_and_skew_flag(self, spark):
        rows = [(i, f"https://big.com/p{i}") for i in range(90)]
        rows += [(100 + i, f"https://small{i}.org/x") for i in range(10)]
        pages = spark.createDataFrame(rows, "doc long, url string")
        out = {r["host"]: r for r in W.host_profile(pages, "url").collect()}
        assert out["big.com"]["n_pages"] == 90
        assert out["big.com"]["share_micro"] == 900000
        assert out["big.com"]["skewed"] == 1
        assert out["small0.org"]["share_micro"] == 10000
        assert out["small0.org"]["skewed"] == 0

    def test_zero_construction_jobs(self, spark):
        pages = spark.createDataFrame(
            [(1, "https://a.com/x")], "doc long, url string"
        )
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None))
        W.host_profile(pages, "url")
        assert len(tracker.getJobIdsForGroup(None)) == before


class TestLatestSnapshot:
    def test_newest_ts_then_highest_id_wins(self, spark):
        rows = [
            # same canonical url crawled three times
            (1, "https://example.com/a?utm_source=x", 100),
            (2, "https://example.com/a", 300),
            (3, "https://example.com/a#frag", 200),
            # ts tie inside a group -> highest id wins
            (4, "http://other.com/b", 50),
            (5, "HTTP://WWW.other.com:80/b", 50),
            # singleton
            (6, "https://unique.com/c", 7),
        ]
        pages = spark.createDataFrame(rows, "id long, url string, ts long")
        out = {
            r["canonical_url"]: r
            for r in W.latest_snapshot(pages, "url", "ts", "id").collect()
        }
        a = out["https://example.com/a"]
        assert (a["n_snapshots"], a["kept_id"], a["kept_ts"]) == (3, 2, 300)
        b = out["http://other.com/b"]
        assert (b["n_snapshots"], b["kept_id"], b["kept_ts"]) == (2, 5, 50)
        c = out["https://unique.com/c"]
        assert (c["n_snapshots"], c["kept_id"], c["kept_ts"]) == (1, 6, 7)

    def test_single_shuffle_no_window(self, spark):
        pages = spark.createDataFrame(
            [(1, "https://a.com/x", 1)], "id long, url string, ts long"
        )
        plan = (
            W.latest_snapshot(pages, "url", "ts", "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # algebraic max(struct) aggregate: one hash-exchange, map-side
        # partial combine, and no Window/Sort operator anywhere
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Window" not in plan
        assert "partial_max" in plan


class TestSnapshotDelta:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [("u1", "same"), ("u2", "before"), ("u3", "dropped")],
            "url string, text string",
        )
        new = spark.createDataFrame(
            [("u1", "same"), ("u2", "after"), ("u4", "brand new")],
            "url string, text string",
        )
        got = {r["url"]: r["status"]
               for r in W.snapshot_delta(old, new).collect()}
        assert got == {"u1": "unchanged", "u2": "modified",
                       "u3": "gone", "u4": "added"}

    def test_text_never_shuffles(self, spark):
        old = spark.createDataFrame([("u", "t")], "url string, text string")
        new = spark.createDataFrame([("u", "t")], "url string, text string")
        plan = (
            W.snapshot_delta(old, new)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # both sides reduce to (url, md5) BEFORE the join: the raw text
        # column must not appear above any Exchange
        assert "FullOuter" in plan
        assert plan.count("md5(") >= 2  # both sides digested map-side


class TestCanonicalFuzz:
    """Idempotence over randomized URL-ish garbage: canonical(canonical(x))
    == canonical(x) for every input — the property that makes re-running
    the canonicalization over an already-canonical corpus a no-op. One
    Spark action for the whole seeded batch."""

    def test_idempotent_on_random_urls(self, spark):
        import random

        rng = random.Random(13)
        schemes = ["http", "HTTPS", "ftp", ""]
        hosts = ["www.Ex.COM", "a.b.co", "x.org:8080", "y.net:443", ""]
        paths = ["", "/", "/p", "/p/", "/p/q/", "//"]
        queries = ["", "?a=1", "?utm_source=t&b=2", "?ref=1&refresh=2",
                   "?b=2&a=1&a=0", "?", "?&&"]
        frags = ["", "#f", "#sec?x=1", "##"]
        cases = []
        for i in range(120):
            s = rng.choice(schemes)
            u = (f"{s}://" if s else "") + rng.choice(hosts) + \
                rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
            cases.append((i, u))
        df = spark.createDataFrame(cases, "id long, url string")
        once = df.select("id", "url", W.canonical_url("url").alias("c1"))
        twice = once.select(
            "id", "url", "c1", W.canonical_url("c1").alias("c2")
        )
        for r in twice.collect():
            assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])


class TestRobotsFilter:
    def test_http_and_port_paths_align(self, spark):
        """path_q must come structurally from the canonical authority — an
        http scheme or a retained non-default port must not misalign the
        prefix match (the hardcoded-'https://' skip bug)."""
        from tika_xapian_spark.operators.weburl import robots_filter

        urls = spark.createDataFrame(
            [
                ("http://plain.com/private/x",),
                ("https://ported.com:8080/private/x",),
                ("https://ok.com/public/x",),
            ],
            "url string",
        )
        rules = spark.createDataFrame(
            [
                ("plain.com", "/private", False),
                ("ported.com", "/private", False),
                ("ok.com", "/private", False),
            ],
            "host string, path_prefix string, allow boolean",
        )
        out = {r.url: r for r in robots_filter(urls, "url", rules).collect()}
        assert out["http://plain.com/private/x"].allowed == 0
        assert out["https://ported.com:8080/private/x"].allowed == 0
        assert out["https://ok.com/public/x"].allowed == 1
        assert out["http://plain.com/private/x"].matched_prefix == "/private"


class TestRobotsPropertyVsPython:
    def test_seeded_random_cases_match_python_reference(self, spark):
        """500 seeded-random (url, rule-table) cases in ONE Spark job vs a
        direct Python implementation of the RFC 9309 longest-match rule
        (longest prefix wins; Allow beats Disallow on ties; default
        allow). Urls are constructed already-canonical (no www/tracking/
        fragment/default port/trailing slash) so the reference's
        structural path+query equals the operator's canonical path."""
        import random

        from tika_xapian_spark.operators.weburl import robots_filter

        rng = random.Random(20260818)
        hosts = [f"h{i}.test" for i in range(5)]
        segs = ["/a", "/ab", "/abc", "/b", "/b/c", "/c"]
        rules_py: dict[str, list[tuple[str, bool]]] = {h: [] for h in hosts}
        for h in hosts:
            for p in rng.sample(segs, rng.randint(0, 4)):
                rules_py[h].append((p, rng.random() < 0.5))
            # a deliberate tie pair on one host: same prefix both ways
            if rng.random() < 0.5:
                rules_py[h] += [("/a", True), ("/a", False)]
        urls = []
        for i in range(500):
            h = rng.choice(hosts)
            scheme = rng.choice(["http", "https"])
            port = rng.choice(["", ":8080"])
            path = rng.choice(segs + ["/z", "/abcd"])
            q = rng.choice(["", "?a=1"])
            urls.append(f"{scheme}://{h}{port}{path}{q}")
        urls = sorted(set(urls))

        def ref(url):
            rest = url.split("://", 1)[1]
            hostport, slash, tail = rest.partition("/")
            host = hostport.split(":")[0]
            path_q = slash + tail
            hits = [
                (len(p), int(a), p)
                for p, a in rules_py[host]
                if path_q.startswith(p)
            ]
            if not hits:
                return (1, "")
            l, a, p = max(hits)
            return (a, p)

        udf = spark.createDataFrame([(u,) for u in urls], "url string")
        rdf = spark.createDataFrame(
            [(h, p, a) for h, rs in rules_py.items() for p, a in rs],
            "host string, path_prefix string, allow boolean",
        )
        got = {
            r.url: (r.allowed, r.matched_prefix)
            for r in robots_filter(udf, "url", rdf).collect()
        }
        assert len(got) == len(urls)
        for u in urls:
            assert got[u] == ref(u), (u, got[u], ref(u), rules_py)


class TestCrawlScheduleProfile:
    def test_makespan_is_largest_host(self, spark):
        """Hosts of sizes 1/3/8: at wave 1 all three fetch; by wave 4 only
        the size-8 host is active; done_urls saturates at the corpus total
        exactly when the largest host finishes."""
        from tika_xapian_spark.operators.weburl import crawl_schedule_profile

        rows = []
        for host, n in [("a.com", 1), ("b.com", 3), ("c.com", 8)]:
            rows += [(f"https://{host}/p{i}",) for i in range(n)]
        pages = spark.createDataFrame(rows, "url string")
        got = {
            r.wave: (r.active_hosts, r.done_urls, r.done_micro)
            for r in crawl_schedule_profile(
                pages, probe_waves=(1, 2, 4, 8, 16)
            ).collect()
        }
        assert got[1] == (3, 3, 3 * 1_000_000 // 12)
        assert got[2] == (2, 5, 5 * 1_000_000 // 12)
        assert got[4] == (1, 8, 8 * 1_000_000 // 12)
        assert got[8] == (1, 12, 1_000_000)   # last wave of the big host
        assert got[16] == (0, 12, 1_000_000)  # crawl finished
