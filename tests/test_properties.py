"""Property-based tests (hypothesis): the tokenizer fast path must be
byte-equivalent to the exact scanner, and the stemmer/tokenizer must be total
and well-behaved on arbitrary input."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from tika_xapian_spark.functions import tokenizer as T
from tika_xapian_spark.functions.porter2 import stem

# simple alphabet that stays on the regex fast path
simple_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_ \t\n", max_size=200
)

# alphabet that exercises every special rule
special_text = st.text(
    alphabet="abcXYZ019 .,;'&+#_-’​·\n\t\"",
    max_size=120,
)

any_text = st.text(max_size=120)


def exact_scan(text: str) -> list[str]:
    """Force the exact scanner by bypassing the fast-path gate."""
    gate = T._NO_SPECIALS
    try:
        T._NO_SPECIALS = re.compile(r".?", re.DOTALL)  # always 'has specials'
        # recompile gate that always matches -> slow path
        return T.scan_terms(text)
    finally:
        T._NO_SPECIALS = gate


@settings(max_examples=300, deadline=None)
@given(simple_text)
def test_fast_path_equals_exact_scanner(text):
    assert T.scan_terms(text) == exact_scan(text)


@settings(max_examples=300, deadline=None)
@given(special_text)
def test_scanner_total_and_lowercase(text):
    terms = T.scan_terms(text)
    for t in terms:
        assert t == t.lower()
        assert t != ""


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_scanner_never_crashes_on_unicode(text):
    T.scan_terms(text)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=0, max_size=30))
def test_stemmer_total_and_bounded(word):
    out = stem(word)
    assert isinstance(out, str)
    # Porter2 never grows a word by more than one char (only <+ 'e' appends)
    assert len(out) <= len(word) + 1
    assert out == out.lower()


@settings(max_examples=200, deadline=None)
@given(simple_text)
def test_index_text_positions_monotonic(text):
    toks, last = T.index_text(text)
    poss = [t.pos for t in toks if t.pos is not None]
    assert poss == sorted(poss)
    assert all(p >= 1 for p in poss)
    assert last == (poss[-1] if poss else 0)


# fused per-doc aggregation (operators/index.py::_doc_postings) must emit the
# identical postings set as the reference-shaped index_document + aggregation
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["", "A", "K", "XS"]),
            st.text(min_size=0, max_size=80),
        ),
        min_size=0,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_fused_doc_postings_equals_index_document(fields):
    from tika_xapian_spark.operators.index import _doc_postings

    fused = _doc_postings(fields, stem=True)
    toks = T.index_document(fields)
    agg = {}
    for t in toks:
        e = agg.setdefault(t.term, [0, []])
        e[0] += 1
        if t.pos is not None:
            e[1].append(t.pos)
    terms = sorted(agg)
    assert fused == {
        "terms": terms,
        "wdfs": [agg[t][0] for t in terms],
        "positions": [agg[t][1] for t in terms],
        "doclen": len(toks),
    }


class TestChunkedScanProperty:
    @given(special_text)
    @settings(max_examples=300, deadline=None)
    def test_chunked_equals_scan_terms(self, text):
        assert T.scan_terms_chunked(text) == T.scan_terms(text)

    @given(any_text)
    @settings(max_examples=300, deadline=None)
    def test_chunked_equals_scan_terms_any_unicode(self, text):
        assert T.scan_terms_chunked(text) == T.scan_terms(text)


class TestFastFrontmatterProperty:
    """Wherever the fast path claims a parse, PyYAML must agree (None is
    always safe — it falls back)."""

    key = st.sampled_from(["title", "author", "date", "tags", "subtitle", "x_y"])
    plain = st.from_regex(r"[A-Za-z][A-Za-z0-9 _.'()/,-]{0,30}", fullmatch=True)
    word = st.from_regex(r"[A-Za-z][A-Za-z0-9_-]{0,10}", fullmatch=True)
    iso = st.sampled_from(
        ["2021-01-02T03:04:05Z", "2020-06-22T12:48:16-0400", "2021-12-31",
         "2020-02-30T00:00:00Z", "1999-01-01 10:11:12+02:00"]
    )
    tricky = st.sampled_from(
        ["true", "No", "null", "123", "1.5", "[a", "a]", "'q'", '"q"',
         "- item", "|", ">", "&anchor", "*ref", "x: y", "has # comment",
         " lead", "trail ", "\t", ""]
    )
    value = st.one_of(plain, iso, tricky)

    @st.composite
    def frontmatter(draw):
        n = draw(st.integers(min_value=1, max_value=5))
        lines = []
        for _ in range(n):
            k = draw(TestFastFrontmatterProperty.key)
            shape = draw(st.integers(0, 2))
            if shape == 0:
                lines.append(f"{k}: {draw(TestFastFrontmatterProperty.value)}")
            elif shape == 1:
                items = draw(
                    st.lists(TestFastFrontmatterProperty.word, max_size=3)
                )
                lines.append(f"{k}: [{', '.join(items)}]")
            else:
                lines.append(f"{k}:")
                ind = draw(st.sampled_from(["", "  "]))
                for _ in range(draw(st.integers(1, 3))):
                    lines.append(
                        f"{ind}- {draw(TestFastFrontmatterProperty.value)}"
                    )
        return "\n".join(lines)

    @given(frontmatter())
    @settings(max_examples=400, deadline=None)
    def test_fast_claim_matches_yaml(self, text):
        import yaml

        from tika_xapian_spark.operators.extract import (
            _fast_frontmatter,
            normalize_date,
        )

        fast = _fast_frontmatter(text)
        if fast is None:
            return  # fallback — always safe
        loader = getattr(yaml, "CSafeLoader", yaml.SafeLoader)
        try:
            slow = yaml.load(text, Loader=loader)
        except Exception:
            # YAML rejects what the fast path accepted. The one permitted
            # case: a resolvable-but-impossible datetime under 'date'
            # (PyYAML raises ValueError -> quarantine; the fast path keeps
            # the string and normalize_date fails -> quarantine). Both
            # pipelines quarantine the row, so end behavior is identical.
            assert normalize_date(str(fast.get("date", ""))) is None, (
                f"fast path accepted what YAML rejects: {text!r}"
            )
            return
        assert isinstance(slow, dict) and set(fast) == set(slow), text
        for k in fast:
            if k == "date":
                assert normalize_date(str(fast[k])) == normalize_date(
                    str(slow[k])
                ), text
            else:
                assert fast[k] == slow[k], (text, k)


class TestOsaDistanceProperty:
    """operators/search.py::osa_distance = restricted Damerau-Levenshtein
    (optimal string alignment), checked against a direct recursive
    definition on short strings plus metric axioms."""

    @staticmethod
    def _osa_ref(a: str, b: str) -> int:
        # memoized literal recursion over the OSA recurrence
        from functools import lru_cache

        @lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            best = min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                best = min(best, d(i - 2, j - 2) + 1)
            return best

        return d(len(a), len(b))

    @given(
        st.text(alphabet="abcd", max_size=7),
        st.text(alphabet="abcd", max_size=7),
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_reference_recursion(self, a, b):
        from tika_xapian_spark.operators.search import osa_distance

        assert osa_distance(a, b) == self._osa_ref(a, b)

    @given(st.text(alphabet="abcdef", max_size=10))
    @settings(max_examples=100, deadline=None)
    def test_identity_and_symmetry(self, a):
        from tika_xapian_spark.operators.search import osa_distance

        assert osa_distance(a, a) == 0
        assert osa_distance(a, a[::-1]) == osa_distance(a[::-1], a)

    def test_transposition_vs_levenshtein(self):
        from tika_xapian_spark.operators.search import osa_distance

        assert osa_distance("teh", "the") == 1  # levenshtein would say 2
        assert osa_distance("ca", "abc") == 3  # true DL would say 2


class TestExactSubstrAdversarial:
    """ExactSubstr at adversarial scale (r5 verdict #8): a doc pair sharing
    a very long span must produce ONE merged span with linear intermediate
    row counts — the gaps-and-islands merge may not fragment, and the `top`
    cutoff must keep the longest span."""

    def test_10k_token_shared_span_merges_to_one(self, spark):
        from tika_xapian_spark.operators.dedup import (
            shared_substring_spans,
            window_gram_positions,
        )

        L = 10_000
        shared = " ".join(f"t{i}" for i in range(L))
        docs = spark.createDataFrame(
            [
                (1, "alpha beta " + shared + " tail"),
                (2, "x " + shared),
                (3, "unrelated content entirely different words"),
            ],
            "doc_id long, text string",
        )
        width = 8
        out = shared_substring_spans(
            docs, key="doc_id", width=width, top=5
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["span_tokens"] == L
        assert r["start_a"] == 2 and r["start_b"] == 1
        # linearity: distinct-token span of L produces exactly L-width+1
        # gram positions per doc — the join fan is 1 per gram (df == 2
        # docs, single position each), so the single (pair, diag) window
        # partition holds L-width+1 rows, linear in span length
        g = window_gram_positions(docs, "doc_id", "text", width)
        per_doc = {
            r["doc"]: r["n"]
            for r in g.groupBy("doc").count().withColumnRenamed("count", "n").collect()
        }
        assert per_doc[1] == (L + 3) - width + 1  # 2 head + L + 1 tail tokens
        assert per_doc[2] == (L + 1) - width + 1

    def test_top_cutoff_keeps_longest_spans(self, spark):
        from tika_xapian_spark.operators.dedup import shared_substring_spans

        # three pairs with span lengths 40 > 30 > 20; top=2 keeps the two
        # longest (deterministic order: longest first)
        def span(n, tag):
            return " ".join(f"{tag}{i}" for i in range(n))

        docs = spark.createDataFrame(
            [
                (1, span(40, "a")), (2, span(40, "a") + " x"),
                (3, span(30, "b")), (4, span(30, "b") + " y"),
                (5, span(20, "c")), (6, span(20, "c") + " z"),
            ],
            "doc_id long, text string",
        )
        out = shared_substring_spans(docs, key="doc_id", width=8, top=2).collect()
        assert [(r["doc_a"], r["doc_b"], r["span_tokens"]) for r in out] == [
            (1, 2, 40),
            (3, 4, 30),
        ]


class TestWithinDocLineDedupProperty:
    """The zero-shuffle aggregate fold must equal a transparent Python
    reference on arbitrary multi-line inputs (empty lines, repeated
    normalized forms, punctuation-only lines, trailing newlines)."""

    @staticmethod
    def _ref(text: str):
        lines = text.split("\n")
        seen, kept = set(), []
        for ln in lines:
            norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", ln.lower())).strip()
            if norm == "" or norm not in seen:
                if norm != "":
                    seen.add(norm)
                kept.append(ln)
        return len(lines), len(kept), "\n".join(kept)

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.text(
                    alphabet="aAbB cC!.-12\t", min_size=0, max_size=12
                ),
                min_size=1,
                max_size=8,
            ).map("\n".join),
            min_size=1,
            max_size=6,
        )
    )
    def test_fold_equals_python_reference(self, texts):
        import tests.conftest  # noqa: F401  (session fixture owner)
        from pyspark.sql import SparkSession

        from tika_xapian_spark.operators.dedup import within_doc_line_dedup

        spark = SparkSession.getActiveSession()
        if spark is None:  # property test may run before any spark fixture
            from tika_xapian_spark.session import get_spark

            spark = get_spark(master="local[2]", shuffle_partitions=2)
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc: (r.n_lines, r.n_kept, r.text_clean)
            for r in within_doc_line_dedup(docs, "doc_id").collect()
        }
        for i, t in enumerate(texts):
            nl, nk, clean = self._ref(t)
            assert got[i] == (nl, nk, clean), (t, got[i])


class TestWinnowingProperty:
    """The winnowing coverage theorem (Schleimer et al. 2003): two docs
    sharing any token run of length >= w + k - 1 share at least one
    SELECTED fingerprint; selection density is bounded by the window count
    (and in expectation ~2/(w+1) of grams)."""

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(0, 10_000),
        st.integers(0, 8),  # shared-run length ABOVE the k+w-1 guarantee
        st.integers(0, 3),
    )
    def test_guaranteed_detection(self, seed, extra, pad):
        import random

        from pyspark.sql import SparkSession

        from tika_xapian_spark.operators.dedup import winnow_fingerprints

        spark = SparkSession.getActiveSession()
        if spark is None:  # property test may run before any spark fixture
            from tika_xapian_spark.session import get_spark

            spark = get_spark(master="local[2]", shuffle_partitions=2)
        k, w = 4, 3
        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(200)]
        run_len = k + w - 1 + extra
        shared = [rng.choice(vocab) for _ in range(run_len)]
        # distinct-token paddings so the run is the only overlap
        pad_a = [f"a{i}" for i in range(pad + 3)]
        pad_b = [f"b{i}" for i in range(pad + 5)]
        docs = spark.createDataFrame(
            [
                (1, " ".join(pad_a + shared + ["aendone", "aendtwo"])),
                (2, " ".join(["bhead"] + shared + pad_b)),
            ],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(docs, key="doc_id", k=k, w=w)
        from pyspark.sql import functions as F

        by_doc = {
            r["doc"]: set(r["s"])
            for r in fps.groupBy("doc")
            .agg(F.collect_set("fp").alias("s"))
            .collect()
        }
        assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"

    def test_density_and_short_doc(self, spark):
        from tika_xapian_spark.operators.dedup import winnow_fingerprints

        k, w = 5, 4
        n = 500
        text = " ".join(f"w{i}" for i in range(n))  # all-distinct tokens
        docs = spark.createDataFrame(
            [(1, text), (2, "too short here")],  # doc 2: < k + w - 1 tokens
            "doc_id long, text string",
        )
        rows = winnow_fingerprints(docs, key="doc_id", k=k, w=w).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc"], set()).add(r["fp"])
        n_windows = (n - k + 1) - w + 1
        n_sel = len(by_doc[1])
        assert n_sel <= n_windows
        # random-hash expectation is 2/(w+1) of gram count; allow wide slack
        assert n_sel >= (n - k + 1) * 2 // (w + 1) // 2
        assert 2 not in by_doc


class TestAnomalyMad:
    def test_spike_flagged_constant_type_null(self, spark, tmp_path):
        """29 ordinary days (counts 9..11) + one 80-event spike: the spike
        day scores > 3 MAD units and is the only flagged row; a type with
        identical volume every day has mad = 0 -> NULL dev, never flagged
        (a stddev rule would divide by zero or flag everything)."""
        from datetime import datetime, timedelta

        from tika_xapian_spark.plans.rel_queries import q_events_anomaly_mad

        rows, eid = [], 0
        base = datetime(2024, 3, 1)
        for d in range(30):
            n = 80 if d == 15 else (9 + (d % 3))
            for _ in range(n):
                rows.append((eid, base + timedelta(days=d), 1, "click", 1.0, "{}"))
                eid += 1
            for _ in range(5):  # constant-volume type
                rows.append((eid, base + timedelta(days=d), 2, "view", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        out = q_events_anomaly_mad(spark, str(tmp_path)).collect()
        flagged = [(r.event_type, r.day.day) for r in out if r.anomalous]
        assert flagged == [("click", 16)]
        views = [r for r in out if r.event_type == "view"]
        assert all(r.dev_micro is None and r.anomalous == 0 for r in views)
