"""MSet::snippet parity: string-equal against xapian-core's golden cases
(tests/api_snippets.cc snippet1 / snippetstem1 / snippetphrase1), run over a
replica of the apitest_simpledata corpus indexed the way the xapian test
harness does (tests/harness/index_utils.cc FileIndexer: whitespace-split,
munge to lowercase alnum, stem EVERY word with the english stemmer).

Pure-Python tests — no Spark session needed."""

import math
import re

import pytest

from tika_xapian_spark.functions.porter2 import stem as porter2_stem
from tika_xapian_spark.operators.snippet import (
    SnippetContext,
    snippet,
)

# tests/testdata/apitest_simpledata.txt (public xapian-core test data)
SIMPLEDATA = """This is a test document used with the API test.  This paragraph must be at
least three lines (including the blank line) to be counted as a "paragraph".

This file will be indexed by paragraph, and the simple query will search
for the word "word".  We'll expect the mset to contain two documents, including
this paragraph and the fourth, below.  Since this paragraph uses the word
"word" so much, this should be the first one in the match set.  I'll just say
the word a few more times (word!) to make sure of that.  If this doesn't word
(typo, I meant work), then there may be four-letter words spoken.

This paragraph only has a load of absolute rubbish, and nothing of any use
whatsoever.

This is the other paragraph with the word in the simple query in it.  For
simplicity, all paragraphs are at least two lines, due to how the hacked up
indexer works.

This is another paragraph which won't be returned.  Well, not with the
simple query, anyway.

And yet another.  This one does mention banana splits, though, so can't be
that bad.
"""

# Xapian BM25 defaults (weight/bm25weight.cc): k1=1, k3=1, b=0.5, min_normlen=0.5
K1, K3, B, MIN_NORMLEN = 1.0, 1.0, 0.5, 0.5


def _munge(word: str) -> str:
    # index_utils.cc munge_term: keep alnum lowercased (no escapes in corpus)
    return re.sub(r"[^a-z0-9]", "", word.lower())


class ApitestDb:
    """FileIndexer replica: one document per paragraph; every whitespace
    word munged then stemmed (english) — the db holds ONLY stemmed forms,
    no Z prefix (unlike TermGenerator conventions)."""

    def __init__(self):
        paras = [p for p in SIMPLEDATA.split("\n\n") if p.strip()]
        self.docs = []
        for p in paras:
            terms = [
                porter2_stem(_munge(w)) for w in p.split() if _munge(w)
            ]
            self.docs.append(terms)
        self.n_docs = len(self.docs)
        self.df = {}
        self.max_wdf = {}
        for terms in self.docs:
            wdf = {}
            for t in terms:
                wdf[t] = wdf.get(t, 0) + 1
            for t, w in wdf.items():
                self.df[t] = self.df.get(t, 0) + 1
                self.max_wdf[t] = max(self.max_wdf.get(t, 0), w)

    def termfreq(self, term: str) -> int:
        return self.df.get(term, 0)

    def max_part(self, term: str) -> float:
        """BM25Weight::get_maxpart — the matcher's per-term score bound
        (same formula as search._term_upper_bounds)."""
        df = self.df.get(term)
        if not df:
            return 0.0
        tw = (self.n_docs - df + 0.5) / (df + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        termweight = math.log(tw) * (K1 + 1)
        max_wdf = self.max_wdf[term]
        denom = K1 * (MIN_NORMLEN * B + (1 - B)) + max_wdf
        return termweight * max_wdf / denom


@pytest.fixture(scope="module")
def db():
    d = ApitestDb()
    assert d.n_docs == 6
    return d


def make_ctx(db, loose=(), phrases=(), wildcards=()):
    all_terms = set(loose) | {t for p in phrases for t in p}
    return SnippetContext(
        termweights={t: db.max_part(t) for t in all_terms},
        collection_size=db.n_docs,
        termfreq=db.termfreq,
        loose_terms=list(loose),
        exact_phrases=[tuple(p) for p in phrases],
        wildcards=list(wildcards),
    )


class TestSnippet1:
    """api_snippets.cc snippet1: query rubbish OR mention, no stemming."""

    CASES = [
        ("Rubbish and junk", 20, "<b>Rubbish</b> and junk"),
        ("Project R.U.B.B.I.S.H. greenlit", 31,
         "Project <b>R.U.B.B.I.S.H.</b> greenlit"),
        ("What a load of rubbish", 100, "What a load of <b>rubbish</b>"),
        ("Mention rubbish", 100, "<b>Mention</b> <b>rubbish</b>"),
        ("A mention of rubbish", 100, "A <b>mention</b> of <b>rubbish</b>"),
        ("Rubbish mention of rubbish", 100,
         "<b>Rubbish</b> <b>mention</b> of <b>rubbish</b>"),
        ("Rubbish and junk", 12, "<b>Rubbish</b> and..."),
        ("Project R.U.B.B.I.S.H. greenlit", 14, "...<b>R.U.B.B.I.S.H.</b>..."),
        ("What a load of rubbish", 12, "...of <b>rubbish</b>"),
        ("What a load of rubbish", 8, "...<b>rubbish</b>"),
        ("Rubbish mention where the start is better than the rubbish ending",
         18, "<b>Rubbish</b> <b>mention</b>..."),
        ("And of the rubbish document to this", 18, "...<b>rubbish</b> document..."),
        ("And if they document rubbish to be this", 18, "...document <b>rubbish</b>..."),
    ]

    def test_cases(self, db):
        ctx = make_ctx(db, loose=["rubbish", "mention"])
        for text, length, expect in self.CASES:
            got = snippet(ctx, text, length)  # no stemmer (Xapian::Stem())
            assert got == expect, (text, length, got, expect)


class TestSnippetStem1:
    """snippetstem1: query rubbish OR Zexampl, english stemmer."""

    CASES = [
        ("You rubbished my ideas", 24, "You rubbished my ideas"),
        ("Rubbished all my examples", 20, "...all my <b>examples</b>"),
        ("Examples of text", 20, "<b>Examples</b> of text"),
    ]

    def test_cases(self, db):
        ctx = make_ctx(db, loose=["rubbish", "Zexampl"])
        for text, length, expect in self.CASES:
            got = snippet(ctx, text, length, stemmer=porter2_stem)
            assert got == expect, (text, length, got, expect)


class TestSnippetPhrase1:
    """snippetphrase1: (rubbish PHRASE mention) AND_NOT banana."""

    CASES = [
        ("A mention of rubbish", 18, "...mention of rubbish"),
        ("This is a rubbish mention", 20, "...is a <b>rubbish mention</b>"),
        ("Mention of a rubbish mention of rubbish", 45,
         "Mention of a <b>rubbish mention</b> of rubbish"),
        ("Mention of a rubbish mention of rubbish", 18,
         "...<b>rubbish mention</b> of..."),
        ("rubbish rubbish mention mention", 45,
         "rubbish <b>rubbish mention</b> mention"),
        ("rubbish mention rubbish mention", 45,
         "<b>rubbish mention</b> <b>rubbish mention</b>"),
    ]

    def test_cases(self, db):
        ctx = make_ctx(
            db, loose=["banana"], phrases=[("rubbish", "mention")]
        )
        for text, length, expect in self.CASES:
            got = snippet(ctx, text, length, stemmer=porter2_stem)
            assert got == expect, (text, length, got, expect)


class TestEdgeCases:
    def test_too_easy_path(self, db):
        # empty highlighters + text within length -> returned verbatim
        ctx = make_ctx(db, loose=["rubbish"])
        assert snippet(ctx, "any old text", 100, hi_start="", hi_end="") == (
            "any old text"
        )

    def test_empty_without_match_flag(self, db):
        from tika_xapian_spark.operators.snippet import (
            SNIPPET_EMPTY_WITHOUT_MATCH,
            SNIPPET_EXHAUSTIVE,
        )

        ctx = make_ctx(db, loose=["rubbish"])
        flags = SNIPPET_EXHAUSTIVE | SNIPPET_EMPTY_WITHOUT_MATCH
        assert snippet(ctx, "nothing matches here", 10, flags=flags) == ""
        out = snippet(ctx, "some rubbish here", 100, flags=flags)
        assert "<b>rubbish</b>" in out

    def test_custom_markers(self, db):
        ctx = make_ctx(db, loose=["rubbish"])
        got = snippet(
            ctx, "What a load of rubbish", 12,
            hi_start="[", hi_end="]", omit="~",
        )
        assert got == "~of [rubbish]"

    def test_xml_escaping(self, db):
        ctx = make_ctx(db, loose=["rubbish"])
        got = snippet(ctx, "a <tag> & rubbish", 100)
        assert got == "a &lt;tag&gt; &amp; <b>rubbish</b>"

    def test_empty_text(self, db):
        ctx = make_ctx(db, loose=["rubbish"])
        assert snippet(ctx, "", 100) == ""


class TestSnippetShapes:
    def test_compiler_decomposition(self):
        from tika_xapian_spark.plans.query_compiler import (
            compile_query,
            snippet_shapes,
        )

        node = compile_query('spark "big table" merg* -slow', partial=False)
        loose, phrases, wildcards = snippet_shapes(node)
        assert "Zspark" in loose and "Zslow" in loose  # both AND_NOT sides
        assert ("big", "table") in phrases
        assert "merg" in wildcards

    def test_partial_mode_shapes(self):
        from tika_xapian_spark.plans.query_compiler import (
            compile_query,
            snippet_shapes,
        )

        loose, phrases, wildcards = snippet_shapes(compile_query("spar"))
        assert wildcards == ["spar"] and loose == ["Zspar"]


def test_snippets_for_page_string_keys(spark):
    """Pages keyed by url STRINGS (the fused pipeline's doc key) must work —
    the result schema derives the key type from the page."""
    from tika_xapian_spark.operators import search as S
    from tika_xapian_spark.operators.index import InvertedIndex
    from tika_xapian_spark.operators.snippet import snippets_for_page

    docs = spark.createDataFrame(
        [("https://a/1", "rubbish and junk here"),
         ("https://a/2", "nothing to see")],
        "url string, text string",
    )
    idx = InvertedIndex.build_from_body(docs, key="url", stem=True)
    try:
        top = S.top_k(S.score_free_text(idx, "rubbish"), k=5)
        page = docs.join(top, docs["url"] == top["doc"]).drop("doc")
        out = {
            r["url"]: r["snippet"]
            for r in snippets_for_page(
                idx, page, "url", "text", loose_terms=["Zrubbish"], length=50
            ).collect()
        }
        assert "<b>rubbish</b>" in out["https://a/1"]
    finally:
        idx.unpersist()
