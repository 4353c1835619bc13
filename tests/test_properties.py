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
