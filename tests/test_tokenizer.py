"""Tokenizer golden tests, ported from the published golden triples of
xapian-core-1.4.17.tar.xz!tests/api_termgen.cc:86-120 (format documented at
its lines 40-83) and the reference's indexing field order
(/root/reference/src/main.rs:123-133)."""

from tika_xapian_spark.functions.tokenizer import (
    Token,
    format_postings,
    index_document,
    index_text,
    scan_terms,
)


def postings_for(text: str, prefix: str = "") -> str:
    tokens, _ = index_text(text, prefix=prefix)
    return format_postings(tokens)


# (text, expected) — STEM_SOME with english stemmer, no prefix.
# Golden strings from api_termgen.cc test_simple[] (stem=en active).
GOLDEN_STEMMED = [
    ("simple-example", "Zexampl:1 Zsimpl:1 example[2] simple[1]"),
    ("I.B.M.", "Zibm:1 ibm[1]"),
    ("I.B.M", "Zibm:1 ibm[1]"),
    ("I.B.", "Zib:1 ib[1]"),
    ("I.B", "Zib:1 ib[1]"),
    ("I.", "Zi:1 i[1]"),
    ("I.B.M. P.C.", "Zibm:1 Zpc:1 ibm[1] pc[2]"),
    ("I.B.M P.C.", "Zibm:1 Zpc:1 ibm[1] pc[2]"),
    (
        "Pi is 3.1415926536 approximately",
        "3.1415926536[3] Zapproxim:1 Zis:1 Zpi:1 approximately[4] is[2] pi[1]",
    ),
    ("hello World Test", "Zhello:1 Ztest:1 Zworld:1 hello[1] test[3] world[2]"),
    ("time_t", "Ztime_t:1 time_t[1]"),
    ("stock -cooking", "Zcook:1 Zstock:1 cooking[2] stock[1]"),
    ("d- school report", "Zd:1 Zreport:1 Zschool:1 d[1] report[3] school[2]"),
    ("gtk+ -gnome", "Zgnome:1 Zgtk+:1 gnome[2] gtk+[1]"),
    ("c++ -d--", "Zc++:1 Zd:1 c++[1] d[2]"),
    ("cd'r toebehoren", "Zcd'r:1 Ztoebehoren:1 cd'r[1] toebehoren[2]"),
]


def test_golden_stemmed():
    failures = []
    for text, expected in GOLDEN_STEMMED:
        got = postings_for(text)
        if got != expected:
            failures.append(f"{text!r}:\n  got      {got}\n  expected {expected}")
    assert not failures, "\n".join(failures)


def test_numbers_no_stem():
    # digit-initial terms are not stemmed (should_stem mask)
    assert postings_for("1.0 1000,000.99 0.9.9,") == "0.9.9[3] 1.0[1] 1000,000.99[2]"


def test_prefixed():
    # api_termgen.cc: { "prefix=XA", "hello World Test", ... }
    assert (
        postings_for("hello World Test", prefix="XA")
        == "XAhello[1] XAtest[3] XAworld[2] ZXAhello:1 ZXAtest:1 ZXAworld:1"
    )


def test_max_term_length_dropped():
    long_word = "a" * 65
    toks, _ = index_text(f"{long_word} ok")
    terms = [t.term for t in toks]
    assert all(len(t.encode()) <= 65 for t in terms)
    assert "ok" in terms
    assert not any(t.startswith("aaa") for t in terms)
    # position counter: dropped term still does NOT consume a position in
    # xapian (the action returns before add_posting)
    assert [t.pos for t in toks if t.term == "ok"] == [1]


def test_infix_apostrophe_and_amp():
    assert scan_terms("AT&T don't") == ["at&t", "don't"]
    assert scan_terms("M&S") == ["m&s"]
    # Unicode right single quote normalized to '
    assert scan_terms("don’t") == ["don't"]


def test_suffix_rules():
    assert scan_terms("c++") == ["c++"]
    assert scan_terms("c++++") == ["c"]  # >3 suffix chars -> dropped
    assert scan_terms("fish+chips") == ["fish", "chips"]
    assert scan_terms("c#") == ["c#"]


def test_position_continuation_across_fields():
    # field order per src/main.rs:123-133: A, D, F, F, S, XS, K*, body
    tokens = index_document(
        [
            ("A", "steve"),
            ("D", "2021"),
            ("F", "note.md"),
            ("S", "hello world"),
            ("", "body text"),
        ]
    )
    positional = [(t.term, t.pos) for t in tokens if t.pos is not None]
    assert positional == [
        ("Asteve", 1),
        ("D2021", 2),
        ("Fnote", 3),
        ("Fmd", 4),
        ("Shello", 5),
        ("Sworld", 6),
        ("body", 7),
        ("text", 8),
    ]


def test_wdf_accumulates_per_term():
    tokens, _ = index_text("spark spark spark fast")
    assert format_postings(tokens) == "Zfast:1 Zspark:3 fast[4] spark[1,2,3]"


def test_empty_and_whitespace():
    assert scan_terms("") == []
    assert scan_terms("   \n\t .,;") == []


LONG62 = "REALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYLONG"


def test_64_byte_boundary_goldens():
    # api_termgen.cc:126-129
    assert postings_for(f"a {LONG62} term") == (
        f"Za:1 Z{LONG62.lower()}:1 Zterm:1 a[1] {LONG62.lower()}[2] term[3]"
    )
    assert postings_for(f"a {LONG62}X term") == "Za:1 Zterm:1 a[1] term[2]"


def test_zero_width_chars_ignored_as_infix():
    # api_termgen.cc:131-136 (Myanmar text joined across U+200B)
    text = (
        "ဥ​အ"  # two word chars joined by a zero-width space
    )
    assert scan_terms(text) == ["ဥအ"]


def test_colon_in_numbers_splits():
    # api_termgen.cc:203-205: colon is not a digit-infix char
    assert scan_terms("11:59") == ["11", "59"]
    assert scan_terms("11:59am") == ["11", "59am"]


class TestChunkedScanEquivalence:
    def test_chunked_equals_exact_on_adversarial_text(self):
        import random

        from tika_xapian_spark.functions.tokenizer import (
            scan_terms,
            scan_terms_chunked,
        )

        rnd = random.Random(13)
        pieces = [
            "hello", "WORLD", "U.S.A.", "c++", "c#", "don't", "3.14",
            "a1b2", "x", "A.B", "foo-bar", "q+", "r##", "naïve", "tag:",
            "...", "+#", "#lead", "trail.", "mid.dot", "1,000", "a_b",
            "ALLCAPS", "MiXeD", "z" * 70,
        ]
        seps = [" ", "  ", "\t", "\n", " \r\n ", " "]
        for _ in range(300):
            text = "".join(
                rnd.choice(pieces) + rnd.choice(seps)
                for _ in range(rnd.randint(1, 25))
            )
            assert scan_terms_chunked(text) == scan_terms(text), repr(text)

    def test_chunked_equals_exact_on_plain_text(self):
        from tika_xapian_spark.functions.tokenizer import (
            scan_terms,
            scan_terms_chunked,
        )

        t = "plain lowercase words with no specials at all"
        assert scan_terms_chunked(t) == scan_terms(t)
