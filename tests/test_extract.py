"""T-extract: the byte-identical extraction invariant (SURVEY.md §5.2) plus
frontmatter edge cases, against the generator's built-in expected outputs."""

import pytest

from tika_xapian_spark.operators.extract import (
    extract_pages,
    normalize_date,
    parse_page,
    quarantine,
    split_frontmatter,
)
from tika_xapian_spark.sources.pages import gen_row, synth_pages


class TestSplitFrontmatter:
    def test_basic(self):
        raw = b"---\ntitle: x\n---\n\nbody\n"
        y, body = split_frontmatter(raw)
        assert y == b"title: x\n"
        assert body == b"\nbody\n"

    def test_crlf_body_preserved(self):
        raw = b"---\ntitle: x\n---\nline\r\ncrlf\r\n"
        _, body = split_frontmatter(raw)
        assert body == b"line\r\ncrlf\r\n"

    def test_inner_dashes_stay_in_body(self):
        raw = b"---\ntitle: x\n---\nbefore\n---\nafter\n"
        _, body = split_frontmatter(raw)
        assert body == b"before\n---\nafter\n"

    def test_empty_body(self):
        y, body = split_frontmatter(b"---\ntitle: x\n---\n")
        assert y is not None
        assert body == b""

    def test_no_frontmatter(self):
        y, body = split_frontmatter(b"plain text")
        assert y is None

    def test_unterminated(self):
        y, _ = split_frontmatter(b"---\ntitle: x\nno close")
        assert y is None

    def test_non_utf8_body_bytes_unchanged(self):
        raw = b"---\ntitle: x\n---\n\xff\xfe raw bytes"
        _, body = split_frontmatter(raw)
        assert body == b"\xff\xfe raw bytes"


class TestNormalizeDate:
    def test_no_colon_offset(self):
        # the reference's documented example date (src/tika_document.rs:12)
        assert normalize_date("2021-06-22T12:48:16-0400") == "2021-06-22T16:48:16+00:00"

    def test_rfc3339_colon_offset(self):
        assert normalize_date("2021-06-22T22:18:16+05:30") == "2021-06-22T16:48:16+00:00"

    def test_zulu(self):
        assert normalize_date("2021-06-22T16:48:16Z") == "2021-06-22T16:48:16+00:00"

    def test_naive_rejected(self):
        assert normalize_date("2021-06-22T16:48:16") is None

    def test_garbage_rejected(self):
        assert normalize_date("not a date") is None


class TestParsePage:
    def test_reference_example(self):
        raw = (
            b"---\n"
            b"author: Steve Sosik\n"
            b"date: 2021-06-22T12:48:16-0400\n"
            b"tags:\n- tika\n"
            b"title: This is an example note\n"
            b"---\n\n"
            b"Some note here formatted with Markdown syntax\n"
        )
        d = parse_page("https://h.example/p/note1.md", raw)
        assert d["status"] == "ok"
        assert d["author"] == "Steve Sosik"
        assert d["date"] == "2021-06-22T16:48:16+00:00"
        assert d["tags"] == ["tika"]
        assert d["title"] == "This is an example note"
        assert d["body_bytes"] == b"\nSome note here formatted with Markdown syntax\n"
        assert d["filename"] == "note1.md"  # backfilled

    def test_scalar_tags(self):
        raw = b"---\ndate: 2021-06-22T12:48:16-0400\ntags: tika\ntitle: t\n---\nb"
        d = parse_page("u/x.md", raw)
        assert d["tags"] == ["tika"]

    def test_missing_required(self):
        raw = b"---\ntitle: t\n---\nb"
        d = parse_page("u/x.md", raw)
        assert d["status"] == "error"
        assert "missing required" in d["error"]

    def test_bad_date_quarantined(self):
        raw = b"---\ndate: nope\ntags: t\ntitle: t\n---\nb"
        d = parse_page("u/x.md", raw)
        assert d["status"] == "error"

    def test_explicit_filename_kept(self):
        raw = b"---\nfilename: custom.md\ndate: 2021-06-22T12:48:16-0400\ntags: t\ntitle: t\n---\nb"
        d = parse_page("u/else.md", raw)
        assert d["filename"] == "custom.md"


@pytest.mark.usefixtures("spark")
class TestExtractPagesSpark:
    N = 256

    def test_byte_identical_against_expected(self, spark):
        pages = synth_pages(spark, self.N, with_expected=True)
        docs = extract_pages(
            pages.select("url", "warc_ts", "html", "text", "lang")
        )
        exp = pages.select(
            "url", "exp_status", "exp_body_bytes", "exp_author", "exp_title",
            "exp_subtitle", "exp_date", "exp_tags", "exp_filename",
        )
        j = docs.join(exp, "url").collect()
        assert len(j) == self.N
        bad = []
        for r in j:
            if r["status"] != r["exp_status"]:
                bad.append(f"{r['url']}: status {r['status']} != {r['exp_status']} ({r['error']})")
                continue
            if r["status"] != "ok":
                continue
            if bytes(r["body_bytes"] or b"") != bytes(r["exp_body_bytes"] or b""):
                bad.append(
                    f"{r['url']}: body {bytes(r['body_bytes'] or b'')!r} != {bytes(r['exp_body_bytes'] or b'')!r}"
                )
            for col in ("author", "title", "subtitle", "date", "filename"):
                if (r[col] or None) != (r[f"exp_{col}"] or None):
                    bad.append(f"{r['url']}: {col} {r[col]!r} != {r['exp_' + col]!r}")
            if list(r["tags"] or []) != list(r["exp_tags"] or []):
                bad.append(f"{r['url']}: tags {r['tags']} != {r['exp_tags']}")
        assert not bad, "\n".join(bad[:20])

    def test_quarantine_channel(self, spark):
        pages = synth_pages(spark, 64)
        docs = extract_pages(pages)
        q = quarantine(docs)
        # every 8th row is the no-frontmatter error case
        assert q.count() == 8
        assert all("frontmatter" in r["error"] for r in q.collect())


def test_gen_row_deterministic():
    a = gen_row(12345)
    b = gen_row(12345)
    assert a == b


class TestFastFrontmatterEquivalence:
    """The hand-rolled frontmatter fast path must agree with PyYAML wherever
    it claims a parse (None = fallback, always safe)."""

    CASES = [
        "title: my note 42\nauthor: someone\ndate: 2021-01-02T03:04:05Z\ntags: [a, b]",
        "title: spaced out words\ntags: word",
        "title: has 'quotes' inside\ntags: [one]",
        "date: 2021-01-02\ntags: []\ntitle: t",
        "date: 2021-13-45T00:00:00Z\ntags: [x]\ntitle: t",  # invalid month
        "title: true\ntags: [a]\ndate: 2020-01-01T00:00:00Z",  # bool word
        "title: 123\ntags: [a]\ndate: 2020-01-01T00:00:00Z",  # number
        "title: |\n  block\ntags: [a]",  # block scalar
        "nested:\n  k: v",
        "tags: [a, 01]",  # numeric-ish list item
        "title: trailing colon: inside",
        "title:no-space",
        "# only a comment\ntitle: t\ntags: [a]\ndate: 2020-01-01T00:00:00Z",
        "title: ends with period.\ntags: [a-b, c_d]\ndate: 2020-01-01 03:04:05+02:00",
        "author: Author 0\ndate: 2021-06-22T12:48:16-0400\ntags:\n- tika\n- t0\ntitle: Example note 0",
        "tags:\n  - one\n  - two words here\ntitle: t\ndate: 2020-01-01T00:00:00Z",
        "tags:\n- ok\n  - badindent\ntitle: t",
        "tags:\n- true\ntitle: t",  # bool item
        "tags:\ntitle: t",  # key with no items
        "tags:\n- \ntitle: t",  # empty item
    ]

    def test_fast_path_matches_yaml(self):
        import yaml

        from tika_xapian_spark.operators.extract import (
            _fast_frontmatter,
            normalize_date,
        )

        loader = getattr(yaml, "CSafeLoader", yaml.SafeLoader)
        for text in self.CASES:
            fast = _fast_frontmatter(text)
            if fast is None:
                continue  # fallback — always safe
            slow = yaml.load(text, Loader=loader)
            assert set(fast) == set(slow), text
            for k in fast:
                if k == "date":
                    assert normalize_date(str(fast[k])) == normalize_date(
                        str(slow[k])
                    ), text
                else:
                    assert fast[k] == slow[k], (text, k)

    def test_fast_path_claims_the_common_shape(self):
        from tika_xapian_spark.operators.extract import _fast_frontmatter

        got = _fast_frontmatter(
            "title: my note 42\nauthor: someone\n"
            "date: 2021-01-02T03:04:05Z\ntags: [a, b]"
        )
        assert got == {
            "title": "my note 42",
            "author": "someone",
            "date": "2021-01-02T03:04:05Z",
            "tags": ["a", "b"],
        }


class TestQuarantineRobustness:
    def test_invalid_yaml_timestamp_quarantines_not_crashes(self, spark):
        # PyYAML raises raw ValueError for resolvable-but-invalid datetimes
        # on keys the fast path doesn't shield; must hit the error channel
        from tika_xapian_spark.operators.extract import parse_page

        raw = (
            b"---\nupdated: 2020-02-30T00:00:00Z\ntitle: t\ntags: [a]\n"
            b"date: 2020-01-01T00:00:00Z\n---\nbody\n"
        )
        d = parse_page("https://x/doc.md", raw)
        assert d["status"] != "ok"
        assert "value error" in (d["error"] or "")

    def test_tab_indented_frontmatter_falls_back_and_quarantines(self):
        # YAML forbids tab indentation; the fast path must not accept what
        # the real parser rejects
        from tika_xapian_spark.operators.extract import _fast_frontmatter

        assert _fast_frontmatter("tags:\n\t- a\ntitle: t") is None
