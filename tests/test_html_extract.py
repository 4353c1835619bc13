"""HTML main-content extractor behavior tests: boilerplate classification,
entity handling, raw-skip tags, malformed markup resilience, determinism."""

from tika_xapian_spark.operators.html_extract import extract_main_content

ARTICLE = (
    "This is a long paragraph of real prose with enough of the most common "
    "words that the classifier will see it is content and not navigation, "
    "because it was written for a reader to actually read."
)


def page(body: str, title: str = "T") -> str:
    return f"<!DOCTYPE html><html><head><title>{title}</title></head><body>{body}</body></html>"


class TestClassification:
    def test_nav_dropped_content_kept(self):
        html = page(
            "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
            f"<div><p>{ARTICLE}</p></div>"
            "<footer><a href='/t'>Terms</a></footer>"
        )
        r = extract_main_content(html)
        assert r.text == ARTICLE
        assert r.title == "T"

    def test_link_farm_dropped(self):
        links = " ".join(f"<a href='/{i}'>Category link {i}</a>" for i in range(20))
        html = page(f"<div>{links}</div><p>{ARTICLE}</p>")
        r = extract_main_content(html)
        assert r.text == ARTICLE

    def test_heading_promoted_next_to_content(self):
        html = page(f"<h1>A Decent Headline</h1><p>{ARTICLE}</p>")
        r = extract_main_content(html)
        assert r.text == f"A Decent Headline\n{ARTICLE}"

    def test_isolated_short_fragment_dropped(self):
        html = page(
            "<p>tiny</p><div style='x'>copyright 2020</div>"
            "<table><tr><td>ad</td></tr></table>"
        )
        r = extract_main_content(html)
        assert r.text == ""

    def test_multiple_paragraphs_joined(self):
        html = page(f"<p>{ARTICLE}</p><p>{ARTICLE}</p>")
        r = extract_main_content(html)
        assert r.text == f"{ARTICLE}\n{ARTICLE}"


class TestMechanics:
    def test_script_style_skipped(self):
        html = page(
            "<script>var x = 'the the the the should not leak';</script>"
            "<style>.a { color: red }</style>"
            f"<p>{ARTICLE}</p>"
        )
        r = extract_main_content(html)
        assert "leak" not in r.text
        assert r.text == ARTICLE

    def test_entities_unescaped(self):
        html = page(f"<p>{ARTICLE} Fish &amp; chips &lt;tag&gt; caf&eacute;.</p>")
        r = extract_main_content(html)
        assert "Fish & chips <tag> café." in r.text

    def test_comments_and_cdata_ignored(self):
        html = page(f"<!-- the the the comment --><p>{ARTICLE}</p>")
        assert extract_main_content(html).text == ARTICLE

    def test_unclosed_tags_resilient(self):
        html = page(f"<div><p>{ARTICLE}<p>second {ARTICLE}")
        r = extract_main_content(html)
        assert ARTICLE in r.text

    def test_whitespace_normalized_inside_blocks(self):
        html = page(f"<p>{ARTICLE[:60]}\n\t   {ARTICLE[60:]}</p>")
        r = extract_main_content(html)
        assert "\t" not in r.text and "  " not in r.text

    def test_deterministic(self):
        html = page(f"<nav><a href='/'>x</a></nav><p>{ARTICLE}</p>")
        assert extract_main_content(html) == extract_main_content(html)

    def test_empty_and_garbage(self):
        assert extract_main_content("").text == ""
        assert extract_main_content("<<<>>><p").text == ""
        assert extract_main_content("just bare text " + ARTICLE).text != ""
