"""HTML → text extraction: scanner semantics, boilerplate heuristic,
totality over arbitrary soup (pure-kernel, plus the seam's
boilerplate flag; the Spark/WARC chain is covered in
test_pipeline.py and test_composition.py)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from coltt_spark.operators.html_text import (
    extract_html_blocks,
    extract_html_text,
    strip_boilerplate_text,
)


def test_block_segmentation_and_whitespace():
    """Block tags delimit lines; source newlines are HTML whitespace
    (NOT line breaks) and collapse to single spaces; empty blocks
    drop; inline tags don't split."""
    html = (
        "<h1>Title</h1><p>one\ntwo\t three</p><div></div>"
        "<p>a <b>bold <i>run</i></b> c</p>text after"
    )
    assert extract_html_text(html) == "Title\none two three\na bold run c\ntext after"


def test_rawtext_elements_skipped_wholesale():
    """script/style content is NOT markup: fake tags, comparison
    operators, and entity-lookalikes inside them never reach the
    output; the element itself acts as a block boundary."""
    html = (
        '<p>before</p><script>var s = "<p>nope</p>"; if (a < b && c > d) '
        'x("&amp;");</script><style>p > a { color: red } /* <div>x</div> '
        "*/</style><p>after</p>"
    )
    assert extract_html_text(html) == "before\nafter"
    # unterminated raw text drops the remainder, totally
    assert extract_html_text("<p>kept</p><script>never closed") == "kept"


def test_comments_dropped_even_with_fake_tags():
    html = "<p>a</p><!-- <p>fake</p> \n multi\nline --><p>b</p><!-- unclosed"
    assert extract_html_text(html) == "a\nb"


def test_quote_aware_tag_scan():
    """A '>' inside a quoted attribute value does not terminate the
    tag — the classic regex-stripper failure."""
    html = "<p data-x='a>b' title=\"c>d\">text</p>"
    assert extract_html_text(html) == "text"


def test_entities_decode():
    assert (
        extract_html_text("<p>Tom &amp; Jerry &lt;&quot;q&#39;&gt; &#x41; &#66;</p>")
        == "Tom & Jerry <\"q'> A B"
    )
    # unknown entity and bare ampersand stay literal
    assert extract_html_text("<p>x &unknownent; y &amp z</p>") == "x &unknownent; y &amp z"


def test_literal_angle_brackets_survive():
    assert extract_html_text("<p>a < b and i <3 you</p>") == "a < b and i <3 you"


def test_case_insensitive_tags():
    assert extract_html_text("<P>one</P><DIV>two</DIV><Br>three") == "one\ntwo\nthree"


def test_link_density_and_boilerplate():
    """Short link-dominated blocks (nav/footer signature) drop; prose
    and long link-dense blocks survive."""
    prose = "Long prose content sentence repeated for length. " * 3
    html = (
        '<div><a href="/">Home</a> | <a href="/a">About</a></div>'
        f"<p>{prose}</p>"
        '<div><a href="/t1">tag1</a> <a href="/t2">tag2</a></div>'
        f'<p><a href="/ref">{prose}</a></p>'
    )
    blocks = extract_html_blocks(html)
    assert [round(f, 2) for _, f in blocks] == [0.9, 0.0, 1.0, 1.0]
    cleaned = strip_boilerplate_text(html)
    assert "Home" not in cleaned and "tag1" not in cleaned
    assert cleaned.splitlines() == [prose.strip()] * 2  # both prose blocks kept


def test_plain_text_is_whitespace_normalization_only():
    plain = "no markup here, just text with   spaces\nand a newline"
    assert extract_html_text(plain) == re.sub(r"\s+", " ", plain).strip()


@settings(max_examples=300, deadline=None)
@given(
    soup=st.text(
        alphabet=st.sampled_from(list("<>&\"'/=!- \n\tabcdeispPSCRIPTstyle#;0123456789")),
        max_size=300,
    )
)
def test_extraction_total_over_arbitrary_soup(soup):
    """Any byte soup extracts without raising, returns a str, and the
    output never contains markup artifacts from WELL-FORMED tags
    (a '<' immediately followed by a letter always opens a tag and is
    consumed or dropped — never echoed with its name)."""
    out = extract_html_text(soup)
    assert isinstance(out, str)
    blocks = extract_html_blocks(soup)
    assert all(0.0 <= f <= 1.0 for _, f in blocks)
    assert all(t == t.strip() and t for t, _ in blocks)


@settings(max_examples=100, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=200
    )
)
def test_escape_extract_roundtrip(text):
    """html.escape(text) wrapped in a paragraph extracts back to the
    whitespace-normalized text — the identity the WARC-HTML oracle
    relies on (entity decode inverts escape for ANY payload)."""
    import html as hm

    norm = re.sub(r"[ \t\r\n\f\v]+", " ", text).strip()
    got = extract_html_text(f"<p>{hm.escape(text)}</p>")
    assert got == norm


def test_html_extract_boilerplate_option(spark):
    """The Spark seam's strip_boilerplate flag applies the per-page
    link-density heuristic inside the same narrow kernel."""
    prose = "Real content sentence that carries meaning and length. " * 3
    page = (
        '<div><a href="/">Home</a> | <a href="/b">Blog</a></div>'
        f"<p>{prose}</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    from coltt_spark.operators.html_text import html_extract

    full = html_extract(df).collect()[0]["text"]
    clean = html_extract(df, strip_boilerplate=True).collect()[0]["text"]
    assert full.splitlines()[0] == "Home | Blog"
    assert clean == prose.strip()
