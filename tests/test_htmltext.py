"""Span-scanner conformance: byte-equality against the REAL reference C
state machine (compiled from /root/reference at test time) plus structural
span checks. SURVEY.md §5.2."""

import subprocess

import numpy as np
import pytest

from high_performance_parallel_search_engine_ray.functions.htmltext import (
    extract_title,
    get_medium_filename,
    html_to_events,
    html_to_spans,
    is_useful_content,
    render_flat,
)

USEFUL = "This paragraph has plenty of alphabetic characters and spaces to pass."

CASES = [
    "",
    "   \t\n  ",
    "plain text with no tags at all",
    "<html><head><title>T</title></head><body>hello world</body></html>",
    # no <body>: head is scanned, title captured? (suppressed inside <head>)
    "<html><head><title>Captured?</title></head>no body tag here</html>",
    # title without head wrapper -> captured
    "<title>Free Title</title>some text",
    "<html><body><h1>Heading</h1><p>" + USEFUL + "</p></body></html>",
    # medium page with article shift
    '<html><body>skip me<article x="medium.com"><h1>Title A</h1><p>'
    + USEFUL
    + "</p><h2>Sub</h2><p>short</p></article></body></html>",
    # medium marker only BEFORE the shift point (shifted html loses it)
    '<html data-x="medium.com"><body><h1>H</h1><p>' + USEFUL + "</p></body></html>",
    # entities, known and unknown
    "<body>A &amp; B &lt;x&gt; &quot;q&quot; &nbsp; &#039; &mdash; &bogus C &toolongentity1234; D</body>",
    # comments and script/style
    "<body>before<!-- secret <p>hidden</p> -->after<script>var x='<p>';</script><style>p{}</style>tail</body>",
    # unclosed comment swallows the rest
    "<body>start<!-- never closed <p>gone</p>",
    # unclosed tag
    "<body>text <a href='x' unclosed",
    # paragraph-break tags and whitespace collapsing
    "<body>a\n\n  b<br>c<li>d<h3>e</h3><hr>f</body>",
    # <h catches <html too when no body tag
    "<html>leading</html>",
    # buffered paragraph never closed (buffer discarded)
    '<article of="medium.com">x<p>never closed para',
    # nested quotes and both href styles
    "<body><a href=\"https://a.example/x\">x</a><a href='https://a.example/y'>y</a></body>",
    # only whitespace inside body -> content_written stays set by spaces
    "<body> \n\t </body>",
    # h1 closed by </h2> (emits h2 format in the C)
    '<sec medium.com><h1>mix</h2>' + USEFUL,
]


def _random_html(rng: np.random.RandomState) -> str:
    frag = [
        "<p>", "</p>", "<h1>", "</h1>", "<h2>", "</h2>", "<br>", "<li>",
        "<script>", "</script>", "<style>", "</style>", "<head>", "</head>",
        "<body>", "</body>", "<title>", "</title>", "<!--", "-->", "<article",
        "medium.com", "&amp;", "&lt;", "&bogus;", "&nope", " ", "\n", "\t",
        "word", "Text123", "<", ">", "&", ";", '"', "'", "href=\"u\"", "/",
    ]
    n = rng.randint(1, 120)
    return "".join(frag[rng.randint(0, len(frag))] for _ in range(n))


def _ref(bin_path: str, html: str) -> str:
    return subprocess.run(
        [bin_path], input=html.encode(), capture_output=True, check=True
    ).stdout.decode()


@pytest.mark.parametrize("html", CASES)
def test_flat_equals_reference_c(ref_html_to_text_bin, html):
    assert render_flat(html_to_events(html)) == _ref(ref_html_to_text_bin, html)


def test_flat_equals_reference_c_fuzz(ref_html_to_text_bin):
    rng = np.random.RandomState(1234)
    for i in range(300):
        html = _random_html(rng)
        got = render_flat(html_to_events(html))
        want = _ref(ref_html_to_text_bin, html)
        assert got == want, f"mismatch on fuzz case {i}: {html!r}"


def test_spans_structure():
    html = (
        '<html><body><article zz="medium.com"><h1>The Heading</h1><p>'
        + USEFUL
        + "</p></article></body></html>"
    )
    spans = html_to_spans(html, ["https://x.example/a", "https://x.example/img.png"])
    kinds = [s["kind"] for s in spans]
    assert "h1" in kinds and "p" in kinds
    assert kinds[-2:] == ["link", "media"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert spans[-1]["media_ref"] == "https://x.example/img.png"


def test_fallback_message():
    assert render_flat(html_to_events("")) == (
        "No readable content could be extracted from this page."
    )


def test_is_useful_content_ratios():
    assert not is_useful_content("short")
    assert is_useful_content(USEFUL)
    assert not is_useful_content("aaaaaaaaaaaaaaaaaaaaaaaa")  # no spaces
    assert not is_useful_content("1234567890 " * 5)  # low alpha ratio


def test_extract_title_and_medium_filename():
    html = "<html><head><title>A &amp; B</title></head></html>"
    assert extract_title(html) == "A & B"
    assert get_medium_filename("https://medium.com/@user/post", html) == "medium_a__b.txt"
    assert (
        get_medium_filename("https://medium.com/@someone", "<html></html>")
        == "medium_profile_someone.txt"
    )


def test_fast_scanner_equals_slow_transliteration():
    """html_to_events (gated-dispatch, run-chunked) must be event-identical
    to html_to_events_slow (the line-by-line C transliteration) — 2000 fuzz
    fragments plus the curated cases."""
    from high_performance_parallel_search_engine_ray.functions.htmltext import (
        html_to_events_slow,
    )

    for c in CASES:
        assert html_to_events(c) == html_to_events_slow(c)
    rng = np.random.RandomState(4242)
    for i in range(2000):
        h = _random_html(rng)
        assert html_to_events(h) == html_to_events_slow(h), f"fuzz {i}: {h!r}"
