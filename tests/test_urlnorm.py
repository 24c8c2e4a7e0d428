"""URL kernel conformance (SURVEY.md §5.1), including differential checks of
normalize_url against the compiled reference C function."""

import subprocess

import pytest

from high_performance_parallel_search_engine_ray.functions.urlnorm import (
    canonicalize_url,
    combined_priority,
    extract_base_domain,
    extract_links,
    get_url_filename,
    host_of,
    is_html_content,
    is_media_url,
    is_valid_crawl_url,
    normalize_url,
    process_extracted_url,
    resolve_url,
    url_priority,
)

URLS = [
    "https://example.com/page#section",
    "https://example.com/page?utm_source=x&keep=1",
    "https://example.com/page?keep=1",
    "https://example.com/page?fbclid=abc",
    "https://example.com/page?gclid=abc",
    "https://medium.com/@user/post?source=rss",
    "https://example.com/dir/",
    "https://example.com/",
    "https://example.com",
    "http://EXAMPLE.com/Path",
    "no-scheme-at-all",
    "",
    "https://example.com/a/b/c/?x=1#frag",
    "https://sub.medium.com/story?x=1",
    "https://example.com/p?q=utm_",
    "/relative/path",
    "https://example.com/page?a=1&utm_campaign=2",
    "x" * 1500,  # exceeds the C 1023-char buffer
]


def test_normalize_matches_reference_c(ref_normalize_url_bin):
    inp = "\n".join(URLS) + "\n"
    out = subprocess.run(
        [ref_normalize_url_bin], input=inp.encode(), capture_output=True, check=True
    ).stdout.decode().split("\n")
    for url, want in zip(URLS, out):
        assert normalize_url(url) == want, f"mismatch for {url!r}"


def test_normalize_basics():
    assert normalize_url("https://e.com/p#f") == "https://e.com/p"
    assert normalize_url("https://e.com/p?utm_x=1") == "https://e.com/p"
    assert normalize_url("https://e.com/p?keep=1") == "https://e.com/p?keep=1"
    assert normalize_url("https://medium.com/p?any=1") == "https://medium.com/p"
    assert normalize_url("https://e.com/p/") == "https://e.com/p"
    assert normalize_url(None) == ""


def test_canonicalize_strict_mode():
    assert canonicalize_url("HTTPS://Example.COM:443/p") == "https://example.com/p"
    assert canonicalize_url("http://e.com:80/p?b=2&a=1") == "http://e.com/p?a=1&b=2"
    assert canonicalize_url("https://e.com/p?utm_s=1&a=1#f") == "https://e.com/p?a=1"


def test_extract_base_domain():
    assert extract_base_domain("https://example.com/a/b") == "https://example.com"
    assert extract_base_domain("https://example.com") == "https://example.com"
    assert extract_base_domain("no-protocol/path") == "no-protocol/path"
    assert extract_base_domain("") == ""


def test_host_of():
    assert host_of("https://Example.COM:8080/x") == "example.com"
    assert host_of("http://user@site.org/p") == "site.org"


def test_resolve_url_reference_quirks():
    base = "https://example.com/a/b"
    dom = "https://example.com"
    assert resolve_url("c", base, dom) == "https://example.com/a/c"
    assert resolve_url("/c", base, dom) == "https://example.com/c"
    # protocol-relative under a scheme-ful base: reference-broken output
    assert resolve_url("//other.com/x", base, dom) == "https:other.com/x"
    # base without scheme falls back to https: + the raw (correct by luck)
    assert resolve_url("//other.com/x", "nohost", "nohost") == "https://other.com/x"
    # base ending in slash keeps the slash
    assert resolve_url("c", "https://example.com/a/", dom) == "https://example.com/a/c"
    # domain-root base: truncation after the '//' slash (reference bug)
    assert resolve_url("c", "https://example.com", dom) == "https://c"


def test_process_extracted_url_filters():
    base, dom = "https://e.com/x", "https://e.com"
    assert process_extracted_url("javascript:void(0)", base, dom, []) is None
    assert process_extracted_url("mailto:a@b.c", base, dom, []) is None
    assert process_extracted_url("#anchor", base, dom, []) is None
    assert process_extracted_url("https://other.net/x", base, dom, []) is None
    assert (
        process_extracted_url("https://e.com/y#f", base, dom, []) == "https://e.com/y"
    )
    # in-candidate-list dedup
    assert process_extracted_url("https://e.com/y", base, dom, ["https://e.com/y"]) is None
    # oversized URL
    assert process_extracted_url("https://e.com/" + "a" * 600, base, dom, []) is None


def test_extract_links_order_and_quotes():
    html = (
        '<a href="https://e.com/1">x</a>'
        "<a href='https://e.com/2'>y</a>"
        '<a href="https://e.com/1#dup">z</a>'
        '<a href="/3">rel</a>'
        '<a href="javascript:no()">j</a>'
    )
    assert extract_links(html, "https://e.com/base") == [
        "https://e.com/1",
        "https://e.com/2",
        "https://e.com/3",
    ]


def test_is_valid_crawl_url():
    dom = "https://e.com"
    assert is_valid_crawl_url("https://e.com/page", dom)
    assert not is_valid_crawl_url("https:e.com/page", dom)  # broken proto-relative
    assert not is_valid_crawl_url("https://e.com/img.PNG", dom)
    assert not is_valid_crawl_url("https://e.com/data.json", dom)  # .js substring
    assert not is_valid_crawl_url("https://e.com/x.jsp", dom)  # .js substring quirk
    assert not is_valid_crawl_url("https://other.net/x", dom)
    assert is_valid_crawl_url("https://medium.com/@u/post", dom)
    assert not is_valid_crawl_url("https://help.medium.com/x", dom)
    assert not is_valid_crawl_url("", dom)


def test_is_html_content():
    assert is_html_content("https://e.com/page", "text/html; charset=utf-8")
    assert not is_html_content("https://e.com/x.png", None)
    assert not is_html_content("https://e.com/page", "image/png")
    assert is_html_content("https://e.com/page", None)  # default true
    # last-dot quirk: extension check uses the final dot of the whole URL
    assert is_html_content("https://e.com/x.png/page", "text/html")


def test_get_url_filename():
    assert get_url_filename("https://e.com/article-name") == "article-name"
    assert get_url_filename("https://e.com/file?q=1") == "file"
    assert get_url_filename("https://e.com/").startswith("webpage_")
    long_tail = "https://e.com/" + "a" * 60
    assert get_url_filename(long_tail).startswith("webpage_")


def test_priorities():
    dom = "https://e.com"
    assert url_priority("https://e.com/article/x", "https://e.com", dom) == 4
    assert url_priority("https://e.com/tag/x", "https://e.com", dom) == 3
    assert url_priority("https://e.com/page/2", "https://e.com", dom) == 2
    assert url_priority("https://e.com/other", "https://e.com", dom) == 1
    assert url_priority("https://medium.com/p/x", "https://medium.com", dom) == 5
    # /tagged/ wins over /@ in the else-if chain
    assert (
        url_priority("https://medium.com/@u/tagged/x", "https://medium.com", dom) == 3
    )
    assert combined_priority("https://e.com/tag/x", "https://e.com", dom) == 5


def test_is_media_url():
    assert is_media_url("https://e.com/a.png")
    assert is_media_url("https://e.com/a.PDF")
    assert not is_media_url("https://e.com/a.html")
