"""URL canonicalization/validation — mirrors the reference's truth tables
(backend/tests/test_link_extractor.py:7-42, backend/tests/test_fetcher.py)."""

from crawlray.canon import (
    canonicalize,
    host_of,
    is_internal,
    is_valid_url,
    normalize_url,
    should_skip_href,
    split_url,
)


def test_normalize_relative():
    assert normalize_url("/path/to/page", "https://example.com") == "https://example.com/path/to/page"


def test_normalize_protocol_relative():
    assert normalize_url("//cdn.example.com/image.jpg", "https://example.com") == "https://cdn.example.com/image.jpg"
    assert normalize_url("//cdn.example.com/x", "http://example.com") == "http://cdn.example.com/x"
    assert normalize_url("//cdn.example.com/x") == "https://cdn.example.com/x"


def test_normalize_absolute_passthrough():
    assert normalize_url("https://other.com/page", "https://example.com") == "https://other.com/page"


def test_normalize_relative_path_forms():
    base = "https://example.com/a/b/c.html"
    assert normalize_url("d.html", base) == "https://example.com/a/b/d.html"
    assert normalize_url("../up.html", base) == "https://example.com/a/up.html"
    assert normalize_url("./same.html", base) == "https://example.com/a/b/same.html"
    assert normalize_url("?q=1", base) == "https://example.com/a/b/c.html?q=1"


def test_canonicalize():
    assert canonicalize("HTTPS://EXAMPLE.com:443/Page#frag") == "https://example.com/Page"
    assert canonicalize("http://a.com:80/") == "http://a.com/"
    assert canonicalize("http://a.com:8080/x") == "http://a.com:8080/x"
    assert canonicalize("https://a.com") == "https://a.com/"
    assert canonicalize("https://a.com/p?q=1#s") == "https://a.com/p?q=1"
    # path case preserved, host case folded
    assert canonicalize("https://A.com/Path") == "https://a.com/Path"


def test_remove_anchor_semantics():
    # anchor removal == canonicalize fragment-strip (link_extractor.py:39-42)
    assert canonicalize("https://example.com/page#section") == "https://example.com/page"
    assert canonicalize("https://example.com/page") == "https://example.com/page"


def test_is_internal():
    assert is_internal("https://example.com/page", "https://example.com")
    assert is_internal("https://example.com/", "https://example.com")
    assert not is_internal("https://other.com/page", "https://example.com")


def test_is_valid_url():
    assert is_valid_url("https://example.com/x")
    assert is_valid_url("http://example.com")
    assert not is_valid_url("ftp://x.com")
    assert not is_valid_url("https://")
    assert not is_valid_url("")
    assert not is_valid_url(None)
    assert not is_valid_url("not a url")
    assert is_valid_url("http://h001.example.org:8080/p/1")
    assert not is_valid_url("http://bad host/x")


def test_should_skip_href():
    assert should_skip_href("#section")
    assert should_skip_href("mailto:a@b.c")
    assert should_skip_href("tel:+1555")
    assert should_skip_href("javascript:void(0)")
    assert should_skip_href("")
    assert not should_skip_href("/page1")


def test_split_and_host():
    assert split_url("https://a.com/x?y#z") == ("https", "a.com", "/x?y#z")
    assert host_of("https://User@A.com:8443/x") == "a.com"
