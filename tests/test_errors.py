"""Error taxonomy truth table (M22; reference backend/utils/error_handler.py)."""

from crawlray.errors import classify, http_suggestions, is_retryable


def test_retry_classification():
    # 5xx / timeout / connection retryable; 4xx not (error_handler.py:144)
    assert classify("http", 500).retry_possible
    assert classify("http", 503).retry_possible
    assert not classify("http", 404).retry_possible
    assert not classify("http", 403).retry_possible
    assert classify("timeout").retry_possible
    assert classify("connection").retry_possible
    assert not classify("too_many_redirects").retry_possible
    assert not classify("parse").retry_possible
    assert not classify("robots").retry_possible


def test_error_codes_and_types():
    assert classify("timeout").error_code == "TIMEOUT"
    assert classify("connection").error_code == "CONNECTION_REFUSED"
    assert classify("http", 404).error_code == "404"
    assert classify("http", 404).error_type == "http_error"
    assert classify("scope_miss").error_code == "ELEMENT_NOT_FOUND"
    assert classify("scope_miss").error_type == "content_error"
    assert classify("invalid_url", detail="ftp://x").error_type == "validation_error"
    assert classify("bogus").error_type == "unknown_error"


def test_http_suggestions_table():
    for code in (400, 401, 403, 404, 408, 429, 500, 502, 503, 504):
        assert http_suggestions(code)
    assert http_suggestions(418) == http_suggestions(599)  # default branch


def test_is_retryable_predicate():
    assert is_retryable("TIMEOUT")
    assert is_retryable("CONNECTION_REFUSED")
    assert is_retryable("500")
    assert is_retryable("503")
    assert not is_retryable("404")
    assert not is_retryable("ROBOTS_DENIED")
    assert not is_retryable("ELEMENT_NOT_FOUND")
