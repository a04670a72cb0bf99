"""Error taxonomy + user-facing suggestions (M22 in SURVEY.md §2.2).

Re-expresses ``backend/utils/error_handler.py:87-296`` as pure functions
over the engine's errors-as-data columns (status / error_type / error_code /
retry_possible). The suggestion table mirrors the reference's per-HTTP-code
guidance (error_handler.py:22-84); classification mirrors its exception →
record mapping (error_handler.py:110-200).
"""

from __future__ import annotations

from dataclasses import dataclass

HTTP_SUGGESTIONS: dict[int, list[str]] = {
    400: ["Check if the URL is properly formatted",
          "Verify all required parameters are included"],
    401: ["The page requires authentication",
          "Check if you have the necessary credentials"],
    403: ["Access to this resource is forbidden",
          "The website may be blocking automated access"],
    404: ["Check if the URL is correct and complete",
          "The page may have been moved or deleted"],
    408: ["The request timed out", "The server may be slow - try again later"],
    429: ["Too many requests sent to the server",
          "Wait a few minutes before trying again"],
    500: ["The server encountered an internal error",
          "Try again in a few minutes - the issue may be temporary"],
    502: ["Bad gateway - the server received an invalid response",
          "Wait a few minutes and try again"],
    503: ["The service is temporarily unavailable",
          "Try again later when the service is restored"],
    504: ["Gateway timeout - the server took too long to respond",
          "Try again in a few minutes"],
}

_DEFAULT_HTTP = [
    "An unexpected HTTP error occurred",
    "Try accessing the URL in a browser to verify it works",
]


@dataclass(frozen=True)
class ErrorRecord:
    error_type: str       # network_error | http_error | content_error | robots | validation_error
    error_code: str       # TIMEOUT | CONNECTION_REFUSED | "<status>" | ELEMENT_NOT_FOUND | ...
    failure_reason: str
    retry_possible: bool
    suggestions: tuple[str, ...]


def http_suggestions(status_code: int) -> list[str]:
    return HTTP_SUGGESTIONS.get(status_code, _DEFAULT_HTTP)


def classify(kind: str, status_code: int = 0, detail: str = "") -> ErrorRecord:
    """kind in {timeout, connection, http, too_many_redirects, parse,
    scope_miss, robots, invalid_url}; mirrors error_handler.py branches."""
    if kind == "timeout":
        return ErrorRecord(
            "network_error", "TIMEOUT",
            "Connection timeout - Server took too long to respond", True,
            ("Check your internet connection", "Try again in a few moments"),
        )
    if kind == "connection":
        return ErrorRecord(
            "network_error", "CONNECTION_REFUSED",
            "Connection refused - Unable to reach the server", True,
            ("Verify the URL is correct", "The server may be down or unreachable"),
        )
    if kind == "http":
        return ErrorRecord(
            "http_error", str(status_code),
            f"HTTP {status_code}",
            status_code >= 500,                      # error_handler.py:144
            tuple(http_suggestions(status_code)),
        )
    if kind == "too_many_redirects":
        return ErrorRecord(
            "network_error", "TOO_MANY_REDIRECTS",
            "Too many redirects - The URL redirected too many times", False,
            ("The URL may be part of a redirect loop",),
        )
    if kind == "parse":
        return ErrorRecord(
            "content_error", "PARSE_ERROR",
            f"Failed to parse page content: {detail}", False,
            ("The page may not be valid HTML",),
        )
    if kind == "scope_miss":
        return ErrorRecord(
            "content_error", "ELEMENT_NOT_FOUND",
            detail or "Scoped element not found", False,
            ("Verify the class name or element id exists on the page",
             "The content may be loaded dynamically via JavaScript"),
        )
    if kind == "robots":
        return ErrorRecord(
            "robots", "ROBOTS_DENIED",
            "Fetch disallowed by robots.txt", False,
            ("The site's robots policy excludes this path",),
        )
    if kind == "invalid_url":
        return ErrorRecord(
            "validation_error", "INVALID_URL",
            f"Invalid URL: {detail}", False,
            ("URLs must start with http:// or https:// and include a host",),
        )
    return ErrorRecord("unknown_error", "UNKNOWN", detail or "Unknown error",
                       False, ())


def is_retryable(error_code: str) -> bool:
    """The re-enqueue predicate: 5xx / timeout / connection errors."""
    if error_code in ("TIMEOUT", "CONNECTION_REFUSED"):
        return True
    return error_code.isdigit() and int(error_code) >= 500
