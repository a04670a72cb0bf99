"""URL normalization / canonicalization / validation.

Re-expresses the reference's URL handling (``backend/crawler/link_extractor.py:15-58``
normalize/remove_anchors/is_internal, ``backend/crawler/fetcher.py:36-50`` validate)
as pure, allocation-light functions usable inside ``map_batches`` hot paths.

Canonical form (the key for URL-seen membership and host partitioning):

- resolve protocol-relative (``//host/...``) against the base scheme (https default)
- resolve relative references against the base URL (RFC-3986-lite join)
- lowercase scheme and host
- strip default ports (``:80`` for http, ``:443`` for https)
- strip the fragment (the reference strips fragments before cross-page dedup,
  ``link_extractor.py:39-42,157-169``)
- empty path -> ``/``
- query string preserved verbatim

These rules are deliberately simple enough to restate in ANSI SQL for the
DuckDB oracle (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
_VALID_HOST_RE = re.compile(r"^[a-z0-9]([a-z0-9._-]*[a-z0-9])?$")

# Skip prefixes mirroring link_extractor.py:100
SKIP_PREFIXES = ("#", "mailto:", "tel:", "javascript:")


def split_url(url: str) -> tuple[str, str, str]:
    """Split an absolute http(s) URL into (scheme, netloc, rest).

    ``rest`` starts with '/' (or '?' / '' for degenerate URLs).
    Returns ('', '', url) if the URL has no '://'.
    """
    i = url.find("://")
    if i < 0:
        return "", "", url
    scheme = url[:i]
    j = i + 3
    # netloc ends at first of / ? #
    end = len(url)
    for k in range(j, len(url)):
        c = url[k]
        if c == "/" or c == "?" or c == "#":
            end = k
            break
    return scheme, url[j:end], url[end:]


def host_of(url: str) -> str:
    """Lowercased host (netloc without port / userinfo) of an absolute URL."""
    _, netloc, _ = split_url(url)
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if ":" in netloc:
        netloc = netloc.split(":", 1)[0]
    return netloc.lower()


def _join_relative(base: str, ref: str) -> str:
    """Minimal RFC-3986 join for the relative forms the crawler meets.

    Mirrors the observable behavior of ``urllib.parse.urljoin`` for the cases
    the reference exercises (absolute-path, relative-path, query-only,
    fragment-only refs); dot-segment collapse ('..'/'.') is applied.
    """
    scheme, netloc, rest = split_url(base)
    if not scheme:
        return ref  # base not absolute; nothing sensible to do
    origin = f"{scheme}://{netloc}"
    if ref.startswith("/"):
        path = ref
    elif ref.startswith("?"):
        base_path = rest.split("?", 1)[0].split("#", 1)[0] or "/"
        path = base_path + ref
    else:
        base_path = rest.split("?", 1)[0].split("#", 1)[0] or "/"
        slash = base_path.rfind("/")
        path = (base_path[: slash + 1] if slash >= 0 else "/") + ref
    # collapse dot segments in the path part only
    pathpart, sep, tail = path.partition("?")
    if "./" in pathpart or pathpart.endswith(("/.", "/..")):
        segs: list[str] = []
        for seg in pathpart.split("/"):
            if seg == ".":
                continue
            if seg == "..":
                if len(segs) > 1:
                    segs.pop()
                continue
            segs.append(seg)
        pathpart = "/".join(segs)
        if not pathpart.startswith("/"):
            pathpart = "/" + pathpart
    return origin + pathpart + sep + tail


def normalize_url(url: str, base: str | None = None) -> str:
    """Resolve ``url`` to absolute form against ``base``.

    Mirrors ``LinkExtractor.normalize_url`` (link_extractor.py:15-37):
    protocol-relative gets the base scheme; relative refs are joined.
    No case folding here — that is ``canonicalize``'s job.
    """
    url = url.strip()
    if url.startswith("//"):
        scheme = split_url(base)[0].lower() if base else ""
        return f"{scheme or 'https'}:{url}"
    if url.startswith(("http://", "https://", "HTTP://", "HTTPS://")) or (
        _SCHEME_RE.match(url) and url[: url.find(":")].lower() in ("http", "https")
    ):
        return url
    if base:
        return _join_relative(base, url)
    return url


def canonicalize(url: str, base: str | None = None) -> str:
    """Full canonical form: normalize + lowercase scheme/host + strip default
    port + strip fragment + ensure non-empty path."""
    url = normalize_url(url, base)
    # strip fragment first (cheap)
    h = url.find("#")
    if h >= 0:
        url = url[:h]
    scheme, netloc, rest = split_url(url)
    if not scheme:
        return url
    scheme = scheme.lower()
    netloc = netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    if not rest:
        rest = "/"
    return f"{scheme}://{netloc}{rest}"


def is_valid_url(url: str) -> bool:
    """Scheme/host validation mirroring ``WebFetcher.validate_url``
    (fetcher.py:36-50): http(s) scheme + a plausible host."""
    if not url or not isinstance(url, str):
        return False
    scheme, netloc, _ = split_url(url)
    if scheme.lower() not in ("http", "https"):
        return False
    host = netloc.rsplit("@", 1)[-1]
    if ":" in host:
        host, _, port = host.partition(":")
        if port and not port.isdigit():
            return False
    return bool(_VALID_HOST_RE.match(host.lower()))


def is_internal(url: str, base: str) -> bool:
    """Same-netloc test mirroring ``LinkExtractor.is_internal_link``
    (link_extractor.py:44-58)."""
    return host_of(url) == host_of(base)


def should_skip_href(href: str) -> bool:
    """Href skip rules of ``extract_all_links`` (link_extractor.py:99-101)."""
    return (not href) or href.startswith(SKIP_PREFIXES)
