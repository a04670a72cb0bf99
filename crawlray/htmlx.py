"""Streaming HTML -> interleaved span-sequence parser (stdlib-only, hot path).

Re-implements the reference's extraction semantics (studied at
``backend/crawler/parser.py:114-178`` extract_text,
``parser.py:180-215`` title/metadata, ``parser.py:225-255`` image URLs,
``backend/crawler/link_extractor.py:81-129`` link extraction) as a single
forward pass over the HTML producing the engine's authoritative document
encoding: an ordered span sequence

    (kind, text, media_ref, offset)   kind in {heading, text, image, link}

per the input-shape contract (BASELINE.json ``input_hint`` / FIXTURES.md §1).

Line/flush rules (the columnar restatement of the reference's block/inline
walk, ``parser.py:129-169``):

- Block elements (the reference's 25-element set) break lines: opening or
  closing a block flushes the accumulated inline text as one span.
- ``<span>`` NOT inside ``<p>`` gets its own line (``parser.py:157-162``):
  closing such a span flushes.
- Inline text pieces are individually stripped and space-joined; blank lines
  are dropped (``parser.py:143-145,175-178``).
- ``script``/``style``/``noscript`` content is dropped (``parser.py:124-126``);
  ``<head>`` content is captured as title/metadata, never as spans.
- ``<h1>``..``<h6>`` lines get ``kind="heading"``.
- ``<img>`` flushes the current line, then emits an ``image`` span with
  ``text`` = alt, ``media_ref`` = resolved absolute src (relative resolved
  against the page URL; ``//`` -> ``https:``; ``data-src`` fallback —
  ``parser.py:238-247``).
- ``<a href>`` emits a ``link`` span when the anchor closes (``text`` = anchor
  text, fallback href; ``media_ref`` = canonical absolute target). Skip
  rules and first-occurrence per-page dedup mirror
  ``link_extractor.py:99-113`` (dedup key = canonical URL). Anchor text also
  flows into the enclosing text line, as in the reference.

Scoped extraction (``parser.py:19-112``): when ``scope_id``/``scope_class``
is given, spans are restricted to the first matching element's subtree;
a missing scope produces a structured ELEMENT_NOT_FOUND error carrying the
<=20 alphabetically-first class names seen (``parser.py:104-107``) — errors
as data, never exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from .canon import canonicalize, host_of, should_skip_href

BLOCK_ELEMENTS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
        "section", "article", "header", "footer", "nav", "aside", "main",
        "blockquote", "pre", "ul", "ol", "li", "table", "tr", "td", "th",
        "dl", "dt", "dd", "form", "fieldset", "figure", "figcaption",
    }
)
HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
SKIP_CONTENT = frozenset({"script", "style", "noscript"})
VOID_ELEMENTS = frozenset(
    {"img", "br", "hr", "meta", "link", "input", "source", "area",
     "base", "col", "embed", "track", "wbr"}
)

KIND_TEXT = "text"
KIND_HEADING = "heading"
KIND_IMAGE = "image"
KIND_LINK = "link"


@dataclass
class Link:
    url: str            # canonical absolute target
    text: str           # anchor text (fallback: raw href), link_extractor.py:76
    title: str
    rel: list[str]
    is_internal: bool
    rank: int           # emission index after per-page dedup


@dataclass
class ParseResult:
    spans: list[tuple[str, str, str]] = field(default_factory=list)  # (kind, text, media_ref)
    title: str = "Untitled"
    description: str = ""
    keywords: str = ""
    author: str = ""
    links: list[Link] = field(default_factory=list)
    classes: set[str] = field(default_factory=set)
    error_code: str = ""        # "" = ok; "ELEMENT_NOT_FOUND" = scope miss
    error_msg: str = ""

    def text_lines(self) -> list[str]:
        return [t for k, t, _ in self.spans if k in (KIND_TEXT, KIND_HEADING)]

    def text(self) -> str:
        """Joined text view — the analog of the reference's extract_text."""
        return "\n".join(self.text_lines())


class _SpanParser(HTMLParser):
    def __init__(self, base_url: str | None, scope_id: str | None, scope_class: str | None):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.base_host = host_of(base_url) if base_url else ""
        self.scope_id = scope_id or None
        self.scope_class = scope_class or None
        self.scoped = bool(self.scope_id or self.scope_class)
        self.scope_found = False
        self.scope_depth = 0          # >0 while inside the scoped subtree
        self.res = ParseResult()
        self.stack: list[str] = []    # open-tag stack (tolerant)
        self.line: list[str] = []     # inline pieces of the current text line
        self.heading_depth = 0
        self.p_depth = 0
        self.skip_depth = 0           # inside script/style/noscript
        self.head_depth = 0           # inside <head>
        self.in_title = False
        self.title_parts: list[str] = []
        self.first_heading: str | None = None
        self.anchor_stack: list[tuple[str, str, str]] = []  # (href, title, rel) raw
        self.anchor_text: list[list[str]] = []
        self.seen_links: set[str] = set()

    # -- helpers ---------------------------------------------------------
    def _collecting(self) -> bool:
        if self.skip_depth or self.head_depth:
            return False
        return (not self.scoped) or self.scope_depth > 0

    def _flush(self) -> None:
        if not self.line:
            return
        text = " ".join(self.line)
        self.line.clear()
        if not text:
            return
        kind = KIND_HEADING if self.heading_depth > 0 else KIND_TEXT
        if kind == KIND_HEADING and self.first_heading is None:
            self.first_heading = text
        self.res.spans.append((kind, text, ""))

    def _emit_image(self, attrs: dict[str, str | None]) -> None:
        src = attrs.get("src") or attrs.get("data-src")
        if not src:
            return
        src = src.strip()
        if src.startswith("//"):
            src = "https:" + src          # parser.py:246-247
        elif self.base_url and not src.startswith(("http://", "https://")):
            from .canon import _join_relative
            src = _join_relative(self.base_url, src)
        self._flush()
        self.res.spans.append((KIND_IMAGE, attrs.get("alt") or "", src))

    # -- HTMLParser hooks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs_list):
        attrs = dict(attrs_list)
        cls = attrs.get("class")
        if cls:
            self.res.classes.update(cls.split())
        if tag == "head":
            self.head_depth += 1
        if tag in SKIP_CONTENT:
            self.skip_depth += 1
            self.stack.append(tag)
            return
        if tag == "title" and self.head_depth:
            self.in_title = True
        # scope entry check
        if self.scoped and self.scope_depth == 0 and not self.scope_found:
            matched = False
            if self.scope_id and attrs.get("id") == self.scope_id:
                matched = True
            elif self.scope_class and cls and self.scope_class in cls.split():
                matched = True
            if matched:
                self.scope_found = True
                self.scope_depth = 0  # becomes 1 when pushed below
                if tag not in VOID_ELEMENTS:
                    self.scope_depth = 1
        elif self.scope_depth > 0 and tag not in VOID_ELEMENTS:
            self.scope_depth += 1

        if tag in VOID_ELEMENTS:
            if tag == "img" and self._collecting():
                self._emit_image(attrs)
            if tag == "meta" and self.head_depth:
                name = (attrs.get("name") or "").lower()
                prop = (attrs.get("property") or "").lower()
                content = attrs.get("content") or ""
                if name == "description" or prop == "og:description":
                    self.res.description = content       # parser.py:208-209
                elif name == "keywords":
                    self.res.keywords = content
                elif name == "author":
                    self.res.author = content
            return

        collecting = self._collecting()
        if tag in BLOCK_ELEMENTS:
            # HTML5 implicit close: a block opening inside <p> closes the <p>
            if self.stack and self.stack[-1] == "p" and tag != "p":
                self.handle_endtag("p")
            if collecting:
                self._flush()
            if tag in HEADINGS:
                self.heading_depth += 1
            if tag == "p":
                self.p_depth += 1
        elif tag == "a":
            self.anchor_stack.append(
                (attrs.get("href") or "", attrs.get("title") or "", attrs.get("rel") or "")
            )
            self.anchor_text.append([])
        self.stack.append(tag)

    def handle_startendtag(self, tag, attrs_list):
        # <img .../> style — route void handling through starttag
        if tag in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs_list)
        else:
            self.handle_starttag(tag, attrs_list)
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str):
        if tag in VOID_ELEMENTS:
            return
        if tag == "head":
            self.head_depth = max(0, self.head_depth - 1)
        if tag == "title":
            self.in_title = False
        if tag in SKIP_CONTENT:
            if self.stack and tag in self.stack:
                self.stack.reverse(); self.stack.remove(tag); self.stack.reverse()
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag not in self.stack:
            return
        # pop until matching tag (tolerates missing end tags)
        while self.stack:
            top = self.stack.pop()
            self._close_tag(top)
            if top == tag:
                break

    def _close_tag(self, tag: str) -> None:
        collecting = self._collecting()
        if tag in BLOCK_ELEMENTS:
            if collecting:
                self._flush()
            if tag in HEADINGS:
                self.heading_depth = max(0, self.heading_depth - 1)
            if tag == "p":
                self.p_depth = max(0, self.p_depth - 1)
        elif tag == "span" and self.p_depth == 0:
            if collecting:
                self._flush()                       # parser.py:157-162
        elif tag == "a" and self.anchor_stack:
            href, title, rel = self.anchor_stack.pop()
            words = self.anchor_text.pop()
            if self.anchor_text:                    # nested anchors: bubble text up
                self.anchor_text[-1].extend(words)
            if collecting:
                self._emit_link(href, title, rel, " ".join(words).strip())
        if self.scope_depth > 0:
            self.scope_depth -= 1

    def _emit_link(self, href: str, title: str, rel: str, text: str) -> None:
        href = href.strip()
        if should_skip_href(href):                  # link_extractor.py:99-101
            return
        url = canonicalize(href, self.base_url)
        if not url.startswith(("http://", "https://")):
            return
        if url in self.seen_links:                  # link_extractor.py:109-113
            return
        self.seen_links.add(url)
        anchor = text or href                       # link_extractor.py:76
        self.res.spans.append((KIND_LINK, anchor, url))
        self.res.links.append(
            Link(
                url=url,
                text=anchor,
                title=title,
                rel=rel.split() if rel else [],
                is_internal=(host_of(url) == self.base_host),
                rank=len(self.res.links),
            )
        )

    def handle_data(self, data: str):
        if self.in_title:
            self.title_parts.append(data)
            return
        if not self._collecting():
            return
        # a newline inside a text node becomes a line break in the output —
        # the reference's final split('\n') pass (parser.py:175-178) turns
        # source newlines into separate emitted lines
        for i, piece in enumerate(data.split("\n")):
            if i > 0:
                self._flush()
            text = piece.strip()
            if not text:
                continue
            if self.anchor_text:
                self.anchor_text[-1].append(text)
            self.line.append(text)

    def close(self):
        super().close()
        # close any dangling open tags
        while self.stack:
            self._close_tag(self.stack.pop())
        self._flush()


def parse_document(
    html: str,
    url: str | None = None,
    scope_id: str | None = None,
    scope_class: str | None = None,
) -> ParseResult:
    """Parse one HTML document into its interleaved span sequence.

    Returns a ParseResult; scope misses come back as error rows
    (``error_code="ELEMENT_NOT_FOUND"``), mirroring the reference's
    failure-to-structured-record conversion (``backend/api/tasks.py:90-141``).
    """
    p = _SpanParser(url, scope_id, scope_class)
    try:
        p.feed(html)
        p.close()
    except Exception as exc:  # malformed beyond tolerance -> content error row
        res = p.res
        res.error_code = "PARSE_ERROR"
        res.error_msg = f"{type(exc).__name__}: {exc}"
        return res
    res = p.res
    title = " ".join(" ".join(p.title_parts).split())
    if title:
        res.title = title
    elif p.first_heading:
        res.title = p.first_heading                 # parser.py:186-189
    if p.scoped and not p.scope_found:
        avail = ", ".join(sorted(res.classes)[:20])  # parser.py:104-107
        scope_desc = (
            f"class='{scope_class}'" if scope_class else f"id='{scope_id}'"
        )
        res.spans = []
        res.links = []
        res.error_code = "ELEMENT_NOT_FOUND"
        res.error_msg = (
            f"Scoped element not found: {scope_desc}."
            + (f" Available classes in HTML: {avail}" if avail else "")
        )
    return res


def extract_text(html: str, url: str | None = None) -> str:
    """Convenience: the reference's ``extract_text`` view (joined text lines)."""
    return parse_document(html, url).text()
