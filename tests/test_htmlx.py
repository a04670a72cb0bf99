"""Span-sequence extraction conformance (FIXTURES.md §1; reference
semantics from backend/crawler/parser.py + link_extractor.py, asserted on
the fixture HTML of backend/tests/test_parser.py / test_link_extractor.py)."""

from crawlray.htmlx import extract_text, parse_document


def test_title_paragraphs_fixture():
    # test_parser.py:62-76 fixture -> FIXTURES.md expected spans
    html = """
    <html><body>
        <h1>Title</h1>
        <p>Paragraph 1</p>
        <p>Paragraph 2</p>
    </body></html>
    """
    r = parse_document(html)
    assert r.spans == [
        ("heading", "Title", ""),
        ("text", "Paragraph 1", ""),
        ("text", "Paragraph 2", ""),
    ]
    assert r.text() == "Title\nParagraph 1\nParagraph 2"


def test_image_fixture():
    # test_parser.py:79-92: absolute kept, relative resolved
    html = """
    <html><body>
        <img src="https://example.com/image1.jpg" alt="Image 1">
        <img src="/path/image2.png" alt="Image 2">
    </body></html>
    """
    r = parse_document(html, "https://example.com")
    assert r.spans == [
        ("image", "Image 1", "https://example.com/image1.jpg"),
        ("image", "Image 2", "https://example.com/path/image2.png"),
    ]


def test_protocol_relative_image():
    r = parse_document('<html><body><img src="//cdn.x.com/i.png" alt="a"></body></html>')
    assert r.spans == [("image", "a", "https://cdn.x.com/i.png")]


def test_data_src_fallback():
    r = parse_document('<html><body><img data-src="https://x.com/i.png"></body></html>')
    assert r.spans == [("image", "", "https://x.com/i.png")]


def test_link_fixture():
    # test_link_extractor.py:44-68: 3 links, anchor/mailto skipped,
    # 2 internal + 1 external, document order
    html = """
    <html><body>
        <a href="/page1">Page 1</a>
        <a href="https://example.com/page2">Page 2</a>
        <a href="https://other.com/page">External</a>
        <a href="#section">Anchor</a>
        <a href="mailto:test@example.com">Email</a>
    </body></html>
    """
    r = parse_document(html, "https://example.com")
    assert [(l.url, l.text, l.is_internal) for l in r.links] == [
        ("https://example.com/page1", "Page 1", True),
        ("https://example.com/page2", "Page 2", True),
        ("https://other.com/page", "External", False),
    ]
    assert [l.rank for l in r.links] == [0, 1, 2]
    link_spans = [s for s in r.spans if s[0] == "link"]
    assert len(link_spans) == 3


def test_link_first_occurrence_dedup():
    # link_extractor.py:109-113 + post-canonicalization collapse (D2)
    html = """
    <html><body>
        <a href="/a">one</a>
        <a href="https://example.com/a">dup absolute</a>
        <a href="/a#frag">dup with fragment</a>
        <a href="/b">two</a>
    </body></html>
    """
    r = parse_document(html, "https://example.com")
    assert [l.url for l in r.links] == [
        "https://example.com/a",
        "https://example.com/b",
    ]
    assert r.links[0].text == "one"  # first occurrence wins


def test_anchor_text_fallback_to_href():
    r = parse_document('<html><body><a href="/x"></a></body></html>', "https://e.com")
    assert r.links[0].text == "/x"  # link_extractor.py:76


def test_span_inside_p_one_line():
    r = parse_document("<html><body><div><p><span>A </span><span>B</span></p></div></body></html>")
    assert r.spans == [("text", "A B", "")]


def test_span_outside_p_own_lines():
    r = parse_document("<html><body><div><span>A</span><span>B</span></div></body></html>")
    assert r.spans == [("text", "A", ""), ("text", "B", "")]


def test_script_style_noscript_stripped():
    html = """
    <html><head><style>p{color:red}</style></head><body>
      <script>var x = "<p>fake</p>";</script>
      <p>Real</p>
      <noscript>ignored</noscript>
    </body></html>
    """
    r = parse_document(html)
    assert r.spans == [("text", "Real", "")]


def test_title_extraction_and_fallback():
    assert parse_document("<html><head><title>Test Title</title></head><body></body></html>").title == "Test Title"
    assert parse_document("<html><body><h1>H1 Title</h1></body></html>").title == "H1 Title"
    assert parse_document("<html><body><p>x</p></body></html>").title == "Untitled"


def test_metadata():
    html = """
    <html><head>
      <meta name="description" content="desc here">
      <meta name="keywords" content="k1,k2">
      <meta name="author" content="Me">
    </head><body></body></html>
    """
    r = parse_document(html)
    assert r.description == "desc here"
    assert r.keywords == "k1,k2"
    assert r.author == "Me"


def test_og_description_fallback():
    html = '<html><head><meta property="og:description" content="og desc"></head><body></body></html>'
    assert parse_document(html).description == "og desc"


def test_scoped_by_class_and_id():
    html = (
        '<html><body><div class="content wide"><p>In scope</p></div>'
        '<div id="main"><p>By id</p></div>'
        '<div class="other"><p>Out</p></div></body></html>'
    )
    assert parse_document(html, scope_class="content").spans == [("text", "In scope", "")]
    assert parse_document(html, scope_id="main").spans == [("text", "By id", "")]


def test_scope_miss_error_row():
    html = '<html><body><div class="aaa"><p>x</p></div><div class="bbb">y</div></body></html>'
    r = parse_document(html, scope_class="missing")
    assert r.error_code == "ELEMENT_NOT_FOUND"
    assert r.spans == []
    # diagnostics carry available classes, sorted, <=20 (parser.py:104-107)
    assert "aaa" in r.error_msg and "bbb" in r.error_msg


def test_interleaving_order():
    html = """
    <html><body>
      <h1>Head</h1>
      <p>before</p>
      <img src="/i.png" alt="pic">
      <p>after <a href="/x">lnk</a></p>
    </body></html>
    """
    r = parse_document(html, "https://e.com")
    assert r.spans == [
        ("heading", "Head", ""),
        ("text", "before", ""),
        ("image", "pic", "https://e.com/i.png"),
        ("link", "lnk", "https://e.com/x"),
        ("text", "after lnk", ""),
    ]
    offsets = list(range(len(r.spans)))
    assert offsets == [0, 1, 2, 3, 4]


def test_img_inside_paragraph_splits_line():
    r = parse_document('<html><body><p>before <img src="https://x.com/i.png"> after</p></body></html>')
    assert r.spans == [
        ("text", "before", ""),
        ("image", "", "https://x.com/i.png"),
        ("text", "after", ""),
    ]


def test_entities_decoded():
    r = parse_document("<html><body><p>a &amp; b &lt;c&gt;</p></body></html>")
    assert r.spans == [("text", "a & b <c>", "")]


def test_extract_text_view():
    assert extract_text("<html><body><h1>A</h1><p>B</p></body></html>") == "A\nB"


def test_unclosed_tags_tolerated():
    r = parse_document("<html><body><p>one<p>two</body></html>")
    assert [s[1] for s in r.spans] == ["one", "two"]


def test_malformed_input_no_crash():
    r = parse_document("<<<>>>< not html at all &&& <p>ok</p>")
    assert ("text", "ok", "") in r.spans or r.error_code
