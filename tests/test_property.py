"""Property-based robustness tests (hypothesis) for the pure kernels.

These guard the crawl invariants the conformance fixtures can't enumerate:
canonicalization idempotence, parser totality on arbitrary input, span
offset integrity, dedup stability.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlray.canon import canonicalize, host_of, is_valid_url, normalize_url
from crawlray.htmlx import parse_document

url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=80,
)
host_st = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,20}[a-z0-9])?(\.[a-z]{2,6}){1,2}",
                        fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)


@given(host=host_st, path=path_st,
       frag=st.text(alphabet="abc123", max_size=8),
       scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_wellformed(host, path, frag, scheme):
    url = f"{scheme}://{host.upper()}{path}#{frag}"
    c = canonicalize(url)
    assert c == canonicalize(c)          # idempotent
    assert "#" not in c                  # fragment stripped
    assert c.startswith(("http://", "https://"))
    assert host_of(c) == host            # host folded
    assert is_valid_url(c)


@given(raw=url_text, base_host=host_st)
@settings(max_examples=200, deadline=None)
def test_normalize_total(raw, base_host):
    # never raises on arbitrary href text
    base = f"https://{base_host}/a/b"
    out = normalize_url(raw, base)
    assert isinstance(out, str)
    canonicalize(raw, base)  # also total


@given(html=st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_parser_total_on_garbage(html):
    res = parse_document(html, "https://example.com")
    # spans are well-formed triples with contiguous offsets
    for i, (kind, text, ref) in enumerate(res.spans):
        assert kind in ("text", "heading", "image", "link")
        assert isinstance(text, str) and isinstance(ref, str)
    # text lines never contain newlines (line-per-span invariant)
    assert all("\n" not in t for t in res.text_lines())


@given(words=st.lists(st.sampled_from("alpha beta gamma delta".split()),
                      min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_parser_paragraph_roundtrip(words):
    html = "<html><body>" + "".join(f"<p>{w}</p>" for w in words) + "</body></html>"
    res = parse_document(html)
    assert [t for _, t, _ in res.spans] == words


@given(hrefs=st.lists(host_st, min_size=0, max_size=15))
@settings(max_examples=100, deadline=None)
def test_link_dedup_first_occurrence(hrefs):
    html = "<html><body>" + "".join(
        f'<a href="https://{h}/p">x</a>' for h in hrefs
    ) + "</body></html>"
    res = parse_document(html, "https://base.org")
    got = [l.url for l in res.links]
    expected, seen = [], set()
    for h in hrefs:
        u = f"https://{h}/p"
        if u not in seen:
            seen.add(u)
            expected.append(u)
    assert got == expected
    assert [l.rank for l in res.links] == list(range(len(got)))
