"""Render stages: span sequences -> txt / markdown / html views, plus the
media-path rewrite join (M9-M12, S6, S10 in SURVEY.md §2).

All stateless ``map_batches`` projections over the doc table. The span
sequence is the source of truth; each renderer is a pure function of
(spans, title), mirroring the reference's converters
(``backend/crawler/converters.py``):

- txt  = text/heading lines joined by newline == ``extract_text``'s view,
  with the >=3-newline collapse of ``clean_content`` (parser.py:217-223);
- md   = html2text-style markdown: ``#`` headings, ``![alt](ref)`` images,
  ``[text](url)`` links (converters.py:35-60);
- html = skeleton + styling template + spans as tags (converters.py:88-183);
- ``rewrite_media_refs`` = the URL->local-path mapping join applied to
  image spans (converters.py:62-82,185-202) as a broadcast hash join.

The ordered bulk concat (S10, ``backend/api/tasks.py:611-699``) is
``ds.sort("seq")`` + driver-side ``iter_batches`` merge — order is the
logical ``seq`` column, not physical block order.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import pyarrow as pa
import ray
import ray.data as rd

_CSS = (
    "body{font-family:sans-serif;max-width:800px;margin:2em auto;"
    "line-height:1.5;color:#222}"
)


def _spans_of(batch: pa.Table):
    col = batch["spans"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def spans_to_text(spans: list[dict]) -> str:
    lines = [s["text"] for s in spans if s["kind"] in ("text", "heading")]
    out = "\n".join(lines)
    while "\n\n\n" in out:                      # clean_content, parser.py:219-221
        out = out.replace("\n\n\n", "\n\n")
    return out.strip()


@dataclass(frozen=True)
class MarkdownOptions:
    """The html2text knobs the reference exposes
    (``backend/crawler/converters.py:35-43``), restated over spans:
    ``ignore_links`` keeps only anchor text, ``ignore_images`` drops image
    spans, ``body_width`` wraps text blocks (0 = no wrap, the reference
    default), ``single_line_break`` drops the blank line between blocks.
    The reference's ``ignore_emphasis`` has no span analog: the span
    parser (M4 invariant) normalizes inline emphasis into plain text, so
    emphasis is always 'ignored' — documented simplification."""

    ignore_links: bool = False
    ignore_images: bool = False
    body_width: int = 0
    single_line_break: bool = False


_MD_DEFAULTS = MarkdownOptions()


def spans_to_markdown(spans: list[dict], title: str,
                      opts: MarkdownOptions = _MD_DEFAULTS) -> str:
    import textwrap

    gap = [] if opts.single_line_break else [""]
    parts = [f"# {title}", *gap] if title else []
    for s in spans:
        k = s["kind"]
        if k == "heading":
            parts.append(f"## {s['text']}")
            parts.extend(gap)
        elif k == "text":
            body = (textwrap.fill(s["text"], opts.body_width)
                    if opts.body_width > 0 else s["text"])
            parts.append(body)
            parts.extend(gap)
        elif k == "image":
            if not opts.ignore_images:
                parts.append(f"![{s['text']}]({s['media_ref']})")
                parts.extend(gap)
        elif k == "link":
            parts.append(
                s["text"] if opts.ignore_links
                else f"[{s['text']}]({s['media_ref']})"
            )
    return "\n".join(parts).strip() + "\n"


def spans_to_html(spans: list[dict], title: str) -> str:
    body: list[str] = []
    for s in spans:
        k, t, m = s["kind"], _html.escape(s["text"]), s["media_ref"]
        if k == "heading":
            body.append(f"<h2>{t}</h2>")
        elif k == "text":
            body.append(f"<p>{t}</p>")
        elif k == "image":
            body.append(f'<img src="{_html.escape(m, quote=True)}" alt="{t}">')
        elif k == "link":
            body.append(f'<p><a href="{_html.escape(m, quote=True)}">{t}</a></p>')
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<meta charset=\"utf-8\">\n<title>{_html.escape(title)}</title>\n"
        f"<style>{_CSS}</style>\n</head>\n<body>\n"
        f"<h1>{_html.escape(title)}</h1>\n" + "\n".join(body) + "\n</body>\n</html>\n"
    )


def render_batch(batch: pa.Table, formats: tuple[str, ...] = ("txt",),
                 md_options: MarkdownOptions = _MD_DEFAULTS) -> pa.Table:
    """Add one rendered column per requested format (txt/md/html)."""
    spans_col = _spans_of(batch)
    titles = batch["title"].to_pylist()
    rendered: dict[str, list[str]] = {f: [] for f in formats}
    for i in range(batch.num_rows):
        spans = spans_col[i].as_py() or []
        for f in formats:
            if f == "txt":
                rendered[f].append(spans_to_text(spans))
            elif f == "md":
                rendered[f].append(spans_to_markdown(spans, titles[i], md_options))
            elif f == "html":
                rendered[f].append(spans_to_html(spans, titles[i]))
            else:
                raise ValueError(f"unknown format {f!r}")  # models.py:36-59
    for f in formats:
        batch = batch.append_column(f"render_{f}", pa.array(rendered[f], pa.string()))
    return batch


class MediaRefRewriter:
    """Broadcast hash join: media_ref -> local path mapping applied to image
    spans (J1 in SURVEY.md §2.4). The mapping dict is ``ray.put`` once and
    fetched per actor in ``__init__`` — never re-shipped per batch."""

    def __init__(self, mapping_ref):
        self.mapping: dict[str, str] = ray.get(mapping_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = _spans_of(batch)
        new_lists = []
        for i in range(batch.num_rows):
            spans = spans_col[i].as_py() or []
            new_lists.append(
                [
                    {**s, "media_ref": self.mapping.get(s["media_ref"], s["media_ref"])}
                    if s["kind"] == "image"
                    else s
                    for s in spans
                ]
            )
        from .parse import build_spans_column

        new_col = build_spans_column(
            [[(s["kind"], s["text"], s["media_ref"]) for s in lst] for lst in new_lists]
        )
        idx = batch.schema.get_field_index("spans")
        return batch.set_column(idx, "spans", new_col)


def combined_text(docs: rd.Dataset) -> str:
    """S10 ordered concat: all docs' txt renders joined in crawl order."""
    ds = docs.sort("seq").map_batches(
        lambda t: pa.table(
            {
                "seq": t["seq"],
                "txt": render_batch(t, ("txt",))["render_txt"],
                "url": t["url"],
            }
        ),
        batch_format="pyarrow",
    )
    parts: list[str] = []
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for url, txt in zip(b["url"].to_pylist(), b["txt"].to_pylist()):
            parts.append(f"===== {url} =====\n{txt}")
    return "\n\n".join(parts)


def filter_outlinks(
    links: pa.Table,
    link_type: str = "all",
    exclude_anchors: bool = False,
    same_domain_only: bool = False,
) -> pa.Table:
    """The reference's ``filter_links`` (link_extractor.py:131-171) over an
    outlinks table (columns: url, is_internal, ...): filter by type,
    optionally strip fragments and re-dedup first-occurrence (D2)."""
    import pyarrow.compute as pc

    from ..canon import canonicalize

    t = links
    if link_type == "internal" or same_domain_only:
        t = t.filter(t["is_internal"])
    elif link_type == "external":
        t = t.filter(pc.invert(t["is_internal"]))
    if exclude_anchors:
        urls = [canonicalize(u) for u in t["url"].to_pylist()]
        seen: set[str] = set()
        keep = []
        for u in urls:
            if u in seen:
                keep.append(False)
            else:
                seen.add(u)
                keep.append(True)
        idx = t.schema.get_field_index("url")
        t = t.set_column(idx, "url", pa.array(urls, pa.string()))
        t = t.filter(pa.array(keep))
    return t
