"""Arrow schemas for every engine table (SURVEY.md §1.2).

The doc table's ``spans`` column is exactly the ``input_hint`` shape from
BASELINE.json: ``list<struct<kind:string, text:string, media_ref:string,
offset:int32>>``. Lance is the production storage format for doc tables per
the north rule; the ``lance`` package is not available in this sandbox, so
all sinks write Parquet with the same schemas (see ``crawlray.checkpoint``)
— the layout (one deterministic file per partition per round + manifest) is
format-agnostic.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("round", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("depth", pa.int32()),
        ("status", pa.string()),        # ok | robots_denied | http_404 | ...
        ("error_type", pa.string()),    # taxonomy of error_handler.py:87-296
        ("error_code", pa.string()),
        ("retry_possible", pa.bool_()),
        ("attempts", pa.int32()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("spans", SPANS_TYPE),
        ("n_spans", pa.int32()),
        ("n_links", pa.int32()),
        ("n_images", pa.int32()),
        ("part_id", pa.int32()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),           # canonical
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
    ]
)

OUTLINK_SCHEMA = pa.schema(
    [
        ("src_doc_id", pa.string()),
        ("url", pa.string()),           # canonical
        ("host", pa.string()),
        ("is_internal", pa.bool_()),
        ("anchor_text", pa.string()),
        ("discovery_rank", pa.int32()),
    ]
)

METRIC_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("part_id", pa.int32()),
        ("urls_in", pa.int64()),
        ("fetched_ok", pa.int64()),
        ("failed", pa.int64()),
        ("robots_denied", pa.int64()),
        ("retries", pa.int64()),
        ("spans", pa.int64()),
        ("links", pa.int64()),
        ("new_urls", pa.int64()),
        ("bytes", pa.int64()),
    ]
)
