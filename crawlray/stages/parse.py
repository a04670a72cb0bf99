"""Parse stage: fetched payloads -> interleaved-span doc rows (M1-M8, M13-M17).

A stateless ``map_batches`` transform (``batch_format="pyarrow"``,
zero-copy in): decodes each ``payload``, runs the single-pass span parser
(``crawlray.htmlx``), and emits DOC_SCHEMA rows with the nested ``spans``
column built directly as Arrow ``ListArray(StructArray)`` — no Python
row-dict materialization. The raw ``payload`` column is dropped here so
HTML bytes never enter a downstream shuffle (SURVEY.md §4.2).

Failed fetches pass through as error doc rows (status/error columns set,
empty spans) — the errors-as-data contract (``backend/api/tasks.py:90-141``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..canon import split_url
from ..htmlx import KIND_IMAGE, KIND_LINK, parse_document
from ..schema import SPAN_STRUCT

# Module-level World cache: the fused fetch+parse stage runs as stateless
# Ray tasks; each worker process builds the (cheap, deterministic) World
# once per config instead of paying an actor-pool spin-up every round.
_WORLD_CACHE: dict = {}


def _get_world(cfg):
    w = _WORLD_CACHE.get(cfg)
    if w is None:
        from ..synth import World

        w = _WORLD_CACHE[cfg] = World(cfg)
    return w


def fetch_parse_batch(batch: pa.Table, world_cfg) -> pa.Table:
    """Fused fetch+parse: frontier rows -> DOC_SCHEMA rows in one pass.

    Functionally identical to SynthFetcher (robots gate, <=3-attempt retry
    classification) followed by parse_batch, but as a single stateless
    map_batches stage: no actor pool startup per round and no payload
    column ever materialized in the object store (HTML lives only in task
    memory for the microseconds between generation and span extraction).
    """
    world = _get_world(world_cfg)
    n = batch.num_rows
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    seqs = batch["seq"].to_pylist()

    span_lists: list[list[tuple[str, str, str]]] = []
    titles: list[str] = []
    descs: list[str] = []
    status: list[str] = []
    errt: list[str] = []
    errc: list[str] = []
    retry: list[bool] = []
    attempts: list[int] = []
    n_links = np.zeros(n, dtype=np.int32)
    n_images = np.zeros(n, dtype=np.int32)

    for i in range(n):
        url, host = urls[i], hosts[i]
        path = split_url(url)[2]
        if world.robots_disallowed(host, path):
            status.append("robots_denied"); errt.append("robots")
            errc.append("ROBOTS_DENIED"); retry.append(False); attempts.append(0)
            span_lists.append([]); titles.append(""); descs.append("")
            continue
        if world.auth_required(host):
            # engine crawls carry no credentials: gated hosts 401 (kept
            # identical across fused path, actor path and oracle)
            status.append("http_401"); errt.append("http_error")
            errc.append("401"); retry.append(False); attempts.append(1)
            span_lists.append([]); titles.append(""); descs.append("")
            continue
        final_status, need = world.fetch_plan(url)
        if final_status == 404:
            status.append("http_404"); errt.append("http_error")
            errc.append("404"); retry.append(False); attempts.append(1)
            span_lists.append([]); titles.append(""); descs.append("")
            continue
        res = parse_document(world.gen_page(url), url)
        if res.error_code:
            status.append("parse_error"); errt.append("content_error")
            errc.append(res.error_code); retry.append(False); attempts.append(min(need, 3))
            span_lists.append([]); titles.append(""); descs.append("")
            continue
        status.append("ok"); errt.append(""); errc.append("")
        retry.append(False); attempts.append(min(need, 3))
        span_lists.append(res.spans)
        titles.append(res.title)
        descs.append(res.description)
        n_links[i] = len(res.links)
        n_images[i] = sum(1 for k, _, _ in res.spans if k == KIND_IMAGE)

    return pa.table(
        {
            "doc_id": pa.array([f"d{s:012d}" for s in seqs], pa.string()),
            "url": batch["url"],
            "host": batch["host"],
            "round": batch["round"],
            "priority": batch["priority"],
            "seq": batch["seq"],
            "depth": batch["depth"],
            "status": pa.array(status, pa.string()),
            "error_type": pa.array(errt, pa.string()),
            "error_code": pa.array(errc, pa.string()),
            "retry_possible": pa.array(retry, pa.bool_()),
            "attempts": pa.array(attempts, pa.int32()),
            "title": pa.array(titles, pa.string()),
            "description": pa.array(descs, pa.string()),
            "spans": build_spans_column(span_lists),
            "n_spans": pa.array([len(s) for s in span_lists], pa.int32()),
            "n_links": pa.array(n_links),
            "n_images": pa.array(n_images),
            "part_id": batch["part_id"],
        }
    )


def build_spans_column(span_lists: list[list[tuple[str, str, str]]]) -> pa.ListArray:
    """Flat-build list<struct<kind,text,media_ref,offset>> from per-doc span
    tuple lists."""
    kinds: list[str] = []
    texts: list[str] = []
    refs: list[str] = []
    offs: list[int] = []
    lengths = np.empty(len(span_lists), dtype=np.int64)
    for i, spans in enumerate(span_lists):
        lengths[i] = len(spans)
        for j, (k, t, m) in enumerate(spans):
            kinds.append(k)
            texts.append(t)
            refs.append(m)
            offs.append(j)
    offsets = np.zeros(len(span_lists) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(refs, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


def parse_batch(batch: pa.Table) -> pa.Table:
    """Fetched batch (frontier cols + fetch cols) -> DOC_SCHEMA batch."""
    n = batch.num_rows
    urls = batch["url"].to_pylist()
    seqs = batch["seq"].to_pylist()
    status = batch["status"].to_pylist()
    payloads = batch["payload"].to_pylist()

    span_lists: list[list[tuple[str, str, str]]] = []
    titles: list[str] = []
    descs: list[str] = []
    n_links = np.zeros(n, dtype=np.int32)
    n_images = np.zeros(n, dtype=np.int32)
    new_status = list(status)
    err_type = batch["error_type"].to_pylist()
    err_code = batch["error_code"].to_pylist()

    for i in range(n):
        if status[i] != "ok" or payloads[i] is None:
            span_lists.append([])
            titles.append("")
            descs.append("")
            continue
        res = parse_document(payloads[i].decode("utf-8", "replace"), urls[i])
        if res.error_code:
            new_status[i] = "parse_error"
            err_type[i] = "content_error"
            err_code[i] = res.error_code
            span_lists.append([])
            titles.append("")
            descs.append("")
            continue
        span_lists.append(res.spans)
        titles.append(res.title)
        descs.append(res.description)
        n_links[i] = len(res.links)
        n_images[i] = sum(1 for k, _, _ in res.spans if k == KIND_IMAGE)

    spans_col = build_spans_column(span_lists)
    doc_ids = pa.array([f"d{s:012d}" for s in seqs], pa.string())
    return pa.table(
        {
            "doc_id": doc_ids,
            "url": batch["url"],
            "host": batch["host"],
            "round": batch["round"],
            "priority": batch["priority"],
            "seq": batch["seq"],
            "depth": batch["depth"],
            "status": pa.array(new_status, pa.string()),
            "error_type": pa.array(err_type, pa.string()),
            "error_code": pa.array(err_code, pa.string()),
            "retry_possible": batch["retry_possible"],
            "attempts": batch["attempts"],
            "title": pa.array(titles, pa.string()),
            "description": pa.array(descs, pa.string()),
            "spans": spans_col,
            "n_spans": pa.array([len(s) for s in span_lists], pa.int32()),
            "n_links": pa.array(n_links),
            "n_images": pa.array(n_images),
            "part_id": batch["part_id"],
        }
    )


def explode_outlinks(docs: pa.Table, seed: int) -> pa.Table:
    """Doc rows -> candidate outlink rows (url, depth, cand_key).

    ``cand_key`` packs the deterministic first-seen order
    ``(src_seq, discovery_rank)`` into one int64
    (``src_seq * 2^20 + rank``; fanout << 2^20): the round's within-round
    dedup keeps the minimal key, making first-seen attribution independent
    of physical execution order (SURVEY.md §7 hard part (a)).
    """
    import pyarrow.compute as pc

    out_urls: list[pa.Array] = []
    out_keys: list[np.ndarray] = []
    out_depths: list[np.ndarray] = []
    seqs = docs["seq"].to_numpy(zero_copy_only=False)
    doc_depths = docs["depth"].to_numpy(zero_copy_only=False)
    row0 = 0
    spans_chunks = (
        docs["spans"].chunks
        if isinstance(docs["spans"], pa.ChunkedArray)
        else [docs["spans"]]
    )
    for lst in spans_chunks:
        n = len(lst)
        offsets = lst.offsets.to_numpy()
        flat = lst.flatten()
        mask = pc.equal(flat.field("kind"), KIND_LINK).to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(n), np.diff(offsets))[mask]
        if len(parents):
            # discovery_rank = position among the doc's links, in order
            change = np.r_[True, parents[1:] != parents[:-1]]
            starts = np.flatnonzero(change)
            sizes = np.diff(np.r_[starts, len(parents)])
            ranks = np.arange(len(parents)) - np.repeat(starts, sizes)
            out_urls.append(flat.field("media_ref").filter(pa.array(mask)))
            out_keys.append((seqs[row0 + parents] << 20) | ranks)
            out_depths.append(doc_depths[row0 + parents] + 1)
        row0 += n
    if not out_urls:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "cand_key": pa.array([], pa.int64()),
                "depth": pa.array([], pa.int32()),
                "host": pa.array([], pa.string()),
                "priority": pa.array([], pa.int32()),
                "url_hash": pa.array([], pa.int64()),
            }
        )
    url_arr = pa.concat_arrays([u.cast(pa.string()) for u in out_urls])
    # host + priority + url_hash are pure functions of the canonical URL;
    # computing them here (inside the parallel worker) keeps the downstream
    # membership/dedup/frontier steps pure column ops with no per-row
    # recompute and no serial driver-side hashing
    from ..canon import host_of
    from ..synth import h64
    from ..util import hash64

    url_list = url_arr.to_pylist()
    hosts = pa.array([host_of(u) for u in url_list], pa.string())
    prios = pa.array([h64(seed, "prio", u) % 4 for u in url_list], pa.int32())
    return pa.table(
        {
            "url": url_arr,
            "cand_key": pa.array(np.concatenate(out_keys), pa.int64()),
            "depth": pa.array(np.concatenate(out_depths).astype(np.int32)),
            "host": hosts,
            "priority": prios,
            "url_hash": pa.array(hash64(url_arr).view(np.int64)),
        }
    )


def scoped_parse_batch(batch: pa.Table) -> pa.Table:
    """Per-row scoped extraction (M2/M3 as a batch stage): rows carry
    (url, payload, scope_class, scope_id) — the reference's per-row UDF
    parameters (``backend/api/models.py:19-34``). Scope misses become
    structured error rows (status='failed', error_code='ELEMENT_NOT_FOUND'
    with the <=20-class diagnostic), mirroring ``backend/api/tasks.py:90-141``.
    """
    urls = batch["url"].to_pylist()
    payloads = batch["payload"].to_pylist()
    sc = batch["scope_class"].to_pylist() if "scope_class" in batch.column_names else [None] * batch.num_rows
    si = batch["scope_id"].to_pylist() if "scope_id" in batch.column_names else [None] * batch.num_rows
    span_lists, status, err_code, err_msg, titles = [], [], [], [], []
    for i in range(batch.num_rows):
        html = payloads[i].decode("utf-8", "replace") if isinstance(payloads[i], bytes) else payloads[i]
        res = parse_document(html, urls[i], scope_id=si[i] or None, scope_class=sc[i] or None)
        if res.error_code:
            status.append("failed")
            err_code.append(res.error_code)
            err_msg.append(res.error_msg)
            span_lists.append([])
            titles.append("")
        else:
            status.append("ok")
            err_code.append("")
            err_msg.append("")
            span_lists.append(res.spans)
            titles.append(res.title)
    return pa.table(
        {
            "url": batch["url"],
            "status": pa.array(status, pa.string()),
            "error_code": pa.array(err_code, pa.string()),
            "error_msg": pa.array(err_msg, pa.string()),
            "title": pa.array(titles, pa.string()),
            "spans": build_spans_column(span_lists),
        }
    )
