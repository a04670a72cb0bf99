"""Bulk CSV crawl — the reference's PRIMARY user flow, end to end.

Mirrors ``backend/main.py`` bulk upload + ``backend/api/tasks.py::
process_bulk_crawl``: a CSV of URLs with per-row configs (mode, scope,
formats, link_type, exclude_anchors, download_images, auth) is validated
and split into seeds/rejects, every seed is fetched (per-row credentials
applied, errors as data), scoped-parsed, rendered into the row's
requested formats, optionally has its images downloaded and its markdown
refs rewritten to local paths, and one output file per (row, format) is
written under ``out_dir`` — plus a per-row result record.

Ray-Data-first shape: rows are hash-partitioned by ``seed_rank`` and the
whole fetch->parse->render->write chain for a partition runs inside ONE
fused ``map_groups`` task (the engine's `_PartWorker` pattern): HTML,
spans and image bytes are born, written and freed inside the task; only
tiny seed rows and result rows cross task boundaries.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..htmlx import parse_document
from ..stages.fetch import SynthFetcher
from ..stages.render import (
    MarkdownOptions,
    filter_outlinks,
    spans_to_html,
    spans_to_markdown,
    spans_to_text,
)
from ..stages.sources import read_seed_csv
from .media import MediaFetcher, infer_extension


def extract_domain_and_path(url: str) -> tuple[str, str]:
    """The reference's filename stem kernel (``writer.py:25-53``):
    www-stripped dot->underscore domain + sanitized first path segment
    (<=50 chars)."""
    import re
    from urllib.parse import urlparse

    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "").replace(".", "_")
    path_parts = [p for p in parsed.path.strip("/").split("/") if p]
    path_segment = ""
    if path_parts:
        path_segment = re.sub(r"[^\w\-_]", "_", "_" + path_parts[0])[:50]
    return domain, path_segment


def generate_folder_name(url: str, timestamp: str, bulk_index: int | None = None) -> str:
    """``writer.py:55-78`` naming: ``[NNN_]{domain}{path}_{YYYYMMDD_HHMM}``,
    filesystem-hostile chars sanitized. ``timestamp`` is INJECTED (the
    reference calls ``datetime.now()``; wall-clock stamping happens at the
    driver here so partition tasks stay deterministic)."""
    import re

    domain, path = extract_domain_and_path(url)
    name = f"{domain}{path}_{timestamp}"
    if bulk_index is not None:
        name = f"{bulk_index:03d}_{name}"
    return re.sub(r'[<>:"/\\|?*]', "_", name)


def generate_filename(url: str, fmt: str, timestamp: str) -> str:
    """``writer.py:80-98``: ``{domain}{path}_{timestamp}.{format}``,
    sanitized. The bulk pipeline itself names files by ``seed_rank`` (a
    per-run-stable key the reference lacks) so resumes are byte-stable;
    these kernels exist for name parity with reference output trees."""
    import re

    domain, path = extract_domain_and_path(url)
    return re.sub(r'[<>:"/\\|?*]', "_", f"{domain}{path}_{timestamp}.{fmt}")


def _span_dicts(spans) -> list[dict]:
    return [{"kind": k, "text": t, "media_ref": m} for k, t, m in spans]


class _BulkPartWorker:
    """One partition of seed rows -> output files + result rows.

    Node-safety contract: ``out_dir`` must be a filesystem shared by all
    worker nodes (the same contract as the engine's checkpoint root) —
    partition tasks write their output files directly. The object pickled
    into each task carries ONLY config; the heavy state (fetcher world,
    media fetcher) and the output subdirs are created lazily inside the
    task via :meth:`_ensure_ready` (idempotent mkdir), never on the
    driver, so a multi-node cluster works without the driver's filesystem
    view leaking into remote tasks."""

    def __init__(self, out_dir: str, world_cfg, global_auth: dict | None,
                 md_options: MarkdownOptions | None = None):
        self.out = Path(out_dir)
        self.world_cfg = world_cfg
        self.global_auth = global_auth
        self.md_options = md_options or MarkdownOptions()
        self.fetcher = None
        self.media = None

    def _ensure_ready(self) -> None:
        """Task-side init: build per-task state and create output dirs on
        the EXECUTING node (idempotent — safe under concurrent tasks)."""
        if self.fetcher is None:
            self.fetcher = SynthFetcher(self.world_cfg, None, self.global_auth)
            self.media = MediaFetcher(self.world_cfg.seed)
        for sub in ("docs", "links", "media"):
            (self.out / sub).mkdir(parents=True, exist_ok=True)

    # -- per-row helpers -------------------------------------------------
    def _write(self, rel: str, data: str | bytes) -> str:
        p = self.out / rel
        if isinstance(data, bytes):
            p.write_bytes(data)
        else:
            p.write_text(data)
        return rel

    def _download_images(self, rank: int, spans: list[dict]) -> tuple[list[dict], list[str], int]:
        refs = sorted({s["media_ref"] for s in spans if s["kind"] == "image"})
        if not refs:
            return spans, [], 0
        worklist = pa.table({"media_ref": pa.array(refs, pa.string())})
        fetched = self.media(worklist)
        mapping: dict[str, str] = {}
        files: list[str] = []
        for i in range(fetched.num_rows):
            if fetched["media_status"][i].as_py() != "ok":
                continue  # too_large etc: ref left untouched (errors-as-data)
            ref = fetched["media_ref"][i].as_py()
            ext = fetched["ext"][i].as_py() or infer_extension(ref)
            rel = f"media/{rank:06d}-{i:03d}{ext}"
            files.append(self._write(rel, fetched["payload"][i].as_py()))
            mapping[ref] = rel
        new_spans = [
            {**s, "media_ref": mapping.get(s["media_ref"], s["media_ref"])}
            if s["kind"] == "image" else s
            for s in spans
        ]
        return new_spans, files, len(mapping)

    def _render_files(self, rank: int, url: str, title: str,
                      spans: list[dict], formats: list[str]) -> list[str]:
        files = []
        for fmt in formats:
            if fmt == "txt":
                body = spans_to_text(spans)
            elif fmt == "md":
                body = spans_to_markdown(spans, title, self.md_options)
            elif fmt == "html":
                body = spans_to_html(spans, title)
            elif fmt == "json":
                body = json.dumps({"url": url, "title": title, "spans": spans},
                                  sort_keys=True)
            else:
                continue  # unknown formats were coerced away at the source
            files.append(self._write(f"docs/{rank:06d}.{fmt}", body))
        return files

    def _link_files(self, rank: int, res, link_type: str,
                    exclude_anchors: bool) -> tuple[list[str], int]:
        tbl = pa.table({
            "url": pa.array([l.url for l in res.links], pa.string()),
            "is_internal": pa.array([l.is_internal for l in res.links], pa.bool_()),
            "discovery_rank": pa.array([l.rank for l in res.links], pa.int32()),
            "anchor_text": pa.array([l.text for l in res.links], pa.string()),
        })
        filtered = filter_outlinks(tbl, link_type=link_type,
                                   exclude_anchors=exclude_anchors)
        urls = filtered["url"].to_pylist()
        files = [
            self._write(f"links/{rank:06d}.txt", "\n".join(urls) + "\n"),
            self._write(f"links/{rank:06d}.json", json.dumps(
                filtered.to_pylist(), sort_keys=True)),
        ]
        return files, len(urls)

    # -- the fused partition task ---------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        self._ensure_ready()
        group = group.take(
            pa.compute.sort_indices(group, sort_keys=[("seed_rank", "ascending")])
        )
        fetched = self.fetcher(group)
        n = fetched.num_rows
        col = lambda c: fetched[c].to_pylist() if c in fetched.column_names else [None] * n
        ranks = col("seed_rank")
        urls, payloads, statuses = col("url"), col("payload"), col("status")
        err_codes = col("error_code")
        modes, formats = col("mode"), col("formats")
        scs, sis = col("scope_class"), col("scope_id")
        lts, eas, dlds = col("link_type"), col("exclude_anchors"), col("download_images")

        out = {k: [] for k in ("seed_rank", "url", "mode", "status", "error_code",
                               "title", "n_links", "n_images", "files")}

        def emit(i, status, error_code="", title="", n_links=0, n_images=0, files=()):
            out["seed_rank"].append(int(ranks[i]))
            out["url"].append(urls[i])
            out["mode"].append(modes[i] or "content")
            out["status"].append(status)
            out["error_code"].append(error_code)
            out["title"].append(title)
            out["n_links"].append(n_links)
            out["n_images"].append(n_images)
            out["files"].append(json.dumps(list(files)))

        for i in range(n):
            if statuses[i] != "ok":
                emit(i, statuses[i], err_codes[i] or "")
                continue
            html = payloads[i].decode("utf-8", "replace")
            res = parse_document(html, urls[i], scope_id=sis[i] or None,
                                 scope_class=scs[i] or None)
            if res.error_code:
                emit(i, "failed", res.error_code)
                continue
            rank = int(ranks[i])
            if (modes[i] or "content") == "link":
                files, n_links = self._link_files(rank, res, lts[i] or "all",
                                                  bool(eas[i]))
                emit(i, "ok", title=res.title, n_links=n_links, files=files)
            else:
                spans = _span_dicts(res.spans)
                media_files: list[str] = []
                n_img = 0
                if dlds[i]:
                    spans, media_files, n_img = self._download_images(rank, spans)
                files = self._render_files(rank, urls[i], res.title, spans,
                                           list(formats[i] or ["txt"]))
                emit(i, "ok", title=res.title, n_links=len(res.links),
                     n_images=n_img, files=files + media_files)

        return pa.table({
            "seed_rank": pa.array(out["seed_rank"], pa.int64()),
            "url": pa.array(out["url"], pa.string()),
            "mode": pa.array(out["mode"], pa.string()),
            "status": pa.array(out["status"], pa.string()),
            "error_code": pa.array(out["error_code"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "n_links": pa.array(out["n_links"], pa.int64()),
            "n_images": pa.array(out["n_images"], pa.int64()),
            "files": pa.array(out["files"], pa.string()),
        })


def bulk_crawl(
    csv_path: str,
    out_dir: str,
    world_cfg,
    global_auth: dict | None = None,
    n_parts: int = 8,
    md_options: MarkdownOptions | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (results, rejects): the full reference bulk flow over Ray Data.
    ``results`` has one row per valid CSV row (status/error as data, the
    written files as a JSON list); ``rejects`` the invalid-URL rows.

    ``out_dir`` must be shared storage visible to every worker node
    (NFS-like or single-node): partition tasks create their own output
    subdirs and write files task-side (see :class:`_BulkPartWorker`)."""
    seeds, rejects = read_seed_csv(csv_path)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["seed_rank"].to_numpy(zero_copy_only=False) % n_parts).astype(np.int32)
        return t.append_column("part", pa.array(part))

    worker = _BulkPartWorker(out_dir, world_cfg, global_auth, md_options)
    results = (
        seeds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: worker(g), batch_format="pyarrow")
    )
    return results, rejects


def package_outputs(out_dir: str, zip_path: str) -> str:
    """S12 analog of the reference's download-all endpoint
    (``backend/main.py`` zip download): deterministically package every
    bulk output file into one zip (sorted entries, zeroed timestamps so
    re-packaging the same tree is byte-identical)."""
    import zipfile

    root = Path(out_dir)
    files = sorted(p for p in root.rglob("*") if p.is_file())
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(root)), date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return zip_path


def preview(out_dir: str, max_chars: int = 400) -> list[dict]:
    """S12 analog of the preview endpoint: first ``max_chars`` of every
    text output file (binary media listed with size only)."""
    root = Path(out_dir)
    out = []
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        rel = str(p.relative_to(root))
        if rel.startswith("media/"):
            out.append({"file": rel, "bytes": p.stat().st_size, "preview": None})
        else:
            out.append({"file": rel, "bytes": p.stat().st_size,
                        "preview": p.read_text(errors="replace")[:max_chars]})
    return out


def bulk_summary(results: rd.Dataset) -> dict:
    """Job summary (the reference's job store counters) via one grouped
    aggregate — no row-wise driver pass."""
    from ray.data.aggregate import Count, Sum

    per_status = results.groupby("status").aggregate(
        Count(alias_name="n")
    ).to_pandas()
    totals = results.aggregate(
        Sum("n_links", alias_name="links"), Sum("n_images", alias_name="images")
    )
    return {
        "by_status": dict(zip(per_status["status"], per_status["n"].astype(int))),
        "total_links": int(totals["links"] or 0),
        "total_images": int(totals["images"] or 0),
    }
