"""Round-granular checkpoint manifests + lineage (SURVEY.md §4.2).

Replaces the reference's whole-file JSON job store rewritten per URL
(``backend/api/models.py:183-255`` — crash *visibility*, no resume) with the
batch-pipeline resume contract: after round r completes, one manifest is
committed atomically (write temp + ``os.replace``) recording

- the next round's frontier partition files,
- per-shard URL-seen snapshots,
- the round's corpus/metrics partition files with lineage
  (which frontier round produced them + the config hash),
- the monotone ``next_seq`` counter.

Resume = load the newest complete manifest, restore shard snapshots, and
continue from its round. All partition files are named deterministically
(``part-{round:04d}-{part:05d}.parquet``) and written with rows sorted on a
logical key, so a resumed run re-produces byte-identical outputs
(SURVEY.md §7 hard part (d)). Output layout note: Lance is the intended
production doc-table format (north rule); the sandbox lacks the ``lance``
package, so sinks emit Parquet in the same layout.
"""

from __future__ import annotations

import json
import os
from hashlib import blake2b
from pathlib import Path


def part_name(round_idx: int, part_id: int, ext: str = ".parquet") -> str:
    return f"part-{round_idx:04d}-{part_id:05d}{ext}"


def atomic_write_json(path: Path, obj: dict) -> None:
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(obj, indent=1, sort_keys=True))
    os.replace(tmp, path)


def atomic_write_bytes(path: Path, blob: bytes) -> None:
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)


def config_hash(cfg: dict) -> str:
    return blake2b(
        json.dumps(cfg, sort_keys=True).encode(), digest_size=8
    ).hexdigest()


class CheckpointStore:
    def __init__(self, out_dir: str | os.PathLike):
        self.root = Path(out_dir)
        for sub in ("corpus", "frontier", "seen", "metrics", "manifests"):
            (self.root / sub).mkdir(parents=True, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def corpus_dir(self, round_idx: int) -> Path:
        p = self.root / "corpus" / f"round-{round_idx:04d}"
        p.mkdir(parents=True, exist_ok=True)
        return p

    def frontier_dir(self, round_idx: int) -> Path:
        p = self.root / "frontier" / f"round-{round_idx:04d}"
        p.mkdir(parents=True, exist_ok=True)
        return p

    def metrics_dir(self, round_idx: int) -> Path:
        p = self.root / "metrics" / f"round-{round_idx:04d}"
        p.mkdir(parents=True, exist_ok=True)
        return p

    def seen_dir(self, round_idx: int) -> Path:
        p = self.root / "seen" / f"round-{round_idx:04d}"
        p.mkdir(parents=True, exist_ok=True)
        return p

    def manifest_path(self, round_idx: int) -> Path:
        return self.root / "manifests" / f"manifest-{round_idx:04d}.json"

    # -- manifests -------------------------------------------------------
    # (the single manifest writer is CrawlEngine._commit_round; a second
    # writer here once drifted from the shape the resume path reads and
    # was removed)

    def latest_manifest(self) -> dict | None:
        files = sorted((self.root / "manifests").glob("manifest-*.json"))
        if not files:
            return None
        return json.loads(files[-1].read_text())


def gc_plan(out_dir: str | os.PathLike, apply: bool = False) -> dict:
    """Checkpoint GARBAGE-COLLECTION plan — the storage-upkeep side of
    the resume contract: the LIVE set is the union of every manifest's
    corpus + metric lineage (the corpus is cumulative — round r's
    partitions are referenced only by manifest r+1), the LATEST
    manifest's frontier partitions and cumulative seen-delta snapshots,
    and the manifests themselves. Everything else under the checkpoint
    root is collectable: frontier partitions of SUPERSEDED rounds (the
    frontier is a barrier — only the newest matters for resume),
    ``.tmp`` remnants and uncommitted partials from interrupted rounds.

    Returns ``{n_live, n_orphans, orphan_bytes, orphans}`` with
    root-relative orphan paths, sorted. ``apply=True`` unlinks the
    orphans and prunes emptied round directories; it refuses to run
    when no manifest exists (an empty live set would collect a
    mid-first-round checkpoint wholesale)."""
    root = Path(out_dir)
    manifests = sorted((root / "manifests").glob("manifest-*.json"))
    live: set[str] = {str(p.relative_to(root)) for p in manifests}
    for mp in manifests:
        m = json.loads(mp.read_text())
        live.update(m["lineage"]["corpus_files"])
        live.update(m["lineage"]["metric_files"])
    if manifests:
        latest = json.loads(manifests[-1].read_text())
        live.update(latest["frontier_files"])
        live.update(latest["seen_files"])
    orphans: list[str] = []
    n_bytes = 0
    for p in root.rglob("*"):
        if p.is_file():
            rel = str(p.relative_to(root))
            if rel not in live:
                orphans.append(rel)
                n_bytes += p.stat().st_size
    orphans.sort()
    if apply:
        if not manifests:
            raise ValueError("gc refuses to run without a manifest")
        for rel in orphans:
            (root / rel).unlink()
        for d in sorted((d for d in root.rglob("round-*") if d.is_dir()),
                        reverse=True):
            try:
                d.rmdir()
            except OSError:
                pass            # not empty — still referenced
    return {"n_live": len(live), "n_orphans": len(orphans),
            "orphan_bytes": n_bytes, "orphans": orphans}
