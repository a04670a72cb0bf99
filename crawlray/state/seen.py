"""Sharded URL-seen membership state (ST2/J2 in SURVEY.md §2.3/2.4).

K named Ray actors each own the membership state for URLs with
``hash64(url) % K == shard_id``. Two modes:

- ``exact``: a Python set of canonical URL strings — the test oracle mode
  (exact URL-seen-set equality, no false positives);
- ``cuckoo``: a ``CuckooFilter`` over 64-bit URL hashes — the scale mode
  (bounded memory per shard; FPs only suppress re-crawls).

The reference has no global URL-seen at all (per-page only,
``backend/crawler/link_extractor.py:94-113``); this stage is the north
rule's addition. Shard count should be >= 2x max parallelism so membership
calls never serialize the pipeline (SURVEY.md §4.3).

Protocol per round (two-phase, so first-seen attribution is deterministic
under parallel callers — SURVEY.md §7 hard part (a)):

1. ``contains_batch`` from parse tasks: read-only test against all
   *previous* rounds' state;
2. the round's surviving candidates are exactly deduped by a
   ``groupby(url).min(cand_key)`` shuffle in the engine;
3. ``add_batch`` inserts the deduped winners once.

Checkpointing is **delta-based**: each round's snapshot is the SORTED set
of keys added since the previous snapshot (O(new URLs), not O(capacity));
restore replays all delta files in round order. Sorting makes the delta
bytes independent of insertion-arrival order, preserving byte-identical
resume.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class UrlSeenShard:
    """One membership shard. num_cpus=0: membership calls are short and
    bursty (vectorized set/filter probes), so shards must never reserve
    CPU slots away from the map/shuffle stages — K shards at num_cpus>0
    can starve a small cluster outright."""

    def __init__(self, shard_id: int, mode: str = "exact", capacity: int = 1 << 20):
        assert mode in ("exact", "cuckoo")
        self.shard_id = shard_id
        self.mode = mode
        self.exact: set[str] = set()
        self.filter = CuckooFilter(capacity) if mode == "cuckoo" else None
        self.delta_urls: list[str] = []
        self.delta_hashes: list[np.ndarray] = []

    def contains_batch(self, urls: list[str] | None, hashes: np.ndarray) -> np.ndarray:
        if self.mode == "exact":
            return np.fromiter((u in self.exact for u in urls), dtype=bool, count=len(urls))
        return self.filter.contains_many(hashes)

    def winners_batch(self, urls: list[str] | None, hashes: np.ndarray,
                      cand_keys: np.ndarray, insert: bool = False) -> np.ndarray:
        """Fused anti-join + within-round dedup for this shard's hash
        partition: mask of rows that are (a) unseen in prior rounds and
        (b) the minimal-``cand_key`` occurrence of their url hash in this
        batch. Hash-partitioning guarantees shard-local min == global min,
        so the round's dedup runs inside K shards in parallel instead of
        one driver-side lexsort.

        ``insert=True`` additionally marks the winners seen before
        returning (the one-RPC upsert: the winner set IS what the engine
        inserts, so a separate ``add`` round-trip re-shipping the same
        hashes is pure overhead; delta snapshots sort, so checkpoint
        bytes are unchanged)."""
        if self.mode == "exact":
            seen = np.fromiter(
                (u in self.exact for u in urls), dtype=bool, count=len(urls)
            )
        else:
            seen = self.filter.contains_many(hashes)
        keep = ~seen
        h = hashes[keep]
        ck = cand_keys[keep]
        mask = np.zeros(len(hashes), dtype=bool)
        if len(h):
            o = np.lexsort((ck, h))
            first = np.r_[True, h[o][1:] != h[o][:-1]]
            mask[np.flatnonzero(keep)[o[first]]] = True
        if insert and mask.any():
            widx = np.flatnonzero(mask)
            self.add_batch(
                [urls[i] for i in widx] if self.mode == "exact" else None,
                hashes[widx],
            )
        return mask

    def add_batch(self, urls: list[str] | None, hashes: np.ndarray) -> int:
        if self.mode == "exact":
            n0 = len(self.exact)
            for u in urls:
                if u not in self.exact:
                    self.exact.add(u)
                    self.delta_urls.append(u)
            return len(self.exact) - n0
        fresh = ~self.filter.contains_many(hashes)
        self.delta_hashes.append(hashes[fresh])
        return self.filter.add_many(hashes)

    def count(self) -> int:
        return len(self.exact) if self.mode == "exact" else self.filter.count

    def snapshot(self) -> bytes:
        """Take the delta since the last snapshot (sorted -> deterministic
        bytes regardless of add arrival order) and clear it."""
        if self.mode == "exact":
            import pickle

            blob = pickle.dumps(sorted(self.delta_urls), protocol=5)
            self.delta_urls = []
            return blob
        h = (np.sort(np.concatenate(self.delta_hashes))
             if self.delta_hashes else np.array([], dtype=np.uint64))
        self.delta_hashes = []
        return h.astype(np.uint64).tobytes()

    def restore(self, blob: bytes) -> None:
        """Apply one delta blob (replayed in round order on resume)."""
        if self.mode == "exact":
            import pickle

            self.exact.update(pickle.loads(blob))
        else:
            self.filter.add_many(np.frombuffer(blob, dtype=np.uint64))


class SeenClient:
    """Driver/task-side helper that routes URL batches to their shards.

    Serializable (holds only actor handles + config); a copy inside a
    ``map_batches`` task issues one RPC per *touched* shard per batch.
    """

    def __init__(self, shards: list[ray.actor.ActorHandle], mode: str):
        self.shards = shards
        self.k = len(shards)
        self.mode = mode

    @staticmethod
    def create(k: int, mode: str = "exact", capacity_per_shard: int = 1 << 20
               ) -> "SeenClient":
        shards = [
            UrlSeenShard.remote(i, mode=mode, capacity=capacity_per_shard)
            for i in range(k)
        ]
        return SeenClient(shards, mode)

    def _route(self, urls: list[str] | None, hashes: np.ndarray):
        shard_of = (hashes % np.uint64(self.k)).astype(np.int64)
        for sid in np.unique(shard_of):
            idx = np.nonzero(shard_of == sid)[0]
            sub_urls = [urls[i] for i in idx] if self.mode == "exact" else None
            yield int(sid), idx, sub_urls, hashes[idx]

    def contains(self, urls: list[str] | None, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        futs, idxs = [], []
        for sid, idx, sub_urls, sub_h in self._route(urls, hashes):
            futs.append(self.shards[sid].contains_batch.remote(sub_urls, sub_h))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def winners(self, urls: list[str] | None, hashes: np.ndarray,
                cand_keys: np.ndarray, insert: bool = False) -> np.ndarray:
        """Fused contains + within-round min-cand_key dedup (see
        ``UrlSeenShard.winners_batch``); one RPC per touched shard, all
        shards work in parallel. ``insert=True`` also marks the winners
        seen in the same RPC (no separate ``add`` round)."""
        out = np.zeros(len(hashes), dtype=bool)
        futs, idxs = [], []
        for sid, idx, sub_urls, sub_h in self._route(urls, hashes):
            futs.append(
                self.shards[sid].winners_batch.remote(
                    sub_urls, sub_h, cand_keys[idx], insert)
            )
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, urls: list[str] | None, hashes: np.ndarray) -> int:
        futs = [
            self.shards[sid].add_batch.remote(sub_urls, sub_h)
            for sid, _idx, sub_urls, sub_h in self._route(urls, hashes)
        ]
        return int(sum(ray.get(futs)))

    def total(self) -> int:
        return int(sum(ray.get([s.count.remote() for s in self.shards])))

    def snapshot_all(self) -> list[bytes]:
        """Per-shard delta blobs for this round's checkpoint."""
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore_blobs(self, blobs: list[bytes]) -> None:
        """Apply one delta blob per shard (index-aligned)."""
        assert len(blobs) == self.k
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def restore_files(self, paths: list[str]) -> None:
        """Replay delta files (named ``.../shard-{id:03d}.bin``) in the
        given order; caller passes them sorted by round then shard."""
        from pathlib import Path

        futs = []
        for p in paths:
            sid = int(Path(p).stem.split("-")[1])
            futs.append(self.shards[sid].restore.remote(Path(p).read_bytes()))
        ray.get(futs)
