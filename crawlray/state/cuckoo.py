"""Cuckoo filter over numpy arrays — the URL-seen membership sketch.

Standard (bucketized) cuckoo filter per Fan et al., "Cuckoo Filter:
Practically Better Than Bloom" (CoNEXT'14), public algorithm: 4-slot
buckets of 16-bit fingerprints, partial-key cuckoo hashing
(``i2 = i1 XOR H(fp)``), BFS-free random-walk eviction with a bounded kick
chain. Supports deletion (unused by the crawl) and byte-exact
snapshot/restore for checkpoint manifests.

False positives only ever *suppress a re-crawl* of a URL that was never
seen (north-rule-accepted approximation); they can never duplicate work.
Tests run the exact-set mode of ``UrlSeenShard`` instead (SURVEY.md §7
"hard parts" (c)).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        # size buckets to a power of two with ~84% max load headroom
        need = max(16, int(capacity / (_SLOTS * 0.84)))
        self.n_buckets = 1 << (need - 1).bit_length()
        self.mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.rng = np.random.RandomState(seed)

    # fingerprints are 1..65535 (0 marks an empty slot)
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i1 ^ (fp.astype(np.uint64) * _FP_MIX)) & self.mask

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test for an array of uint64 hashes."""
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fingerprint(h)
        i1 = h & self.mask
        i2 = self._index2(i1, fp)
        fpc = fp[:, None]
        return ((self.table[i1.astype(np.int64)] == fpc).any(axis=1)
                | (self.table[i2.astype(np.int64)] == fpc).any(axis=1))

    def add_many(self, hashes: np.ndarray) -> int:
        """Insert hashes (idempotent-ish: skips values already present).
        Returns the number actually inserted. Raises if the filter is full
        (kick chain exhausted) — size capacity generously.

        Vectorized fast path: dedup on (bucket, fp), drop already-present
        values, place every item whose ``i1`` bucket has a free slot in
        one numpy pass; only bucket-overflow leftovers (a small fraction
        at sane load factors) take the sequential cuckoo-kick loop."""
        h = np.unique(hashes.astype(np.uint64, copy=False))
        fp_u = self._fingerprint(h)
        i1_u = (h & self.mask).astype(np.int64)
        # one candidate per (bucket, fp): duplicates are skips by contract
        _, uniq_idx = np.unique(
            (i1_u.astype(np.uint64) << np.uint64(16)) | fp_u.astype(np.uint64),
            return_index=True,
        )
        fp_u, i1_u, h = fp_u[uniq_idx], i1_u[uniq_idx], h[uniq_idx]
        i2_u = self._index2(i1_u.astype(np.uint64), fp_u).astype(np.int64)
        present = ((self.table[i1_u] == fp_u[:, None]).any(axis=1)
                   | (self.table[i2_u] == fp_u[:, None]).any(axis=1))
        fp_u, i1_u = fp_u[~present], i1_u[~present]
        inserted = 0
        if len(fp_u):
            # rank of each item within its i1 bucket (items sorted by bucket)
            order = np.argsort(i1_u, kind="stable")
            bs, fs = i1_u[order], fp_u[order]
            starts = np.r_[True, bs[1:] != bs[:-1]]
            rank = np.arange(len(bs)) - np.repeat(np.flatnonzero(starts),
                                                  np.diff(np.r_[np.flatnonzero(starts), len(bs)]))
            rows = self.table[bs]
            empty = rows == 0                       # (n, 4) free-slot map
            n_free = empty.sum(axis=1)
            fits = rank < n_free
            if fits.any():
                # slot index = (rank+1)-th empty column of the row
                cum = np.cumsum(empty[fits], axis=1)
                slot = (cum == (rank[fits] + 1)[:, None]).argmax(axis=1)
                self.table[bs[fits], slot] = fs[fits]
                inserted += int(fits.sum())
            # leftover: bucket overflow -> classic per-item path below
            fp_all = fs[~fits]
            i1_all = bs[~fits]
        else:
            fp_all = fp_u
            i1_all = i1_u
        for k in range(len(fp_all)):
            fp = int(fp_all[k])
            i1 = int(i1_all[k])
            i2 = int((np.uint64(i1) ^ (np.uint64(fp) * _FP_MIX)) & self.mask)
            row1, row2 = self.table[i1], self.table[i2]
            if (row1 == fp).any() or (row2 == fp).any():
                continue
            if self._try_put(i1, fp) or self._try_put(i2, fp):
                inserted += 1
                continue
            # evict: random walk
            i, cur = i2, fp
            ok = False
            for _ in range(_MAX_KICKS):
                s = int(self.rng.randint(_SLOTS))
                cur, self.table[i, s] = int(self.table[i, s]), cur
                i = int((np.uint64(i) ^ (np.uint64(cur) * _FP_MIX)) & self.mask)
                if self._try_put(i, cur):
                    ok = True
                    break
            if not ok:
                raise RuntimeError("cuckoo filter full — increase capacity")
            inserted += 1
        self.count += inserted
        return inserted

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def delete_many(self, hashes: np.ndarray) -> int:
        h = hashes.astype(np.uint64, copy=False)
        fp_all = self._fingerprint(h)
        removed = 0
        for k in range(len(h)):
            fp = int(fp_all[k])
            i1 = int(h[k] & self.mask)
            i2 = int((np.uint64(i1) ^ (np.uint64(fp) * _FP_MIX)) & self.mask)
            for i in (i1, i2):
                slots = np.nonzero(self.table[i] == fp)[0]
                if len(slots):
                    self.table[i, slots[0]] = 0
                    removed += 1
                    break
        self.count -= removed
        return removed

    # -- checkpointing ----------------------------------------------------
    def snapshot(self) -> bytes:
        head = np.array([self.n_buckets, self.count], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def restore(cls, blob: bytes, seed: int = 7) -> "CuckooFilter":
        n_buckets, count = np.frombuffer(blob[:16], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_buckets = int(n_buckets)
        f.mask = np.uint64(f.n_buckets - 1)
        f.table = np.frombuffer(blob[16:], dtype=np.uint16).reshape(f.n_buckets, _SLOTS).copy()
        f.count = int(count)
        f.rng = np.random.RandomState(seed)
        return f
