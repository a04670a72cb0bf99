"""Mergeable sketches: approximate distinct counting at corpus scale.

The exact count-distinct operators (``source_stats``'s per-group distinct
langs, ``distinct_pairs``) shuffle the distinct keys; at 100 TB a global
"how many distinct URLs/shingles/users" over billions of keys should not
move keys at all. :func:`approx_distinct` is the HyperLogLog answer
(Flajolet et al. 2007, the standard cardinality sketch): every block
folds into a fixed 2^p-byte register array inside ``map_batches`` (an
embarrassingly parallel pass over the data), and merging is an
elementwise ``max`` of tiny register arrays — one 4 KiB object per
block crosses to the driver, never a key. Standard error is
``1.04/sqrt(2^p)`` (~1.6% at p=12).

Hashing uses :func:`crawlray.util.hash64` (the engine's stable SipHash),
so results are deterministic for a given input and polars version.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..util import hash64


def _hll_fold(values: np.ndarray, p: int) -> np.ndarray:
    """Fold uint64 hashes into a 2^p register array (max leading-run)."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = values << np.uint64(p)                  # low 64-p bits, top-aligned
    # rank = position of first 1-bit in the remaining stream, in 1..64-p+1
    # (rest == 0 -> all zeros -> maximal rank)
    nbits = 64 - p
    ranks = np.full(len(values), nbits + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        # leading-zero count via float64 exponent is unsafe >2^53; do it
        # with a 6-step binary search, fully vectorized
        lz = np.zeros(len(r), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += np.uint8(shift)
            r[mask] <<= np.uint64(shift)
        ranks[nz] = np.minimum(lz + 1, nbits + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, ranks)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from a register array (HLL with the standard
    small-range linear-counting correction)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hash_col(c: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Column -> uint64 hashes: a Murmur3-style finalizer mix for integer
    columns (vectorized, allocation-light), :func:`hash64` otherwise."""
    if pa.types.is_integer(c.type):
        v = c.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = v * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0x85EBCA6B)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return h
    return hash64(c)


def approx_distinct_multi(
    ds: rd.Dataset, cols: list[str], p: int = 12
) -> dict[str, float]:
    """Approximate count-distinct of several columns via HyperLogLog in
    ONE streaming pass.

    Each block maps to one 2^p-byte register row per column
    (``map_batches``, no shuffle); the per-block registers — O(blocks x
    cols) x 4 KiB, independent of row count — reduce on the driver with
    an elementwise max. The only data crossing the cluster is sketches.
    Register-max merging is exact (``test_hll_merge_equals_single_fold``),
    so the distributed estimate is bit-identical to a sequential fold
    over the same rows in any order."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        out = []
        for col in cols:
            if t.num_rows == 0:
                regs = np.zeros(m, dtype=np.uint8)
            else:
                regs = _hll_fold(hash_col(t[col]), p)
            out.append(regs.tobytes())
        return pa.table({"col": pa.array(list(cols), pa.string()),
                         "regs": pa.array(out, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = {c: np.zeros(m, dtype=np.uint8) for c in cols}
    for row in parts:
        c = row["col"]
        merged[c] = np.maximum(merged[c], np.frombuffer(row["regs"], dtype=np.uint8))
    return {c: hll_estimate(r) for c, r in merged.items()}


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate global count-distinct of ``ds[col]`` via HyperLogLog
    (single-column convenience over :func:`approx_distinct_multi`)."""
    return approx_distinct_multi(ds, [col], p)[col]
