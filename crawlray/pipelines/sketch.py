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
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

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

def _mg_reduce(words: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction to at most ``k`` counters: subtract the
    (k+1)-th largest count from all and keep the positive remainder (the
    batch formulation of the MG stream sketch). Estimates undercount true
    frequency by at most the subtracted mass; summed over blocks the
    total undercount is <= N/(k+1) (MG sketches are mergeable with the
    single-stream bound — Agarwal et al. 2013, "Mergeable Summaries")."""
    if len(words) <= k:
        return words, counts
    kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    c = counts - kth
    keep = c > 0
    return words[keep], c[keep]


def heavy_hitters(
    ds: rd.Dataset,
    text_col: str = "text",
    threshold_pm: int = 10,
    k: int = 2048,
) -> rd.Dataset:
    """EXACT global heavy hitters — every word whose corpus frequency is
    >= threshold_pm per-mille of all words — without ever shuffling the
    raw word stream. Two passes:

    1. Per-block Misra-Gries sketches (<= k+1 rows per block: k counters
       plus one sentinel row carrying the block's total word count) are
       the ONLY thing that shuffles; a small ``groupby(word).sum`` merges
       them. Words surviving ``est + N//(k+1) >= ceil(N*pm/1000)`` form
       the candidate set — a guaranteed SUPERSET of the true heavy
       hitters whenever ``k+1 > 1000/threshold_pm`` (MG's deterministic
       undercount bound), which the default k=2048 satisfies for pm>=1.
    2. The candidate set broadcasts once (``ray.put``); a second streaming
       pass counts ONLY candidate words exactly, and the integer filter
       ``n*1000 >= N*pm`` yields the exact answer.

    Shuffle volume: O(blocks x k) sketch rows + O(candidates), both
    independent of corpus size. Returns (word, n) rows."""
    import ray

    TOTAL = ""  # sentinel key: str.split() never yields an empty token

    def sketch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        words = [w for s in texts for w in s.split()]
        if not words:
            return pa.table({"word": pa.array([TOTAL]),
                             "est": pa.array([0], pa.int64())})
        uniq, cnts = np.unique(np.asarray(words, dtype=object), return_counts=True)
        w, c = _mg_reduce(uniq, cnts.astype(np.int64), k)
        return pa.table({
            "word": pa.array(list(w) + [TOTAL], pa.string()),
            "est": pa.array(np.r_[c, len(words)], pa.int64()),
        })

    merged = ds.map_batches(sketch, batch_format="pyarrow").groupby(
        "word").aggregate(Sum("est", alias_name="est"))

    n_total = 0
    cand = []
    for row in merged.iter_rows():
        if row["word"] == TOTAL:
            n_total = int(row["est"])
        else:
            cand.append((row["word"], int(row["est"])))
    # iter_rows here drains O(sketch rows), not the corpus: bounded by
    # blocks x k. threshold T and MG slack in exact integer math.
    thresh = -((-n_total * threshold_pm) // 1000)   # ceil(N*pm/1000)
    slack = n_total // (k + 1)
    cand_set = {w for w, est in cand if est + slack >= thresh}
    cand_ref = ray.put(cand_set)

    class ExactCount:
        def __init__(self, ref):
            self.cands = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            words = [w for s in texts for w in s.split() if w in self.cands]
            if not words:
                return pa.table({"word": pa.nulls(0, pa.string()),
                                 "n": pa.nulls(0, pa.int64())})
            uniq, cnts = np.unique(np.asarray(words, dtype=object),
                                   return_counts=True)
            return pa.table({"word": pa.array(list(uniq), pa.string()),
                             "n": pa.array(cnts.astype(np.int64))})

    exact = ds.map_batches(
        ExactCount, fn_constructor_args=(cand_ref,),
        batch_format="pyarrow", concurrency=(1, 8),
    ).groupby("word").aggregate(Sum("n", alias_name="n"))

    def final_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.multiply(t["n"], 1000),
                                pa.scalar(n_total * threshold_pm, pa.int64()))
        return t.filter(keep)

    return exact.map_batches(final_filter, batch_format="pyarrow")


def grouped_approx_distinct(
    ds: rd.Dataset, group: str, col: str, p: int = 12
) -> pa.Table:
    """Approximate count-distinct of ``col`` PER ``group`` via keyed
    HyperLogLog sketches in one streaming pass — the sketch-per-key form
    of :func:`approx_distinct_multi` ("distinct users per event type /
    per host" at corpus scale, where the exact plan shuffles every key).

    Each block emits one (group, 2^p-byte register row) per group
    PRESENT in the block; the driver max-merges O(blocks x groups)
    sketches. Group cardinality must be dimension-small (the same
    contract as ``grouped_quantiles``' totals map — route through a
    keyed exchange instead when groups are fact-scale). Register-max
    merging is exact, so the distributed estimate is bit-identical to a
    sequential fold. Returns (group, approx_n) sorted by group."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group: pa.nulls(0, pa.string()),
                             "regs": pa.nulls(0, pa.binary())})
        keys = t[group].to_pandas().to_numpy()
        h = hash_col(t[col])
        uniq, inv = np.unique(keys, return_inverse=True)
        groups_out, regs_out = [], []
        for gi, g in enumerate(uniq):
            groups_out.append(g)
            regs_out.append(_hll_fold(h[inv == gi], p).tobytes())
        return pa.table({group: pa.array(groups_out),
                         "regs": pa.array(regs_out, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict = {}
    for row in parts:
        g = row[group]
        prev = merged.get(g)
        cur = np.frombuffer(row["regs"], dtype=np.uint8)
        merged[g] = cur if prev is None else np.maximum(prev, cur)
    keys = sorted(merged)
    return pa.table({
        group: pa.array(keys),
        "approx_n": pa.array(
            [int(round(hll_estimate(merged[g]))) for g in keys], pa.int64()),
    })


# Count-Min row-hash constants (independent derived hashes per row)
CM_ODD = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
          0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cm_row_idx(h: np.ndarray, r: int, w: int) -> np.ndarray:
    """Row r's bucket index for each uint64 key hash (multiplicative
    derive + xorshift so the d rows probe independently)."""
    hr = h * np.uint64(CM_ODD[r])
    hr ^= hr >> np.uint64(33)
    return (hr % np.uint64(w)).astype(np.int64)


def _cm_fold(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """Fold uint64 key hashes into a d x w Count-Min table (Cormode &
    Muthukrishnan 2005): each row counts into an independent hash
    bucket; a key's estimate is the MIN over its d cells (always an
    overestimate, error <= 2n/w with prob 1 - (1/2)^d)."""
    tbl = np.zeros((d, w), np.int64)
    for r in range(d):
        np.add.at(tbl[r], _cm_row_idx(h, r, w), 1)
    return tbl


def cm_point_estimates(
    ds: rd.Dataset,
    col: str,
    keys: "pa.Array",
    d: int = 4,
    w: int = 1 << 12,
) -> pa.Table:
    """Count-Min point-frequency estimates for ``keys`` over ``ds[col]``
    — the LINEAR synopsis (sketch(A ∪ B) = sketch(A) + sketch(B)), so
    the distributed plan is the cheapest possible: every block folds
    into one fixed d x w integer table inside ``map_batches``, the
    driver SUMS O(blocks) flat tables (d*w*8 B each — 128 KiB at the
    defaults — never a key), and point queries read min-of-d cells.
    The additive merge is exact, so the distributed estimate is
    bit-identical to a sequential fold of the whole column. Nulls are
    dropped (SQL count semantics). Returns (col, est_n) — est_n >= the
    true count, within 2n/w at confidence 1-2^-d."""
    def partial(t: pa.Table) -> pa.Table:
        c = t[col].drop_null()
        tbl = _cm_fold(hash_col(c), d, w) if len(c) else np.zeros(
            (d, w), np.int64)
        return pa.table({"cm": pa.array([tbl.ravel()], pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    tbl = np.zeros(d * w, np.int64)
    for row in parts:
        tbl += np.asarray(row["cm"], np.int64)
    tbl = tbl.reshape(d, w)

    kh = hash_col(keys)
    est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
    for r in range(d):
        est = np.minimum(est, tbl[r, _cm_row_idx(kh, r, w)])
    return pa.table({col: keys, "est_n": pa.array(est, pa.int64())})
