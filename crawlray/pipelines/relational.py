"""Relational operators the Dataset API lacks as first-class calls.

- ``bucketed_hash_join``: the portable both-sides-large equi-join
  (ray_guide "Joins and lookups") as an EXPLICIT hash exchange: each
  block splits into ``bucket = hash(key) % B`` sub-tables (one task per
  block, ``num_returns=B`` keeps every shard in the object store), then
  one Arrow (Acero) hash join task per bucket over that bucket's left +
  right shards. No pad/tag/union and no Ray Data sort: a groupby-based
  shuffle re-coalesces small blocks under target_max_block_size and ran
  its whole map side as ONE task (measured 5.1 s of a 6 s join at
  sf0.1); the exchange is B-wide parallel and moves only column data
  for the bucket. Staying in Arrow end-to-end preserves dtypes exactly
  (a pandas merge degrades null-padded int64 payloads to float64 —
  round-1 ``order_priority_revenue`` hash mismatch). B bounds per-task
  memory; skew is handled by raising B. Executes its inputs (an
  exchange, not a lazy stage).
- ``grouped_argmax``: per-group top-1 by a value column (the
  ``row_number() OVER (PARTITION BY ...) = 1`` window analog) via
  per-batch partial argmax (one candidate row per (batch, group) — the
  full table never shuffles) + a sort-based reduce: sort candidates by
  (group, value desc, tiebreak) and keep the first adjacent row per
  group. Avoids a tiny-group ``map_groups`` call explosion when there
  are thousands of groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import hash64, keep_first_sorted, pa_type_of


def _as_table(t) -> pa.Table:
    """Block refs from ``to_arrow_refs`` are NOT converted when the
    upstream stage produced pandas blocks (a pandas-format map_batches)
    — coerce at the task boundary so the exchanges accept either."""
    return t if isinstance(t, pa.Table) else pa.Table.from_pandas(
        t, preserve_index=False
    )


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return ((v * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets)).astype(np.int32)
    return (hash64(col) % np.uint64(n_buckets)).astype(np.int32)


def _key_hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row uint64 key hash (same key classes as :func:`_bucket_of`);
    null slots hash as 0 — callers must mask them out themselves."""
    if pa.types.is_integer(col.type):
        filled = pc.fill_null(col, pa.scalar(0).cast(col.type))
        v = filled.to_numpy(zero_copy_only=False).astype(np.uint64)
        return v * np.uint64(0x9E3779B97F4A7C15)
    return hash64(pc.fill_null(col, "" if not pa.types.is_binary(col.type) else b""))


def _bloom_positions(h: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Two double-hashing probe positions per key into an m-bit (power of
    two) bloom bitmap."""
    mask = np.uint64(m - 1)
    p0 = h & mask
    stride = ((h >> np.uint64(32)) | np.uint64(1)) & mask
    p1 = (p0 + stride) & mask
    return p0, p1


def build_bloom(right: rd.Dataset, key: str, bloom_bits: int) -> np.ndarray:
    """Bloom bitmap (packed uint64 words) over the distinct ``key`` values
    of ``right``. One Ray task per block emits an m-bit partial bitmap
    (m/8 bytes — e.g. 512 KiB at m=2^22); the driver OR-folds O(blocks)
    of them, so nothing key-shaped ever funnels to the driver. Null keys
    are NOT inserted (SQL EXISTS equality never matches NULL)."""
    import ray

    if bloom_bits & (bloom_bits - 1):
        raise ValueError(f"bloom_bits must be a power of two: {bloom_bits}")

    @ray.remote
    def bitmap_of(t) -> np.ndarray:
        t = _as_table(t)
        words = np.zeros(bloom_bits // 64, np.uint64)
        if t.num_rows:
            col = t[key]
            h = _key_hash64(col)
            valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
            h = h[valid]
            for p in _bloom_positions(h, bloom_bits):
                np.bitwise_or.at(words, (p >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (p & np.uint64(63)))
        return words

    parts = [bitmap_of.remote(t)
             for t in right.select_columns([key]).to_arrow_refs()]
    out = np.zeros(bloom_bits // 64, np.uint64)
    for w in ray.get(parts):
        np.bitwise_or(out, w, out=out)
    return out


def _bloom_maybe(col: pa.ChunkedArray | pa.Array, words: np.ndarray,
                 bloom_bits: int) -> np.ndarray:
    """Per-row bool: key MAY be in the bloom set (false = definitely
    absent; null keys are definitely-absent for EXISTS semantics)."""
    h = _key_hash64(col)
    keep = ~pc.is_null(col).to_numpy(zero_copy_only=False)
    for p in _bloom_positions(h, bloom_bits):
        bit = (words[(p >> np.uint64(6)).astype(np.int64)]
               >> (p & np.uint64(63))) & np.uint64(1)
        keep &= bit.astype(bool)
    return keep


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str | list[str],
    n_buckets: int = 32,
    join_type: str = "inner",
) -> rd.Dataset:
    """Equi-join of two large Datasets on ``key`` — a single column name
    or a COMPOSITE key (list of names; both sides must carry all of
    them). ``join_type``: "inner", "left outer" — unmatched left rows
    keep null right columns — or "full outer" — unmatched rows of
    EITHER side survive with the other side's columns null and the keys
    coalesced. Column names of the two sides must be disjoint apart
    from the key columns.

    Composite keys bucket on the FIRST key column only: rows that agree
    on every key column agree on the first, so they meet in one bucket
    and the per-bucket Acero join (over all key columns) is globally
    correct. Pick a first key with enough cardinality to spread B
    buckets; the remaining key columns cost nothing extra in routing."""
    import ray

    ks = [key] if isinstance(key, str) else list(key)
    k0 = ks[0]
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c not in ks]
    # pa_type_of: pandas-block datasets report numpy dtypes (quirk), and
    # the typed empties / null-fill columns need real Arrow types
    types = {
        n: pa_type_of(t)
        for n, t in [*zip(l_schema.names, l_schema.types),
                     *zip(r_schema.names, r_schema.types)]
    }
    all_cols = l_cols + r_cols  # unified output schema
    empty = pa.table({c: pa.nulls(0, types[c]) for c in all_cols})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t: pa.Table, side_empty: pa.Table):
        # lazy upstream stages can emit schema-LESS empty blocks; replace
        # them with the side's typed empty so concat/join keep the schema
        t = _as_table(t)
        if t.num_rows == 0:
            out = [side_empty] * b
        else:
            buckets = _bucket_of(t[k0], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def join_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l]) if n_l else empty
        r = pa.concat_tables(shards[n_l:]) if len(shards) > n_l else empty
        if l.num_rows == 0:
            if join_type != "full outer" or r.num_rows == 0:
                return empty
            # full outer vs an empty left: right rows + null left columns
            out = r.select([*ks, *r_cols])
            for c in l_cols:
                if c not in ks:
                    out = out.append_column(c, pa.nulls(r.num_rows, types[c]))
            return out.select(all_cols)
        if r.num_rows == 0:
            if join_type == "inner":
                return empty
            # left/full outer vs an empty right: left rows + null right cols
            out = l
            for c in r_cols:
                out = out.append_column(c, pa.nulls(l.num_rows, types[c]))
            return out.select(all_cols)
        # Acero hash join; single-threaded — the task already owns 1 CPU.
        # full outer coalesces the key columns (verified behavior).
        return l.join(r.select([*ks, *r_cols]), keys=ks, join_type=join_type,
                      use_threads=False).select(all_cols)

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    l_empty = pa.table({c: pa.nulls(0, types[c]) for c in l_cols})
    r_empty = pa.table({c: pa.nulls(0, types[c]) for c in [*ks, *r_cols]})
    lsplit = _rows([split.remote(t, l_empty) for t in left.to_arrow_refs()])
    rsplit = _rows([split.remote(t, r_empty) for t in right.to_arrow_refs()])
    joined = [
        join_bucket.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(joined)


def bucketed_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    n_buckets: int = 32,
    bloom_bits: int | None = None,
) -> rd.Dataset:
    """Anti equi-join: left rows whose ``key`` has NO match in ``right``
    (the ``NOT EXISTS`` / ``EXCEPT``-by-key analog; the engine's frontier
    ∖ seen step generalized to arbitrary datasets). Output carries the
    LEFT columns only.

    Same explicit B-wide hash exchange as :func:`bucketed_hash_join`, but
    the per-bucket task reduces the right side to its DISTINCT keys
    before probing (``pc.is_in`` inverted), so a right side with heavy
    key duplication (orders per customer) costs one dedup pass per
    bucket, never a join blow-up. Executes its inputs (an exchange, not
    a lazy stage).

    ``bloom_bits`` (power of two) adds a bloom BYPASS — the anti-join
    dual of the semi join's pre-filter: a bloom over the right keys
    proves absence, so a bloom-NEGATIVE left row (plus every null-key
    row, which NOT EXISTS always keeps) is a DEFINITE keep and is
    emitted straight from the split task, never entering the exchange;
    only the bloom-positive minority rides the exchange to the exact
    probe. Result is bit-identical; exchange volume scales with the
    match-candidate rate instead of |left| — the win when most left
    keys have no match (frontier ∖ seen with a young seen set)."""
    import ray

    from ..util import pa_type_of

    bloom_ref = None
    if bloom_bits is not None:
        bloom_ref = ray.put(build_bloom(right, key, bloom_bits))

    l_schema = left.schema()
    l_cols = list(l_schema.names)
    types = {n: pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    empty = pa.table({c: pa.nulls(0, types[c]) for c in l_cols})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t: pa.Table, side_empty: pa.Table):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [side_empty] * b
        else:
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b + 1)
    def split_bypass(t: pa.Table, bloom):
        # last return = definite keeps (bloom-negative + null keys);
        # first b = the bloom-positive rows, exchanged as usual
        t = _as_table(t)
        if t.num_rows == 0:
            out = [empty] * (b + 1)
        else:
            maybe = _bloom_maybe(t[key], bloom, bloom_bits)
            null_keep = pc.is_null(t[key]).to_numpy(zero_copy_only=False)
            keep = t.filter(pa.array(~maybe | null_keep)).select(l_cols)
            t = t.filter(pa.array(maybe & ~null_keep))
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
            out.append(keep)
        return out

    @ray.remote
    def anti_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l]) if n_l else empty
        if l.num_rows == 0:
            return empty
        r = pa.concat_tables(shards[n_l:]) if len(shards) > n_l else None
        if r is None or r.num_rows == 0:
            return l.select(l_cols)
        # skip_nulls: NOT EXISTS keeps a NULL-key left row (NULL = x is
        # never true) — without it a null in the right side would eat it
        probe = pc.is_in(l[key], value_set=pc.unique(r[key]), skip_nulls=True)
        return l.filter(pc.invert(probe)).select(l_cols)

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    r_key_type = pa_type_of(
        dict(zip(right.schema().names, right.schema().types))[key]
    )
    r_empty = pa.table({key: pa.nulls(0, r_key_type)})
    rkeys = right.select_columns([key])
    bypass: list = []
    if bloom_ref is None:
        lsplit = _rows([split.remote(t, empty) for t in left.to_arrow_refs()])
    else:
        lrefs = [split_bypass.remote(t, bloom_ref)
                 for t in left.to_arrow_refs()]
        lsplit = [refs[:b] for refs in lrefs]
        bypass = [refs[b] for refs in lrefs]
    rsplit = _rows([split.remote(t, r_empty) for t in rkeys.to_arrow_refs()])
    out = [
        anti_bucket.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(out + bypass)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Backward as-of LEFT join: for every left row, attach the right row
    with the same ``key`` and the greatest ``right_ts`` <= ``left_ts``
    (``ASOF LEFT JOIN`` in DuckDB; an operator Ray Data has no native
    call for). Unmatched left rows keep nulls in the right columns.

    Plan (SURVEY.md §2.4 custom-operator case (a)): the same B-wide
    explicit hash exchange as ``bucketed_hash_join`` — key-hash bucket
    both sides, then ONE vectorized merge task per bucket: tag rows
    (right before left at equal ts, so "<=" matches), lexsort the union
    by (key, ts, tag), ``np.maximum.accumulate`` over right-row merged
    positions = "latest right row at or before me", validated against a
    forward-filled key. O(n log n) per bucket, no per-row Python.
    Partitioning assumption: a key's rows co-locate in one bucket (hash
    on ``key``); skewed hot keys bound per-task memory via ``n_buckets``.

    Ties on (key, ts) between right rows resolve to the right row latest
    in its bucket-sort order — timestamps at microsecond grain make ties
    measure-zero; callers needing total determinism under ties should
    pass a tie-broken ts column. Column names of the two sides must be
    disjoint apart from ``key``. Executes its inputs (an exchange, not a
    lazy stage).
    """
    import ray

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c != key]
    # pa_type_of: pandas-block datasets report numpy dtypes (quirk), and
    # the typed empties / null-fill columns need real Arrow types
    types = {
        n: pa_type_of(t)
        for n, t in [*zip(l_schema.names, l_schema.types),
                     *zip(r_schema.names, r_schema.types)]
    }
    all_cols = l_cols + r_cols
    empty = pa.table({c: pa.nulls(0, types[c]) for c in all_cols})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t: pa.Table, side_empty: pa.Table):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [side_empty] * b
        else:
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def merge_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l])
        if l.num_rows == 0:
            return empty
        r = pa.concat_tables(shards[n_l:])
        lk = l[key].to_numpy(zero_copy_only=False)
        lt = l[left_ts].to_numpy(zero_copy_only=False).view(np.int64)
        if r.num_rows == 0:
            match = np.full(l.num_rows, -1, np.int64)
        else:
            rk = r[key].to_numpy(zero_copy_only=False)
            rt = r[right_ts].to_numpy(zero_copy_only=False).view(np.int64)
            nl, nr = len(lk), len(rk)
            k = np.concatenate([lk, rk])
            t = np.concatenate([lt, rt])
            tag = np.concatenate([np.ones(nl, np.int8), np.zeros(nr, np.int8)])
            order = np.lexsort((tag, t, k))
            k_s, tag_s = k[order], tag[order]
            # merged position of the latest right row at or before each row
            ridx = np.where(tag_s == 0, np.arange(nl + nr), -1)
            last_r = np.maximum.accumulate(ridx)
            valid = (last_r >= 0)
            valid &= k_s[np.maximum(last_r, 0)] == k_s
            # original right-row index for each left row, -1 = no match
            match = np.full(l.num_rows, -1, np.int64)
            is_left = tag_s == 1
            l_orig = order[is_left]                       # left original idx
            lr = last_r[is_left]
            lv = valid[is_left]
            match[l_orig] = np.where(lv, order[np.maximum(lr, 0)] - nl, -1)
        cols = {c: l[c] for c in l_cols}
        hit = match >= 0
        take = pa.array(np.where(hit, match, 0), pa.int64())
        mask = pa.array(~hit)
        for c in r_cols:
            if r.num_rows == 0:
                cols[c] = pa.nulls(l.num_rows, types[c])
            else:
                taken = r[c].take(take).combine_chunks()
                cols[c] = pc.if_else(mask, pa.nulls(l.num_rows, types[c]), taken)
        return pa.table({c: cols[c] for c in all_cols})

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    l_empty = pa.table({c: pa.nulls(0, types[c]) for c in l_cols})
    r_empty = pa.table({c: pa.nulls(0, types[c]) for c in [key, *r_cols]})
    lsplit = _rows([split.remote(t, l_empty) for t in left.to_arrow_refs()])
    rsplit = _rows([split.remote(t, r_empty) for t in right.to_arrow_refs()])
    merged = [
        merge_bucket.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(merged)


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Keyed interval (range) join: left rows matched to every right row
    with the same ``key`` whose interval covers the left timestamp,
    ``right_lo <= left_ts < right_hi`` (half-open, the event-time
    convention). Inner join — unmatched left rows drop. Another operator
    Ray Data has no native call for (SURVEY.md §2.4 custom-op case (a)).

    Plan: the equi-key range join lowered to the explicit B-wide hash
    exchange (``bucketed_hash_join``'s split machinery) + one Acero
    equi-join task per bucket followed by a vectorized interval filter —
    the standard lowering when intervals per key are FEW (dimension-style
    interval tables: promo periods, maintenance windows, user sessions).
    Candidate work per key is ``n_left_k * n_intervals_k``; a key with
    many overlapping intervals inflates candidates, which is inherent to
    the join's output complexity. Partitioning assumption: a key's rows
    co-locate in one bucket (hash on ``key``); ``n_buckets`` bounds
    per-task memory. Column names disjoint apart from ``key``. Executes
    its inputs (an exchange, not a lazy stage).
    """
    import ray

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c != key]
    # pa_type_of: pandas-block datasets report numpy dtypes (quirk), and
    # the typed empties / null-fill columns need real Arrow types
    types = {
        n: pa_type_of(t)
        for n, t in [*zip(l_schema.names, l_schema.types),
                     *zip(r_schema.names, r_schema.types)]
    }
    all_cols = l_cols + r_cols
    empty = pa.table({c: pa.nulls(0, types[c]) for c in all_cols})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t: pa.Table, side_empty: pa.Table):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [side_empty] * b
        else:
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def join_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l])
        r = pa.concat_tables(shards[n_l:])
        if l.num_rows == 0 or r.num_rows == 0:
            return empty
        cand = l.join(r.select([key, *r_cols]), keys=key, join_type="inner",
                      use_threads=False)
        ts = cand[left_ts].to_numpy(zero_copy_only=False).view(np.int64)
        lo = cand[right_lo].to_numpy(zero_copy_only=False).view(np.int64)
        hi = cand[right_hi].to_numpy(zero_copy_only=False).view(np.int64)
        return cand.filter(pa.array((lo <= ts) & (ts < hi))).select(all_cols)

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    l_empty = pa.table({c: pa.nulls(0, types[c]) for c in l_cols})
    r_empty = pa.table({c: pa.nulls(0, types[c]) for c in [key, *r_cols]})
    lsplit = _rows([split.remote(t, l_empty) for t in left.to_arrow_refs()])
    rsplit = _rows([split.remote(t, r_empty) for t in right.to_arrow_refs()])
    joined = [
        join_bucket.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(joined)


def _rank_block_impl(t: pa.Table, keys: list[str], carry, k: int) -> pa.Table:
    """Keep rows with within-group rank < k over an (already sorted)
    block; ``carry`` = (key_tuple, rows_already_ranked) for the group
    continuing from previous blocks."""
    if t.num_rows == 0:
        return t
    arrs = [t[c].to_pandas().to_numpy() for c in keys]
    n = t.num_rows
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for a in arrs:
        new[1:] |= a[1:] != a[:-1]
    seg_id = np.cumsum(new) - 1
    seg_first = np.flatnonzero(new)
    rank = np.arange(n) - seg_first[seg_id]
    if carry is not None and tuple(a[0] for a in arrs) == tuple(carry[0]):
        rank[seg_id == 0] += carry[1]
    return t.filter(pa.array(rank < k))


def keep_first_k_sorted(sorted_ds: rd.Dataset, keys: list[str], k: int) -> rd.Dataset:
    """Per-group head(k) over an ALREADY-SORTED dataset (sorted by keys,
    then by the desired within-group order): ``keep_first_sorted``
    generalized from k=1. Driver work is O(blocks): each block reports
    (first key, last key, trailing-run length, single-key?) and a running
    (key, count) carry threads group runs across block boundaries —
    no per-group ``map_groups`` call explosion."""
    import ray

    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds

    @ray.remote
    def edge_info(t: pa.Table):
        if t.num_rows == 0:
            return None
        arrs = [t[c].to_pandas().to_numpy() for c in keys]
        n = t.num_rows
        same = np.ones(n, dtype=bool)
        for a in arrs:
            same[1:] &= a[1:] == a[:-1]
        # trailing run length of the last key
        flips = np.flatnonzero(~same)
        trail = n if len(flips) == 0 else n - flips[-1]
        first = tuple(a[0] for a in arrs)
        last = tuple(a[-1] for a in arrs)
        return first, last, int(trail), bool(same[1:].all() if n > 1 else True)

    edges = ray.get([edge_info.remote(r) for r in refs])
    carries: list[tuple | None] = []
    run_key: tuple | None = None
    run_cnt = 0
    for e in edges:
        carries.append((run_key, run_cnt) if run_key is not None else None)
        if e is None:
            continue
        first, last, trail, one_key = e
        if one_key and run_key is not None and first == run_key:
            run_cnt += trail          # the single key continues the run
        else:
            run_key, run_cnt = last, trail
    rank_block = ray.remote(_rank_block_impl)
    return rd.from_arrow_refs(
        [rank_block.remote(r, keys, c, k) for r, c in zip(refs, carries)]
    )


def grouped_topk(
    ds: rd.Dataset,
    group_keys: list[str],
    value: str,
    tiebreak: str,
    k: int,
    n_buckets: int = 16,
) -> rd.Dataset:
    """Per-group top-k rows by ``value`` desc (ties -> smallest
    ``tiebreak``) — the ``row_number() OVER (PARTITION BY ...) <= k``
    window analog. Per-batch partial head(k) (at most k candidate rows
    per (batch, group) enter the exchange), then ONE hash exchange on
    ``group_keys[0]`` — a SUPERSET partitioning of the composite group,
    so every group's candidates co-locate — and a per-bucket sort +
    head(k). Replaces a global range sort (sample pass + full shuffle)
    with a plain hash exchange; output row order is arbitrary."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([value, tiebreak], ascending=[False, True], kind="stable")
            .groupby(group_keys, sort=False)
            .head(k)
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = (
            t.to_pandas()
            .sort_values(
                [*group_keys, value, tiebreak],
                ascending=[True] * len(group_keys) + [False, True],
                kind="stable",
            )
            .groupby(group_keys, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False).select(
            t.column_names
        )

    return bucketed_reduce(partials, group_keys[0], bucket_fn, n_buckets)


def grouped_argmax(
    ds: rd.Dataset, group_keys: list[str], value: str, tiebreak: str
) -> rd.Dataset:
    """One row per group: the row maximizing ``value`` (ties -> smallest
    ``tiebreak``). Same plan as ``grouped_topk`` with k=1."""
    return grouped_topk(ds, group_keys, value, tiebreak, 1)

def bucketed_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    n_buckets: int = 32,
    bloom_bits: int | None = None,
) -> rd.Dataset:
    """Semi equi-join: left rows whose ``key`` HAS a match in ``right``
    (the ``EXISTS`` / ``IN (SELECT ...)`` analog, the complement of
    :func:`bucketed_anti_join`). Output carries the LEFT columns only,
    never duplicated by right-side multiplicity — the shape SQL's EXISTS
    has and an inner join does not.

    Same explicit B-wide hash exchange as :func:`bucketed_hash_join`;
    the per-bucket task reduces the right side to its DISTINCT keys
    before probing (``pc.is_in``), so a right side with heavy key
    duplication costs one dedup pass per bucket, never a join blow-up.
    Executes its inputs (an exchange, not a lazy stage).

    ``bloom_bits`` (power of two) adds a bloom PRE-FILTER: an m-bit
    bitmap over the right keys is built first (:func:`build_bloom`,
    O(blocks) m/8-byte partials OR-folded on the driver, broadcast once
    via ``ray.put``) and left rows whose key is definitely absent are
    dropped INSIDE the split task, before any bytes enter the exchange.
    False positives survive to the exact per-bucket ``is_in`` probe, so
    the result is bit-identical with or without the bloom; what changes
    is exchange volume — the win when the left side is much larger than
    the match set (the LSH candidate-resolution shape)."""
    import ray

    from ..util import pa_type_of

    bloom_ref = None
    if bloom_bits is not None:
        bloom_ref = ray.put(build_bloom(right, key, bloom_bits))

    l_schema = left.schema()
    l_cols = list(l_schema.names)
    types = {n: pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    empty = pa.table({c: pa.nulls(0, types[c]) for c in l_cols})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t: pa.Table, side_empty: pa.Table, bloom):
        t = _as_table(t)
        if t.num_rows and bloom is not None:
            t = t.filter(pa.array(_bloom_maybe(t[key], bloom, bloom_bits)))
        if t.num_rows == 0:
            out = [side_empty] * b
        else:
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def semi_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l]) if n_l else empty
        if l.num_rows == 0:
            return empty
        r = pa.concat_tables(shards[n_l:]) if len(shards) > n_l else None
        if r is None or r.num_rows == 0:
            return empty
        # skip_nulls: SQL EXISTS equality never matches NULL = NULL,
        # but Arrow's is_in default does — null keys must never probe true
        probe = pc.is_in(l[key], value_set=pc.unique(r[key]), skip_nulls=True)
        return l.filter(probe).select(l_cols)

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    r_key_type = pa_type_of(
        dict(zip(right.schema().names, right.schema().types))[key]
    )
    r_empty = pa.table({key: pa.nulls(0, r_key_type)})
    rkeys = right.select_columns([key])
    lsplit = _rows([split.remote(t, empty, bloom_ref)
                    for t in left.to_arrow_refs()])
    rsplit = _rows([split.remote(t, r_empty, None)
                    for t in rkeys.to_arrow_refs()])
    out = [
        semi_bucket.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Set operations, generic keyed reduce, and reshape (round 4)
# ---------------------------------------------------------------------------

def _neutral(t: pa.DataType) -> pa.Scalar:
    """A type-appropriate fill for the null-safe key encoding (the VALUE
    is irrelevant — a companion is-null flag disambiguates it from a
    real 0/'' — it only has to be a valid scalar of the column type)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    return pa.scalar(0).cast(t)  # numeric / temporal / decimal


def bucketed_set_op(
    left: rd.Dataset,
    right: rd.Dataset,
    columns: list[str],
    op: str = "intersect",
    n_buckets: int = 32,
) -> rd.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` over ``columns`` (DISTINCT set
    semantics on both sides, like the SQL operators — reference query
    surface analog: "which url/customer sets overlap between two runs").

    NULL handling matches SQL set ops (``IS NOT DISTINCT FROM``
    equality, where NULL == NULL): every key column is encoded as a
    (neutral-filled value, is-null flag) pair and the per-bucket
    distinct/join runs over the encoded pair, so Acero's
    null-never-matches join semantics cannot drop null rows.

    Distributed shape: each side reduces every batch to its DISTINCT
    encoded rows in a LAZY pre-pass (only per-block distinct rows enter
    the exchange), then the same B-wide explicit hash exchange as
    :func:`bucketed_hash_join` (bucket = hash of the first key column —
    equal rows agree on every column, so they meet in one bucket), then
    one task per bucket: global distinct per side + inner join
    (intersect) / left-anti join (except), decoded back to the original
    columns. Executes its inputs (an exchange, not a lazy stage)."""
    import ray

    if op not in ("intersect", "except", "intersect all", "except all"):
        raise ValueError(
            f"op must be 'intersect[ all]' or 'except[ all]': {op!r}")
    bag = op.endswith(" all")   # SQL ALL variants: multiset semantics —
    # per-row multiplicity = min(cnt_l, cnt_r) (intersect) or
    # max(cnt_l - cnt_r, 0) (except); the lazy pre-pass keeps per-block
    # COUNTS instead of collapsing to distinct, counts sum in the bucket
    base_op = op.split()[0]

    types = {}
    for ds in (left, right):
        sch = ds.schema()
        m = dict(zip(sch.names, sch.types))
        for c in columns:
            t = pa_type_of(m[c])
            if types.setdefault(c, t) != t:
                raise ValueError(f"column {c!r} type mismatch: {types[c]} vs {t}")

    k_cols = [f"__k_{c}" for c in columns]
    n_cols = [f"__n_{c}" for c in columns]
    enc_cols = k_cols + n_cols
    out_cols = enc_cols + (["__cnt"] if bag else [])
    empty = pa.table(
        {f"__k_{c}": pa.nulls(0, types[c]) for c in columns}
        | {f"__n_{c}": pa.nulls(0, pa.int8()) for c in columns}
        | ({"__cnt": pa.nulls(0, pa.int64())} if bag else {})
    ).select(out_cols)

    def encode_distinct(t: pa.Table) -> pa.Table:
        cols = {}
        for c in columns:
            arr = t[c]
            cols[f"__k_{c}"] = pc.fill_null(arr, _neutral(types[c]))
            cols[f"__n_{c}"] = pc.is_null(arr).cast(pa.int8())
        enc = pa.table(cols).select(enc_cols)
        if bag:
            g = enc.group_by(enc_cols, use_threads=False).aggregate(
                [([], "count_all")])
            return pa.table({**{c: g[c] for c in enc_cols},
                             "__cnt": g["count_all"].cast(pa.int64())})
        return enc.group_by(enc_cols, use_threads=False).aggregate([])

    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [empty] * b
        else:
            buckets = _bucket_of(t[k_cols[0]], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def setop_bucket_bag(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l]) if n_l else empty
        r = pa.concat_tables(shards[n_l:]) if len(shards) > n_l else empty

        def fold(t: pa.Table) -> pa.Table:
            g = t.group_by(enc_cols, use_threads=False).aggregate(
                [("__cnt", "sum")])
            return pa.table({**{c: g[c] for c in enc_cols},
                             "__cnt": g["__cnt_sum"].cast(pa.int64())})

        l, r = fold(l), fold(r)
        if base_op == "intersect":
            j = l.join(r.rename_columns(enc_cols + ["__cnt_r"]),
                       keys=enc_cols, join_type="inner", use_threads=False)
            n = np.minimum(j["__cnt"].to_numpy(zero_copy_only=False),
                           j["__cnt_r"].to_numpy(zero_copy_only=False))
        else:                               # except all
            j = l.join(r.rename_columns(enc_cols + ["__cnt_r"]),
                       keys=enc_cols, join_type="left outer",
                       use_threads=False)
            rc = pc.fill_null(j["__cnt_r"].combine_chunks(),
                              pa.scalar(0, pa.int64())).to_numpy()
            n = np.maximum(
                j["__cnt"].to_numpy(zero_copy_only=False) - rc, 0)
        idx = np.repeat(np.arange(len(n)), n)
        keep = j.select(enc_cols).take(pa.array(idx, pa.int64()))
        return pa.table({
            c: pc.if_else(
                pc.equal(keep[f"__n_{c}"], pa.scalar(1, pa.int8())),
                pa.scalar(None, types[c]),
                keep[f"__k_{c}"],
            )
            for c in columns
        })

    @ray.remote
    def setop_bucket(n_l: int, *shards) -> pa.Table:
        l = pa.concat_tables(shards[:n_l]) if n_l else empty
        r = pa.concat_tables(shards[n_l:]) if len(shards) > n_l else empty
        l = l.group_by(enc_cols, use_threads=False).aggregate([]).select(enc_cols)
        if l.num_rows == 0:
            keep = l
        elif op == "intersect":
            keep = (
                empty if r.num_rows == 0
                else l.join(
                    r.group_by(enc_cols, use_threads=False).aggregate([]),
                    keys=enc_cols, join_type="inner", use_threads=False,
                ).select(enc_cols)
            )
        else:  # except
            keep = (
                l if r.num_rows == 0
                else l.join(
                    r.group_by(enc_cols, use_threads=False).aggregate([]),
                    keys=enc_cols, join_type="left anti", use_threads=False,
                ).select(enc_cols)
            )
        return pa.table({
            c: pc.if_else(
                pc.equal(keep[f"__n_{c}"], pa.scalar(1, pa.int8())),
                pa.scalar(None, types[c]),
                keep[f"__k_{c}"],
            )
            for c in columns
        })

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    l_enc = left.map_batches(encode_distinct, batch_format="pyarrow")
    r_enc = right.map_batches(encode_distinct, batch_format="pyarrow")
    lsplit = _rows([split.remote(t) for t in l_enc.to_arrow_refs()])
    rsplit = _rows([split.remote(t) for t in r_enc.to_arrow_refs()])
    bucket_task = setop_bucket_bag if bag else setop_bucket
    out = [
        bucket_task.remote(
            len(lsplit),
            *[ls[i] for ls in lsplit],
            *[rs[i] for rs in rsplit],
        )
        for i in range(b)
    ]
    return rd.from_arrow_refs(out)


def bucketed_reduce(
    ds: rd.Dataset,
    key: str,
    bucket_fn,
    n_buckets: int = 32,
    schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Generic partition-by-key-then-reduce: exchange ``ds`` by
    ``hash(key) % B`` and run ``bucket_fn(pa.Table) -> pa.Table`` ONCE
    per bucket over all of that bucket's rows. The shape behind grouped
    filters / correlated-subquery decorrelation (compute a per-key
    aggregate AND use it to filter the same rows without a second pass
    or a join): every row with a given key is in exactly one bucket, so
    any per-key computation inside ``bucket_fn`` is globally correct.
    ``bucket_fn`` must accept an empty (schema-typed) table. Executes
    its input (an exchange, not a lazy stage). Pass ``schema`` (the
    INPUT ds schema) when statically known: ``ds.schema()`` probes by
    executing one block, which spins any upstream actor pool a second
    time just to learn column types."""
    import ray

    sch = schema if schema is not None else ds.schema()
    types = {n: pa_type_of(t) for n, t in zip(sch.names, sch.types)}
    empty = pa.table({c: pa.nulls(0, types[c]) for c in sch.names})
    b = n_buckets

    @ray.remote(num_returns=b)
    def split(t):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [empty] * b
        else:
            buckets = _bucket_of(t[key], b)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def reduce_bucket(*shards) -> pa.Table:
        t = pa.concat_tables(shards) if shards else empty
        return bucket_fn(t)

    splits = [split.remote(t) for t in ds.to_arrow_refs()]
    rows = [[r] for r in splits] if b == 1 else splits
    out = [reduce_bucket.remote(*[s[i] for s in rows]) for i in range(b)]
    return rd.from_arrow_refs(out)


def salted_distinct_count(
    ds: rd.Dataset,
    group_key: str,
    value_key: str,
    n_buckets: int = 32,
    count_name: str = "distinct_count",
    schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Exact ``COUNT(DISTINCT value) GROUP BY group_key`` built for
    LOW-cardinality group keys where EVERY group is a hot key (five
    event types over 10^10 rows): a plain groupby-on-group_key would
    serialize each group through one reducer, capping parallelism at
    the number of groups no matter how many nodes exist. The salting
    strategy (SCALE.md "salt hot keys"):

    1. lazy per-block local dedup of ``(group, value)`` pairs — zero
       shuffle, and it bounds what enters the exchange at
       O(blocks x distinct-pairs-per-block);
    2. exchange by ``mix(hash(group), hash(value)) % B`` — the VALUE
       is the salt, so one hot group's pairs spread over all B
       reducers while each distinct pair still lands in exactly one
       bucket (so the cross-bucket count sum is exact);
    3. per-bucket pair-dedup, then per-group partial counts
       (<= |groups| rows out of each bucket);
    4. one tiny final task sums the B x |groups| partial rows.

    NULL values are not counted (SQL COUNT(DISTINCT ...) semantics);
    a NULL group is kept as its own group, matching GROUP BY. Output:
    ``group_key``, ``count_name`` (int64). Executes its input.
    """
    import ray

    sch = schema if schema is not None else ds.schema()
    types = {n: pa_type_of(t) for n, t in zip(sch.names, sch.types)}
    pair_empty = pa.table({group_key: pa.nulls(0, types[group_key]),
                           value_key: pa.nulls(0, types[value_key])})
    b = n_buckets

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.select([group_key, value_key])
        t = t.filter(pc.is_valid(t[value_key]))
        return t.group_by([group_key, value_key]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow")

    @ray.remote(num_returns=b)
    def split(t):
        t = _as_table(t)
        if t.num_rows == 0:
            out = [pair_empty] * b
        else:
            h = _key_hash64(t[group_key])
            hv = _key_hash64(t[value_key])
            mixed = (h * np.uint64(0x9E3779B97F4A7C15)) ^ hv
            buckets = (mixed % np.uint64(b)).astype(np.int32)
            out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def count_bucket(*shards) -> pa.Table:
        t = pa.concat_tables(shards) if shards else pair_empty
        t = t.group_by([group_key, value_key]).aggregate([])
        part = t.group_by([group_key]).aggregate([(value_key, "count")])
        return part.rename_columns([group_key, count_name])

    @ray.remote
    def final_sum(*parts) -> pa.Table:
        t = pa.concat_tables(parts)
        out = t.group_by([group_key]).aggregate([(count_name, "sum")])
        return pa.table({
            group_key: out[group_key],
            count_name: out[f"{count_name}_sum"].cast(pa.int64()),
        })

    splits = [split.remote(t) for t in pairs.to_arrow_refs()]
    rows = [[r] for r in splits] if b == 1 else splits
    partials = [count_bucket.remote(*[s[i] for s in rows])
                for i in range(b)]
    return rd.from_arrow_refs([final_sum.remote(*partials)])


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "measure",
    value_name: str = "val",
) -> rd.Dataset:
    """``UNPIVOT`` / melt: wide-to-long reshape as a LAZY zero-shuffle
    per-batch kernel — a batch of R rows emits R x len(value_cols) rows
    (id columns repeated zero-copy per measure via table concat; one
    (measure, value) pair per source column). Value columns are cast to
    the first value column's type, which they must be compatible with."""
    common = None

    def melt(t: pa.Table) -> pa.Table:
        nonlocal common
        if common is None:
            common = pa_type_of(t.schema.field(value_cols[0]).type)
        n = t.num_rows
        pieces = [
            pa.table(
                {c: t[c] for c in id_cols}
                | {
                    var_name: pa.array([v] * n, pa.string()),
                    value_name: t[v].cast(common),
                }
            )
            for v in value_cols
        ]
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow")


def longest_prefix_match(
    ds: rd.Dataset,
    col: str,
    rules: dict[str, str],
    rule_col: str = "rule",
    action_col: str = "action",
) -> rd.Dataset:
    """Longest-prefix-match classification join: label every row with the
    LONGEST rule prefix matching ``col`` — robots.txt longest-match
    semantics (the Google robots spec's rule-selection order; the synth
    world's ``robots_disallowed`` is a one-rule instance,
    ``crawlray/synth.py:84``) and routing-table lookup, as one operator.

    The broadcast small-side plan: the rule set (robots rules per host —
    thousands, kilobytes) is captured into the stateless batch kernel,
    never shuffled; each batch does ONE ``pc.utf8_slice_codeunits`` +
    hash-set probe PER DISTINCT RULE LENGTH (a handful), longest first,
    filling unmatched rows only — O(L) vectorized passes regardless of
    rule count. Rows matching no rule are dropped (emit a catch-all ''
    or 'https://' rule to keep them). Keys are assumed ASCII (URLs) —
    slicing is by codeunit."""
    by_len: dict[int, dict[str, str]] = {}
    for r, a in rules.items():
        by_len.setdefault(len(r), {})[r] = a
    lengths = sorted(by_len, reverse=True)

    def classify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out_rule = np.full(n, None, object)
        out_act = np.full(n, None, object)
        unset = np.ones(n, bool)
        u = t[col].combine_chunks()
        for l in lengths:
            if not unset.any():
                break
            tbl = by_len[l]
            sl = pc.utf8_slice_codeunits(u, 0, l)
            hit = pc.is_in(sl, value_set=pa.array(list(tbl), pa.string()),
                           skip_nulls=True).to_numpy(zero_copy_only=False)
            take = hit & unset
            if not take.any():
                continue
            matched = sl.to_numpy(zero_copy_only=False)[take]
            out_rule[take] = matched
            # action lookup over UNIQUE matched rules only (per-row
            # Python would be a hot-path loop)
            uu, inv = np.unique(matched, return_inverse=True)
            out_act[take] = np.array([tbl[x] for x in uu], object)[inv]
            unset &= ~take
        keep = ~unset
        return pa.table({
            col: u.filter(pa.array(keep)),
            rule_col: pa.array(out_rule[keep], pa.string()),
            action_col: pa.array(out_act[keep], pa.string()),
        })

    return ds.map_batches(classify, batch_format="pyarrow")


def band_self_pairs(
    ds: rd.Dataset,
    ts_col: str,
    id_col: str,
    band_us: int,
    n_buckets: int = 32,
) -> rd.Dataset:
    """KEYLESS self band-join: every ordered pair (a, b) with
    ``ts_a < ts_b <= ts_a + band`` (exact ts ties broken by id so each
    unordered pair appears once) — burst / co-occurrence detection with
    no equi-key for a hash join to grab. Output ``(first_id, second_id,
    gap_us)``.

    Scale plan — the 1-D spatial-join tiling: each row lands in its
    time tile ``tb = ts // band`` twice, once as an OWNER of tile tb and
    once as a right-candidate for tile tb-1; a pair is formed only in
    the LEFT row's tile, and its right side (ts in (ts_a, ts_a+band]) is
    by construction fully visible there — so no pair is missed and none
    duplicates, whatever the band/tile hash layout. Tiles exchange by
    ``hash(tb)`` (bucketed_reduce), and inside a worker bucket the
    window lookup is ONE vectorized searchsorted over the composite key
    ``tb*band + ts`` (monotone across tiles, so co-hashed tiles can't
    cross-match) with repeat/arange pair enumeration — output-bounded
    work, never an O(n^2) scan. Shuffle mass is 2x fixed-width rows."""
    out_empty = pa.table({"first_id": pa.nulls(0, pa.int64()),
                          "second_id": pa.nulls(0, pa.int64()),
                          "gap_us": pa.nulls(0, pa.int64())})
    band = np.int64(band_us)

    def explode(t: pa.Table) -> pa.Table:
        ts = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = ts // band
        return pa.table({
            "tb": pa.array(np.concatenate([tb, tb - 1]), pa.int64()),
            "ts": pa.array(np.concatenate([ts, ts]), pa.int64()),
            "id": pa.array(np.concatenate([ids, ids]), pa.int64()),
            "own": pa.array(np.concatenate(
                [np.ones(len(ts), bool), np.zeros(len(ts), bool)])),
        })

    def _enumerate(lo, hi, lidx_pool):
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return (np.empty(0, np.int64),) * 2
        starts = np.repeat(lo, cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        return np.repeat(lidx_pool, cnt), starts + offs

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        tb = t["tb"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        own = t["own"].to_numpy(zero_copy_only=False)
        skey = tb * band + ts
        order = np.argsort(skey, kind="stable")
        skey_s, ts_s, id_s = skey[order], ts[order], ids[order]
        lkey, lts, lid = skey[own], ts[own], ids[own]
        lpool = np.arange(len(lkey), dtype=np.int64)
        # strict branch: ts_b in (ts_a, ts_a + band]
        lo = np.searchsorted(skey_s, lkey, "right")
        hi = np.searchsorted(skey_s, lkey + band, "right")
        li1, ri1 = _enumerate(lo, hi, lpool)
        # tie branch: ts_b == ts_a, id_b > id_a (gap 0, self excluded)
        lo2 = np.searchsorted(skey_s, lkey, "left")
        li2, ri2 = _enumerate(lo2, lo, lpool)
        if len(li2):
            m = id_s[ri2] > lid[li2]
            li2, ri2 = li2[m], ri2[m]
        first = np.concatenate([lid[li1], lid[li2]])
        second = np.concatenate([id_s[ri1], id_s[ri2]])
        gap = np.concatenate([ts_s[ri1] - lts[li1],
                              np.zeros(len(li2), np.int64)])
        return pa.table({"first_id": pa.array(first, pa.int64()),
                         "second_id": pa.array(second, pa.int64()),
                         "gap_us": pa.array(gap, pa.int64())})

    rows = ds.map_batches(explode, batch_format="pyarrow")
    if rows.schema() is None:   # empty input: map_batches never ran
        return rd.from_arrow(out_empty)
    return bucketed_reduce(rows, "tb", pairs, n_buckets=n_buckets)


def interval_agg_join(
    tagged: rd.Dataset,
    key: str,
    ts: str,
    side: str,
    id_col: str,
    value: str,
    window_us: int,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Stream-stream INTERVAL JOIN with aggregation, generalized from
    the purchase-attribution shape: for every PROBE row (``side`` == 1),
    the count and ``value``-sum of the SIDE rows (``side`` == 0) of the
    same ``key`` whose ``ts`` falls in the trailing window
    [probe_ts - window_us, probe_ts). LEFT semantics: probes whose key
    has no side rows return zeros. A row that should act as both side
    and probe is simply emitted twice into ``tagged`` with each flag.

    One exchange on ``key`` (both tags ride it), then the disjoint-
    segment-shift idiom per bucket: side rows lexsort by (key, ts), each
    key's segment maps onto a non-overlapping zts range, every probe
    resolves with TWO global searchsorteds and a prefix-sum diff —
    output-bounded, no per-key loop, no pair enumeration. ``ts`` must be
    int64 (microseconds); the per-bucket monotone encoding needs
    (ts span + 2 x window) x keys_per_bucket < 2^63 — raise
    ``n_buckets`` to shrink the factor at scale.

    Returns (id_col, n_matched, value_sum) for every probe row."""
    W = np.int64(window_us)

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.nulls(0, pa.int64()),
                          "n_matched": pa.nulls(0, pa.int64()),
                          "value_sum": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t[key].to_numpy(zero_copy_only=False)
        tss = t[ts].to_numpy(zero_copy_only=False)
        sd = t[side].to_numpy(zero_copy_only=False)
        eid = t[id_col].to_numpy(zero_copy_only=False)
        vals = t[value].to_numpy(zero_copy_only=False)
        rel = tss - tss.min()
        offset = rel.max() + 2 * W + 2
        v, p = sd == 0, sd == 1
        if not p.any():
            return empty
        vu, vrel, vc = u[v], rel[v], vals[v]
        order = np.lexsort((vrel, vu))
        vu, vrel, vc = vu[order], vrel[order], vc[order]
        uniq = np.unique(vu)
        vseg = np.cumsum(np.r_[0, vu[1:] != vu[:-1]]) if len(vu) else vu
        vz = vrel + vseg * offset
        pref = np.r_[np.int64(0), np.cumsum(vc)]
        pu, prel, pe = u[p], rel[p], eid[p]
        idx = np.searchsorted(uniq, pu)
        hit = idx < len(uniq)
        idx_c = np.minimum(idx, max(len(uniq) - 1, 0))
        hit &= (uniq[idx_c] == pu) if len(uniq) else False
        pz = prel + idx_c * offset
        lo = np.searchsorted(vz, pz - W, side="left")
        hi = np.searchsorted(vz, pz, side="left")
        n = np.where(hit, hi - lo, 0)
        s = np.where(hit, pref[hi] - pref[lo], 0)
        return pa.table({id_col: pa.array(pe, pa.int64()),
                         "n_matched": pa.array(n, pa.int64()),
                         "value_sum": pa.array(s, pa.int64())})

    return bucketed_reduce(tagged, key, bucket_fn, n_buckets=n_buckets)
