"""Relational operators the Dataset API lacks as first-class calls.

- ``bucketed_hash_join``: the portable both-sides-large equi-join
  (ray_guide "Joins and lookups"): null-pad both sides to a common
  schema, tag, union, shuffle ONCE by ``bucket = hash(key) % B``, then
  an Arrow (Acero) hash join inside each bucket group. Staying in Arrow
  end-to-end preserves dtypes exactly — a pandas merge here degrades
  null-padded int64 payload columns to float64, which changes the
  emitted schema (round-1 ``order_priority_revenue`` hash mismatch).
  B bounds per-task memory; skew is handled by raising B (salting hot
  keys into more buckets). Explicit and version-independent, unlike
  ``Dataset.join``.
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

from ..util import hash64, keep_first_sorted


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return ((v * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets)).astype(np.int32)
    return (hash64(col) % np.uint64(n_buckets)).astype(np.int32)


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Inner equi-join of two large Datasets on ``key``. Column names of
    the two sides must be disjoint apart from ``key``."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c != key]
    types = {
        **dict(zip(l_schema.names, l_schema.types)),
        **dict(zip(r_schema.names, r_schema.types)),
    }
    all_cols = l_cols + r_cols  # unified payload schema

    def pad(tag: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in t.column_names:
                    arrays.append(t[c])
                else:
                    arrays.append(pa.nulls(n, types[c]))
            out = pa.table(dict(zip(names, arrays)))
            out = out.append_column("bucket", pa.array(_bucket_of(t[key], n_buckets)))
            return out.append_column("side", pa.array([tag] * n, pa.string()))
        return fn

    lb = left.map_batches(pad("l"), batch_format="pyarrow")
    rb = right.map_batches(pad("r"), batch_format="pyarrow")

    empty = pa.table({c: pa.nulls(0, types[c]) for c in all_cols})

    def join_bucket(t: pa.Table) -> pa.Table:
        lmask = pc.equal(t["side"], "l")
        l = t.filter(lmask).select(l_cols)
        r = t.filter(pc.invert(lmask)).select([key, *r_cols])
        if l.num_rows == 0 or r.num_rows == 0:
            return empty
        # Acero hash join; single-threaded — the task already owns 1 CPU.
        return l.join(r, keys=key, join_type="inner", use_threads=False).select(all_cols)

    return lb.union(rb).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def grouped_argmax(
    ds: rd.Dataset, group_keys: list[str], value: str, tiebreak: str
) -> rd.Dataset:
    """One row per group: the row maximizing ``value`` (ties -> smallest
    ``tiebreak``)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([value, tiebreak], ascending=[False, True], kind="stable")
            .groupby(group_keys, sort=False)
            .head(1)
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    ordered = partials.sort(
        [*group_keys, value, tiebreak],
        descending=[False] * len(group_keys) + [True, False],
    )
    return keep_first_sorted(ordered, list(group_keys))
