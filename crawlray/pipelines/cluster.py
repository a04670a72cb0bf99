"""Distributed k-means (Lloyd's) over an embedding column.

The canonical scale shape for clustering on Ray Data: centroids are a
k × dim float64 array (tiny — kilobytes) BROADCAST into every assignment
task; each ``map_batches`` task emits per-cluster partial sums and counts
(O(k × dim) per block), and the driver folds O(blocks × k × dim) partial
rows into the next centroid set. Vectors never shuffle and never
materialize on the driver; per-iteration driver work is bounded by the
block count, exactly like the engine's other bounded folds
(``price_histogram``, HLL registers).

Cross-engine determinism (the DuckDB oracle restates the same unrolled
iterations): centroids are rounded to ``round_dp`` decimals after every
update IN BOTH ENGINES, so each iteration's assignment inputs are
bit-identical; within an assignment, only float64 summation order differs
between numpy and DuckDB's ``list_distance`` (~1 ulp), which can flip an
argmin only on an exact distance tie between different clusters — a
measure-zero event on real-valued embeddings (the ``pagerank`` precedent).
Ties at EQUAL distance resolve to the smaller cluster id in both engines.

Init is deterministic and SQL-expressible: centroid j = the (rounded)
vector of the j-th smallest id among ``id < k``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _vecs_of(t: pa.Table, vec_col: str) -> np.ndarray:
    arr = t[vec_col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(t.num_rows, -1)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared-L2 argmin per row; first-min = smallest cluster id on ties
    (matches the SQL ``ORDER BY dist, c`` tie-break)."""
    d2 = np.empty((x.shape[0], cents.shape[0]), np.float64)
    for j in range(cents.shape[0]):
        diff = x - cents[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    return np.argmin(d2, axis=1)


def kmeans(
    emb: rd.Dataset,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> rd.Dataset:
    """``iters`` Lloyd iterations (assign + centroid update), then a final
    assignment under the last centroids. Returns (id_col, cluster:int64)."""
    init_rows = emb.filter(
        expr=f"{id_col} < {k}"
    ).select_columns([id_col, vec_col]).take_all()
    if not init_rows:
        return rd.from_arrow(pa.table({
            id_col: pa.nulls(0, pa.int64()),
            "cluster": pa.nulls(0, pa.int64()),
        }))
    init_rows.sort(key=lambda r: r[id_col])
    cents = np.round(
        np.asarray([r[vec_col] for r in init_rows], np.float64), round_dp
    )
    dim = cents.shape[1]

    for _ in range(iters):
        c_now = cents   # bind by value: map_batches pickles the closure

        def partials(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    "cluster": pa.nulls(0, pa.int64()),
                    "count": pa.nulls(0, pa.int64()),
                    "psum": pa.nulls(0, pa.list_(pa.float64())),
                })
            x = _vecs_of(t, vec_col)
            a = _assign(x, c_now)
            cl = np.unique(a)
            sums = np.zeros((len(cl), dim), np.float64)
            cnts = np.zeros(len(cl), np.int64)
            for i, j in enumerate(cl):
                m = a == j
                sums[i] = x[m].sum(axis=0)
                cnts[i] = int(m.sum())
            return pa.table({
                "cluster": pa.array(cl.astype(np.int64)),
                "count": pa.array(cnts),
                "psum": pa.array(list(sums)),
            })

        rows = emb.select_columns([vec_col]).map_batches(
            partials, batch_format="pyarrow"
        ).take_all()   # O(blocks × k) rows — bounded driver fold
        tot = np.zeros((k, dim), np.float64)
        n = np.zeros(k, np.int64)
        for r in rows:
            tot[r["cluster"]] += np.asarray(r["psum"], np.float64)
            n[r["cluster"]] += r["count"]
        nz = n > 0
        new = cents.copy()   # empty cluster keeps its previous centroid
        new[nz] = np.round(tot[nz] / n[nz, None], round_dp)
        cents = new

    c_fin = cents

    def final_assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.nulls(0, pa.int64()),
                "cluster": pa.nulls(0, pa.int64()),
            })
        a = _assign(_vecs_of(t, vec_col), c_fin)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a.astype(np.int64)),
        })

    return emb.select_columns([id_col, vec_col]).map_batches(
        final_assign, batch_format="pyarrow"
    )
