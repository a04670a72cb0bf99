"""Similarity search over the ``embeddings`` table (list<float> column).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once (``ray.put``), each ``map_batches`` task computes a (batch x query)
  float64 matmul and emits only its LOCAL top-k rows per query (partial
  top-k combiner), so the final per-query reduce sees ``k x n_blocks`` rows
  instead of the full corpus — the scalable pattern for 100 TB.
- ``ivf_topk``: IVF-style scale path: deterministic k-means-lite centroids
  (numpy, trained on a driver-side sample), every vector assigned to its
  nearest centroid in a vectorized stage, queries probe only the
  ``n_probe`` nearest centroid buckets.

float64 throughout so results are reproducible against the DuckDB oracle
(``list_cosine_similarity`` computes in double).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_log = logging.getLogger("crawlray.ann")


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    lst = batch[col]
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lst)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _PartialTopK:
    """Per-batch cosine + local top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.q_ids = q["ids"]
        self.qm = _normalize(q["matrix"])     # (Q, d), broadcast once per actor
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))        # (B, d)
        sims = m @ self.qm.T                  # (B, Q)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[0])
        # SUPERSET partial: emit every row at or above each column's
        # k-th largest sim (boundary ties included), fully vectorized —
        # one partition + one nonzero instead of a Python loop of
        # per-query lexsorts. The global merge (`_final_topk`) applies
        # the exact (sim desc, vec_id asc) tie-break, so over-emitting
        # here never changes the answer, only ships a few extra rows.
        thresh = -np.partition(-sims, k - 1, axis=0)[k - 1]   # (Q,)
        rows, cols = np.nonzero(sims >= thresh[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.q_ids[cols].astype(np.int64)),
                "vec_id": pa.array(vec_ids[rows].astype(np.int64)),
                "sim": pa.array(sims[rows, cols], pa.float64()),
            }
        )


def _final_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    g = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable").head(k)
    g = g.copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def brute_force_topk(
    embeddings: rd.Dataset, query_ids: list[int], k: int = 5
) -> pd.DataFrame:
    """Exact cosine top-k of each query vector against the whole table.
    Returns (query_id, vec_id, rank) — deterministic tie-break on vec_id."""
    q = embeddings.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas()
    q = q.sort_values("vec_id")
    qref = ray.put(
        {
            "ids": q["vec_id"].to_numpy().astype(np.int64),
            "matrix": np.stack(q["embedding"].to_numpy()).astype(np.float64),
        }
    )
    partial = embeddings.map_batches(
        _PartialTopK,
        fn_constructor_args=(qref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )
    final = (
        partial.groupby("query_id")
        .map_groups(lambda df: _final_topk(df, k), batch_format="pandas")
        .to_pandas()
    )
    return final.sort_values(["query_id", "rank"]).reset_index(drop=True)[
        ["query_id", "vec_id", "rank"]
    ]


def _cos_rows_packed(a, b, packs_a, packs_b, threshold: float) -> pa.Table:
    """Exact-cosine verify kernel over packed float64 unit vectors — the
    ONE kernel both candidate-resolution regimes (broadcast and join)
    feed, so their outputs are bit-identical by construction."""
    n = len(a)
    empty = pa.table({"a": pa.nulls(0, pa.int64()), "b": pa.nulls(0, pa.int64()),
                      "cos": pa.nulls(0, pa.float64())})
    if n == 0:
        return empty
    ma = np.frombuffer(b"".join(packs_a), dtype=np.float64).reshape(n, -1)
    mb = np.frombuffer(b"".join(packs_b), dtype=np.float64).reshape(n, -1)
    cos = np.einsum("ij,ij->i", ma, mb)
    m = cos >= threshold
    return pa.table({
        "a": pa.array(np.asarray(a)[m].astype(np.int64)),
        "b": pa.array(np.asarray(b)[m].astype(np.int64)),
        "cos": pa.array(np.round(cos[m], 6), pa.float64()),
    })


class _VecPacker:
    """(vec_id, vec): the L2-normalized float64 vector packed as bytes
    (binary is joinable through Acero, list columns are not) — the
    ShinglePacker analog. ``ids_ref`` (broadcast candidate-id set)
    filters the batch; ``None`` means the input was already semi-joined
    down to candidates and every row packs."""

    def __init__(self, ids_ref):
        self.ids = None if ids_ref is None else ray.get(ids_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (np.ones(len(ids), dtype=bool) if self.ids is None
             else np.isin(ids, self.ids))
        if not m.any():
            return pa.table({"vec_id": pa.nulls(0, pa.int64()),
                             "vec": pa.nulls(0, pa.binary())})
        sub = t.filter(pa.array(m))
        mat = np.ascontiguousarray(_normalize(_matrix(sub)))
        return pa.table({
            "vec_id": pa.array(ids[m], pa.int64()),
            "vec": pa.array([mat[i].tobytes() for i in range(len(mat))], pa.binary()),
        })


def embedding_lsh_pairs(
    embeddings: rd.Dataset,
    cos_threshold: float = 0.9,
    n_planes: int = 64,
    bands: int = 8,
    seed: int = 11,
    broadcast_max_docs: int | None = None,
) -> rd.Dataset:
    """Embedding near-dup pairs at scale: random-hyperplane (SRP) LSH.

    Sign-bit signatures against ``n_planes`` fixed random hyperplanes,
    banded into ``bands`` keys; same candidate machinery as the MinHash
    path (sort + adjacent chain pairs + distributed dedup), then an EXACT
    cosine verify — every emitted pair is exact, LSH only bounds recall.
    Detection probability for a pair at cosine c is
    1-(1-(1-acos(c)/pi)^(planes/bands))^bands (~0.93 at c=0.9 with 64/8);
    intended domain is near-duplicates, the brute-force
    ``embedding_near_dups`` covers low thresholds exactly.

    Candidate vectors resolve via a broadcast (ids + unit-vector matrix,
    ``ray.put`` once) while the candidate set fits
    (``broadcast_max_docs``), and via two ``bucketed_hash_join``s against
    a packed-vector table beyond that — the huge-candidate regime where a
    low threshold makes "the small side" approach the corpus and a
    driver-side materialization would not fit (the mirror of
    ``minhash_lsh_pairs``'s ``broadcast_max_docs`` switch). The switch is
    size-gated BEFORE anything candidate-sized reaches the driver (on the
    materialized pair count; distinct ids <= 2 x pairs); in the huge
    regime the distinct-id *Dataset* filters the embedding side via
    :func:`~crawlray.pipelines.relational.bucketed_semi_join` — no
    ``unique()``-to-driver on either path. ``broadcast_max_docs=None``
    derives the cap from the object-store budget
    (:func:`~crawlray.util.auto_broadcast_cap` at ``dim*8`` bytes/item);
    the chosen regime is logged. Both regimes share the
    :func:`_cos_rows_packed` numerics, asserted bit-identical in tests.
    """
    from ..util import (adjacent_pairs_sorted, auto_broadcast_cap,
                        drop_empty_blocks, keep_first_sorted)
    from .relational import bucketed_hash_join, bucketed_semi_join

    rows_per_band = n_planes // bands
    empty = pa.table({"a": pa.nulls(0, pa.int64()), "b": pa.nulls(0, pa.int64()),
                      "cos": pa.nulls(0, pa.float64())})
    first = embeddings.limit(1).take_all()
    if not first:
        return rd.from_arrow(empty)
    dim = len(first[0]["embedding"])
    rs = np.random.RandomState(seed)
    planes = rs.randn(n_planes, dim)
    pref = ray.put(planes)

    def sig(t: pa.Table) -> pa.Table:
        m = _normalize(_matrix(t))
        bits = (m @ ray.get(pref).T) > 0                  # (n, n_planes)
        w = (1 << np.arange(rows_per_band, dtype=np.int64))
        n = len(m)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            keys[:, b] = bits[:, b * rows_per_band:(b + 1) * rows_per_band] @ w
        return pa.table({
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
            "band_key": pa.array(keys.ravel()),
            "vec_id": pa.array(np.repeat(ids, bands)),
        })

    banded = embeddings.map_batches(sig, batch_format="pyarrow")
    cand = adjacent_pairs_sorted(
        banded.sort(["band_id", "band_key", "vec_id"]),
        ["band_id", "band_key"], "vec_id",
    )
    cand = keep_first_sorted(cand.sort(["a", "b"]), ["a", "b"])

    def ids_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vec_id": pa.compute.unique(both)})

    cand = cand.materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return rd.from_arrow(empty)
    cap = (auto_broadcast_cap(dim * 8 + 64) if broadcast_max_docs is None
           else broadcast_max_docs)

    if 2 * n_pairs <= cap:
        # small-candidate regime: distinct ids (bounded by 2*pairs <= cap)
        # collect once; candidate vectors only (the small side) broadcast
        # as a sorted id vector + contiguous unit-vector matrix so the
        # verify is a single row-wise dot
        _log.info("embedding_lsh_pairs: regime=broadcast pairs=%d cap=%d",
                  n_pairs, cap)
        involved = np.array(
            sorted(cand.map_batches(ids_of, batch_format="pyarrow").unique("vec_id")),
            dtype=np.int64,
        )
        inv_ref = ray.put(involved)

        def pick(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.isin(ids, ray.get(inv_ref))
            return t.filter(pa.array(m))

        vec_tbls = ray.get(
            embeddings.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        )
        parts = [t for t in vec_tbls if t.num_rows]
        all_ids = np.concatenate(
            [t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64) for t in parts]
        )
        all_mat = np.vstack([_normalize(_matrix(t)) for t in parts])
        order = np.argsort(all_ids, kind="stable")
        lk_ref = ray.put((all_ids[order], np.ascontiguousarray(all_mat[order])))

        class VerifyCos:
            def __init__(self, lk, thr):
                self.ids, self.mat = ray.get(lk)
                self.thr = thr

            def __call__(self, t: pa.Table) -> pa.Table:
                a = t["a"].to_numpy(zero_copy_only=False)
                b = t["b"].to_numpy(zero_copy_only=False)
                # fancy-index gather copies to CONTIGUOUS (n, dim) arrays —
                # the same einsum input layout as the join regime's
                # unpacked buffers, so both regimes round identically
                cos = np.einsum(
                    "ij,ij->i",
                    self.mat[np.searchsorted(self.ids, a)],
                    self.mat[np.searchsorted(self.ids, b)],
                )
                m = cos >= self.thr
                return pa.table({"a": pa.array(a[m].astype(np.int64)),
                                 "b": pa.array(b[m].astype(np.int64)),
                                 "cos": pa.array(np.round(cos[m], 6), pa.float64())})

        verified = cand.map_batches(
            VerifyCos, fn_constructor_args=(lk_ref, cos_threshold),
            batch_format="pyarrow", concurrency=(2, 8), num_cpus=1,
        )
        # typed 0-row head block: an all-empty Dataset otherwise loses its
        # schema at to_pandas/driver-check time
        return rd.from_arrow(empty).union(verified)

    # huge-candidate regime: NOTHING materializes on the driver — the
    # distinct-id Dataset (sort + keep-first, never unique()-to-driver)
    # semi-joins the embedding side down to candidates, packed unit
    # vectors resolve to the pair rows via two explicit hash-exchange
    # joins, and the verify runs inside map_batches over the joined rows
    _log.info("embedding_lsh_pairs: regime=semi-join pairs=%d cap=%d",
              n_pairs, cap)
    ids_ds = keep_first_sorted(
        cand.map_batches(ids_of, batch_format="pyarrow").sort("vec_id"),
        ["vec_id"],
    )
    # bloom pre-filter: non-candidate embeddings drop inside the split
    # task, so their vector payloads never enter the exchange
    vecs = drop_empty_blocks(bucketed_semi_join(
        embeddings, ids_ds, "vec_id", n_buckets=8, bloom_bits=1 << 22
    )).map_batches(
        _VecPacker, fn_constructor_args=(None,),
        batch_format="pyarrow", concurrency=(2, 8), num_cpus=1,
    ).materialize()
    va = vecs.map_batches(
        lambda t: t.rename_columns(["a", "vec_a"]), batch_format="pyarrow"
    )
    vb = vecs.map_batches(
        lambda t: t.rename_columns(["b", "vec_b"]), batch_format="pyarrow"
    )
    joined = drop_empty_blocks(bucketed_hash_join(
        bucketed_hash_join(cand, va, "a", n_buckets=8), vb, "b", n_buckets=8
    ))

    def verify(t: pa.Table) -> pa.Table:
        return _cos_rows_packed(
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["vec_a"].to_pylist(), t["vec_b"].to_pylist(), cos_threshold,
        )

    return rd.from_arrow(empty).union(
        joined.map_batches(verify, batch_format="pyarrow")
    )


# -- IVF scale path ----------------------------------------------------------

def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8,
                    seed: int = 5) -> np.ndarray:
    """Deterministic k-means-lite on a sample (numpy, driver side)."""
    rs = np.random.RandomState(seed)
    c = sample[rs.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        d = sample @ c.T
        assign = d.argmax(axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def seeded_id_sample(
    embeddings: rd.Dataset, sample_rows: int, seed: int = 5
) -> pd.DataFrame:
    """~``sample_rows`` rows drawn uniformly over the ``vec_id`` space via
    a seeded multiplicative hash-mod filter — NOT ``limit(n)``: a head
    sample follows storage order, which at corpus scale correlates with
    source/time and biases anything trained on it (IVF centroids would
    under-cover the tail). Deterministic for a fixed seed; one cheap
    metadata count + one filtered scan."""
    n = embeddings.count()
    if n <= sample_rows:
        return embeddings.to_pandas()
    cut = np.uint64(min(int(sample_rows / n * 2.0**64), 2**64 - 1))
    phi = np.uint64(0x9E3779B97F4A7C15)
    s = np.uint64(seed)

    def pick(t: pa.Table) -> pa.Table:
        v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = np.multiply(v + s, phi)        # wraps mod 2^64
        return t.filter(pa.array(h < cut))

    return embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()


def ivf_topk(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2048,
) -> pd.DataFrame:
    """IVF-bucketed ANN: probe only the n_probe nearest centroid buckets.
    Approximate by design; recall measured against brute force in tests."""
    sample = seeded_id_sample(embeddings, sample_rows).sort_values("vec_id")
    sm = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    cents = train_centroids(sm, n_centroids)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_matrix(batch))
        b = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")

    qdf = embeddings.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    qm = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    # stable: centroid-score ties break to the LOWEST centroid id, so the
    # probe set is deterministic and the SQL oracle can restate it
    probe = np.argsort(-(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]
    wanted = sorted({int(b) for row in probe for b in row})
    shortlist = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=pa.array(wanted, pa.int32()))),
        batch_format="pyarrow",
    )
    qref = ray.put(
        {"ids": qdf["vec_id"].to_numpy().astype(np.int64), "matrix": qm}
    )
    partial = shortlist.map_batches(
        _PartialTopK, fn_constructor_args=(qref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=2, num_cpus=0.5,
    )
    # NOTE: partial top-k here scans only probed buckets; per-query bucket
    # masking is skipped (each query's true buckets are a subset of the
    # union) — recall can only improve, determinism is unaffected.
    final = (
        partial.groupby("query_id")
        .map_groups(lambda df: _final_topk(df, k), batch_format="pandas")
        .to_pandas()
    )
    return final.sort_values(["query_id", "rank"]).reset_index(drop=True)[
        ["query_id", "vec_id", "rank"]
    ]


def mutual_topk_pairs(embeddings: rd.Dataset, k: int = 5) -> rd.Dataset:
    """RECIPROCAL k-NN pairs — (a, b) where each vector is in the
    other's cosine top-k (self excluded): the mutual-neighbor graph
    that seeds agglomerative dedup clustering and hubness-robust
    retrieval eval. BRUTE regime like :func:`brute_force_topk` (the
    whole matrix broadcasts once; the IVF/LSH paths are the scale
    story): per-batch local top-(k+1) against the broadcast matrix,
    distributed per-query merge drops self and re-ranks to k, then the
    reciprocal check is ONE exchange on the normalized (min, max) pair
    key counting directions — no driver pass over pairs."""
    from .relational import bucketed_reduce

    allv = embeddings.to_pandas().sort_values("vec_id")
    mref = ray.put({
        "ids": allv["vec_id"].to_numpy().astype(np.int64),
        "matrix": np.stack(allv["embedding"].to_numpy()).astype(np.float64),
    })

    partial = embeddings.map_batches(
        _PartialTopK,
        fn_constructor_args=(mref, k + 1),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
        num_cpus=0.5,
    )

    def finish(t: pa.Table) -> pa.Table:
        # per-query merge, vectorized across every query in the bucket
        # (a groupby().map_groups here pays a per-group pandas call per
        # query and, being lazy, re-executes under the next exchange)
        empty = pa.table({"query_id": pa.nulls(0, pa.int64()),
                          "vec_id": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        q = t["query_id"].to_numpy(zero_copy_only=False)
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        s = t["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s, q))      # q asc, sim desc, vec asc
        q, v = q[order], v[order]
        m = v != q                          # drop self
        q, v = q[m], v[m]
        if not len(q):
            return empty
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        pos = (np.arange(len(q))
               - np.repeat(starts, np.diff(np.r_[starts, len(q)])))
        keep = pos < k
        return pa.table({"query_id": pa.array(q[keep], pa.int64()),
                         "vec_id": pa.array(v[keep], pa.int64())})

    from .relational import bucketed_reduce as _br
    topk = _br(partial, "query_id", finish, n_buckets=16)

    def norm_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.minimum(q, v), pa.int64()),
                         "b": pa.array(np.maximum(q, v), pa.int64())})

    def mutual(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.nulls(0, pa.int64()),
                          "vec_b": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        key = np.stack([a, b], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        both = uniq[cnt == 2]
        return pa.table({"vec_a": pa.array(both[:, 0], pa.int64()),
                         "vec_b": pa.array(both[:, 1], pa.int64())})

    return bucketed_reduce(
        topk.map_batches(norm_pairs, batch_format="pyarrow"),
        "a", mutual, n_buckets=16)
