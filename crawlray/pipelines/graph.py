"""Link-graph analytics over the crawl's outlink edges.

``pagerank`` is the crawl-native iterative operator (the reference crawls
and extracts links, ``backend/crawler/link_extractor.py``; ranking the
resulting web graph is the canonical downstream computation). Ray Data has
no iterative fixpoint operator and running a Dataset join+groupby per
iteration pays seconds of fixed overhead per round (see
``dedup.connected_components_ds`` — the same finding), so this uses the
same raw-Ray sharded-state pattern (SURVEY.md §2.4 custom-op case (c)):

- node ids are ``hash64(url)`` (stable SipHash; 64-bit collisions are
  birthday-negligible below ~1e9 nodes and detectable above — document,
  don't pretend);
- EDGES are sharded by ``hash(src) % K`` and RANKS are owned by
  ``hash(node) % K`` — the same hash, so every edge's source rank is
  shard-local and an iteration is: per-shard vectorized
  contribution pass (``rank[src] * d / outdeg[src]``, partial-aggregated
  by dst with ``np.add.at``) -> K×K exchange of per-dst partial sums ->
  per-shard rank update ``(1-d)/N + d * sum(contribs)``. Dangling nodes
  (no outlinks) keep the teleport term only; their lost mass is NOT
  redistributed (the simple variant — the SQL oracle restates the same
  formula).

State is O(nodes/K) per shard; an iteration ships only per-(shard, dst)
partial sums, never edges. K and iters are the scale knobs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import hash64


def _shard_of(h: np.ndarray, k: int) -> np.ndarray:
    return (h % np.uint64(k)).astype(np.int32)


def pagerank(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_shards: int = 8,
    iters: int = 5,
    damping: float = 0.85,
) -> rd.Dataset:
    """Rank every node of the (src, dst) edge dataset after ``iters``
    synchronous power iterations. Returns a Dataset of (url, rank)."""
    k = n_shards
    d = damping

    @ray.remote(num_returns=2 * k if k > 1 else 2)
    def split(t: pa.Table):
        """Route edges by src-shard and (hash, url) node rows by
        node-shard (both endpoints — dst-only nodes must exist too)."""
        if not isinstance(t, pa.Table):      # pandas block via to_arrow_refs
            t = pa.Table.from_pandas(t, preserve_index=False)
        s = t[src].to_pandas().to_numpy()
        e = t[dst].to_pandas().to_numpy()
        sh, eh = hash64(pa.array(s)), hash64(pa.array(e))
        es = _shard_of(sh, k)
        edge_parts = [
            {"src_h": sh[es == i], "dst_h": eh[es == i]} for i in range(k)
        ]
        nh = np.concatenate([sh, eh])
        nu = np.concatenate([s, e])
        ns = _shard_of(nh, k)
        node_parts = [{"h": nh[ns == i], "url": nu[ns == i]} for i in range(k)]
        return (*edge_parts, *node_parts)

    @ray.remote
    class _RankShard:
        """Owns the ranks of nodes with ``hash % K == shard`` and the
        edges whose SOURCE lives here (same hash -> src ranks local)."""

        def __init__(self, shard: int, n_edge_parts: int, *parts):
            # flattened (edge_parts..., node_parts...): Ray only
            # auto-dereferences TOP-LEVEL ObjectRef args
            edge_parts = list(parts[:n_edge_parts])
            node_parts = list(parts[n_edge_parts:])
            self.shard = shard
            eh = [p for p in edge_parts if len(p["src_h"])]
            self.src_h = (
                np.concatenate([p["src_h"] for p in eh]) if eh else
                np.empty(0, np.uint64)
            )
            self.dst_h = (
                np.concatenate([p["dst_h"] for p in eh]) if eh else
                np.empty(0, np.uint64)
            )
            nh = (
                np.concatenate([p["h"] for p in node_parts])
                if node_parts else np.empty(0, np.uint64)
            )
            nu = (
                np.concatenate([p["url"] for p in node_parts])
                if node_parts else np.empty(0, object)
            )
            self.nodes, first = np.unique(nh, return_index=True)
            self.urls = nu[first]
            # out-degree of owned nodes (edges are src-sharded here)
            self.outdeg = np.zeros(len(self.nodes), np.int64)
            if len(self.src_h):
                u, c = np.unique(self.src_h, return_counts=True)
                self.outdeg[np.searchsorted(self.nodes, u)] = c
            self.rank = np.empty(0, np.float64)

        def n_nodes(self) -> int:
            return len(self.nodes)

        def init_rank(self, n_total: int) -> None:
            self.n_total = n_total
            self.rank = np.full(len(self.nodes), 1.0 / n_total)

        def contribs(self):
            """Per-dst partial contribution sums, split by dst shard
            (``num_returns=k`` at the call site: the K×K exchange stays
            in the object store — the driver never sees a partial sum)."""
            if not len(self.src_h):
                out = [
                    {"h": np.empty(0, np.uint64), "c": np.empty(0, np.float64)}
                ] * k
            else:
                si = np.searchsorted(self.nodes, self.src_h)
                per_edge = d * self.rank[si] / self.outdeg[si]
                u, inv = np.unique(self.dst_h, return_inverse=True)
                sums = np.zeros(len(u), np.float64)
                np.add.at(sums, inv, per_edge)
                ds_ = _shard_of(u, k)
                out = [{"h": u[ds_ == i], "c": sums[ds_ == i]} for i in range(k)]
            return tuple(out) if k > 1 else out[0]

        def update(self, *parts) -> None:
            new = np.full(len(self.nodes), (1.0 - d) / self.n_total)
            for p in parts:
                if len(p["h"]):
                    new[np.searchsorted(self.nodes, p["h"])] += p["c"]
            self.rank = new

        def table(self) -> pa.Table:
            return pa.table({
                "url": pa.array(self.urls.tolist(), pa.string()),
                "rank": pa.array(self.rank),
            })

    blocks = edges.to_arrow_refs()
    parts = [split.remote(b) for b in blocks]
    # parts[b] is a 2k tuple of refs: edges 0..k-1, nodes k..2k-1
    shards = [
        _RankShard.remote(
            i,
            len(parts),
            *[p[i] for p in parts],
            *[p[k + i] for p in parts],
        )
        for i in range(k)
    ]
    n_total = sum(ray.get([s.n_nodes.remote() for s in shards]))
    if n_total == 0:
        for s in shards:
            ray.kill(s)
        return rd.from_arrow(pa.table({
            "url": pa.nulls(0, pa.string()), "rank": pa.nulls(0, pa.float64()),
        }))
    ray.get([s.init_rank.remote(n_total) for s in shards])
    for _ in range(iters):
        outs = [s.contribs.options(num_returns=k).remote() for s in shards]
        refs = [o if k > 1 else [o] for o in outs]
        ray.get([
            shards[i].update.remote(*[refs[s][i] for s in range(k)])
            for i in range(k)
        ])
    tables = [s.table.remote() for s in shards]
    ray.wait(tables, num_returns=len(tables))   # materialize before kill
    out = rd.from_arrow_refs(tables)
    for s in shards:
        ray.kill(s)
    return out
