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
import pyarrow.compute as pc
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
    seeds: "list[str] | None" = None,
) -> rd.Dataset:
    """Rank every node of the (src, dst) edge dataset after ``iters``
    synchronous power iterations. Returns a Dataset of (url, rank).

    ``seeds``: PERSONALIZED PageRank (random walk with restart,
    Haveliwala 2002) — the restart/teleport mass concentrates on the
    seed pages (1/|seeds| each; seeds absent from the graph lose their
    share, the documented contract) instead of spreading uniformly.
    The uniform path keeps its exact float op order (its oracle is
    bit-matched); the personalized branch has its own."""
    k = n_shards
    d = damping
    seed_h_all = None
    n_seeds = 0
    if seeds:
        seed_h_all = np.sort(hash64(pa.array(
            np.asarray(seeds, object), pa.string())))
        n_seeds = len(seeds)

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

        def init_rank(self, n_total: int, seed_h=None,
                      n_seeds: int = 0) -> None:
            self.n_total = n_total
            if seed_h is None:
                self.restart = None
                self.rank = np.full(len(self.nodes), 1.0 / n_total)
            else:
                pos = np.searchsorted(seed_h, self.nodes)
                ok = pos < len(seed_h)
                ok[ok] &= seed_h[pos[ok]] == self.nodes[ok]
                self.restart = ok
                self.n_seeds = n_seeds
                self.rank = np.where(ok, 1.0 / n_seeds, 0.0)

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
            if self.restart is None:
                new = np.full(len(self.nodes), (1.0 - d) / self.n_total)
            else:
                new = np.where(self.restart,
                               (1.0 - d) / self.n_seeds, 0.0)
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
    ray.get([s.init_rank.remote(n_total, seed_h_all, n_seeds)
             for s in shards])
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


WIDEST_SEED_W = 1_000_000_000


def widest_paths(
    edges: rd.Dataset,
    seeds: list[str],
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    n_shards: int = 8,
    max_hops: int = 6,
) -> rd.Dataset:
    """WIDEST (max-min bottleneck) path within ``max_hops`` edges —
    :func:`cheapest_paths` on the max-min semiring: a path's value is
    its smallest edge weight, each node keeps the best such value over
    all <= max_hops-edge paths from the seed set (seeds themselves at
    ``WIDEST_SEED_W``, the +infinity stand-in both engines state)."""
    return cheapest_paths(edges, seeds, src=src, dst=dst, weight=weight,
                          n_shards=n_shards, max_hops=max_hops,
                          maximize=True, seed_value=WIDEST_SEED_W)


def hits(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_shards: int = 8,
    iters: int = 5,
) -> rd.Dataset:
    """Hub/authority scores (Kleinberg's HITS, JACM 1999) after ``iters``
    synchronous iterations — the bidirectional complement of
    :func:`pagerank`: a page is a good AUTHORITY if good hubs link to it
    and a good HUB if it links to good authorities. Normalization is L1
    (divide by the global sum) rather than the textbook L2 so every
    operation is +, /, sum — exactly restatable in SQL with no sqrt.

    Same sharded raw-task pattern (SURVEY.md §2.4 case (c)), but HITS
    needs BOTH directions, so each edge is routed twice at split time:
    once by ``hash(src) % K`` (out-edges — the authority pass reads the
    local h[src]) and once by ``hash(dst) % K`` (in-edges — the hub pass
    reads the local a[dst]). An iteration is two half-steps, each a
    per-shard vectorized contribution pass (``np.add.at`` partial sums)
    → K×K object-store exchange → owner-side fold; the driver sees only
    the K per-shard norm partials (2K floats per iteration, never a
    node). Returns a Dataset of (url, hub, authority), un-normalized
    float64 — callers round (both engines sum float64 in different
    orders; see the pagerank 6dp contract)."""
    k = n_shards

    @ray.remote(num_returns=3 * k if k > 1 else 3)
    def split(t: pa.Table):
        """Route each edge by src-shard (out-edges) AND dst-shard
        (in-edges), plus (hash, url) node rows by node-shard."""
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        s = t[src].to_pandas().to_numpy()
        e = t[dst].to_pandas().to_numpy()
        sh, eh = hash64(pa.array(s)), hash64(pa.array(e))
        es = _shard_of(sh, k)
        out_parts = [
            {"src_h": sh[es == i], "dst_h": eh[es == i]} for i in range(k)
        ]
        ed = _shard_of(eh, k)
        in_parts = [
            {"src_h": sh[ed == i], "dst_h": eh[ed == i]} for i in range(k)
        ]
        nh = np.concatenate([sh, eh])
        nu = np.concatenate([s, e])
        ns = _shard_of(nh, k)
        node_parts = [{"h": nh[ns == i], "url": nu[ns == i]} for i in range(k)]
        return (*out_parts, *in_parts, *node_parts)

    @ray.remote
    class _HitsShard:
        """Owns hub/authority scores of nodes with ``hash % K == shard``,
        the out-edges whose SOURCE lives here, and the in-edges whose
        DESTINATION lives here."""

        def __init__(self, shard: int, n_blocks: int, *parts):
            out_parts = list(parts[:n_blocks])
            in_parts = list(parts[n_blocks:2 * n_blocks])
            node_parts = list(parts[2 * n_blocks:])
            self.shard = shard

            def _cat(ps, key):
                ne = [p for p in ps if len(p[key])]
                return (np.concatenate([p[key] for p in ne]) if ne
                        else np.empty(0, np.uint64))

            self.out_src = _cat(out_parts, "src_h")
            self.out_dst = _cat(out_parts, "dst_h")
            self.in_src = _cat(in_parts, "src_h")
            self.in_dst = _cat(in_parts, "dst_h")
            nh = (np.concatenate([p["h"] for p in node_parts])
                  if node_parts else np.empty(0, np.uint64))
            nu = (np.concatenate([p["url"] for p in node_parts])
                  if node_parts else np.empty(0, object))
            self.nodes, first = np.unique(nh, return_index=True)
            self.urls = nu[first]
            self.hub = np.empty(0, np.float64)
            self.auth = np.empty(0, np.float64)
            self._raw = np.empty(0, np.float64)

        def n_nodes(self) -> int:
            return len(self.nodes)

        def init_scores(self, n_total: int) -> None:
            self.hub = np.full(len(self.nodes), 1.0 / n_total)
            self.auth = np.zeros(len(self.nodes))

        def _contribs(self, src_h, dst_h, scores):
            """Per-target partial sums of scores[source] over local
            edges, split by the target's owner shard."""
            if not len(src_h):
                return [
                    {"h": np.empty(0, np.uint64), "c": np.empty(0, np.float64)}
                ] * k
            per_edge = scores[np.searchsorted(self.nodes, src_h)]
            u, inv = np.unique(dst_h, return_inverse=True)
            sums = np.zeros(len(u), np.float64)
            np.add.at(sums, inv, per_edge)
            ds_ = _shard_of(u, k)
            return [{"h": u[ds_ == i], "c": sums[ds_ == i]} for i in range(k)]

        def auth_contribs(self):
            """h[src] pushed along OUT-edges (src local), keyed by dst."""
            out = self._contribs(self.out_src, self.out_dst, self.hub)
            return tuple(out) if k > 1 else out[0]

        def hub_contribs(self):
            """a[dst] pushed along IN-edges (dst local), keyed by src."""
            out = self._contribs(self.in_dst, self.in_src, self.auth)
            return tuple(out) if k > 1 else out[0]

        def fold_raw(self, *parts) -> float:
            """Sum incoming partials into the raw (un-normalized) vector;
            return the shard's norm partial — the ONLY value the driver
            ever sees."""
            raw = np.zeros(len(self.nodes))
            for p in parts:
                if len(p["h"]):
                    raw[np.searchsorted(self.nodes, p["h"])] += p["c"]
            self._raw = raw
            return float(raw.sum())

        def set_auth(self, total: float) -> None:
            self.auth = self._raw / total

        def set_hub(self, total: float) -> None:
            self.hub = self._raw / total

        def table(self) -> pa.Table:
            return pa.table({
                "url": pa.array(self.urls.tolist(), pa.string()),
                "hub": pa.array(self.hub),
                "authority": pa.array(self.auth),
            })

    blocks = edges.to_arrow_refs()
    parts = [split.remote(b) for b in blocks]
    shards = [
        _HitsShard.remote(
            i,
            len(parts),
            *[p[i] for p in parts],
            *[p[k + i] for p in parts],
            *[p[2 * k + i] for p in parts],
        )
        for i in range(k)
    ]
    n_total = sum(ray.get([s.n_nodes.remote() for s in shards]))
    if n_total == 0:
        for s in shards:
            ray.kill(s)
        return rd.from_arrow(pa.table({
            "url": pa.nulls(0, pa.string()),
            "hub": pa.nulls(0, pa.float64()),
            "authority": pa.nulls(0, pa.float64()),
        }))
    ray.get([s.init_scores.remote(n_total) for s in shards])

    def half_step(contrib_method: str, set_method: str) -> None:
        outs = [getattr(s, contrib_method).options(num_returns=k).remote()
                for s in shards]
        refs = [o if k > 1 else [o] for o in outs]
        sums = ray.get([
            shards[i].fold_raw.remote(*[refs[s][i] for s in range(k)])
            for i in range(k)
        ])
        total = sum(sums)
        ray.get([getattr(s, set_method).remote(total) for s in shards])

    for _ in range(iters):
        half_step("auth_contribs", "set_auth")
        half_step("hub_contribs", "set_hub")
    tables = [s.table.remote() for s in shards]
    ray.wait(tables, num_returns=len(tables))
    out = rd.from_arrow_refs(tables)
    for s in shards:
        ray.kill(s)
    return out


def bfs_depths(
    edges: rd.Dataset,
    seeds: list[str],
    src: str = "src",
    dst: str = "dst",
    n_shards: int = 8,
    max_depth: int = 16,
) -> rd.Dataset:
    """Shortest-hop BFS level of every node reachable from ``seeds`` over
    the (src, dst) outlink edge dataset — the crawl-depth computation the
    reference performs implicitly by crawling breadth-first from its seed
    list (``backend/api/tasks.py:488`` processes seeds in order; link
    discovery is per-page, ``backend/crawler/link_extractor.py:81-129``).

    Same sharded raw-task pattern as :func:`pagerank` (SURVEY.md §2.4
    custom-op case (c)): node depths are owned by ``hash(node) % K``
    shards and edges are sharded by ``hash(src) % K`` — the same hash, so
    a frontier node's outgoing edges are always shard-local. One level is:
    per-shard vectorized neighbor expansion (searchsorted of the sorted
    local frontier against the shard's src-sorted edge array) → K×K
    exchange of candidate dst hashes (object store only; the driver sees
    per-shard NEW-NODE COUNTS, never node ids) → per-shard first-visit
    update (``depth[h] = level`` for unseen only). Terminates when a level
    discovers nothing or at ``max_depth`` (the SQL restatement's recursion
    cap). State is O(nodes/K) per shard; a level ships only the frontier's
    out-neighborhood, never edges."""
    k = n_shards

    @ray.remote(num_returns=2 * k if k > 1 else 2)
    def split(t: pa.Table):
        if not isinstance(t, pa.Table):
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
    class _DepthShard:
        def __init__(self, shard: int, n_edge_parts: int, *parts):
            edge_parts = list(parts[:n_edge_parts])
            node_parts = list(parts[n_edge_parts:])
            self.shard = shard
            eh = [p for p in edge_parts if len(p["src_h"])]
            src_h = (
                np.concatenate([p["src_h"] for p in eh]) if eh else
                np.empty(0, np.uint64)
            )
            dst_h = (
                np.concatenate([p["dst_h"] for p in eh]) if eh else
                np.empty(0, np.uint64)
            )
            order = np.argsort(src_h, kind="stable")
            self.src_h, self.dst_h = src_h[order], dst_h[order]
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
            self.depth = np.full(len(self.nodes), -1, np.int32)
            self.frontier = np.empty(0, np.uint64)

        def seed(self, seed_h: np.ndarray) -> int:
            """Mark seed nodes (depth 0); seeds absent from the edge set
            are ignored — the graph never saw them."""
            pos = np.searchsorted(self.nodes, seed_h)
            ok = (pos < len(self.nodes))
            ok[ok] &= self.nodes[pos[ok]] == seed_h[ok]
            hit = np.unique(pos[ok])
            self.depth[hit] = 0
            self.frontier = self.nodes[hit]
            return len(hit)

        def neighbors(self):
            """Out-neighborhood of the current local frontier, split by
            dst owner shard (num_returns=k: the exchange stays in the
            object store)."""
            f = self.frontier
            if not len(f) or not len(self.src_h):
                out = [np.empty(0, np.uint64)] * k
            else:
                pos = np.searchsorted(f, self.src_h)
                m = pos < len(f)
                m[m] = f[pos[m]] == self.src_h[m]
                cand = np.unique(self.dst_h[m])
                ds_ = _shard_of(cand, k)
                out = [cand[ds_ == i] for i in range(k)]
            return tuple(out) if k > 1 else out[0]

        def absorb(self, level: int, *parts) -> int:
            """First-visit update: unseen candidates get this level and
            become the next frontier. Returns the newly-visited count."""
            live = [p for p in parts if len(p)]
            if not live:
                self.frontier = np.empty(0, np.uint64)
                return 0
            cand = np.unique(np.concatenate(live))
            pos = np.searchsorted(self.nodes, cand)
            new = pos[self.depth[pos] < 0]
            self.depth[new] = level
            self.frontier = self.nodes[new]
            return len(new)

        def table(self) -> pa.Table:
            m = self.depth >= 0
            return pa.table({
                "url": pa.array(self.urls[m].tolist(), pa.string()),
                "depth": pa.array(self.depth[m].astype(np.int64)),
            })

    blocks = edges.to_arrow_refs()
    parts = [split.remote(b) for b in blocks]
    shards = [
        _DepthShard.remote(
            i,
            len(parts),
            *[p[i] for p in parts],
            *[p[k + i] for p in parts],
        )
        for i in range(k)
    ]
    seed_h = hash64(pa.array(np.asarray(seeds, object), pa.string()))
    ss = _shard_of(seed_h, k)
    n_seeded = sum(ray.get([
        shards[i].seed.remote(np.sort(seed_h[ss == i])) for i in range(k)
    ]))
    if n_seeded:
        for level in range(1, max_depth + 1):
            outs = [s.neighbors.options(num_returns=k).remote() for s in shards]
            refs = [o if k > 1 else [o] for o in outs]
            new = sum(ray.get([
                shards[i].absorb.remote(level, *[refs[s][i] for s in range(k)])
                for i in range(k)
            ]))
            if new == 0:
                break
    tables = [s.table.remote() for s in shards]
    ray.wait(tables, num_returns=len(tables))
    out = rd.from_arrow_refs(tables)
    for s in shards:
        ray.kill(s)
    return out


def _group_combos(k: np.ndarray, v: np.ndarray):
    """Per-group upper-triangle pairs: inputs sorted by (k, v); for each
    group of equal ``k`` with values v1 < v2 < ... emit every (vi, vj),
    i < j, plus the group key. Python loops over GROUPS only; each
    group's pairs come from one ``np.triu_indices`` call."""
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    outs_k, outs_x, outs_y = [], [], []
    for s, e in zip(starts, ends):
        d = e - s
        if d < 2:
            continue
        i, j = np.triu_indices(d, 1)
        vals = v[s:e]
        outs_k.append(np.full(i.size, k[s], k.dtype))
        outs_x.append(vals[i])
        outs_y.append(vals[j])
    if not outs_k:
        z = np.empty(0, np.int64)
        return z, z, z
    return (np.concatenate(outs_k), np.concatenate(outs_x),
            np.concatenate(outs_y))


def cooccurrence_edges(items: rd.Dataset, group: str, node: str) -> rd.Dataset:
    """Distinct undirected co-occurrence edges (a < b): two ``node``
    values share an edge iff they appear in the same ``group``. Stage 1
    of `triangle_counts`, exposed because every whole-graph metric
    (clustering coefficient, assortativity, reciprocity) starts here:
    ``bucketed_reduce`` by ``group`` co-locates each group, a vectorized
    combos kernel emits its distinct pairs, and a global sort +
    keep-first dedups across groups. Returns a MATERIALIZED (a, b)
    dataset safe to consume multiple times."""
    from .relational import bucketed_reduce
    from ..util import drop_empty_blocks, keep_first_sorted

    def pairs_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.nulls(0, pa.int64()),
                             "b": pa.nulls(0, pa.int64())})
        g = t[group].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[node].to_numpy(zero_copy_only=False).astype(np.int64)
        kv = np.unique(np.stack([g, n], axis=1), axis=0)
        _, x, y = _group_combos(kv[:, 0], kv[:, 1])
        t2 = np.unique(np.stack([x, y], axis=1), axis=0) if x.size else \
            np.empty((0, 2), np.int64)
        return pa.table({"a": pa.array(t2[:, 0]), "b": pa.array(t2[:, 1])})

    return keep_first_sorted(
        drop_empty_blocks(
            bucketed_reduce(items, group, pairs_of, n_buckets=16)
        ).sort(["a", "b"]),
        ["a", "b"],
    ).materialize()


def triangle_rows(items: rd.Dataset, group: str, node: str) -> rd.Dataset:
    """Enumerated triangles (pivot < x < y, each exactly once) of the
    co-occurrence graph — the shared core under :func:`triangle_counts`
    (per-node fold) and :func:`edge_support` (per-edge fold). Stages
    1-3 of the node-iterator-with-orientation plan: co-located distinct
    edges, lowest-vertex wedges, composite-key close join."""
    from ..util import drop_empty_blocks
    from .relational import bucketed_hash_join, bucketed_reduce

    edges = cooccurrence_edges(items, group, node)

    def wedges_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.nulls(0, pa.int64()),
                             "y": pa.nulls(0, pa.int64()),
                             "pivot": pa.nulls(0, pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        piv, x, y = _group_combos(a[order], b[order])
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "pivot": pa.array(piv)})

    wedges = drop_empty_blocks(
        bucketed_reduce(edges, "a", wedges_of, n_buckets=16)
    )
    exy = edges.map_batches(
        lambda t: t.rename_columns(["x", "y"]), batch_format="pyarrow"
    )
    return drop_empty_blocks(bucketed_hash_join(
        wedges, exy, key=["x", "y"], n_buckets=16
    ))


def edge_support(items: rd.Dataset, group: str, node: str) -> rd.Dataset:
    """Per-EDGE triangle support of the co-occurrence graph — the
    k-truss ingredient: every triangle (pivot < x < y) contributes one
    unit of support to each of its three edges (pivot,x), (pivot,y),
    (x,y), all already (lo, hi)-oriented by construction. Per-batch
    (a, b) pair-count partials fold into per-edge totals; only edges
    in >= 1 triangle appear (edges never in a triangle have support 0
    by definition and are the overwhelming majority at scale)."""
    import pandas as pd

    tris = triangle_rows(items, group, node)

    def edge_partial(t: pa.Table) -> pa.Table:
        p = t["pivot"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        ea = np.concatenate([p, p, x])
        eb = np.concatenate([x, y, y])
        key = (ea.astype(np.int64) << 32) | eb.astype(np.int64)
        u, c = np.unique(key, return_counts=True)
        return pa.table({"a": pa.array((u >> 32).astype(np.int64)),
                         "b": pa.array((u & 0xFFFFFFFF).astype(np.int64)),
                         "support": pa.array(c.astype(np.int64))})

    parts = (tris.map_batches(edge_partial, batch_format="pyarrow")
             .to_pandas())
    if parts.empty:
        return rd.from_arrow(pa.table({"a": pa.nulls(0, pa.int64()),
                                       "b": pa.nulls(0, pa.int64()),
                                       "support": pa.nulls(0, pa.int64())}))
    out = parts.groupby(["a", "b"], as_index=False)["support"].sum()
    return rd.from_arrow(pa.Table.from_pandas(out.astype("int64"),
                                              preserve_index=False))


def triangle_counts(items: rd.Dataset, group: str, node: str) -> rd.Dataset:
    """Per-node triangle counts of the co-occurrence graph: nodes are
    ``node`` values, with an (undirected, distinct) edge between two
    nodes that share a ``group`` (parts in the same order, tokens in the
    same doc). Classic node-iterator-with-orientation plan, every stage
    an explicit exchange:

    1. EDGES: ``bucketed_reduce`` by ``group`` co-locates each group, a
       vectorized combos kernel emits its distinct pairs (a < b), then a
       global sort + keep-first dedups across groups.
    2. WEDGES: ``bucketed_reduce`` by the LOWER endpoint ``a`` —
       orientation at the smallest vertex means each triangle is
       generated exactly once, and per-pivot work is deg(a)^2 where
       deg counts only HIGHER neighbors (the standard skew bound).
    3. CLOSE: composite-key ``bucketed_hash_join`` of wedges against the
       edge set on (x, y) — a wedge survives iff its far edge exists.
    4. COUNTS: each triangle touches 3 nodes; per-batch np.unique
       partials fold into per-node totals (bounded by |nodes|).

    Returns (node, n_triangles), nodes with >= 1 triangle only."""
    tris = triangle_rows(items, group, node)

    def node_partial(t: pa.Table) -> pa.Table:
        allv = np.concatenate([
            t[c].to_numpy(zero_copy_only=False) for c in ("pivot", "x", "y")
        ])
        u, c = np.unique(allv, return_counts=True)
        # "__cnt", not a bare name: ``node`` may itself be a short name
        # like "n" and pa.table silently drops duplicate keys
        return pa.table({node: pa.array(u.astype(np.int64)),
                         "__cnt": pa.array(c.astype(np.int64))})

    import pandas as pd

    parts = tris.map_batches(node_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return rd.from_arrow(pa.table({node: pa.nulls(0, pa.int64()),
                                       "n_triangles": pa.nulls(0, pa.int64())}))
    out = parts.groupby(node, as_index=False)["__cnt"].sum().rename(
        columns={"__cnt": "n_triangles"})
    return rd.from_arrow(pa.Table.from_pandas(out.astype("int64"),
                                              preserve_index=False))


def cheapest_paths(
    edges: rd.Dataset,
    seeds: list[str],
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    n_shards: int = 8,
    max_hops: int = 6,
    maximize: bool = False,
    seed_value: int = 0,
    seed_values: list[int] | None = None,
) -> rd.Dataset:
    """Min-COST path within ``max_hops`` edges from ``seeds`` over a
    WEIGHTED (src, dst, w) edge dataset — hop-bounded Bellman-Ford on
    the :func:`bfs_depths` shard layout (costs owned by hash(node) % K,
    edges by hash(src) % K — same hash, so a frontier node's outgoing
    edges are shard-local). One round relaxes every frontier node's
    out-edges (vectorized searchsorted + per-dst min via sorted
    reduceat), ships only per-(shard, dst) best candidates, and absorbs
    IMPROVEMENTS only — after r rounds each cost is exactly the min
    over paths of <= r edges, so ``max_hops`` rounds implement the
    recursive oracle's hop cap. Early-exits when a round improves
    nothing (the <= max_hops semantics are unaffected: no improvement
    means a fixpoint on every shorter hop count too). Seeds absent
    from the edge set are ignored (the bfs_depths contract).

    ``maximize=True`` switches the semiring from min-plus (shortest
    weighted path) to MAX-MIN (widest / bottleneck path): a path's
    value is the minimum edge weight along it, combined by max per
    node; seeds start at ``seed_value`` (pass a large constant to act
    as +infinity). Same shard layout, same improvements-only exchange
    — only the two combine directions flip.

    ``seed_values`` (aligned with ``seeds``) gives each seed its OWN
    starting value instead of the shared ``seed_value`` — the hook the
    packed-lexicographic tricks use (e.g. graph voronoi: value =
    seed rank, edge weights pre-scaled by the pack base, so min-plus
    carries (distance, nearest-seed) as one integer)."""
    k = n_shards
    sgn = -1 if maximize else 1            # lexsort picks FIRST per key

    @ray.remote(num_returns=2 * k if k > 1 else 2)
    def split(t: pa.Table):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        s = t[src].to_pandas().to_numpy()
        e = t[dst].to_pandas().to_numpy()
        w = t[weight].to_pandas().to_numpy().astype(np.int64)
        sh, eh = hash64(pa.array(s)), hash64(pa.array(e))
        es = _shard_of(sh, k)
        edge_parts = [
            {"src_h": sh[es == i], "dst_h": eh[es == i], "w": w[es == i]}
            for i in range(k)
        ]
        nh = np.concatenate([sh, eh])
        nu = np.concatenate([s, e])
        ns = _shard_of(nh, k)
        node_parts = [{"h": nh[ns == i], "url": nu[ns == i]} for i in range(k)]
        return (*edge_parts, *node_parts)

    @ray.remote
    class _CostShard:
        def __init__(self, shard: int, n_edge_parts: int, *parts):
            edge_parts = list(parts[:n_edge_parts])
            node_parts = list(parts[n_edge_parts:])
            self.shard = shard
            eh = [p for p in edge_parts if len(p["src_h"])]
            src_h = (np.concatenate([p["src_h"] for p in eh]) if eh
                     else np.empty(0, np.uint64))
            dst_h = (np.concatenate([p["dst_h"] for p in eh]) if eh
                     else np.empty(0, np.uint64))
            w = (np.concatenate([p["w"] for p in eh]) if eh
                 else np.empty(0, np.int64))
            order = np.argsort(src_h, kind="stable")
            self.src_h, self.dst_h = src_h[order], dst_h[order]
            self.w = w[order]
            nh = (np.concatenate([p["h"] for p in node_parts])
                  if node_parts else np.empty(0, np.uint64))
            nu = (np.concatenate([p["url"] for p in node_parts])
                  if node_parts else np.empty(0, object))
            self.nodes, first = np.unique(nh, return_index=True)
            self.urls = nu[first]
            self.cost = np.full(len(self.nodes), -1, np.int64)
            self.frontier = np.empty(0, np.uint64)
            self.fcost = np.empty(0, np.int64)

        def seed(self, seed_h: np.ndarray, seed_c=None) -> int:
            if len(seed_h) == 0:
                return 0
            if seed_c is None:
                seed_c = np.full(len(seed_h), seed_value, np.int64)
            # best (per combine direction) value per distinct seed hash
            order = np.lexsort((sgn * seed_c, seed_h))
            h, c = seed_h[order], seed_c[order]
            first = np.r_[True, h[1:] != h[:-1]]
            h, c = h[first], c[first]
            pos = np.searchsorted(self.nodes, h)
            ok = pos < len(self.nodes)
            ok[ok] &= self.nodes[pos[ok]] == h[ok]
            pos, c = pos[ok], c[ok]
            self.cost[pos] = c
            self.frontier = self.nodes[pos]
            self.fcost = c
            return len(pos)

        def relax(self):
            """Candidate (dst, frontier_cost + w) pairs, min-combined
            per dst locally, split by dst owner shard."""
            f, fc = self.frontier, self.fcost
            empties = [{"h": np.empty(0, np.uint64),
                        "c": np.empty(0, np.int64)}] * k
            if not len(f) or not len(self.src_h):
                out = empties
            else:
                pos = np.searchsorted(f, self.src_h)
                m = pos < len(f)
                m[m] = f[pos[m]] == self.src_h[m]
                if not m.any():
                    return tuple(empties) if k > 1 else empties[0]
                cand_h = self.dst_h[m]
                fcm = fc[np.searchsorted(f, self.src_h[m])]
                cand_c = (np.minimum(fcm, self.w[m]) if maximize
                          else fcm + self.w[m])
                order = np.lexsort((sgn * cand_c, cand_h))
                cand_h, cand_c = cand_h[order], cand_c[order]
                starts = np.flatnonzero(
                    np.r_[True, cand_h[1:] != cand_h[:-1]])
                best_h, best_c = cand_h[starts], cand_c[starts]
                ds_ = _shard_of(best_h, k)
                out = [{"h": best_h[ds_ == i], "c": best_c[ds_ == i]}
                       for i in range(k)]
            return tuple(out) if k > 1 else out[0]

        def absorb(self, *parts) -> int:
            live = [p for p in parts if len(p["h"])]
            if not live:
                self.frontier = np.empty(0, np.uint64)
                self.fcost = np.empty(0, np.int64)
                return 0
            h = np.concatenate([p["h"] for p in live])
            c = np.concatenate([p["c"] for p in live])
            order = np.lexsort((sgn * c, h))
            h, c = h[order], c[order]
            starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
            h, c = h[starts], c[starts]
            pos = np.searchsorted(self.nodes, h)
            ok = pos < len(self.nodes)
            ok[ok] &= self.nodes[pos[ok]] == h[ok]
            pos, c = pos[ok], c[ok]
            better = (self.cost[pos] < 0) | (
                (c > self.cost[pos]) if maximize
                else (c < self.cost[pos]))
            pos, c = pos[better], c[better]
            self.cost[pos] = c
            self.frontier = self.nodes[pos]
            self.fcost = c
            return len(pos)

        def table(self) -> pa.Table:
            m = self.cost >= 0
            return pa.table({
                "url": pa.array(self.urls[m].tolist(), pa.string()),
                "cost": pa.array(self.cost[m], pa.int64()),
            })

    blocks = edges.to_arrow_refs()
    parts = [split.remote(b) for b in blocks]
    shards = [
        _CostShard.remote(
            i, len(parts),
            *[p[i] for p in parts],
            *[p[k + i] for p in parts],
        )
        for i in range(k)
    ]
    seed_h = hash64(pa.array(np.asarray(seeds, object), pa.string()))
    seed_c = (np.asarray(seed_values, np.int64)
              if seed_values is not None
              else np.full(len(seed_h), seed_value, np.int64))
    ss = _shard_of(seed_h, k)
    n_seeded = sum(ray.get([
        shards[i].seed.remote(seed_h[ss == i], seed_c[ss == i])
        for i in range(k)
    ]))
    if n_seeded:
        for _hop in range(max_hops):
            outs = [s.relax.options(num_returns=k).remote() for s in shards]
            refs = [o if k > 1 else [o] for o in outs]
            improved = sum(ray.get([
                shards[i].absorb.remote(*[refs[s][i] for s in range(k)])
                for i in range(k)
            ]))
            if improved == 0:
                break
    tables = [s.table.remote() for s in shards]
    ray.wait(tables, num_returns=len(tables))
    out = rd.from_arrow_refs(tables)
    for s in shards:
        ray.kill(s)
    return out


def kcore_peel(edges: rd.Dataset, k: int, rounds: int) -> rd.Dataset:
    """Bounded K-CORE peel over a distinct undirected (a, b) edge set:
    ``rounds`` iterations of (degree count -> drop nodes with degree
    < k -> drop edges touching a dropped node), then the surviving
    degrees. A FIXED round count, not a fixpoint test, so the SQL
    restatement (the same rounds unrolled as CTEs) is equal by
    construction whether or not the peel has converged — the
    ``pagerank`` unrolled-oracle contract. Every round is fully
    distributed: per-batch np.unique endpoint partials -> ONE exchange
    by node finishes degrees and filters, and the survivor set prunes
    the edge list through two :func:`bucketed_semi_join` passes (never
    a driver-side membership set — the near-dup candidate-id lesson).
    Shuffle volume per round is O(E) edge rows + O(V) degree partials.

    Returns (node, core_degree) for every endpoint of a surviving
    edge; isolated survivors of earlier rounds drop with their last
    edge, matching the oracle's endpoint scan."""
    from .relational import bucketed_reduce, bucketed_semi_join
    from ..util import drop_empty_blocks

    def ends_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.nulls(0, pa.int64()),
                             "cnt": pa.nulls(0, pa.int64())})
        allv = np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                               t["b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(allv, return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    def degrees(es: rd.Dataset, keep_min: int | None) -> rd.Dataset:
        def finish(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.nulls(0, pa.int64()),
                                 "cnt": pa.nulls(0, pa.int64())})
            g = t.group_by("node").aggregate([("cnt", "sum")])
            out = pa.table({"node": g["node"], "cnt": g["cnt_sum"]})
            if keep_min is not None:
                out = out.filter(pc.greater_equal(out["cnt"], keep_min))
            return out

        return bucketed_reduce(
            es.map_batches(ends_partial, batch_format="pyarrow"),
            "node", finish, n_buckets=16)

    cur = edges
    for _ in range(rounds):
        alive = drop_empty_blocks(
            degrees(cur, keep_min=k).select_columns(["node"])
        ).materialize()
        if alive.count() == 0:
            # the peel annihilated the graph; later rounds are no-ops
            return rd.from_arrow(pa.table({
                "node": pa.nulls(0, pa.int64()),
                "core_degree": pa.nulls(0, pa.int64())}))
        # materialize the renames: a lazy map_batches has no schema yet
        # and bucketed_semi_join reads right.schema() for the key type
        cur = bucketed_semi_join(
            cur,
            alive.map_batches(lambda t: t.rename_columns(["a"]),
                              batch_format="pyarrow").materialize(),
            "a", n_buckets=16)
        cur = bucketed_semi_join(
            cur,
            alive.map_batches(lambda t: t.rename_columns(["b"]),
                              batch_format="pyarrow").materialize(),
            "b", n_buckets=16).materialize()

    return drop_empty_blocks(degrees(cur, keep_min=None)).map_batches(
        lambda t: t.rename_columns(["node", "core_degree"]),
        batch_format="pyarrow")
