"""CrawlEngine — the round-based crawl driver (SURVEY.md §3.4, SCALE.md).

Each round has a DATA PLANE and a CONTROL PLANE:

Data plane (always distributed): the frontier's selected rows — a few
bytes each — are hash(url)-partitioned into ``n_parts`` fused tasks, each
doing fetch (robots gate, <=3-attempt retries) -> single-pass HTML->span
parse -> deterministic corpus+metrics partition file -> outlink candidate
extraction. Wide payloads (HTML, spans) are born, written and freed
inside one task; only tiny frontier/candidate rows cross task boundaries.

Control plane (politeness top-budget selection, URL-seen anti-join,
within-round dedup, dense seq assignment, frontier build):
- frontier <= ``driver_threshold`` rows: numpy/pandas on the driver — the
  frontier is a checkpoint-materialized table either way, and local
  vector ops beat latency-bound small-table shuffles ~10x;
- above the threshold (the multi-node regime), the identical semantics
  run as Ray Data pipelines: two-phase salted per-host top-k
  (phase A bounds every host group to budget x n_blocks — the hot-host
  strategy), shard-actor membership filter, sort + adjacent-drop dedup,
  zip_with_index seq assignment, partitioned frontier write.
Both plans emit byte-identical artifacts (asserted in tests).

Determinism contract (verified against ``crawlray.oracle.simulate_crawl``
in exact AND cuckoo modes): fetch set + logical order
``(round, priority, seq)`` + URL-seen set are exactly the sequential
oracle's; every artifact is byte-identical across re-runs and resumes
(deterministic partition files, sorted writes, schema metadata stripped,
sorted per-round seen deltas).
"""

from __future__ import annotations

import json
import os
import time as _time
from dataclasses import asdict, dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .canon import host_of
from .checkpoint import CheckpointStore, atomic_write_bytes, config_hash, part_name
from .stages.fetch import SynthFetcher
from .stages.frontier import mark_candidates
from .stages.parse import explode_outlinks, fetch_parse_batch, parse_batch
from .state.seen import SeenClient
from .synth import World, WorldConfig, h64
from .util import hash64, hash_impl_stamp, zip_with_index

FRONTIER_COLS = ["url", "host", "priority", "depth", "seq", "url_hash"]
FRONTIER_TYPES = {
    "url": pa.string(), "host": pa.string(), "priority": pa.int32(),
    "depth": pa.int32(), "seq": pa.int64(), "url_hash": pa.int64(),
}


def _uhash(t: "pa.Table") -> "np.ndarray":
    """The frontier/candidate url_hash column as uint64 (computed ONCE in
    the parallel workers / seed builder; never re-hashed on the driver)."""
    return t["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)

_TRACE = bool(os.environ.get("CRAWLRAY_TRACE"))


class _Timer:
    """Per-round step tracer (enable with CRAWLRAY_TRACE=1)."""

    def __init__(self, label: str):
        self.label = label
        self.t = _time.perf_counter()

    def lap(self, step: str) -> None:
        if _TRACE:
            now = _time.perf_counter()
            print(f"[trace {self.label}] {step}: {now - self.t:.2f}s", flush=True)
            self.t = now


@dataclass(frozen=True)
class EngineConfig:
    world: WorldConfig = WorldConfig()
    n_seeds: int = 32
    max_rounds: int = 3
    budget: int | None = None          # per-host per-round; None -> world default
    n_parts: int = 16                  # corpus partitions per round
    n_frontier_parts: int = 8
    n_seen_shards: int = 8
    seen_mode: str = "exact"           # exact (tests) | cuckoo (scale)
    seen_capacity: int = 1 << 20       # per shard, cuckoo mode
    fetch_batch_size: int = 256
    fetch_concurrency: tuple[int, int] = (2, 8)
    rate_per_host: float | None = None # wall-clock token bucket (None = off)
    # doc-corpus storage format: "auto" = Lance when the package imports
    # (north-rule corpus format), Parquet otherwise; or a concrete name
    # from crawlray.storage.FORMATS. Byte-identity e2e contract holds for
    # parquet/ipc; lance guarantees row-identity (versioned dir trees).
    corpus_format: str = "auto"
    # Frontier rounds at or below this row count run their CONTROL-PLANE
    # steps (politeness selection, membership filter, dedup, seq assignment,
    # frontier build) on the driver: the frontier is a checkpoint-
    # materialized table either way, and numpy beats a latency-bound
    # small-table shuffle by ~10x. The heavy data plane (fetch/parse/
    # corpus-write/candidate-extract) is ALWAYS distributed. Above the
    # threshold every step runs distributed (same semantics, byte-identical
    # outputs — asserted in tests). Not part of the config hash.
    driver_threshold: int = 2_000_000

    @property
    def round_budget(self) -> int:
        return self.budget if self.budget is not None else self.world.politeness_budget


def _tree_size(path: Path) -> int:
    """File size, or total size of a dataset directory (Lance corpora are
    versioned directory trees, not single files)."""
    if path.is_dir():
        return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
    return path.stat().st_size


class _DocWriter:
    """Per-corpus-partition sink: writes the round's docs + metrics files
    deterministically through the pluggable storage format
    (``crawlray.storage``; north-rule corpus format = Lance when
    importable), returns the partition's outlink candidates."""

    def __init__(self, corpus_dir: str, metrics_dir: str, round_idx: int,
                 seed: int = 0, fmt_name: str = "parquet"):
        from .storage import resolve_format

        self.corpus_dir = corpus_dir
        self.metrics_dir = metrics_dir
        self.round_idx = round_idx
        self.seed = seed
        self.fmt = resolve_format(fmt_name)

    def __call__(self, group: pa.Table) -> pa.Table:
        part_id = int(group["part_id"][0].as_py())
        docs = group.take(pc.sort_indices(group, sort_keys=[("seq", "ascending")]))
        # canonical bytes: schema metadata (e.g. pandas round-trip info)
        # varies by physical plan — never let it into checkpoint files
        docs = docs.replace_schema_metadata(None)
        fname = part_name(self.round_idx, part_id, self.fmt.ext)
        self.fmt.write(docs, Path(self.corpus_dir) / fname)
        status = docs["status"].to_pylist()
        metric = pa.table(
            {
                "round": pa.array([self.round_idx], pa.int32()),
                "part_id": pa.array([part_id], pa.int32()),
                "urls_in": pa.array([docs.num_rows], pa.int64()),
                "fetched_ok": pa.array([status.count("ok")], pa.int64()),
                "failed": pa.array(
                    [sum(s not in ("ok", "robots_denied") for s in status)], pa.int64()
                ),
                "robots_denied": pa.array([status.count("robots_denied")], pa.int64()),
                "retries": pa.array(
                    [int(pc.sum(pc.max_element_wise(pc.subtract(docs["attempts"], 1), 0)).as_py() or 0)],
                    pa.int64(),
                ),
                "spans": pa.array([int(pc.sum(docs["n_spans"]).as_py() or 0)], pa.int64()),
                "links": pa.array([int(pc.sum(docs["n_links"]).as_py() or 0)], pa.int64()),
                "new_urls": pa.array([0], pa.int64()),
                "bytes": pa.array([_tree_size(Path(self.corpus_dir) / fname)], pa.int64()),
            }
        )
        # metrics are control-plane: always parquet regardless of corpus fmt
        pq.write_table(metric, Path(self.metrics_dir) / part_name(self.round_idx, part_id))
        return explode_outlinks(docs, self.seed)


class _PartWorker:
    """Fused per-partition crawl worker: one ``groupby(part_id)`` group of
    FRONTIER rows (url/host/seq only — a few bytes each) -> fetch+parse ->
    deterministic corpus+metrics partition files -> outlink candidates.

    Only tiny frontier rows and tiny candidate rows ever cross task
    boundaries; HTML and span payloads are born, written to the corpus
    file, and freed inside a single task. This removes the round's only
    large shuffle (docs-by-part_id) entirely — the partition key is
    applied BEFORE the data gets wide.
    """

    def __init__(self, corpus_dir: str, metrics_dir: str, round_idx: int,
                 world_cfg, fmt_name: str = "parquet"):
        self.writer = _DocWriter(corpus_dir, metrics_dir, round_idx,
                                 world_cfg.seed, fmt_name)
        self.world_cfg = world_cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        group = group.take(
            pc.sort_indices(group, sort_keys=[("seq", "ascending")])
        )
        docs = fetch_parse_batch(group, self.world_cfg)
        return self.writer(docs)


@ray.remote
def _part_task(worker: "_PartWorker", group: pa.Table) -> pa.Table:
    """One corpus partition of one round (driver-path data plane)."""
    return worker(group)


@ray.remote
def _write_frontier_shards(fdir: str, round_idx: int, part: int,
                           *shards) -> None:
    """One frontier partition file assembled from its exchange shards
    (dist-path write fan-out). Empty partitions write nothing — the same
    files the driver path produces."""
    parts = [s for s in shards if s.num_rows]
    if not parts:
        return
    t = pa.concat_tables(parts).select(FRONTIER_COLS)
    t = t.take(
        pc.sort_indices(t, sort_keys=[("priority", "ascending"), ("seq", "ascending")])
    )
    pq.write_table(
        t.replace_schema_metadata(None), Path(fdir) / part_name(round_idx, part)
    )


@ray.remote
def _write_frontier_part(sub: pa.Table, fdir: str, round_idx: int,
                         part: int) -> None:
    """One frontier partition file (driver-path write fan-out). Receives
    the part's PRE-FILTERED rows: shipping the full table and filtering
    in every task made all K tasks page-fault the whole multi-hundred-MB
    plasma object concurrently (measured 4 s of mmap stampede per cold
    wave vs 0.04 s for the driver-side filter)."""
    sub = sub.take(
        pc.sort_indices(sub, sort_keys=[("priority", "ascending"), ("seq", "ascending")])
    )
    pq.write_table(
        sub.replace_schema_metadata(None), Path(fdir) / part_name(round_idx, part)
    )


# -- distributed-control-plane exchange tasks ---------------------------------
# The round-4 soak measured the original Ray-Data-operator control plane at
# 2.8x the driver path's wall (candidates+dedup alone 218 s vs ~22 s on a
# 2.5M-row frontier round): groupby().map_groups() over thousands of tiny
# host/part groups serializes (the known tiny-group pathology), and the
# per-batch _SeenFilter contains() RPCs plus a separate sort-dedup re-shipped
# every candidate three times. The dist path now uses the same explicit
# K-wide exchanges as the driver path — blocks split by key in parallel
# tasks, one task per key-range — and the same FUSED winners_batch
# (anti-join + min-cand_key dedup + insert, ONE RPC per seen shard).

def _coerce_table(t) -> pa.Table:
    return t if isinstance(t, pa.Table) else pa.Table.from_pandas(
        t, preserve_index=False
    )


def _part_id_key(t: pa.Table, n: int) -> np.ndarray:
    """Precomputed part_id column (values already in [0, n))."""
    return t["part_id"].to_numpy(zero_copy_only=False)


def _host_key(t: pa.Table, n: int) -> np.ndarray:
    """Host-hash bucket (phase-B select exchange)."""
    return (hash64(t["host"].combine_chunks()) % np.uint64(n)).astype(np.int64)


def _url_hash_key(t: pa.Table, n: int) -> np.ndarray:
    """``url_hash % n`` — the SeenClient shard routing AND the frontier
    fpart routing (same function)."""
    return (_uhash(t) % np.uint64(n)).astype(np.int64)


@ray.remote
def _split_by(t, n: int, side_empty: pa.Table, keyer):
    """Split one block into n shards by ``keyer(t, n)`` (the ONE exchange
    split task; empty input blocks become n typed empties so downstream
    concat keeps its schema)."""
    t = _coerce_table(t)
    if t.num_rows == 0:
        out = [side_empty] * n
    else:
        kv = keyer(t, n)
        out = [t.filter(pa.array(kv == i)) for i in range(n)]
    return out if n > 1 else out[0]


def _exchange_split(refs, n: int, side_empty: pa.Table, keyer) -> list[list]:
    """Fan a list of block refs into an n-way exchange: returns a list of
    per-block shard-ref rows (handles Ray's num_returns=1 unwrapping)."""
    split = [
        _split_by.options(num_returns=n).remote(r, n, side_empty, keyer)
        for r in refs
    ]
    return [[s] for s in split] if n == 1 else split


@ray.remote
def _select_bucket(budget: int, side_empty: pa.Table, *shards) -> pa.Table:
    """Exact per-host top-budget by (priority, seq) over one host-hash
    bucket — all of a bucket's hosts in ONE vectorized pandas pass,
    replacing a per-host map_groups. The ranking kernel is SHARED with
    phase A (``rank_within_host``) so the two phases cannot diverge."""
    from .stages.frontier import rank_within_host

    parts = [s for s in shards if s.num_rows]
    if not parts:
        return side_empty
    df = rank_within_host(pa.concat_tables(parts).to_pandas(), budget, "sel")
    return pa.Table.from_pandas(df, preserve_index=False)


@ray.remote
def _part_task_shards(worker: "_PartWorker", k: int, side_empty: pa.Table,
                      *shards):
    """One corpus partition assembled from its exchange shards (dist-path
    data plane), FUSED with the url_hash%k seen-shard split: the task
    emits its candidates pre-routed, so the candidate table never
    round-trips the object store whole between the fetch wave and the
    winners wave. Empty partitions write nothing — byte-identical to the
    driver path, which only spawns tasks for non-empty parts."""
    parts = [s for s in shards if s.num_rows]
    if not parts:
        out = [side_empty] * k
    else:
        cand = worker(pa.concat_tables(parts))
        if cand.num_rows == 0:
            out = [side_empty] * k
        else:
            kv = _url_hash_key(cand, k)
            out = [cand.filter(pa.array(kv == i)) for i in range(k)]
    return out if k > 1 else out[0]


@ray.remote
def _shard_winners(shard, mode: str, side_empty: pa.Table, *tbls) -> pa.Table:
    """One seen shard's round: concat the shard's candidate rows and make
    ONE fused winners_batch(insert=True) RPC (anti-join vs prior rounds +
    within-round min-cand_key dedup + insert) — the same single-call-per-
    shard shape as the driver path, so delta snapshots stay identical."""
    parts = [t for t in tbls if t.num_rows]
    if not parts:
        return side_empty
    cand = pa.concat_tables(parts).combine_chunks()
    urls = cand["url"].to_pylist() if mode == "exact" else None
    ck = cand["cand_key"].to_numpy(zero_copy_only=False)
    mask = ray.get(shard.winners_batch.remote(urls, _uhash(cand), ck, True))
    return cand.filter(pa.array(mask))


class CrawlEngine:
    def __init__(self, cfg: EngineConfig, out_dir: str):
        self.cfg = cfg
        self.store = CheckpointStore(out_dir)
        self.world = World(cfg.world)
        # every knob that changes on-disk state layout or crawl semantics
        # must be hashed: a resume under a different seen config would
        # misread delta blobs / route hashes to shards contains() never
        # queries, silently re-crawling seen URLs
        from .storage import resolve_format

        self.corpus_fmt = resolve_format(cfg.corpus_format)
        self.cfg_hash = config_hash(
            {"world": asdict(cfg.world), "n_seeds": cfg.n_seeds,
             "budget": cfg.round_budget, "n_parts": cfg.n_parts,
             "n_frontier_parts": cfg.n_frontier_parts,
             "seen_mode": cfg.seen_mode, "n_seen_shards": cfg.n_seen_shards,
             "seen_capacity": cfg.seen_capacity,
             # RESOLVED name, not "auto": resuming an auto=parquet tree in
             # an env where lance became importable must be rejected
             "corpus_format": self.corpus_fmt.name,
             # url_hash / cuckoo fingerprints persist in checkpoints and
             # are trusted verbatim on resume; a changed hash64
             # implementation (e.g. a polars upgrade) must reject like
             # any other config drift, not silently mis-route shards
             "hash_impl": hash_impl_stamp()}
        )
        self.seen = SeenClient.create(
            cfg.n_seen_shards, mode=cfg.seen_mode, capacity_per_shard=cfg.seen_capacity
        )
        # (round_idx, table): the next round's frontier, kept in memory by
        # the driver path so round r+1 skips re-reading the files round r
        # just wrote. The FILES remain the durable checkpoint (resume
        # reads them); downstream steps are row-order-insensitive (total
        # sorts / hash routing), so cache vs read-back is byte-identical.
        self._frontier_cache: tuple[int, pa.Table] | None = None

    def shutdown(self) -> None:
        """Kill the URL-seen shard actors (for ephemeral engines created
        inside long-lived driver processes). The engine is unusable after."""
        for shard in self.seen.shards:
            ray.kill(shard, no_restart=True)

    # -- helpers ---------------------------------------------------------
    def _rel(self, paths: list[str]) -> list[str]:
        root = self.store.root
        return [str(Path(p).relative_to(root)) for p in paths]

    def _abs(self, paths: list[str]) -> list[str]:
        root = self.store.root
        return [str(root / p) for p in paths]

    def _filter(self, ds: rd.Dataset, expr) -> rd.Dataset:
        return ds.map_batches(
            lambda t: t.filter(expr(t)), batch_format="pyarrow"
        )

    def _write_frontier(self, ds: rd.Dataset, round_idx: int) -> list[str]:
        """Deterministic frontier partition files for ``round_idx`` — an
        explicit fpart exchange (split blocks in parallel, ONE sorted
        write task per non-empty partition). The previous
        groupby(fpart).map_groups writer sort-shuffled the whole frontier
        through Ray Data first (38.5 s on the soak's 2.5M-row round vs
        ~2 s as an exchange); same files, same bytes."""
        fdir = self.store.frontier_dir(round_idx)
        k = self.cfg.n_frontier_parts
        f_empty = pa.table(
            {c: pa.nulls(0, FRONTIER_TYPES[c]) for c in FRONTIER_COLS}
        )
        split = _exchange_split(ds.to_arrow_refs(), k, f_empty, _url_hash_key)
        ray.get([
            _write_frontier_shards.remote(str(fdir), round_idx, p,
                                          *[s[p] for s in split])
            for p in range(k)
        ])
        return sorted(str(p) for p in fdir.glob("*.parquet"))

    def _snapshot_seen(self, round_idx: int) -> list[str]:
        sdir = self.store.seen_dir(round_idx)
        files = []
        for i, blob in enumerate(self.seen.snapshot_all()):
            p = sdir / f"shard-{i:03d}.bin"
            atomic_write_bytes(p, blob)
            files.append(str(p))
        return files

    # -- lifecycle -------------------------------------------------------
    def _bootstrap(self) -> dict:
        seeds = self.world.seed_table(self.cfg.n_seeds)
        self.seen.add(seeds["url"].to_pylist(), _uhash(seeds))
        frontier_files = self._write_frontier_driver(seeds, 0)
        seen_files = self._snapshot_seen(0)
        manifest = {
            "next_round": 0,
            "next_seq": seeds.num_rows,
            "config_hash": self.cfg_hash,
            "frontier_files": self._rel(frontier_files),
            "seen_files": self._rel(seen_files),
            "lineage": {"corpus_files": [], "metric_files": [],
                        "input_frontier_round": -1},
            "totals": {"seeds": seeds.num_rows},
        }
        from .checkpoint import atomic_write_json

        atomic_write_json(self.store.manifest_path(0), manifest)
        return manifest

    def run(self, resume: bool = True) -> dict:
        manifest = self.store.latest_manifest() if resume else None
        if manifest is not None and manifest.get("config_hash") != self.cfg_hash:
            raise ValueError("checkpoint was produced by a different config")
        if manifest is None:
            manifest = self._bootstrap()
        else:
            # seen_files = cumulative sorted list of per-round delta files
            self.seen.restore_files(self._abs(sorted(manifest["seen_files"])))

        summary = {"rounds": 0, "fetched": 0, "new_urls": 0}
        r = manifest["next_round"]
        while r < self.cfg.max_rounds and manifest["frontier_files"]:
            manifest = self._run_round(r, manifest)
            summary["rounds"] += 1
            summary["fetched"] += manifest["totals"]["urls_in"]
            summary["new_urls"] += manifest["totals"]["new_urls"]
            r += 1
        summary["seen_total"] = self.seen.total()
        summary["next_seq"] = manifest["next_seq"]
        summary["last_round"] = r - 1
        return summary

    # -- one round -------------------------------------------------------
    def _run_round(self, r: int, manifest: dict) -> dict:
        """Dispatch: control-plane on driver for checkpoint-sized frontiers,
        fully distributed above ``driver_threshold`` (or when the wall-clock
        politeness actor pool is on). Both paths produce byte-identical
        artifacts."""
        n_frontier = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in self._abs(manifest["frontier_files"])
        )
        if self.cfg.rate_per_host is None and n_frontier <= self.cfg.driver_threshold:
            return self._run_round_driver(r, manifest)
        return self._run_round_dist(r, manifest)

    def _write_frontier_driver(self, t: pa.Table, round_idx: int) -> list[str]:
        """Driver-side frontier partition writer — byte-identical layout to
        the distributed ``_FrontierWriter`` (same partitioning key, same
        per-file sort, same schema/order). The per-part filter+sort+write
        fan out as parallel tasks over one object-store copy of the
        table — the driver only computes the part ids."""
        fdir = self.store.frontier_dir(round_idx)
        if t.num_rows:
            t = t.select(FRONTIER_COLS)
            fp = (_uhash(t) % np.uint64(self.cfg.n_frontier_parts)).astype(np.int32)
            ray.get([
                _write_frontier_part.remote(
                    t.filter(pa.array(fp == part)), str(fdir), round_idx,
                    int(part),
                )
                for part in np.unique(fp)
            ])
        return sorted(str(p) for p in fdir.glob("*.parquet"))

    def _run_round_driver(self, r: int, manifest: dict) -> dict:
        import pandas as pd

        cfg = self.cfg
        budget = cfg.round_budget
        next_seq = manifest["next_seq"]
        tm = _Timer(f"r{r}")

        cache, self._frontier_cache = self._frontier_cache, None
        if cache is not None and cache[0] == r:
            fr = cache[1]
        else:
            fr = pq.read_table(
                self._abs(manifest["frontier_files"]), columns=FRONTIER_COLS
            )
        # exact per-host politeness budget in (priority, seq) order
        order = np.lexsort((fr["seq"].to_numpy(), fr["priority"].to_numpy()))
        hosts_sorted = pd.Series(fr["host"].to_pandas().to_numpy()[order])
        ranks = hosts_sorted.groupby(hosts_sorted, sort=False).cumcount().to_numpy()
        sel = np.zeros(fr.num_rows, dtype=bool)
        sel[order] = ranks < budget
        fetch_tbl = fr.filter(pa.array(sel))
        deferred_tbl = fr.filter(pa.array(~sel))
        tm.lap("politeness-select")

        # data plane: distributed fused per-partition workers
        world_cfg = cfg.world
        part = (_uhash(fetch_tbl) % np.uint64(cfg.n_parts)).astype(np.int32)
        fetch_tbl = fetch_tbl.append_column(
            "round", pa.array(np.full(fetch_tbl.num_rows, r, np.int32))
        ).append_column("part_id", pa.array(part))
        cdir, mdir = self.store.corpus_dir(r), self.store.metrics_dir(r)
        worker = _PartWorker(str(cdir), str(mdir), r, world_cfg,
                             self.corpus_fmt.name)
        # explicit task fan-out: the fetch table is already on the driver, so
        # partitioning it ourselves guarantees n_parts-wide parallelism
        # (a Ray Data groupby re-coalesces small sorted data into a handful
        # of target_max_block_size blocks and quietly serializes map_groups)
        pid = fetch_tbl["part_id"].to_numpy(zero_copy_only=False)
        futs = [
            _part_task.remote(worker, fetch_tbl.filter(pa.array(pid == p)))
            for p in np.unique(pid)
        ]
        cand_tbls = [t for t in ray.get(futs) if t.num_rows]
        tm.lap("fetch+parse+write+extract")

        if cand_tbls:
            cand = pa.concat_tables(cand_tbls).combine_chunks()
            tm.lap("cand-concat")
            # url_hash was computed inside the parallel extract workers;
            # membership + within-round min-cand_key dedup run fused inside
            # the K seen shards in parallel (UrlSeenShard.winners_batch) —
            # the driver never hashes or lexsorts the candidate set
            hashes = _uhash(cand)
            ck = cand["cand_key"].to_numpy(zero_copy_only=False)
            urls_list = (
                cand["url"].to_pylist() if self.seen.mode == "exact" else None
            )
            # insert=True: winners are marked seen inside the same shard
            # RPC — the winner set is exactly what gets inserted, so the
            # old separate seen.add() round re-shipped the same hashes
            mask = self.seen.winners(urls_list, hashes, ck, insert=True)
            tm.lap("cand-winners")
            winners_idx = np.flatnonzero(mask)
            # crawl order: dense seq by ascending cand_key
            winners_idx = winners_idx[np.argsort(ck[winners_idx], kind="stable")]
            win = cand.take(pa.array(winners_idx))
            tm.lap("cand-take")
            n_new = win.num_rows
            new_tbl = pa.table(
                {
                    "url": win["url"],
                    "host": win["host"],
                    "priority": win["priority"],
                    "depth": win["depth"],
                    "seq": pa.array(
                        np.arange(next_seq, next_seq + n_new, dtype=np.int64)
                    ),
                    "url_hash": win["url_hash"],
                }
            )
            tm.lap("dedup+seq")
        else:
            n_new = 0
            new_tbl = deferred_tbl.select(FRONTIER_COLS).slice(0, 0)

        next_frontier = pa.concat_tables(
            [deferred_tbl.select(FRONTIER_COLS), new_tbl]
        )
        frontier_files = self._write_frontier_driver(next_frontier, r + 1)
        self._frontier_cache = (r + 1, next_frontier.select(FRONTIER_COLS))
        tm.lap("write-frontier")
        return self._commit_round(r, manifest, frontier_files, next_seq, n_new, tm)

    def _commit_round(
        self, r: int, manifest: dict, frontier_files: list[str],
        next_seq: int, n_new: int, tm: "_Timer",
    ) -> dict:
        seen_files = sorted(
            set(manifest["seen_files"]) | set(self._rel(self._snapshot_seen(r + 1)))
        )
        tm.lap("snapshot-seen")
        metric_files = sorted(str(p) for p in self.store.metrics_dir(r).glob("*.parquet"))
        # lineage must follow the RESOLVED corpus format: ipc partitions are
        # .arrow files and lance partitions are .lance directories — a
        # "*.parquet" glob here silently recorded [] for exactly the
        # north-rule production format
        corpus_files = sorted(
            str(p) for p in self.store.corpus_dir(r).glob(f"part-*{self.corpus_fmt.ext}")
        )
        totals = {"urls_in": 0, "fetched_ok": 0, "failed": 0,
                  "robots_denied": 0, "spans": 0, "links": 0}
        if metric_files:
            mt = pq.read_table(metric_files)
            for k in totals:
                totals[k] = int(pc.sum(mt[k]).as_py() or 0)
        totals["new_urls"] = n_new

        new_manifest = {
            "next_round": r + 1,
            "next_seq": next_seq + n_new,
            "config_hash": self.cfg_hash,
            "frontier_files": self._rel(frontier_files),
            "seen_files": seen_files,
            "lineage": {
                "corpus_files": self._rel(corpus_files),
                "metric_files": self._rel(metric_files),
                "input_frontier_round": r,
                "input_frontier_files": manifest["frontier_files"],
            },
            "totals": totals,
        }
        from .checkpoint import atomic_write_json

        atomic_write_json(self.store.manifest_path(r + 1), new_manifest)
        return new_manifest

    def _run_round_dist(self, r: int, manifest: dict) -> dict:
        cfg = self.cfg
        budget = cfg.round_budget
        next_seq = manifest["next_seq"]

        tm = _Timer(f"r{r}")
        frontier = rd.read_parquet(
            self._abs(manifest["frontier_files"]), columns=FRONTIER_COLS
        )
        marked = frontier.map_batches(
            lambda df: mark_candidates(df, budget), batch_format="pandas"
        ).materialize()
        tm.lap("phaseA-materialize")
        survivors = self._filter(marked, lambda t: t["cand"])
        # phase B as an explicit host-hash exchange: B bucket tasks, each
        # marking sel for ALL its hosts in one vectorized pass (a per-host
        # map_groups over thousands of tiny groups serializes — measured
        # 8-15 s/round on the 2.5M-frontier soak, <1 s as an exchange)
        n_b = cfg.n_frontier_parts
        marked_empty = pa.table({
            **{c: pa.nulls(0, FRONTIER_TYPES[c]) for c in FRONTIER_COLS},
            "cand": pa.nulls(0, pa.bool_()),
        })
        sel_empty = marked_empty.append_column("sel", pa.nulls(0, pa.bool_()))
        bsplit = _exchange_split(survivors.to_arrow_refs(), n_b,
                                 marked_empty, _host_key)
        sel_refs = [
            _select_bucket.remote(budget, sel_empty, *[s[i] for s in bsplit])
            for i in range(n_b)
        ]
        selected = rd.from_arrow_refs(sel_refs)
        tm.lap("phaseB-select")

        world_cfg = cfg.world
        n_parts = cfg.n_parts

        def prep_fetch(t: pa.Table) -> pa.Table:
            t = t.select(FRONTIER_COLS)
            part = (_uhash(t) % np.uint64(n_parts)).astype(np.int32)
            return t.append_column("round", pa.array(np.full(t.num_rows, r, np.int32))) \
                    .append_column("part_id", pa.array(part))

        fetchset = self._filter(selected, lambda t: t["sel"]).map_batches(
            prep_fetch, batch_format="pyarrow"
        )

        cand_empty = pa.table({
            "url": pa.nulls(0, pa.string()),
            "cand_key": pa.nulls(0, pa.int64()),
            "depth": pa.nulls(0, pa.int32()),
            "host": pa.nulls(0, pa.string()),
            "priority": pa.nulls(0, pa.int32()),
            "url_hash": pa.nulls(0, pa.int64()),
        })
        cdir, mdir = self.store.corpus_dir(r), self.store.metrics_dir(r)
        k = cfg.n_seen_shards
        if cfg.rate_per_host is not None:
            # wall-clock politeness -> stateful fetcher actor pool (token
            # buckets live per actor), separate parse stage
            fetched = fetchset.map_batches(
                SynthFetcher,
                fn_constructor_args=(world_cfg, cfg.rate_per_host),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=cfg.fetch_concurrency,
                num_cpus=1,
            )
            docs = fetched.map_batches(parse_batch, batch_format="pyarrow")
            doc_writer = _DocWriter(str(cdir), str(mdir), r, world_cfg.seed,
                                    self.corpus_fmt.name)
            cand_refs = docs.groupby("part_id").map_groups(
                lambda g: doc_writer(g), batch_format="pyarrow"
            ).to_arrow_refs()
            ssplit = _exchange_split(cand_refs, k, cand_empty, _url_hash_key)
        else:
            # fused per-partition worker as an explicit part_id exchange:
            # n_parts-wide fan-out (one task per partition), fetch+parse+
            # write+extract-candidates inside each task — the wide doc
            # payloads never enter a shuffle or the object store. The
            # previous groupby(part_id).map_groups() re-coalesced the
            # frontier into a handful of blocks and quietly serialized
            # the fetch (soak: 218 s for this stage; the exchange matches
            # the driver path's explicit fan-out).
            worker = _PartWorker(str(cdir), str(mdir), r, world_cfg,
                                 self.corpus_fmt.name)
            fetch_empty = pa.table({
                **{c: pa.nulls(0, FRONTIER_TYPES[c]) for c in FRONTIER_COLS},
                "round": pa.nulls(0, pa.int32()),
                "part_id": pa.nulls(0, pa.int32()),
            })
            psplit = _exchange_split(fetchset.to_arrow_refs(), n_parts,
                                     fetch_empty, _part_id_key)
            ssplit = [
                _part_task_shards.options(num_returns=k).remote(
                    worker, k, cand_empty, *[s[i] for s in psplit])
                for i in range(n_parts)
            ]
            if k == 1:
                ssplit = [[s] for s in ssplit]
        tm.lap("fetch+parse+write+extract")

        # membership + within-round min-cand_key dedup + insert, fused in
        # ONE winners_batch RPC per seen shard (UrlSeenShard.winners_batch)
        # — identical call shape to the driver path, reached through a
        # shard-hash exchange instead of a driver-side concat. Replaces
        # the old per-batch contains() RPC waves + sort-dedup + separate
        # add round (three extra trips over every candidate).
        win_refs = [
            _shard_winners.remote(self.seen.shards[i], self.seen.mode,
                                  cand_empty, *[s[i] for s in ssplit])
            for i in range(k)
        ]
        win_ds = rd.from_arrow_refs(win_refs)
        tm.lap("candidates+winners")
        # crawl order: dense seq by ascending cand_key (cand_key is unique
        # per discovery event, so the sort is deterministic)
        ordered = win_ds.sort("cand_key")
        indexed, n_new = zip_with_index(ordered, "rank")
        tm.lap("order+index")

        def finalize_new(t: pa.Table) -> pa.Table:
            # host/priority/url_hash were computed in the parallel explode
            return pa.table(
                {
                    "url": t["url"],
                    "host": t["host"],
                    "priority": t["priority"],
                    "depth": t["depth"],
                    "seq": pc.add(t["rank"], pa.scalar(next_seq, pa.int64())),
                    "url_hash": t["url_hash"],
                }
            )

        new_ds = indexed.map_batches(finalize_new, batch_format="pyarrow").materialize()
        tm.lap("finalize-new")

        deferred = self._filter(marked, lambda t: pc.invert(t["cand"])).select_columns(
            FRONTIER_COLS
        ).union(
            self._filter(selected, lambda t: pc.invert(t["sel"])).select_columns(
                FRONTIER_COLS
            )
        )
        next_frontier = deferred.union(new_ds)
        frontier_files = self._write_frontier(next_frontier, r + 1)
        tm.lap("write-frontier")
        return self._commit_round(r, manifest, frontier_files, next_seq, n_new, tm)
