"""End-to-end crawl conformance vs the sequential oracle + resume tests.

north-rule gates: crawl-order equality, URL-seen-set equality, span-sequence
equality (kind, text, media_ref, order), byte-identical resume.
"""

import glob
import pickle
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from crawlray.engine import CrawlEngine, EngineConfig
from crawlray.oracle import simulate_crawl
from crawlray.synth import World, WorldConfig

CFG = EngineConfig(
    world=WorldConfig(n_urls=800, n_hosts=12),
    n_seeds=12,
    max_rounds=2,
    n_parts=4,
    n_frontier_parts=3,
    n_seen_shards=4,
)


def read_corpus(out_dir: str):
    from crawlray.storage import read_corpus as _rc

    return _rc(out_dir)


def tree_bytes(root: str) -> dict[str, bytes]:
    out = {}
    for p in sorted(Path(root).rglob("*")):
        if p.is_file() and p.suffix != ".tmp":
            out[str(p.relative_to(root))] = p.read_bytes()
    return out


@pytest.fixture(scope="module")
def crawl_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl") / "run")
    eng = CrawlEngine(CFG, out)
    summary = eng.run()
    oracle = simulate_crawl(World(CFG.world), CFG.n_seeds, max_rounds=CFG.max_rounds)
    return out, summary, oracle


def test_fetch_count_matches_oracle(crawl_run):
    out, summary, oracle = crawl_run
    assert summary["fetched"] == len(oracle.fetch_log)
    assert summary["rounds"] == oracle.rounds


def test_crawl_order_matches_oracle(crawl_run):
    out, _, oracle = crawl_run
    docs = read_corpus(out).to_pandas().sort_values(["round", "priority", "seq"])
    eng_log = [
        (r, p, s, u, "ok" if st == "ok" else st)
        for r, p, s, u, st in zip(
            docs["round"], docs["priority"], docs["seq"], docs["url"], docs["status"]
        )
    ]
    assert eng_log == oracle.fetch_log


def test_url_seen_set_matches_oracle(crawl_run):
    out, summary, oracle = crawl_run
    # delta snapshots: the seen set is the union of every round's deltas
    seen = set()
    for p in sorted(glob.glob(f"{out}/seen/round-*/*.bin")):
        seen.update(pickle.loads(Path(p).read_bytes()))
    assert seen == oracle.seen
    assert summary["seen_total"] == len(oracle.seen)


def test_span_sequences_match_oracle(crawl_run):
    out, _, oracle = crawl_run
    docs = read_corpus(out)
    df = docs.to_pandas()
    by_url = dict(zip(df["url"], df["spans"]))
    assert len(oracle.spans_by_url) > 50
    for url, expected in oracle.spans_by_url.items():
        got = [(d["kind"], d["text"], d["media_ref"]) for d in by_url[url]]
        assert got == expected, url
        offsets = [d["offset"] for d in by_url[url]]
        assert offsets == list(range(len(expected)))


def test_politeness_budget_respected(crawl_run):
    out, _, _ = crawl_run
    docs = read_corpus(out).to_pandas()
    per = docs.groupby(["round", "host"]).size()
    assert (per <= CFG.round_budget).all()


def test_metrics_and_lineage(crawl_run):
    out, summary, oracle = crawl_run
    import json

    manifests = sorted(glob.glob(f"{out}/manifests/manifest-*.json"))
    assert len(manifests) == summary["rounds"] + 1
    last = json.loads(Path(manifests[-1]).read_text())
    assert last["lineage"]["corpus_files"]
    assert last["lineage"]["input_frontier_files"]
    mt = pq.read_table(
        [str(Path(out) / p) for p in last["lineage"]["metric_files"]]
    ).to_pandas()
    ok_docs = sum(1 for *_, st in oracle.fetch_log if st == "ok")
    # the final round's metrics cover only that round; sum across rounds
    total_ok = 0
    for m in manifests[1:]:
        mm = json.loads(Path(m).read_text())
        total_ok += mm["totals"]["fetched_ok"]
    assert total_ok == ok_docs
    assert set(mt.columns) >= {"urls_in", "fetched_ok", "failed", "robots_denied"}


def test_error_rows_present(crawl_run):
    out, _, oracle = crawl_run
    docs = read_corpus(out).to_pandas()
    statuses = set(docs["status"])
    oracle_statuses = {st for *_, st in oracle.fetch_log}
    assert statuses == oracle_statuses
    err = docs[docs["status"] == "http_404"]
    if len(err):
        assert (err["error_type"] == "http_error").all()
        assert (err["n_spans"] == 0).all()


def test_resume_byte_identical(crawl_run, tmp_path):
    """Kill after round 0 (simulated by max_rounds=1), then resume with a
    FRESH engine to the full horizon: every artifact byte-matches the
    uninterrupted run."""
    out_full, _, _ = crawl_run
    out2 = str(tmp_path / "resume")
    import dataclasses

    cfg1 = dataclasses.replace(CFG, max_rounds=1)
    CrawlEngine(cfg1, out2).run()
    # fresh engine instance (new shard actors) resumes from the manifest
    CrawlEngine(CFG, out2).run(resume=True)
    a, b = tree_bytes(out_full), tree_bytes(out2)
    assert set(a) == set(b)
    diffs = [k for k in a if a[k] != b[k]]
    assert diffs == []


def test_resume_after_partial_round(crawl_run, tmp_path):
    """Crash mid-round: last manifest missing + partial round files on disk.
    Resume re-executes the round and converges to identical bytes."""
    out_full, summary, _ = crawl_run
    out2 = str(tmp_path / "crash")
    shutil.copytree(out_full, out2)
    last_round = summary["rounds"] - 1
    # simulate: the crash happened during `last_round` — its manifest was
    # never committed and its outputs are partial
    Path(f"{out2}/manifests/manifest-{last_round + 1:04d}.json").unlink()
    partials = sorted(glob.glob(f"{out2}/corpus/round-{last_round:04d}/*.parquet"))
    Path(partials[0]).unlink()
    for p in glob.glob(f"{out2}/frontier/round-{last_round + 1:04d}/*.parquet"):
        Path(p).unlink()
    CrawlEngine(CFG, out2).run(resume=True)
    a, b = tree_bytes(out_full), tree_bytes(out2)
    assert set(a) == set(b)
    assert [k for k in a if a[k] != b[k]] == []


def test_config_mismatch_rejected(tmp_path):
    out = str(tmp_path / "cfgmm")
    import dataclasses

    cfg1 = dataclasses.replace(CFG, max_rounds=1)
    CrawlEngine(cfg1, out).run()
    bad = dataclasses.replace(CFG, n_seeds=CFG.n_seeds + 1)
    with pytest.raises(ValueError):
        CrawlEngine(bad, out).run(resume=True)
    # seen-state layout knobs are part of the hashed config too: a resume
    # under a different seen config would misread delta blobs / shard
    # routing and silently re-crawl seen URLs
    for change in ({"seen_mode": "cuckoo"}, {"n_seen_shards": CFG.n_seen_shards + 1},
                   {"seen_capacity": CFG.seen_capacity * 2}):
        with pytest.raises(ValueError):
            CrawlEngine(dataclasses.replace(cfg1, **change), out).run(resume=True)


def test_actor_fetcher_path_matches_oracle(tmp_path):
    """rate_per_host set -> the stateful SynthFetcher actor-pool path (token
    buckets exercised); crawl results must be identical to the fused path."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_rounds=1, rate_per_host=1e9)
    out = str(tmp_path / "actorpath")
    summary = CrawlEngine(cfg, out).run()
    oracle = simulate_crawl(World(CFG.world), CFG.n_seeds, max_rounds=1)
    assert summary["fetched"] == len(oracle.fetch_log)
    docs = read_corpus(out).to_pandas().sort_values(["round", "priority", "seq"])
    eng_log = [
        (r, p, s, u, "ok" if st == "ok" else st)
        for r, p, s, u, st in zip(
            docs["round"], docs["priority"], docs["seq"], docs["url"], docs["status"]
        )
    ]
    assert eng_log == oracle.fetch_log


def test_distributed_path_byte_identical(crawl_run, tmp_path):
    """driver_threshold=0 forces the fully distributed control plane; the
    artifact tree must byte-match the driver-path run (same semantics,
    different physical plan)."""
    import dataclasses

    out_full, _, _ = crawl_run
    out2 = str(tmp_path / "dist")
    cfg = dataclasses.replace(CFG, driver_threshold=0)
    CrawlEngine(cfg, out2).run()
    a, b = tree_bytes(out_full), tree_bytes(out2)
    assert set(a) == set(b)
    assert [k for k in a if a[k] != b[k]] == []
