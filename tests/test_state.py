"""Cuckoo filter + URL-seen shard actors + politeness unit tests."""

import numpy as np
import pytest

from crawlray.state.cuckoo import CuckooFilter
from crawlray.state.politeness import HostPoliteness, TokenBucket
from crawlray.state.seen import SeenClient
from crawlray.util import hash64


def test_cuckoo_basic():
    f = CuckooFilter(capacity=10_000)
    h = np.random.RandomState(0).randint(0, 2**63, size=5000).astype(np.uint64)
    assert not f.contains_many(h).any()
    assert f.add_many(h) == len(np.unique(h))
    assert f.contains_many(h).all()


def test_cuckoo_fp_rate():
    f = CuckooFilter(capacity=20_000)
    rs = np.random.RandomState(1)
    ins = rs.randint(0, 2**63, size=10_000).astype(np.uint64)
    f.add_many(ins)
    probe = rs.randint(0, 2**63, size=20_000).astype(np.uint64)
    fp = f.contains_many(probe).mean()
    # 16-bit fingerprints, 4-slot buckets: expected fp ~ 8/2^16 ~ 0.00012
    assert fp < 0.005


def test_cuckoo_delete():
    f = CuckooFilter(capacity=1000)
    h = np.random.RandomState(3).randint(0, 2**63, size=100).astype(np.uint64)
    f.add_many(h)
    assert f.contains_many(h).all()
    f.delete_many(h[:50])
    assert not f.contains_many(h[:50]).any()
    assert f.contains_many(h[50:]).all()


def test_cuckoo_snapshot_restore():
    f = CuckooFilter(capacity=5000)
    h = np.random.RandomState(2).randint(0, 2**63, size=3000).astype(np.uint64)
    f.add_many(h)
    blob = f.snapshot()
    g = CuckooFilter.restore(blob)
    assert g.count == f.count
    assert g.contains_many(h).all()
    assert blob == g.snapshot()  # byte-stable round trip


def test_cuckoo_idempotent_add():
    f = CuckooFilter(capacity=1000)
    h = np.random.RandomState(4).randint(0, 2**63, size=50).astype(np.uint64)
    f.add_many(h)
    n = f.count
    assert f.add_many(h) == 0  # re-adding present values inserts nothing
    assert f.count == n


@pytest.mark.parametrize("mode", ["exact", "cuckoo"])
def test_seen_shards(mode):
    client = SeenClient.create(4, mode=mode, capacity_per_shard=1 << 14)
    urls = [f"https://h{i % 7}.example.org/p/{i}" for i in range(500)]
    import pyarrow as pa

    hashes = hash64(pa.array(urls))
    assert not client.contains(urls, hashes).any()
    client.add(urls, hashes)
    assert client.contains(urls, hashes).all()
    assert client.total() == 500
    other = [f"https://other{i}.org/" for i in range(500)]
    oh = hash64(pa.array(other))
    hits = client.contains(other, oh)
    assert hits.mean() < 0.01  # exact: 0; cuckoo: tiny fp rate

    # delta snapshot / restore into a fresh set of shards
    blobs = client.snapshot_all()
    client2 = SeenClient.create(4, mode=mode, capacity_per_shard=1 << 14)
    client2.restore_blobs(blobs)
    assert client2.contains(urls, hashes).all()
    assert client2.total() == 500


def test_token_bucket_disabled_mode():
    b = TokenBucket(rate=None)
    assert b.acquire() == 0.0


def test_token_bucket_rate_limits():
    b = TokenBucket(rate=1000.0, burst=2)
    waited = sum(b.acquire() for _ in range(20))
    assert waited > 0.0  # ran out of burst and actually slept


def test_host_politeness_isolates_hosts():
    p = HostPoliteness(rate_per_host=None)
    p.acquire("a.com")
    p.acquire("b.com")
    assert set(p.buckets) == {"a.com", "b.com"}


def test_per_host_qps_actually_bounded():
    """Wall-clock assertion (dev-spec rate-limit requirement): K fetches
    through one host's token bucket cannot finish faster than
    (K - burst) / rate seconds."""
    import time

    import pyarrow as pa

    from crawlray.stages.fetch import SynthFetcher
    from crawlray.synth import World, WorldConfig

    cfg = WorldConfig(n_urls=200, n_hosts=4)
    world = World(cfg)
    host = world.hosts[2]
    rate, burst, k = 200.0, 4.0, 30
    f = SynthFetcher(cfg, rate_per_host=rate)
    f.politeness.burst = burst  # default burst is 8; tighten for the bound
    f.politeness.buckets.clear()
    batch = pa.table({"url": [f"https://{host}/p/{i}" for i in range(k)],
                      "host": [host] * k})
    t0 = time.monotonic()
    out = f(batch)
    elapsed = time.monotonic() - t0
    assert out.num_rows == k
    assert elapsed >= (k - burst) / rate * 0.95   # bucket actually throttled
    assert elapsed < 5.0                          # and did not wedge


def test_per_host_buckets_refill_independently():
    """Two hosts at the same rate, interleaved: independent buckets refill
    concurrently, so total elapsed ~= one host's bound, not 2x."""
    import time

    p = HostPoliteness(rate_per_host=200.0, burst=4.0)
    k = 30
    t0 = time.monotonic()
    for i in range(k):
        p.acquire("a.com")
        p.acquire("b.com")
    elapsed = time.monotonic() - t0
    single = (k - 4.0) / 200.0
    assert elapsed >= single * 0.95
    assert elapsed < single * 1.75  # NOT serialized host-after-host


def test_hot_host_salted_selection_exact():
    """Two-phase salted per-host top-k (SURVEY §4.2): a hot host spread
    over many salt blocks still selects exactly the global per-host
    top-budget in (priority, seq) order, with one owner group per host,
    and phase A bounds the shuffle to <= budget x n_blocks rows/host."""
    import numpy as np
    import pandas as pd

    from crawlray.stages.frontier import mark_candidates, select_per_host

    rs = np.random.RandomState(7)
    budget, n_blocks = 5, 6
    rows = []
    seq = 0
    for _ in range(240):
        host = "hot.example.org" if rs.rand() < 0.5 else f"h{rs.randint(4)}.org"
        rows.append({"host": host, "priority": int(rs.randint(4)), "seq": seq})
        seq += 1
    df = pd.DataFrame(rows)
    blocks = np.array_split(df.sample(frac=1.0, random_state=3), n_blocks)
    survivors = pd.concat([mark_candidates(b, budget) for b in blocks])
    survivors = survivors[survivors["cand"]]
    per_host_surv = survivors.groupby("host").size()
    assert (per_host_surv <= budget * n_blocks).all()
    selected = pd.concat(
        [select_per_host(g, budget) for _, g in survivors.groupby("host")]
    )
    selected = selected[selected["sel"]]
    # exactness: equals the naive single-pass per-host top-budget
    exp = (
        df.sort_values(["priority", "seq"], kind="stable")
        .groupby("host", sort=False)
        .head(budget)
    )
    got_keys = set(zip(selected["host"], selected["seq"]))
    exp_keys = set(zip(exp["host"], exp["seq"]))
    assert got_keys == exp_keys
    assert (selected.groupby("host").size() <= budget).all()
