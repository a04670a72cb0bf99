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
