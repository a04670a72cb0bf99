"""zip_with_index / unique_keep_first / hash64 distributed utilities."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawlray.util import hash64, unique_keep_first, zip_with_index


def test_hash64_stable_and_spread():
    urls = [f"https://h{i}.org/p/{i}" for i in range(1000)]
    h1 = hash64(pa.array(urls))
    h2 = hash64(pa.array(urls))
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 1000
    # shard spread is roughly uniform
    counts = np.bincount((h1 % 8).astype(int), minlength=8)
    assert counts.min() > 60


def test_zip_with_index_follows_sort_order():
    ds = rd.from_items([{"k": int(v)} for v in np.random.RandomState(0).permutation(5000)])
    ds = ds.repartition(8).sort("k")
    indexed, n = zip_with_index(ds, "idx", start=100)
    assert n == 5000
    df = indexed.to_pandas().sort_values("idx")
    assert df["idx"].tolist() == list(range(100, 5100))
    assert df["k"].tolist() == sorted(df["k"].tolist())


def test_unique_keep_first():
    rows = []
    rs = np.random.RandomState(1)
    for i in range(3000):
        key = f"k{rs.randint(400)}"
        rows.append({"url": key, "cand_key": int(rs.randint(10**6))})
    ds = rd.from_items(rows).repartition(7)
    out = unique_keep_first(ds, "url", "cand_key").to_pandas()
    import pandas as pd

    expected = (
        pd.DataFrame(rows)
        .sort_values(["url", "cand_key"], kind="stable")
        .drop_duplicates("url", keep="first")
    )
    got = out.sort_values("url").reset_index(drop=True)
    exp = expected.sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["cand_key"].tolist() == exp["cand_key"].tolist()
