"""Round-4f units: skyline kernel and outlier prefilter safety.

The part_skyline / value_outliers / chi_square queries are covered by the
parameterized oracle gate in test_queries.py; this file pins the
vectorized `_skyline_mask` kernel against a brute-force O(n^2) dominance
reference (hypothesis), including the duplicate-co-survival rule, and the
batch-union funnel property the distributed plan relies on.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlray.queries import _skyline_mask


def _brute_skyline(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    n = len(price)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if (price[j] <= price[i] and size[j] >= size[i]
                    and (price[j] < price[i] or size[j] > size[i])):
                keep[i] = False
                break
    return keep


points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=60)


@given(points)
@settings(max_examples=200, deadline=None)
def test_skyline_matches_bruteforce(pts):
    price = np.array([p for p, _ in pts], np.int64)
    size = np.array([s for _, s in pts], np.int64)
    assert np.array_equal(_skyline_mask(price, size),
                          _brute_skyline(price, size))


@given(points, st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_skyline_of_local_unions_is_global(pts, nsplit):
    """The distributed plan's funnel property: the global skyline equals
    the skyline of the union of per-split local skylines."""
    price = np.array([p for p, _ in pts], np.int64)
    size = np.array([s for _, s in pts], np.int64)
    glob = set(map(tuple, np.c_[price, size][_skyline_mask(price, size)]))
    cand_p, cand_s = [], []
    for chunk in np.array_split(np.arange(len(pts)), nsplit):
        m = _skyline_mask(price[chunk], size[chunk])
        cand_p.extend(price[chunk][m])
        cand_s.extend(size[chunk][m])
    cp, cs = np.array(cand_p, np.int64), np.array(cand_s, np.int64)
    got = set(map(tuple, np.c_[cp, cs][_skyline_mask(cp, cs)]))
    assert got == glob


def test_skyline_duplicates_cosurvive():
    price = np.array([5, 5, 7], np.int64)
    size = np.array([9, 9, 9], np.int64)
    assert list(_skyline_mask(price, size)) == [True, True, False]


def test_skyline_empty():
    assert len(_skyline_mask(np.array([], np.int64),
                             np.array([], np.int64))) == 0


class TestBandSelfPairs:
    def _run(self, ts_us, ids, band, nb, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from crawlray.pipelines.relational import band_self_pairs

        df = pd.DataFrame({
            "ts": pd.to_datetime(np.asarray(ts_us, np.int64), unit="us"),
            "event_id": np.asarray(ids, np.int64),
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        got = band_self_pairs(ds.repartition(3), "ts", "event_id",
                              band_us=band, n_buckets=nb).to_pandas()
        return set(map(tuple, got.to_numpy()))

    @staticmethod
    def _brute(ts_us, ids, band):
        out = set()
        for i in range(len(ts_us)):
            for j in range(len(ts_us)):
                ta, tb = int(ts_us[i]), int(ts_us[j])
                if (tb > ta or (tb == ta and ids[j] > ids[i])) \
                        and tb <= ta + band:
                    out.add((ids[i], ids[j], tb - ta))
        return out

    def test_matches_bruteforce_with_ties(self, ray_session):
        rng = np.random.RandomState(7)
        ts = rng.randint(0, 3000, size=80).astype(np.int64)  # many ties
        ids = np.arange(80, dtype=np.int64)
        for band in (1, 100, 500):
            assert self._run(ts, ids, band, 4, ray_session) == \
                self._brute(ts, ids, band), band

    def test_tile_boundary_pairs(self, ray_session):
        # pairs straddling tile boundaries: tiles of width 100
        ts = np.array([99, 101, 250, 320], np.int64)
        ids = np.array([1, 2, 3, 4], np.int64)
        assert self._run(ts, ids, 100, 3, ray_session) == \
            {(1, 2, 2), (3, 4, 70)}

    def test_empty(self, ray_session):
        assert self._run(np.array([], np.int64), np.array([], np.int64),
                         100, 2, ray_session) == set()
