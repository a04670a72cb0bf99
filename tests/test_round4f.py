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
