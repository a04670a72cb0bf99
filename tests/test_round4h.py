"""Round-4h units: k-core peel and sorted-neighborhood window pairs.

The kcore / snm_candidates / word_length_histogram queries are covered by
the parameterized oracle gate in test_queries.py; this file pins the
operator kernels on edges the sf data may not exercise — the bounded peel
against a brute-force numpy reference (including graph annihilation), and
the cross-block tail carry of `sorted_window_pairs` (boundary pairs,
blocks smaller than the window).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _brute_peel(edges: set, k: int, rounds: int):
    """Sequential reference: fixed-round peel, then surviving degrees."""
    cur = set(edges)
    for _ in range(rounds):
        deg: dict = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in alive and b in alive}
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def _rand_edges(seed: int, n: int, m: int) -> set:
    rs = np.random.RandomState(seed)
    es = set()
    while len(es) < m:
        a, b = rs.randint(0, n, 2)
        if a != b:
            es.add((min(a, b), max(a, b)))
    return es


class TestKcorePeel:
    def _run(self, edges: set, k: int, rounds: int, blocks: int = 3):
        from crawlray.pipelines.graph import kcore_peel

        df = pd.DataFrame(sorted(edges), columns=["a", "b"])
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        got = kcore_peel(ds, k=k, rounds=rounds).to_pandas()
        if got.empty:   # Ray's to_pandas drops columns on 0-row data
            return {}
        return dict(zip(got["node"], got["core_degree"]))

    def test_matches_bruteforce(self, ray_session):
        for seed, k in ((3, 3), (7, 4)):
            edges = _rand_edges(seed, 25, 120)
            assert self._run(edges, k, 3) == _brute_peel(edges, k, 3), (
                seed, k)

    def test_annihilation_returns_empty(self, ray_session):
        # a path graph has max degree 2: k=3 kills everything round 1
        edges = {(i, i + 1) for i in range(10)}
        assert self._run(edges, 3, 2) == {}

    def test_triangle_core_survives(self, ray_session):
        # triangle + pendant: k=2 peels the pendant, keeps the triangle
        edges = {(1, 2), (1, 3), (2, 3), (3, 4)}
        assert self._run(edges, 2, 2) == {1: 2, 2: 2, 3: 2}


class TestSortedWindowPairs:
    def _pairs(self, blocks, w):
        from crawlray.pipelines.dedup import sorted_window_pairs

        refs = [ray.put(pa.table({"doc_id": pa.array(b, pa.int64())}))
                for b in blocks]
        got = sorted_window_pairs(
            rd.from_arrow_refs(refs), "doc_id", w).to_pandas()
        return sorted(zip(got["doc_a"], got["doc_b"]))

    @staticmethod
    def _expected(ids, w):
        return sorted((ids[i], ids[j])
                      for i in range(len(ids))
                      for j in range(i + 1, min(i + w, len(ids))))

    def test_boundary_pairs_cross_blocks(self, ray_session):
        blocks = [[10, 11, 12], [13, 14], [15, 16, 17]]
        ids = [x for b in blocks for x in b]
        assert self._pairs(blocks, 3) == self._expected(ids, 3)

    def test_block_smaller_than_window_carries(self, ray_session):
        # middle block of 1 row: a w=3 pair spans the whole block
        blocks = [[1, 2], [3], [4, 5]]
        ids = [1, 2, 3, 4, 5]
        assert self._pairs(blocks, 3) == self._expected(ids, 3)

    def test_single_block_and_w2(self, ray_session):
        assert self._pairs([[7, 8, 9]], 2) == [(7, 8), (8, 9)]


class TestEdit1Kernel:
    """_edit1 is the FastSS verify: exact agreement with true
    Levenshtein distance == 1 on adversarial short strings."""

    @staticmethod
    def _lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    def test_exhaustive_small_alphabet(self):
        from crawlray.queries import _edit1
        from itertools import product

        words = [""]
        for L in (1, 2, 3):
            words += ["".join(p) for p in product("abc", repeat=L)]
        for a in words:
            for b in words:
                assert _edit1(a, b) == (self._lev(a, b) == 1), (a, b)

    def test_transposition_is_not_edit1(self):
        from crawlray.queries import _edit1
        assert not _edit1("ab", "ba")
        assert not _edit1("Customer#01", "Customer#10")


class TestBestRunKernel:
    """q_best_run's banded prefix-min Kadane vs brute force O(n^2),
    including the cross-user band isolation the first draft got wrong."""

    @staticmethod
    def _brute(vals):
        best = vals[0] if vals else 0
        for i in range(len(vals)):
            s = 0
            for j in range(i, len(vals)):
                s += vals[j]
                best = max(best, s)
        return best

    def test_matches_bruteforce_multiuser(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        from crawlray.queries import (BEST_RUN_BASELINE_CENTS, SQL_BEST_RUN,
                                      q_best_run)

        rs = np.random.RandomState(5)
        rows = []
        eid = 0
        for u in range(1, 7):
            for _ in range(int(rs.randint(1, 40))):
                rows.append((eid, u, int(rs.randint(0, 1200))))
                eid += 1
        df = pd.DataFrame({
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime(
                [1700000000_000000 + i * 1000 for i in range(len(rows))],
                unit="us").astype("datetime64[us]"),
            "user_id": [r[1] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [r[2] / 100 for r in rows],
            "props": ["{}"] * len(rows),
        })
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "events.parquet"))
        got = q_best_run(str(tmp_path)).to_pandas()
        got = dict(zip(got["user_id"], got["best_sum"]))
        for u in sorted(set(r[1] for r in rows)):
            nets = [r[2] - BEST_RUN_BASELINE_CENTS
                    for r in rows if r[1] == u]
            assert got[u] == self._brute(nets), u
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        exp = dict(con.execute(SQL_BEST_RUN).fetchall())
        assert got == {int(k): int(v) for k, v in exp.items()}
