"""Round-4c units: bloom pre-filtered semi join + exact grouped median.

The new queries themselves (nation_share, revenue_cube,
part_median_price, big_spenders, monthly_growth) are covered by the
parameterized oracle gate in test_queries.py; this file pins the
operator-level contracts underneath them.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from crawlray.pipelines.relational import (
    _bloom_maybe,
    bucketed_anti_join,
    bucketed_semi_join,
    build_bloom,
)


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestBloomSemiJoin:
    def test_parity_int_keys_with_nulls(self, ray_session):
        l = pa.table({
            "k": pa.array(([1, 2, 3, None, 5, 6, 7, 8, 9, 10] * 40), pa.int64()),
            "v": pa.array(range(400), pa.int64()),
        })
        r = pa.table({"k": pa.array([2, 2, 5, None, 9], pa.int64())})
        plain = _sorted_df(bucketed_semi_join(
            rd.from_arrow(l), rd.from_arrow(r), "k"))
        bloom = _sorted_df(bucketed_semi_join(
            rd.from_arrow(l), rd.from_arrow(r), "k", bloom_bits=1 << 12))
        pd.testing.assert_frame_equal(plain, bloom)
        # exactly the three matching non-null keys survive
        assert set(bloom["k"]) == {2, 5, 9}

    def test_parity_string_keys(self, ray_session):
        l = pa.table({"k": pa.array(["a", "b", None, "c", "d"] * 20),
                      "v": pa.array(range(100))})
        r = pa.table({"k": pa.array(["b", "x", None, "d"])})
        plain = _sorted_df(bucketed_semi_join(
            rd.from_arrow(l), rd.from_arrow(r), "k"))
        bloom = _sorted_df(bucketed_semi_join(
            rd.from_arrow(l), rd.from_arrow(r), "k", bloom_bits=1 << 10))
        pd.testing.assert_frame_equal(plain, bloom)
        assert set(bloom["k"]) == {"b", "d"}

    def test_bloom_has_no_false_negatives(self, ray_session):
        keys = pa.array(np.arange(0, 10_000, 3, dtype=np.int64))
        bm = build_bloom(rd.from_arrow(pa.table({"k": keys})), "k", 1 << 14)
        keep = _bloom_maybe(keys, bm, 1 << 14)
        assert keep.all()  # every inserted key must probe true

    def test_bloom_drops_most_absent_keys(self, ray_session):
        present = pa.array(np.arange(0, 3_000, 3, dtype=np.int64))
        absent = pa.array(np.arange(1, 3_001, 3, dtype=np.int64))
        bm = build_bloom(rd.from_arrow(pa.table({"k": present})), "k", 1 << 16)
        keep = _bloom_maybe(absent, bm, 1 << 16)
        # 2 probes into a 64Kbit map at n=1000: fpp well under 10%
        assert keep.mean() < 0.1

    def test_null_keys_never_probe_true(self, ray_session):
        bm = build_bloom(
            rd.from_arrow(pa.table({"k": pa.array([None, None], pa.int64())})),
            "k", 1 << 10)
        assert not bm.any()  # nulls are not inserted
        keep = _bloom_maybe(pa.array([None, 1], pa.int64()), bm, 1 << 10)
        assert not keep.any()

    def test_anti_join_bypass_parity_int(self, ray_session):
        # null left key: NOT EXISTS keeps it — must survive the bypass
        l = pa.table({
            "k": pa.array(([1, 2, 3, None, 5, 6, 7, 8, 9, 10] * 40), pa.int64()),
            "v": pa.array(range(400), pa.int64()),
        })
        r = pa.table({"k": pa.array([2, 2, 5, None, 9], pa.int64())})
        plain = _sorted_df(bucketed_anti_join(
            rd.from_arrow(l), rd.from_arrow(r), "k"))
        bloom = _sorted_df(bucketed_anti_join(
            rd.from_arrow(l), rd.from_arrow(r), "k", bloom_bits=1 << 12))
        pd.testing.assert_frame_equal(plain, bloom)
        kept = set(bloom["k"].dropna())
        assert kept == {1, 3, 6, 7, 8, 10}
        assert bloom["k"].isna().sum() == 40  # null keys all kept

    def test_anti_join_bypass_parity_string(self, ray_session):
        l = pa.table({"k": pa.array(["a", "b", None, "c", "d"] * 20),
                      "v": pa.array(range(100))})
        r = pa.table({"k": pa.array(["b", "x", None, "d"])})
        plain = _sorted_df(bucketed_anti_join(
            rd.from_arrow(l), rd.from_arrow(r), "k"))
        bloom = _sorted_df(bucketed_anti_join(
            rd.from_arrow(l), rd.from_arrow(r), "k", bloom_bits=1 << 10))
        pd.testing.assert_frame_equal(plain, bloom)
        assert set(bloom["k"].dropna()) == {"a", "c"}

    def test_bloom_bits_must_be_power_of_two(self, ray_session):
        ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            build_bloom(ds, "k", 1000)


class TestCompositeKeyJoin:
    def _sides(self):
        l = pa.table({
            "u": pa.array([1, 1, 2, 2, 3, None], pa.int64()),
            "d": pa.array(["a", "b", "a", "b", "a", "a"]),
            "x": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        })
        r = pa.table({
            "u": pa.array([1, 2, 2, 4, None], pa.int64()),
            "d": pa.array(["a", "a", "z", "a", "a"]),
            "y": pa.array([100, 200, 300, 400, 500], pa.int64()),
        })
        return l, r

    def _duck_join(self, how):
        # DuckDB, not pandas.merge: merge matches NaN keys, SQL never does
        import duckdb

        l, r = self._sides()
        con = duckdb.connect()
        con.register("l", l.to_pandas())
        con.register("r", r.to_pandas())
        df = con.execute(f"""
            SELECT coalesce(l.u, r.u) AS u, coalesce(l.d, r.d) AS d, x, y
            FROM l {how} JOIN r ON l.u = r.u AND l.d = r.d
        """).df()
        return (df.sort_values(["u", "d", "x", "y"])
                .reset_index(drop=True))

    def _ray_join(self, join_type):
        from crawlray.pipelines.relational import bucketed_hash_join

        l, r = self._sides()
        df = bucketed_hash_join(
            rd.from_arrow(l), rd.from_arrow(r), key=["u", "d"],
            n_buckets=4, join_type=join_type,
        ).to_pandas()
        return (df[["u", "d", "x", "y"]]
                .sort_values(["u", "d", "x", "y"])
                .reset_index(drop=True))

    def test_inner(self, ray_session):
        got, exp = self._ray_join("inner"), self._duck_join("INNER")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # null keys never match (SQL equality)
        assert not got["u"].isna().any()

    def test_left_outer(self, ray_session):
        got, exp = self._ray_join("left outer"), self._duck_join("LEFT")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_full_outer(self, ray_session):
        got, exp = self._ray_join("full outer"), self._duck_join("FULL")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestExactQuantilesHist:
    def _check(self, vals, q_pms=(500, 900, 990), **kw):
        from crawlray.pipelines.stats import exact_quantiles_hist

        arr = pa.array(vals, pa.int64())
        ds = rd.from_arrow(pa.table({"v": arr}))
        got = exact_quantiles_hist(ds, "v", list(q_pms), **kw).to_pandas()
        clean = np.sort(np.array([v for v in vals if v is not None],
                                 dtype=np.int64))
        n = len(clean)
        for q in q_pms:
            rank = (q * n + 999) // 1000
            exp = int(clean[rank - 1])
            assert int(got.loc[got["q_pm"] == q, "v"].iloc[0]) == exp, (
                q, got)

    def test_small_domain(self, ray_session):
        self._check([5, 1, 3, 3, 2, 9, 7, 7, 7, 100])

    def test_wide_domain_multi_pass(self, ray_session):
        rng = np.random.RandomState(7)
        vals = rng.randint(-10**12, 10**12, size=5000).tolist()
        self._check(vals, n_bins=64)  # forces several refinement passes

    def test_duplicates_and_nulls(self, ray_session):
        self._check([4, 4, 4, None, 4, 1, None, 9])

    def test_empty(self, ray_session):
        from crawlray.pipelines.stats import exact_quantiles_hist

        ds = rd.from_arrow(pa.table({"v": pa.array([None, None], pa.int64())}))
        out = exact_quantiles_hist(ds, "v").to_pandas()
        assert len(out) == 0


class TestVideoFrameSampler:
    def _work(self):
        return pa.table({
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "media_ref": pa.array(["r1", "r2", "r3"], pa.string()),
            "payload": pa.array([b"abc", None, b"xyzw"], pa.binary()),
        })

    def test_fan_out_and_null_payload(self):
        from crawlray.pipelines.media import VideoFrameSampler

        out = VideoFrameSampler()(self._work())
        # d2's failed fetch emits zero frames
        assert "d2" not in set(out["doc_id"].to_pylist())
        df = out.to_pandas()
        for doc, g in df.groupby("doc_id"):
            assert 1 <= len(g) <= 5
            assert list(g["frame_idx"]) == list(range(len(g)))
            assert list(g["ts_ms"]) == [i * 1000 for i in range(len(g))]
            assert g["frame_feature"].nunique() == len(g)

    def test_deterministic(self):
        from crawlray.pipelines.media import VideoFrameSampler

        a = VideoFrameSampler()(self._work())
        b = VideoFrameSampler()(self._work())
        assert a.equals(b)

    def test_stub_backend_raises(self):
        from crawlray.pipelines.media import VideoFrameSampler

        with pytest.raises(NotImplementedError):
            VideoFrameSampler(backend="stub")(self._work())


class TestTriangleCounts:
    def test_group_combos(self):
        from crawlray.pipelines.graph import _group_combos

        k = np.array([1, 1, 1, 2, 3, 3], np.int64)
        v = np.array([10, 20, 30, 5, 7, 9], np.int64)
        g, x, y = _group_combos(k, v)
        got = sorted(zip(g.tolist(), x.tolist(), y.tolist()))
        assert got == [(1, 10, 20), (1, 10, 30), (1, 20, 30), (3, 7, 9)]

    def test_matches_brute_force(self, ray_session):
        from crawlray.pipelines.graph import triangle_counts

        rng = np.random.RandomState(3)
        groups = rng.randint(0, 40, size=400)
        nodes = rng.randint(0, 30, size=400)
        t = pa.table({"g": pa.array(groups.astype(np.int64)),
                      "n": pa.array(nodes.astype(np.int64))})
        got = triangle_counts(rd.from_arrow(t), "g", "n").to_pandas()
        got = got.sort_values("n").reset_index(drop=True)

        # brute force
        edges = set()
        from collections import defaultdict
        per_g = defaultdict(set)
        for g, n in zip(groups, nodes):
            per_g[g].add(n)
        for mem in per_g.values():
            mem = sorted(mem)
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    edges.add((mem[i], mem[j]))
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        counts = defaultdict(int)
        for a, b in edges:
            for c in adj[a] & adj[b]:
                if c > b:  # a < b < c exactly once
                    counts[a] += 1; counts[b] += 1; counts[c] += 1
        exp = pd.DataFrame(sorted(counts.items()), columns=["n", "n_triangles"])
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_no_triangles(self, ray_session):
        from crawlray.pipelines.graph import triangle_counts

        # a path graph: groups of exactly two nodes, no closures
        t = pa.table({"g": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
                      "n": pa.array([1, 2, 2, 3, 3, 4], pa.int64())})
        out = triangle_counts(rd.from_arrow(t), "g", "n").to_pandas()
        assert len(out) == 0


class TestGroupedMedian:
    def test_matches_pandas_median_contract(self, ray_session):
        from crawlray.queries import q_part_median_price

        got = q_part_median_price("/root/testdata/sf0.001").to_pandas()
        got = got.sort_values("l_partkey").reset_index(drop=True)
        import pyarrow.parquet as pq

        li = pq.read_table(
            "/root/testdata/sf0.001/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice"],
        ).to_pandas()
        li["cents"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
        # lower median: sorted[(n-1)//2] per group
        exp = (
            li.sort_values(["l_partkey", "cents"])
            .groupby("l_partkey")["cents"]
            .agg(n_items="count",
                 median_cents=lambda s: s.iloc[(len(s) - 1) // 2])
            .reset_index()
        )
        exp = exp.astype({"l_partkey": "int64", "n_items": "int64",
                          "median_cents": "int64"})
        pd.testing.assert_frame_equal(
            got[["l_partkey", "n_items", "median_cents"]], exp,
            check_dtype=False, check_exact=True)


class TestSaltedDistinctCount:
    def test_matches_pandas_and_null_semantics(self, ray_session):
        from crawlray.pipelines.relational import salted_distinct_count

        rng = np.random.default_rng(7)
        g = rng.choice(["a", "b", "c"], 5000).tolist() + [None] * 50
        v = rng.integers(0, 200, 5050).astype(object)
        v[::37] = None  # NULL values must NOT be counted (SQL semantics)
        t = pa.table({"g": pa.array(g, pa.string()),
                      "v": pa.array(v.tolist(), pa.int64())})
        out = _sorted_df(salted_distinct_count(
            rd.from_arrow(t).repartition(8), "g", "v",
            n_buckets=16, count_name="n"))
        df = t.to_pandas()
        exp = (df[df.v.notna()].groupby("g", dropna=False).v.nunique()
               .reset_index().rename(columns={"v": "n"}))
        exp["n"] = exp["n"].astype("int64")
        exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_single_bucket_and_empty(self, ray_session):
        from crawlray.pipelines.relational import salted_distinct_count

        t = pa.table({"g": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
        out = salted_distinct_count(rd.from_arrow(t), "g", "v",
                                    n_buckets=1)
        assert out.count() == 0
        assert out.schema().names == ["g", "distinct_count"]


class TestAudioChunker:
    def _work(self):
        return pa.table({
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "media_ref": pa.array(["r1", "r2", "r3"], pa.string()),
            "payload": pa.array([b"abc", None, b"xyzw"], pa.binary()),
        })

    def test_fan_out_and_null_payload(self):
        from crawlray.pipelines.media import AudioChunker

        out = AudioChunker()(self._work())
        # d2's failed fetch emits zero chunks
        assert "d2" not in set(out["doc_id"].to_pylist())
        df = out.to_pandas()
        for doc, g in df.groupby("doc_id"):
            assert 1 <= len(g) <= 4
            assert list(g["chunk_idx"]) == list(range(len(g)))
            assert list(g["start_ms"]) == [i * 2000 for i in range(len(g))]
            # all but the tail chunk run the full stride
            assert (g["duration_ms"].iloc[:-1] == 2000).all()
            assert 500 <= g["duration_ms"].iloc[-1] <= 500 + 255 * 4
            assert g["chunk_feature"].nunique() == len(g)
            assert (g["rms"] >= 0).all() and (g["rms"] < 1 << 16).all()

    def test_deterministic(self):
        from crawlray.pipelines.media import AudioChunker

        a = AudioChunker()(self._work())
        b = AudioChunker()(self._work())
        assert a.equals(b)

    def test_stub_backend_raises(self):
        from crawlray.pipelines.media import AudioChunker

        with pytest.raises(NotImplementedError):
            AudioChunker(backend="stub")(self._work())


class TestCountMin:
    def test_overestimate_and_parity(self, ray_session):
        from crawlray.pipelines.sketch import (_cm_fold, _cm_row_idx,
                                               cm_point_estimates, hash_col)

        rng = np.random.default_rng(3)
        vals = rng.zipf(1.3, 20_000)
        vals = vals[vals < 1000].astype(np.int64)
        t = pa.table({"k": pa.array(vals, pa.int64())})
        keys = pa.array([1, 2, 3, 50, 999], pa.int64())
        out = cm_point_estimates(
            rd.from_arrow(t).repartition(6), "k", keys).to_pandas()
        true = pd.Series(vals).value_counts()
        for k, est in zip(out["k"], out["est_n"]):
            tn = int(true.get(k, 0))
            assert est >= tn                       # CM never undercounts
            assert est <= tn + 2 * len(vals) / (1 << 12) * 8  # loose bound
        # distributed fold == sequential fold, bit for bit (linear merge)
        d, w = 4, 1 << 12
        tbl = _cm_fold(hash_col(pa.array(vals, pa.int64())), d, w)
        kh = hash_col(keys)
        est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
        for r in range(d):
            est = np.minimum(est, tbl[r, _cm_row_idx(kh, r, w)])
        assert list(out["est_n"]) == est.tolist()

    def test_nulls_dropped(self, ray_session):
        from crawlray.pipelines.sketch import cm_point_estimates

        t = pa.table({"k": pa.array([1, 1, None, 2, None], pa.int64())})
        out = cm_point_estimates(
            rd.from_arrow(t), "k",
            pa.array([1, 2], pa.int64())).to_pandas()
        assert list(out["est_n"]) == [2, 1]
