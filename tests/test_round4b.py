"""Round-4 widening: set ops (INTERSECT/EXCEPT), generic keyed reduce,
and UNPIVOT/melt."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from crawlray.pipelines.relational import (
    bucketed_reduce,
    bucketed_set_op,
    unpivot,
)


def _rows(ds, cols):
    df = ds.to_pandas()
    return sorted(map(tuple, df[cols].itertuples(index=False)),
                  key=lambda r: tuple((v is None, v) for v in r))


def _tbl(**cols):
    return rd.from_arrow(pa.table(cols))


class TestSetOps:
    def test_intersect_dedups_and_matches_nulls(self):
        # SQL INTERSECT: distinct set semantics, NULL == NULL
        left = _tbl(k=pa.array([1, 1, 2, 3, None, None], pa.int64()))
        right = _tbl(k=pa.array([2, 2, None, 4], pa.int64()))
        out = bucketed_set_op(left, right, ["k"], op="intersect", n_buckets=4)
        got = sorted(out.to_pandas()["k"].tolist(), key=lambda v: (pd.isna(v), v))
        assert [v if not pd.isna(v) else None for v in got] == [2, None]

    def test_except_keeps_distinct_left_only(self):
        left = _tbl(k=pa.array([1, 1, 2, 3, None], pa.int64()))
        right = _tbl(k=pa.array([2, None], pa.int64()))
        out = bucketed_set_op(left, right, ["k"], op="except", n_buckets=4)
        got = sorted(out.to_pandas()["k"].dropna().astype(int).tolist())
        assert got == [1, 3]
        assert out.to_pandas()["k"].isna().sum() == 0  # NULL was in right

    def test_empty_right(self):
        left = _tbl(k=pa.array([1, 1, 2], pa.int64()))
        right = _tbl(k=pa.array([], pa.int64()))
        inter = bucketed_set_op(left, right, ["k"], op="intersect", n_buckets=2)
        assert inter.count() == 0
        exc = bucketed_set_op(left, right, ["k"], op="except", n_buckets=2)
        assert sorted(exc.to_pandas()["k"].tolist()) == [1, 2]

    def test_multi_column_rows_compare_as_whole_rows(self):
        left = _tbl(
            a=pa.array(["x", "x", "y", None], pa.string()),
            b=pa.array([1, 1, 2, None], pa.int64()),
        )
        right = _tbl(
            a=pa.array(["x", "y", None], pa.string()),
            b=pa.array([1, 99, None], pa.int64()),
        )
        out = bucketed_set_op(left, right, ["a", "b"], op="intersect",
                              n_buckets=4).to_pandas()
        got = {(r.a if pd.notna(r.a) else None,
                int(r.b) if pd.notna(r.b) else None)
               for r in out.itertuples()}
        # ('y', 2) != ('y', 99); (None, None) matches (None, None)
        assert got == {("x", 1), (None, None)}

    def test_matches_duckdb_on_random_data(self):
        import duckdb

        rng = np.random.default_rng(7)
        a = pd.DataFrame({"k": rng.integers(0, 40, 300)})
        b = pd.DataFrame({"k": rng.integers(20, 60, 300)})
        con = duckdb.connect()
        con.register("a", a)
        con.register("b", b)
        for op, sql_op in [("intersect", "INTERSECT"), ("except", "EXCEPT")]:
            want = sorted(
                con.execute(
                    f"SELECT k FROM a {sql_op} SELECT k FROM b"
                ).df()["k"].tolist()
            )
            got = bucketed_set_op(
                rd.from_pandas(a), rd.from_pandas(b), ["k"], op=op, n_buckets=8
            ).to_pandas()["k"].astype(int).tolist()
            assert sorted(got) == want, op

    def test_bad_op_raises(self):
        left = _tbl(k=pa.array([1], pa.int64()))
        with pytest.raises(ValueError):
            bucketed_set_op(left, left, ["k"], op="union")


class TestBucketedReduce:
    def test_per_key_aggregate_matches_pandas(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": rng.integers(0, 25, 500),
            "v": rng.integers(0, 100, 500),
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

        def bucket_fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            d = t.to_pandas().groupby("k", as_index=False).agg(s=("v", "sum"))
            return pa.Table.from_pandas(d, preserve_index=False)

        got = (
            bucketed_reduce(ds, "k", bucket_fn, n_buckets=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            df.groupby("k", as_index=False)
            .agg(s=("v", "sum"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64")
        )

    def test_key_colocation_lets_buckets_filter_locally(self):
        # the Q17 shape: per-key mean computed inside the bucket is global
        df = pd.DataFrame({"k": [1, 1, 1, 2, 2], "v": [1, 2, 9, 5, 5]})
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

        def below_mean(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            d = t.to_pandas()
            m = d.groupby("k")["v"].transform("mean")
            return pa.Table.from_pandas(d[d["v"] < m], preserve_index=False)

        got = _rows(bucketed_reduce(ds, "k", below_mean, n_buckets=3),
                    ["k", "v"])
        assert got == [(1, 1), (1, 2)]  # mean(k=1)=4, mean(k=2)=5


class TestUnpivot:
    def test_matches_pandas_melt(self):
        df = pd.DataFrame({
            "id": [1, 2, 3],
            "a": [10, 20, 30],
            "b": [7, 8, 9],
        })
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        got = (
            unpivot(ds, ["id"], ["a", "b"], var_name="m", value_name="v")
            .to_pandas()
            .sort_values(["id", "m"])
            .reset_index(drop=True)
        )
        want = (
            df.melt(id_vars=["id"], value_vars=["a", "b"],
                    var_name="m", value_name="v")
            .sort_values(["id", "m"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    def test_casts_to_first_value_column_type(self):
        t = pa.table({
            "id": pa.array([1], pa.int64()),
            "a": pa.array([2], pa.int64()),
            "b": pa.array([3], pa.int32()),
        })
        out = unpivot(rd.from_arrow(t), ["id"], ["a", "b"]).to_pandas()
        assert sorted(out["val"].tolist()) == [2, 3]
        assert out["val"].dtype == np.int64

    def test_row_count_is_rows_times_measures(self):
        n = 1000
        t = pa.table({
            "id": pa.array(np.arange(n)),
            "a": pa.array(np.ones(n, np.int64)),
            "b": pa.array(np.ones(n, np.int64)),
            "c": pa.array(np.ones(n, np.int64)),
        })
        assert unpivot(rd.from_arrow(t), ["id"], ["a", "b", "c"]).count() == 3 * n
