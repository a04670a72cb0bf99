"""Round-4g units: nearest-view tie-breaks and linear-interp hull edges.

The q6_revenue / nearest_view / linear_interp queries are covered by the
parameterized oracle gate in test_queries.py at sf0.01; this file pins the
adversarial edges that real data may never exercise — equal |gap| on both
sides of a purchase, duplicate view timestamps (id-minimal run head), and
single-anchor interpolation hulls — against the same DuckDB oracle over a
purpose-built tiny events table.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.queries import (SQL_LINEAR_INTERP, SQL_NEAREST_VIEW,
                              q_linear_interp, q_nearest_view)

US = 1_000_000
BASE = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def _events(rows) -> pd.DataFrame:
    """rows: (event_id, user_id, event_type, sec_offset, value)."""
    return pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime(
            [BASE + r[3] * US for r in rows],
            unit="us").astype("datetime64[us]"),
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [float(r[4]) for r in rows],
        "props": ["{}"] * len(rows),
    })


def _write_sf(tmp_path, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(tmp_path, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True).astype("float64"))


class TestNearestViewTies:
    def test_equal_gap_both_sides_picks_min_id(self, ray_session, tmp_path):
        # views at t-10 (id 5) and t+10 (id 2): ids tie-break, not sides
        df = _events([
            (5, 1, "view", 0, 1.0),
            (9, 1, "purchase", 10, 1.0),
            (2, 1, "view", 20, 1.0),
        ])
        sf = _write_sf(tmp_path, df)
        got = q_nearest_view(sf).to_pandas()
        assert len(got) == 1
        assert int(got["nearest_view_id"][0]) == 2
        assert int(got["gap_us"][0]) == 10 * US
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_NEAREST_VIEW)))

    def test_duplicate_view_ts_run_head_is_min_id(self, ray_session,
                                                  tmp_path):
        # three views at the SAME nearest instant: min event_id wins
        df = _events([
            (7, 1, "view", 100, 1.0),
            (3, 1, "view", 100, 1.0),
            (8, 1, "view", 100, 1.0),
            (9, 1, "purchase", 103, 1.0),
            (1, 1, "view", 900, 1.0),
        ])
        sf = _write_sf(tmp_path, df)
        got = q_nearest_view(sf).to_pandas()
        assert int(got["nearest_view_id"][0]) == 3
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_NEAREST_VIEW)))

    def test_zero_gap_and_no_view_user(self, ray_session, tmp_path):
        # user 1: view at the purchase instant (gap 0); user 2: no views
        df = _events([
            (4, 1, "view", 50, 1.0),
            (6, 1, "purchase", 50, 1.0),
            (7, 2, "purchase", 50, 1.0),
            (8, 2, "click", 50, 1.0),
        ])
        sf = _write_sf(tmp_path, df)
        got = q_nearest_view(sf).to_pandas()
        assert len(got) == 1          # user 2's purchase drops (inner)
        assert int(got["event_id"][0]) == 6
        assert int(got["gap_us"][0]) == 0
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_NEAREST_VIEW)))

    @pytest.mark.parametrize("seed", [3, 11])
    def test_random_matches_oracle(self, ray_session, tmp_path, seed):
        rs = np.random.RandomState(seed)
        n = 400
        df = _events([
            (i, int(rs.randint(1, 9)),
             ["view", "purchase", "click"][rs.randint(0, 3)],
             int(rs.randint(0, 500)),   # dense: forced gap/ts ties
             1.0)
            for i in range(n)
        ])
        sf = _write_sf(tmp_path, df)
        pd.testing.assert_frame_equal(
            _norm(q_nearest_view(sf).to_pandas()),
            _norm(_oracle(sf, SQL_NEAREST_VIEW)))


class TestOrderCountDistribution:
    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        """sf0.01 has no order-less customer, so the left-join edge of
        the Q13 shape is pinned here: customers 1..5, orders only for
        1 (x3) and 2 (x1) -> histogram {0: 3, 1: 1, 3: 1}."""
        from crawlray.queries import (SQL_ORDER_COUNT_DISTRIBUTION,
                                      q_order_count_distribution)

        cust = pd.DataFrame({
            "c_custkey": [1, 2, 3, 4, 5],
            "c_name": [f"c{i}" for i in range(5)],
            "c_nationkey": [0] * 5,
            "c_acctbal": [0.0] * 5,
            "c_mktsegment": ["A"] * 5,
        })
        orders = pd.DataFrame({
            "o_orderkey": [10, 11, 12, 13],
            "o_custkey": [1, 1, 1, 2],
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * 4).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 4,
        })
        for name, df in (("customer", cust), ("orders", orders)):
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(tmp_path / f"{name}.parquet"))
        got = q_order_count_distribution(str(tmp_path)).to_pandas()
        assert dict(zip(got["c_count"], got["custdist"])) == {
            0: 3, 1: 1, 3: 1}
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tmp_path}/{t}.parquet')")
        exp = con.execute(SQL_ORDER_COUNT_DISTRIBUTION).fetchdf()
        pd.testing.assert_frame_equal(_norm(got), _norm(exp))


class TestLinearInterpHull:
    def test_single_anchor_user(self, ray_session, tmp_path):
        # one anchor day: that day = value/1, every other day NULL
        df = _events([(1, 1, "view", 9 * 86_400, 2.5)])  # day 10
        sf = _write_sf(tmp_path, df)
        got = q_linear_interp(sf).to_pandas().sort_values("day")
        assert len(got) == 31
        row = got[got["day"] == 10].iloc[0]
        assert (int(row["interp_num"]), int(row["interp_den"])) == (250, 1)
        assert got[got["day"] != 10]["interp_num"].isna().all()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_LINEAR_INTERP)))

    def test_interior_rational(self, ray_session, tmp_path):
        # anchors day 1 (100c) and day 4 (400c): day 2 = (100*2+400*1)/3
        df = _events([
            (1, 1, "view", 0, 1.0),
            (2, 1, "view", 3 * 86_400, 4.0),
        ])
        sf = _write_sf(tmp_path, df)
        got = q_linear_interp(sf).to_pandas()
        d2 = got[got["day"] == 2].iloc[0]
        assert (int(d2["interp_num"]), int(d2["interp_den"])) == (600, 3)
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_LINEAR_INTERP)))

    def test_same_day_latest_event_is_anchor(self, ray_session, tmp_path):
        # two events on day 3: the later ts (then higher id) wins
        df = _events([
            (1, 1, "view", 2 * 86_400, 1.0),
            (9, 1, "view", 2 * 86_400 + 60, 7.0),
            (5, 1, "view", 2 * 86_400 + 60, 3.0),
        ])
        sf = _write_sf(tmp_path, df)
        got = q_linear_interp(sf).to_pandas()
        d3 = got[got["day"] == 3].iloc[0]
        assert (int(d3["interp_num"]), int(d3["interp_den"])) == (700, 1)
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_LINEAR_INTERP)))
