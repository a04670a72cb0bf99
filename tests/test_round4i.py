"""Round-4i units: adversarial edges for the late round-4 kernels.

The queries are covered by the parameterized oracle gate at sf0.01; this
file pins edges that corpus may not exercise — rolling-median partial
windows and duplicate timestamps, the daily-concentration decile cut
under total ties, half-life for single-day users, record-high monotone
runs, and two-hop reach on a path graph — each against the same DuckDB
oracle over purpose-built tiny tables.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
BASE = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def _events(rows) -> pd.DataFrame:
    """rows: (event_id, user_id, event_type, sec_offset, value)."""
    return pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([BASE + r[3] * US for r in rows],
                             unit="us").astype("datetime64[us]"),
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [float(r[4]) for r in rows],
        "props": ["{}"] * len(rows),
    })


def _write(tmp_path, df: pd.DataFrame, name: str = "events") -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _oracle(tmp_path, sql: str, tables=("events",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True).astype("float64"))


class TestRollingMedianEdges:
    def test_partial_windows_and_duplicate_ts(self, ray_session, tmp_path):
        from crawlray.queries import SQL_ROLLING_MEDIAN, q_rolling_median

        # duplicate timestamps (event_id breaks ties) + <5-row windows
        rows = [(1, 1, "view", 10, 3.00), (2, 1, "view", 10, 1.00),
                (3, 1, "view", 10, 2.00), (4, 1, "view", 20, 10.00),
                (5, 2, "view", 5, 7.77)]
        sf = _write(tmp_path, _events(rows))
        got = q_rolling_median(sf).to_pandas()
        byid = dict(zip(got["event_id"], got["med2"]))
        assert byid[1] == 2 * 300           # window [300]
        assert byid[2] == 300 + 100         # window [300, 100]
        assert byid[3] == 2 * 200           # window [300, 100, 200]
        assert byid[4] == 200 + 300         # even window of 4
        assert byid[5] == 2 * 777           # fresh user
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_ROLLING_MEDIAN)))


class TestDailyConcentrationEdges:
    def test_all_equal_values_tie_at_cut(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_DAILY_CONCENTRATION,
                                      q_daily_concentration)

        # 10 users, identical daily value: cut ties -> ALL count as top
        rows = [(i, i, "view", i, 5.00) for i in range(10)]
        sf = _write(tmp_path, _events(rows))
        got = q_daily_concentration(sf).to_pandas()
        assert (got["top_decile_cents"] == got["total_cents"]).all()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_DAILY_CONCENTRATION)))


class TestHalflifeEdges:
    def test_single_day_user_and_even_split(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_HALFLIFE_HISTOGRAM,
                                      q_halflife_histogram)

        day = 86_400
        rows = [
            (1, 1, "view", 0, 1.0),              # single-event user: hl 0
            (2, 2, "view", 0, 1.0),              # 2 events on day 1,
            (3, 2, "view", 4 * day, 1.0),        # half at first -> hl 0
            (4, 3, "view", 0, 1.0),              # 1 of 3 on day 1,
            (5, 3, "view", 2 * day, 1.0),        # 2/3 crosses half on
            (6, 3, "view", 2 * day + 60, 1.0),   # day 3 -> hl 2
        ]
        sf = _write(tmp_path, _events(rows))
        got = q_halflife_histogram(sf).to_pandas()
        h = dict(zip(got["half_life_days"], got["n_users"]))
        assert h == {0: 2, 2: 1}
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_HALFLIFE_HISTOGRAM)))


class TestRecordHighEdges:
    def test_monotone_and_flat_runs(self, ray_session, tmp_path):
        from crawlray.queries import SQL_RECORD_HIGHS, q_record_highs

        rows = [
            # user 1: strictly increasing -> every event is a record
            (1, 1, "view", 0, 1.0), (2, 1, "view", 10, 2.0),
            (3, 1, "view", 20, 3.0),
            # user 2: flat -> ties are NOT records (strict >)
            (4, 2, "view", 0, 5.0), (5, 2, "view", 10, 5.0),
            # user 3: decreasing -> only the first
            (6, 3, "view", 0, 9.0), (7, 3, "view", 10, 1.0),
        ]
        sf = _write(tmp_path, _events(rows))
        got = q_record_highs(sf).to_pandas()
        h = dict(zip(got["user_id"], got["n_records"]))
        assert h == {1: 3, 2: 1, 3: 1}
        pd.testing.assert_frame_equal(
            _norm(got), _norm(_oracle(sf, SQL_RECORD_HIGHS)))


class TestTwoHopReachPath:
    def test_path_graph(self, ray_session, tmp_path):
        """Path a-b-c-d (via shared orders): reach(a) = {b, c},
        reach(b) = {a, c, d}, all from the 2-step plan."""
        from crawlray.queries import SQL_TWO_HOP_REACH, q_two_hop_reach

        # parts must satisfy the % 5 == 0 filter
        a, b, c, d = 5, 10, 15, 20
        li = pd.DataFrame({
            "l_orderkey": [1, 1, 2, 2, 3, 3],
            "l_partkey": [a, b, b, c, c, d],
            "l_suppkey": [0] * 6,
            "l_linenumber": np.arange(6, dtype=np.int32),
            "l_quantity": [1.0] * 6,
            "l_extendedprice": [1.0] * 6,
            "l_discount": [0.0] * 6,
            "l_tax": [0.0] * 6,
            "l_returnflag": ["N"] * 6,
            "l_linestatus": ["O"] * 6,
            "l_shipdate": pd.to_datetime(
                ["2024-01-01"] * 6).astype("datetime64[us]"),
        })
        _write(tmp_path, li, "lineitem")
        got = q_two_hop_reach(str(tmp_path)).to_pandas()
        h = dict(zip(got["l_partkey"], got["n_reach"]))
        assert h == {a: 2, b: 3, c: 3, d: 2}
        pd.testing.assert_frame_equal(
            _norm(got),
            _norm(_oracle(tmp_path, SQL_TWO_HOP_REACH, ("lineitem",))))
