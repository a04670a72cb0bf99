"""Round-4l units: adversarial edges for the session-11 storage-planner
kernels (RLE runs, vbyte postings, roaring containers).

The queries are covered by the parameterized oracle gate at sf0.01; this
file pins the edges the corpus may not exercise — run detection on an
out-of-order arrival stream (the engine must sort by (ts, event_id)
inside each user before counting runs), the varint byte ladder at its
exact power-of-two boundaries, and the roaring array/bitmap switch at
the 63/64 cutoff.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawlray.queries import (
    BITMAP_ARRAY_MAX,
    BITMAP_CONTAINER,
    SQL_RLE_ENCODING_ESTIMATE,
    q_bitmap_index_estimate,
    q_rle_encoding_estimate,
)


def _events_table(rows):
    """rows: (event_id, user_id, ts_us, event_type)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })


class TestRleRuns:
    def test_out_of_order_rows_sort_before_run_detection(
            self, ray_session, tmp_path):
        """Rows are written in SHUFFLED order; runs are defined over
        the (ts, event_id) sort within each user. user 1's type
        sequence in time order is A A B A (3 runs of A-len 2, B-len 1,
        A-len 1); user 2 contributes one more A run — and a run can
        never bridge the user boundary even when types match."""
        base = 1_700_000_000_000_000
        rows = [
            (3, 1, base + 3_000_000, "click"),   # A (run 3 of user 1)
            (1, 1, base + 1_000_000, "click"),   # A
            (4, 2, base + 4_000_000, "click"),   # user 2: own run
            (0, 1, base + 0, "click"),           # A
            (2, 1, base + 2_000_000, "view"),    # B
        ]
        pq.write_table(_events_table(rows),
                       str(tmp_path / "events.parquet"))
        got = (q_rle_encoding_estimate(str(tmp_path))
               .set_index("event_type").sort_index())
        assert got.loc["click", "n_rows"] == 4
        assert got.loc["click", "n_runs"] == 3   # 2 in user 1 + user 2
        assert got.loc["click", "max_run"] == 2
        assert got.loc["view", "n_runs"] == 1
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        exp = (con.execute(SQL_RLE_ENCODING_ESTIMATE).fetchdf()
               .set_index("event_type").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))

    def test_equal_ts_breaks_by_event_id(self, ray_session, tmp_path):
        """Two rows at the SAME timestamp order by event_id — the
        deterministic tiebreak both engine and oracle state."""
        base = 1_700_000_000_000_000
        rows = [(1, 1, base, "view"), (0, 1, base, "click"),
                (2, 1, base + 1, "click")]
        pq.write_table(_events_table(rows),
                       str(tmp_path / "events.parquet"))
        got = (q_rle_encoding_estimate(str(tmp_path))
               .set_index("event_type").sort_index())
        # order: click(0), view(1), click(2) -> 3 runs, never a 2-run
        assert got.loc["click", "n_runs"] == 2
        assert got.loc["click", "max_run"] == 1
        assert got.loc["view", "n_runs"] == 1


class TestVbyteLadder:
    def test_byte_boundaries(self):
        """The varint ladder at its exact boundaries: 127 -> 1 byte,
        128 -> 2, 16383 -> 2, 16384 -> 3, 2^21 - 1 -> 3, 2^21 -> 4
        (the kernel's closed form 1 + [g>=2^7] + [g>=2^14] + [g>=2^21]
        equals ceil(bitlen/7) for g >= 1)."""
        gap = np.array([1, 127, 128, 16383, 16384,
                        (1 << 21) - 1, 1 << 21], np.int64)
        nbytes = (1 + (gap >= 128) + (gap >= 1 << 14)
                  + (gap >= 1 << 21)).astype(np.int64)
        assert nbytes.tolist() == [1, 1, 2, 2, 3, 3, 4]
        # closed form == ceil(bitlength / 7) on the tested range
        expect = [max(1, -(-int(g).bit_length() // 7)) for g in gap]
        assert nbytes.tolist() == expect


class TestBitmapCutoff:
    def test_array_bitmap_switch_at_63_64(self, ray_session, tmp_path):
        """A container with exactly 63 ids stays an ARRAY (126 bytes);
        64 ids flip it to a BITMAP (32 bytes) — the roaring decision
        the planner encodes. Container 0 gets 63 'click' ids,
        container 1 gets 64."""
        assert BITMAP_CONTAINER == 256 and BITMAP_ARRAY_MAX == 63
        base = 1_700_000_000_000_000
        rows = [(i, 1, base + i, "click") for i in range(63)]
        rows += [(256 + i, 1, base + 1000 + i, "click") for i in range(64)]
        pq.write_table(_events_table(rows),
                       str(tmp_path / "events.parquet"))
        got = q_bitmap_index_estimate(str(tmp_path))
        row = got.set_index("event_type").loc["click"]
        assert row["n_containers"] == 2
        assert row["n_array"] == 1
        assert row["n_bitmap"] == 1
        assert row["index_bytes"] == 2 * 63 + 32
