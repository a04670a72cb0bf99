"""Round-4l units: adversarial edges for the session-11 kernels
(RLE runs, vbyte postings, roaring containers, Huffman, apportionment,
closest pair, token-budget selection).

The queries are covered by the parameterized oracle gate at sf0.01; this
file pins the edges the corpus may not exercise — run detection on an
out-of-order arrival stream, the varint byte ladder at its exact
power-of-two boundaries, the roaring array/bitmap switch at 63/64, the
Huffman tie contract (Kraft equality, deterministic equal-weight trees),
the largest-remainder tie seat, the closest pair that phase 1's
x-neighbor window cannot see, the d0 == 0 duplicate regime, and the
token-budget boundary-doc split on both sides of the budget.
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


class TestHuffman:
    def _lengths(self, weights):
        """Driver-side merge loop restated (weights: name -> w)."""
        import heapq
        depth = {t: 0 for t in weights}
        heap = [(w, t, (t,)) for t, w in weights.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            w1, l1, m1 = heapq.heappop(heap)
            w2, l2, m2 = heapq.heappop(heap)
            for t in m1 + m2:
                depth[t] += 1
            heapq.heappush(heap, (w1 + w2, min(l1, l2), m1 + m2))
        return depth

    def test_textbook_example(self):
        d = self._lengths({"a": 8, "b": 4, "c": 2, "d": 1, "e": 1})
        assert d == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 4}

    def test_kraft_equality_and_beats_fixed_width(self):
        """A Huffman code is a FULL prefix tree: sum 2^-len == 1; and
        on a skewed distribution it beats the 3-bit fixed code."""
        w = {"a": 100, "b": 20, "c": 5, "d": 2, "e": 1}
        d = self._lengths(w)
        assert sum(2.0 ** -d[t] for t in w) == 1.0
        huff = sum(w[t] * d[t] for t in w)
        assert huff < 3 * sum(w.values())

    def test_tie_break_deterministic(self):
        """Four equal weights: the (weight, min-name) rank pairs a+b
        and c+d first — depths all 2, never a skewed 1/2/3/3 tree."""
        d = self._lengths({"a": 1, "b": 1, "c": 1, "d": 1})
        assert d == {"a": 2, "b": 2, "c": 2, "d": 2}


class TestApportionment:
    def test_seats_sum_and_remainder_tie(self, ray_session, tmp_path):
        """Crafted tie: nations ALPHA and BETA have identical counts
        (same remainder) and only one leftover seat — the name ASC
        tiebreak must give it to ALPHA on both engine and oracle; the
        published seats always sum to exactly 97."""
        import duckdb
        from crawlray.queries import SQL_APPORTIONMENT, q_apportionment

        nat = pa.table({
            "n_nationkey": pa.array([0, 1, 2], pa.int32()),
            "n_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
            "n_regionkey": pa.array([0, 0, 0], pa.int32()),
        })
        # counts 3, 3, 2 (total 8): 97*3//8 = 36 r3 for BOTH ALPHA and
        # BETA, 97*2//8 = 24 r2 for GAMMA -> floors sum 96, one
        # leftover seat, remainder tie between ALPHA and BETA.
        ck, nk = [], []
        kid = 0
        for nkey, c in [(0, 3), (1, 3), (2, 2)]:
            for _ in range(c):
                ck.append(kid); nk.append(nkey); kid += 1
        cust = pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "c_name": pa.array([f"c{i}" for i in ck]),
            "c_nationkey": pa.array(nk, pa.int32()),
            "c_acctbal": pa.array([0.0] * len(ck)),
            "c_mktsegment": pa.array(["BUILDING"] * len(ck)),
        })
        pq.write_table(nat, str(tmp_path / "nation.parquet"))
        pq.write_table(cust, str(tmp_path / "customer.parquet"))
        got = (q_apportionment(str(tmp_path))
               .set_index("n_name").sort_index())
        assert int(got["seats"].sum()) == 97
        assert got.loc["ALPHA", "seats"] == 37   # 36 + the tie seat
        assert got.loc["BETA", "seats"] == 36
        assert got.loc["GAMMA", "seats"] == 24
        con = duckdb.connect()
        for t in ["nation", "customer"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tmp_path}/{t}.parquet')")
        exp = (con.execute(SQL_APPORTIONMENT).fetchdf()
               .set_index("n_name").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestClosestPair:
    def _emb_table(self, pts):
        """pts: (vec_id, x, y) -> embeddings parquet schema (8-dim)"""
        return pa.table({
            "vec_id": pa.array([p[0] for p in pts], pa.int64()),
            "embedding": pa.array(
                [[np.float32(p[1]), np.float32(p[2])] + [np.float32(0)] * 6
                 for p in pts], pa.list_(pa.float32())),
            "label": pa.array([0] * len(pts), pa.int32()),
        })

    def _oracle(self, tmp_path):
        from crawlray.queries import SQL_CLOSEST_PAIR
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/embeddings.parquet')")
        return con.execute(SQL_CLOSEST_PAIR).fetchdf()

    def test_true_pair_far_apart_in_x_rank(self, ray_session, tmp_path):
        """The closest pair sits 9 apart in x-rank (outside phase 1's
        4-neighbor window), so only the phase-2 cell exchange can find
        it — x nearly equal across all points, y spread except the
        planted pair."""
        from crawlray.queries import q_closest_pair
        pts = [(i, i * 1e-6, float(i)) for i in range(9)]
        pts.append((9, 9 * 1e-6, 0.0001))    # ~coincides with vec 0 in y
        pq.write_table(self._emb_table(pts),
                       str(tmp_path / "embeddings.parquet"))
        got = q_closest_pair(str(tmp_path))
        assert (int(got["id_a"][0]), int(got["id_b"][0])) == (0, 9)
        exp = self._oracle(tmp_path)
        assert got.equals(exp.astype(got.dtypes.to_dict()))

    def test_exact_duplicates_d0_zero_regime(self, ray_session, tmp_path):
        """Two duplicate coordinate groups: the d0 == 0 regime must
        publish the LEXICOGRAPHICALLY smallest zero-distance pair
        (1, 5), not whichever duplicate phase 1 happened to see."""
        from crawlray.queries import q_closest_pair
        pts = [(7, 2.0, 2.0), (8, 2.0, 2.0),      # dup group B
               (1, 1.0, 1.0), (5, 1.0, 1.0),      # dup group A (smaller ids)
               (3, 9.0, 9.0)]
        pq.write_table(self._emb_table(pts),
                       str(tmp_path / "embeddings.parquet"))
        got = q_closest_pair(str(tmp_path))
        assert (int(got["id_a"][0]), int(got["id_b"][0])) == (1, 5)
        assert float(got["dist2"][0]) == 0.0
        exp = self._oracle(tmp_path)
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestTokenBudgetSelect:
    def _docs_table(self, rows):
        """rows: (doc_id, text)"""
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })

    def _run(self, tmp_path):
        import duckdb as dk
        from crawlray.queries import (SQL_TOKEN_BUDGET_SELECT,
                                      q_token_budget_select)
        got = q_token_budget_select(str(tmp_path))
        con = dk.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = con.execute(SQL_TOKEN_BUDGET_SELECT).fetchdf()
        assert got.equals(exp.astype(got.dtypes.to_dict()))
        return got

    def test_all_docs_fit_under_budget(self, ray_session, tmp_path):
        rows = [(1, "the cat"), (2, "a dog runs")]
        pq.write_table(self._docs_table(rows),
                       str(tmp_path / "documents.parquet"))
        got = self._run(tmp_path)
        assert int(got["boundary_doc_id"][0]) == -1
        assert int(got["n_docs_full"][0]) == 2

    def test_boundary_doc_split(self, ray_session, tmp_path):
        """Budget 10_000: 2 small all-stopword docs (score 1000) fit
        fully; one 20_000-token zero-stopword filler (score 0) is the
        boundary and is taken fractionally."""
        filler = " ".join(["word"] * 20000)
        rows = [(10, "the of to in"),          # 4 toks, score 1000
                (11, "a and is it the"),       # 5 toks, score 1000
                (12, filler)]                  # 20000 toks, score 0
        pq.write_table(self._docs_table(rows),
                       str(tmp_path / "documents.parquet"))
        got = self._run(tmp_path)
        assert int(got["n_docs_full"][0]) == 2
        assert int(got["tokens_full"][0]) == 9
        assert int(got["boundary_doc_id"][0]) == 12
        assert int(got["boundary_take"][0]) == 10_000 - 9
        assert int(got["boundary_score"][0]) == 0


class TestMultiPatternAndBorder:
    def _docs(self, rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })

    def test_self_overlapping_pattern_counts_agree(
            self, ray_session, tmp_path, monkeypatch):
        """'aa' in 'aaaa' is 3 overlapping matches but BOTH engines
        count left-to-right non-overlapping (2) — the documented
        contract, pinned on a pattern where the two conventions
        differ."""
        import crawlray.queries as Q
        monkeypatch.setattr(Q, "MULTI_PATTERNS", ["aa"])
        pq.write_table(self._docs([(1, "aaaa"), (2, "aabaa")]),
                       str(tmp_path / "documents.parquet"))
        got = Q.q_multi_pattern_counts(str(tmp_path))
        assert int(got["n_occurrences"][0]) == 2 + 2
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = con.execute(Q._multi_pattern_sql()).fetchdf()
        assert got.reset_index(drop=True).equals(
            exp.astype(got.dtypes.to_dict()).reset_index(drop=True))

    def test_border_period_edges(self, ray_session, tmp_path):
        """'abcabc' has border 3 / period 3; 'aaaa' has border 3
        (k < n strictly) / period 1; a 70-repeat border caps at the
        documented 64 on BOTH engines; a borderless doc publishes 0."""
        from crawlray.queries import (SQL_TEXT_BORDER_PERIOD,
                                      q_text_border_period)
        rows = [(1, "abcabc"), (2, "aaaa"), (3, "a" * 200),
                (4, "xyzw")]
        pq.write_table(self._docs(rows),
                       str(tmp_path / "documents.parquet"))
        got = (q_text_border_period(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        assert got.loc[1, "border_len"] == 3 and got.loc[1, "period"] == 3
        assert got.loc[2, "border_len"] == 3 and got.loc[2, "period"] == 1
        assert got.loc[3, "border_len"] == 64      # the documented cap
        assert got.loc[4, "border_len"] == 0 and got.loc[4, "period"] == 0
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = (con.execute(SQL_TEXT_BORDER_PERIOD).fetchdf()
               .set_index("doc_id").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestCoverageFamily:
    def _docs(self, rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })

    def test_set_cover_greedy_order_and_tie(self, ray_session, tmp_path):
        """sA covers bigrams {a b, b c}; sB covers {a b}; sC covers
        {c d}. Greedy picks sA (gain 2) then the NAME tiebreak between
        sB (gain 0 -> excluded) and sC (gain 1): step 2 = sC, and sB
        never appears because its marginal gain is zero."""
        from crawlray.queries import _set_cover_sql, q_set_cover_sources
        rows = [(1, "a b c", "sA"), (2, "a b", "sB"), (3, "c d", "sC")]
        pq.write_table(self._docs(rows),
                       str(tmp_path / "documents.parquet"))
        got = q_set_cover_sources(str(tmp_path))
        assert got["source"].tolist() == ["sA", "sC"]
        assert got["new_terms"].tolist() == [2, 1]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = con.execute(_set_cover_sql()).fetchdf()
        assert got.reset_index(drop=True).equals(
            exp.astype(got.dtypes.to_dict()).reset_index(drop=True))

    def test_heaps_counts_first_occurrence_only(
            self, ray_session, tmp_path):
        """doc 0 introduces 2 bigrams; doc 30 repeats one of them and
        adds 1 new; the k=25 checkpoint sees only doc 0's vocabulary
        and k=50 sees 3 — repeats never recount."""
        from crawlray.queries import _heaps_sql, q_heaps_vocab_growth
        rows = [(0, "x y z", "s"), (30, "x y w q", "s")]
        pq.write_table(self._docs([(r[0], r[1], r[2]) for r in rows]),
                       str(tmp_path / "documents.parquet"))
        got = q_heaps_vocab_growth(str(tmp_path)).set_index("k")
        assert got.loc[25, "vocab_size"] == 2     # "x y", "y z"
        assert got.loc[50, "vocab_size"] == 4     # + "y w", "w q"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = con.execute(_heaps_sql()).fetchdf().set_index("k")
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestSkybandAndHarmonic:
    def test_skyband_k_boundary(self, ray_session, tmp_path):
        """A part with exactly 3 dominators is OUT (k = 3 strictly
        less); 2 dominators stays in with the exact count; equal
        (price, size) twins never dominate each other."""
        from crawlray.queries import q_skyband_parts
        rows = [  # (key, size, price)
            (1, 10, 1.00),   # dominates everything below
            (2, 10, 1.00),   # twin of 1 — neither dominates the other
            (3, 9, 2.00),    # dominated by 1, 2          -> n = 2, in
            (4, 8, 3.00),    # dominated by 1, 2, 3       -> n = 3, out
            (5, 7, 4.00),    # dominated by 1, 2, 3, 4    -> n = 4, out
        ]
        t = pa.table({
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_size": pa.array([r[1] for r in rows], pa.int64()),
            "p_retailprice": pa.array([r[2] for r in rows]),
            "p_name": pa.array(["p"] * len(rows)),
            "p_brand": pa.array(["b"] * len(rows)),
        })
        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = q_skyband_parts(str(tmp_path)).set_index("p_partkey")
        assert sorted(got.index) == [1, 2, 3]
        assert got.loc[1, "n_dominators"] == 0
        assert got.loc[2, "n_dominators"] == 0
        assert got.loc[3, "n_dominators"] == 2
        import duckdb as dk
        from crawlray.queries import SQL_SKYBAND_PARTS
        con = dk.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/part.parquet')")
        exp = (con.execute(SQL_SKYBAND_PARTS).fetchdf()
               .set_index("p_partkey").sort_index())
        assert got.sort_index().equals(exp.astype(got.dtypes.to_dict()))

    def test_harmonic_fraction_equals_lcm_arithmetic(self):
        """The engine's Fraction fold over a depth histogram equals
        the oracle's hsum/840 gcd reduction for every depth <= 8 —
        the shared-constant contract (840 = lcm(1..8))."""
        import math
        from fractions import Fraction
        hist = {1: 3, 2: 5, 3: 1, 7: 2, 8: 4}
        harm = sum((Fraction(n, d) for d, n in hist.items()),
                   Fraction(0))
        hsum = sum(840 // d * n for d, n in hist.items())
        g = math.gcd(hsum, 840)
        assert (harm.numerator, harm.denominator) == (hsum // g, 840 // g)


class TestWatermarkTriggers:
    def test_late_updates_after_firing(self, ray_session, tmp_path):
        """Out-of-order stream: window H fires at the arrival of an
        (H+1)-hour event past the 60s allowance; the two H-window
        events arriving AFTER that are late updates. Window H+1 never
        fires (nothing reaches its end + 60s)."""
        from crawlray.queries import (SQL_WATERMARK_TRIGGER_COUNTS,
                                      q_watermark_trigger_counts)
        H = 1_700_000_000 // 3600 * 3600          # aligned hour (sec)
        rows = [  # (event_id = arrival order, ts_sec)
            (0, H + 10),          # window H, before firing
            (1, H + 3600 + 90),   # window H+1; ts >= end(H)+60 -> fires H
            (2, H + 1800),        # window H, late update
            (3, H + 3000),        # window H, late update
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows],
                           pa.timestamp("us")),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = (q_watermark_trigger_counts(str(tmp_path))
               .set_index("window_hour").sort_index())
        h = H // 3600
        assert got.loc[h, "n_events"] == 3
        assert got.loc[h, "n_late_updates"] == 2
        assert got.loc[h, "fired"] == 1
        assert got.loc[h + 1, "fired"] == 0
        assert got.loc[h + 1, "n_late_updates"] == 0
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        exp = (con.execute(SQL_WATERMARK_TRIGGER_COUNTS).fetchdf()
               .set_index("window_hour").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestEncodingAdvisor:
    def test_rle_and_dict_winners(self, ray_session, tmp_path):
        """l_returnflag is constant (one run per order -> RLE wins);
        l_linestatus alternates every row (runs = rows -> RLE loses,
        2-value dictionary wins). Engine == oracle on bytes AND the
        argmin label."""
        from crawlray.queries import (_encoding_advisor_sql,
                                      q_encoding_advisor)
        n = 4096
        t = pa.table({
            "l_orderkey": pa.array([i // 512 for i in range(n)],
                                   pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([i % 512 + 1 for i in range(n)],
                                     pa.int32()),
            "l_quantity": pa.array([1.0] * n),
            "l_extendedprice": pa.array([1.0] * n),
            "l_discount": pa.array([0.0] * n),
            "l_tax": pa.array([0.0] * n),
            "l_returnflag": pa.array(["R"] * n),
            "l_linestatus": pa.array(["F" if i % 2 == 0 else "O"
                                      for i in range(n)]),
            "l_shipdate": pa.array([1_700_000_000_000_000] * n,
                                   pa.timestamp("us")),
        })
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))
        got = q_encoding_advisor(str(tmp_path)).set_index("col")
        # returnflag: 8 orders x 1 run = 8 runs -> 24 B beats
        # dict (1 + 4096/8 = 513) and plain (4096)
        assert got.loc["l_returnflag", "rle_bytes"] == 24
        assert got.loc["l_returnflag", "dict_bytes"] == 513
        assert got.loc["l_returnflag", "best"] == "rle"
        # linestatus: 4096 runs -> 12288 B; dict 2 + 512 = 514 -> dict
        assert got.loc["l_linestatus", "rle_bytes"] == 3 * 4096
        assert got.loc["l_linestatus", "dict_bytes"] == 514
        assert got.loc["l_linestatus", "best"] == "dict"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/lineitem.parquet')")
        exp = (con.execute(_encoding_advisor_sql()).fetchdf()
               .set_index("col").sort_index())
        assert got.sort_index().equals(exp.astype(got.dtypes.to_dict()))


class TestMinhashErrorAudit:
    def test_identical_docs_match_all_perms(self, ray_session, tmp_path):
        """An exact duplicate pair must collide in LSH, score exact
        jaccard 1.0 and agree on ALL 128 permutations; a disjoint doc
        sharing no shingles never reaches n_match 128."""
        from crawlray.queries import q_minhash_error_audit
        text = "a b c d e f g h i j"
        rows = [(1, text), (2, text), (3, "z y x w v u t s r q")]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = q_minhash_error_audit(str(tmp_path))
        dup = got[(got["a"] == 1) & (got["b"] == 2)]
        assert len(dup) == 1
        assert float(dup["jaccard"].iloc[0]) == 1.0
        assert int(dup["n_match"].iloc[0]) == 128
        others = got[(got["a"] != 1) | (got["b"] != 2)]
        assert (others["n_match"] < 128).all()


class TestSimhashAuditAndSweep:
    def test_duplicate_docs_hamming_zero_full_overlap(
            self, ray_session, tmp_path):
        """Exact duplicates: hamming 0, word sets identical
        (n_inter == n_union); a doc with disjoint words that happens
        to band-collide would carry its true (smaller) overlap."""
        from crawlray.queries import q_simhash_error_audit
        text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(1, text), (2, text)]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = q_simhash_error_audit(str(tmp_path))
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["a"], r["b"], r["hamming"]) == (1, 2, 0)
        assert r["n_inter"] == r["n_union"] == 8

    def test_sweep_thresholds_split_differently(
            self, ray_session, tmp_path):
        """One user, events at 0s, 1000s, 2500s: gaps 1000 and 1500 —
        T=900 gives 3 sessions (all singletons), T=1800 gives 1
        session of 3, T=3600 the same; strict '>' means a gap of
        EXACTLY 900 would not break."""
        from crawlray.queries import q_session_timeout_sweep
        base = 1_700_000_000_000_000
        rows = [(0, 1, base, "view"), (1, 1, base + 1000_000_000, "view"),
                (2, 1, base + 2500_000_000, "view")]
        pq.write_table(_events_table(rows),
                       str(tmp_path / "events.parquet"))
        got = (q_session_timeout_sweep(str(tmp_path))
               .set_index("timeout_sec"))
        assert got.loc[900, "n_sessions"] == 3
        assert got.loc[900, "n_singletons"] == 3
        assert got.loc[1800, "n_sessions"] == 1
        assert got.loc[1800, "n_singletons"] == 0
        assert got.loc[3600, "n_sessions"] == 1
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        from crawlray.queries import _session_sweep_sql
        exp = (con.execute(_session_sweep_sql()).fetchdf()
               .set_index("timeout_sec").sort_index())
        assert got.sort_index().equals(exp.astype(got.dtypes.to_dict()))


class TestEdgeSupportAndBacklog:
    def test_k4_clique_every_edge_in_two_triangles(
            self, ray_session, tmp_path):
        """One order holding 4 parts makes a K4: all 6 edges have
        support exactly 2 (each edge closes with either of the other
        2 vertices)."""
        from crawlray.queries import q_edge_support
        parts = [0, 5, 10, 15]               # % 5 == 0 keeps them
        n = len(parts)
        t = pa.table({
            "l_orderkey": pa.array([1] * n, pa.int64()),
            "l_partkey": pa.array(parts, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
            "l_quantity": pa.array([1.0] * n),
            "l_extendedprice": pa.array([1.0] * n),
            "l_discount": pa.array([0.0] * n),
            "l_tax": pa.array([0.0] * n),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array([1_700_000_000_000_000] * n,
                                   pa.timestamp("us")),
        })
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))
        got = q_edge_support(str(tmp_path)).to_pandas()
        assert len(got) == 6
        assert (got["support"] == 2).all()

    def test_inverted_interval_never_open(self, ray_session, tmp_path):
        """An order whose lineitem fully shipped BEFORE the order date
        (the synthetic corpus contains such rows) is open on no day —
        engine and oracle agree on the crafted case."""
        import duckdb as dk
        from crawlray.queries import (SQL_OPEN_ORDERS_DAILY,
                                      q_open_orders_daily)
        D = 86_400_000_000
        base_day = 20_000
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O", "O"]),
            "o_totalprice": pa.array([1.0, 1.0]),
            "o_orderdate": pa.array([base_day * D, base_day * D],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2),
        })
        li = pa.table({
            "l_orderkey": pa.array([1, 2], pa.int64()),
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 1], pa.int32()),
            "l_quantity": pa.array([1.0, 1.0]),
            "l_extendedprice": pa.array([1.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0]),
            "l_tax": pa.array([0.0, 0.0]),
            "l_returnflag": pa.array(["N", "N"]),
            "l_linestatus": pa.array(["O", "O"]),
            # order 1 ships 2 days later; order 2 shipped 3 days BEFORE
            "l_shipdate": pa.array([(base_day + 2) * D,
                                    (base_day - 3) * D],
                                   pa.timestamp("us")),
        })
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        got = q_open_orders_daily(str(tmp_path))
        con = dk.connect()
        for name in ["orders", "lineitem"]:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                        f"read_parquet('{tmp_path}/{name}.parquet')")
        exp = con.execute(SQL_OPEN_ORDERS_DAILY).fetchdf()
        # order 1 open for days base..base+2; order 2 never
        m = got.set_index("day")["n_open"]
        assert m.loc[base_day] == 1 and m.loc[base_day + 2] == 1
        assert (got["n_open"] >= 0).all()
        assert got.reset_index(drop=True).equals(
            exp.astype(got.dtypes.to_dict()).reset_index(drop=True))


class TestDbscanClusters:
    def test_two_blobs_and_isolated_core(self, ray_session, tmp_path):
        """Blob A (6 identical points, keys 1-6) and blob B (5 points,
        keys 11-15) are two clusters labeled by their min ids; a star
        center (key 20) has 4 border satellites (non-core) — it is a
        CORE with no core neighbor, so it must survive as a singleton
        cluster, and the satellites get no label."""
        import duckdb as dk
        from crawlray.queries import SQL_DBSCAN_CLUSTERS, q_dbscan_clusters
        rows = []   # (key, size, price_dollars)
        rows += [(k, 10, 10.00) for k in range(1, 7)]        # blob A
        rows += [(k, 30, 30.00) for k in range(11, 16)]      # blob B
        rows += [(20, 50, 50.00),                            # star core
                 (21, 49, 49.00), (22, 51, 51.00),
                 (23, 49, 51.00), (24, 51, 49.00)]
        t = pa.table({
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_size": pa.array([r[1] for r in rows], pa.int64()),
            "p_retailprice": pa.array([float(r[2]) for r in rows]),
            "p_name": pa.array(["p"] * len(rows)),
            "p_brand": pa.array(["b"] * len(rows)),
        })
        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = q_dbscan_clusters(str(tmp_path)).set_index("p_partkey")
        assert sorted(got.index) == [1, 2, 3, 4, 5, 6,
                                     11, 12, 13, 14, 15, 20]
        assert (got.loc[1:6, "cluster"] == 1).all()
        assert (got.loc[11:15, "cluster"] == 11).all()
        assert got.loc[20, "cluster"] == 20
        con = dk.connect()
        con.execute(f"CREATE VIEW part AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/part.parquet')")
        exp = (con.execute(SQL_DBSCAN_CLUSTERS).fetchdf()
               .set_index("p_partkey").sort_index())
        assert got.sort_index().equals(exp.astype(got.dtypes.to_dict()))


class TestLcsPairs:
    def test_dp_equals_bruteforce(self):
        """The driver's rolling-array DP equals the O(2^n) brute-force
        LCS on random short sequences — the engine-side ground truth
        (the oracle cross-checks via chain-extension independently)."""
        import itertools
        from crawlray.queries import q_lcs_user_pairs  # noqa: F401
        rng = np.random.default_rng(3)

        def dp_lcs(a, b):
            dp = np.zeros(len(b) + 1, np.int64)
            for x in a:
                prev = 0
                for j, y in enumerate(b):
                    cur = int(dp[j + 1])
                    dp[j + 1] = prev + 1 if x == y else max(dp[j + 1],
                                                            dp[j])
                    prev = cur
            return int(dp[-1])

        def brute(a, b):
            best = 0
            for r in range(len(a), 0, -1):
                for comb in itertools.combinations(a, r):
                    # is comb a subsequence of b?
                    it = iter(b)
                    if all(c in it for c in comb):
                        return r
            return best

        for _ in range(20):
            a = list(rng.integers(0, 4, rng.integers(1, 9)))
            b = list(rng.integers(0, 4, rng.integers(1, 9)))
            assert dp_lcs(a, b) == brute(a, b)


class TestModularityAndChunks:
    def test_modularity_signs(self):
        """Q's exact rational sign sanity on hand graphs: a graph
        whose only edges are within-brand has positive Q; a perfect
        bipartite cross-brand graph has negative Q (the closed form
        (4 m e_in - sum d_c^2) / 4 m^2 on paper)."""
        import math

        def q(m, e_in, degs):
            num = 4 * m * e_in - sum(d * d for d in degs)
            den = 4 * m * m
            g = math.gcd(abs(num), den)
            return num // g, den // g

        # two brands, each a single within-edge: m=2, e_in=2,
        # degrees per brand 2 and 2 -> Q = (16-8)/16 = 1/2
        assert q(2, 2, [2, 2]) == (1, 2)
        # one cross edge only: m=1, e_in=0, degrees 1,1 -> Q = -1/2
        assert q(1, 0, [1, 1]) == (-1, 2)

    def test_chunk_plan_boundaries(self, ray_session, tmp_path):
        """n = 64 is one chunk; n = 65 spills into a second chunk of
        17 tokens (64-token window, 48 stride); empty doc has zero
        chunks — engine == oracle on the crafted table."""
        import duckdb as dk
        from crawlray.queries import SQL_PASSAGE_CHUNKS, q_passage_chunks
        rows = [(1, " ".join(["w"] * 64)), (2, " ".join(["w"] * 65)),
                (3, ""), (4, "one two")]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = (q_passage_chunks(str(tmp_path)).to_pandas()
               .set_index("doc_id").sort_index())
        assert got.loc[1, "n_chunks"] == 1
        assert got.loc[1, "last_chunk_tokens"] == 64
        assert got.loc[2, "n_chunks"] == 2
        assert got.loc[2, "last_chunk_tokens"] == 17
        assert got.loc[3, "n_chunks"] == 0
        assert got.loc[4, "n_chunks"] == 1
        con = dk.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        exp = (con.execute(SQL_PASSAGE_CHUNKS).fetchdf()
               .set_index("doc_id").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestPlannerAndProfileOps:
    def test_session_length_quantile_ranks(self, ray_session, tmp_path):
        """Sessions of lengths 1, 2, 3, 4 (one user, gaps > 30 min
        between groups): p50 = 2nd smallest = 2, p90 = ceil(3.6) =
        4th = 4 — the ceil-rank convention."""
        from crawlray.queries import q_session_length_quantiles
        base = 1_700_000_000_000_000
        rows, eid, t = [], 0, base
        for ln in [1, 2, 3, 4]:
            for _ in range(ln):
                rows.append((eid, 1, t, "view"))
                eid += 1
                t += 60_000_000          # 1 min inside session
            t += 3_600_000_000           # 1 h gap -> new session
        pq.write_table(_events_table(rows),
                       str(tmp_path / "events.parquet"))
        got = (q_session_length_quantiles(str(tmp_path))
               .set_index("quantile_pm"))
        assert got.loc[500, "k"] == 2 and got.loc[500, "session_len"] == 2
        assert got.loc[900, "k"] == 4 and got.loc[900, "session_len"] == 4

    def test_inclusion_dep_violation_counts(self, ray_session, tmp_path):
        """customer keys {1,2,3}; orders reference {1,2} only — the
        FK holds one way, and the reversed candidate counts exactly
        one missing value (customer 3 without orders)."""
        import duckdb as dk
        import crawlray.queries as Q
        nat = pa.table({"n_nationkey": pa.array([0], pa.int32()),
                        "n_name": pa.array(["X"]),
                        "n_regionkey": pa.array([0], pa.int32())})
        cust = pa.table({
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([0, 0, 0], pa.int32()),
            "c_acctbal": pa.array([0.0] * 3),
            "c_mktsegment": pa.array(["BUILDING"] * 3)})
        orders = pa.table({
            "o_orderkey": pa.array([10, 11], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O", "O"]),
            "o_totalprice": pa.array([1.0, 1.0]),
            "o_orderdate": pa.array([1_700_000_000_000_000] * 2,
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2)})
        li = pa.table({
            "l_orderkey": pa.array([10], pa.int64()),
            "l_partkey": pa.array([5], pa.int64()),
            "l_suppkey": pa.array([7], pa.int64()),
            "l_linenumber": pa.array([1], pa.int32()),
            "l_quantity": pa.array([1.0]),
            "l_extendedprice": pa.array([1.0]),
            "l_discount": pa.array([0.0]), "l_tax": pa.array([0.0]),
            "l_returnflag": pa.array(["N"]),
            "l_linestatus": pa.array(["O"]),
            "l_shipdate": pa.array([1_700_000_000_000_000],
                                   pa.timestamp("us"))})
        part = pa.table({"p_partkey": pa.array([5, 6], pa.int64()),
                         "p_size": pa.array([1, 1], pa.int64()),
                         "p_retailprice": pa.array([1.0, 1.0]),
                         "p_name": pa.array(["p", "q"]),
                         "p_brand": pa.array(["b", "b"])})
        sup = pa.table({"s_suppkey": pa.array([7], pa.int64()),
                        "s_name": pa.array(["s"]),
                        "s_nationkey": pa.array([0], pa.int32())})
        for name, t in [("nation", nat), ("customer", cust),
                        ("orders", orders), ("lineitem", li),
                        ("part", part), ("supplier", sup)]:
            pq.write_table(t, str(tmp_path / f"{name}.parquet"))
        got = Q.q_inclusion_deps(str(tmp_path)).set_index("dep")
        assert got.loc["o_custkey<c_custkey", "holds"] == 1
        assert got.loc["c_custkey<o_custkey", "n_missing"] == 1
        assert got.loc["c_custkey<o_custkey", "holds"] == 0
        assert got.loc["p_partkey<l_partkey", "n_missing"] == 1
        con = dk.connect()
        for name in ["nation", "customer", "orders", "lineitem",
                     "part", "supplier"]:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                        f"read_parquet('{tmp_path}/{name}.parquet')")
        exp = (con.execute(Q._inclusion_sql()).fetchdf()
               .set_index("dep").sort_index())
        assert got.sort_index().equals(exp.astype(got.dtypes.to_dict()))


class TestCheckpointGc:
    def test_gc_collects_superseded_frontiers_and_strays(
            self, ray_session, tmp_path):
        """After a 3-round crawl: every corpus/metric/seen file and the
        LATEST frontier are live; older rounds' frontier partitions,
        .tmp remnants and stray files are collectable — and a resume
        after apply still reports the same totals (nothing the resume
        path needs was collected)."""
        import shutil
        from crawlray.checkpoint import gc_plan
        from crawlray.engine import CrawlEngine, EngineConfig
        from crawlray.synth import WorldConfig

        out = tmp_path / "crawl"
        cfg = EngineConfig(world=WorldConfig(n_urls=1500, n_hosts=15),
                           n_seeds=15, max_rounds=3)
        res = CrawlEngine(cfg, str(out)).run()
        # plant a stray uncommitted partial + a tmp remnant
        stray = out / "corpus" / "round-0002" / "part-9999-00000.parquet"
        stray.write_bytes(b"junk")
        tmpf = out / "frontier" / "round-0001" / "leftover.tmp"
        tmpf.write_bytes(b"x")
        plan = gc_plan(out)
        rels = set(plan["orphans"])
        assert "corpus/round-0002/part-9999-00000.parquet" in rels
        assert "frontier/round-0001/leftover.tmp" in rels
        # superseded frontier rounds are collectable; the latest is NOT
        latest_round = max(int(p.name.split("-")[1].split(".")[0])
                           for p in (out / "manifests").glob("*.json"))
        assert any(r.startswith("frontier/round-0000/") for r in rels)
        assert not any(
            r.startswith(f"frontier/round-{latest_round:04d}/")
            for r in rels)
        # nothing from corpus/seen/metrics written by the engine is
        # collectable
        assert not any(r.startswith(("corpus/round-000",))
                       and "9999" not in r for r in rels)
        assert not any(r.startswith(("seen/", "metrics/", "manifests/"))
                       for r in rels)
        plan2 = gc_plan(out, apply=True)
        assert plan2["orphans"] == plan["orphans"]
        assert gc_plan(out)["n_orphans"] == 0
        res2 = CrawlEngine(cfg, str(out)).run(resume=True)
        assert res2["rounds"] == 0
        assert res2["seen_total"] == res["seen_total"]

    def test_gc_apply_refuses_without_manifest(self, tmp_path):
        import pytest as _pytest
        from crawlray.checkpoint import gc_plan
        (tmp_path / "manifests").mkdir()
        (tmp_path / "loose.bin").write_bytes(b"z")
        assert gc_plan(tmp_path)["n_orphans"] == 1
        with _pytest.raises(ValueError):
            gc_plan(tmp_path, apply=True)


class TestSessionPropertyKernels:
    """Hypothesis properties for the pure kernels behind the session-11
    operators — no Ray needed: the closest-pair two-phase plan and the
    RLE run detector are re-run in-process against brute force on
    random inputs."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _phase_plan(ids, x, y):
        """In-process restatement of the q_closest_pair plan: phase-1
        4-neighbor x-scan bound, then d0-cell strip resolution with
        the y-sorted lag loop — returns (d2, a, b)."""
        def best_of(d2, ia, ib):
            lo = np.minimum(ia, ib); hi = np.maximum(ia, ib)
            j = np.lexsort((hi, lo, d2))[0]
            return float(d2[j]), int(lo[j]), int(hi[j])

        o = np.lexsort((ids, x))
        ids_s, xs, ys = ids[o], x[o], y[o]
        cd2, ca, cb = [], [], []
        for k in range(1, min(5, len(ids_s))):
            dx = xs[k:] - xs[:-k]; dy = ys[k:] - ys[:-k]
            cd2.append(dx * dx + dy * dy)
            ca.append(ids_s[:-k]); cb.append(ids_s[k:])
        d0sq, a0, b0 = best_of(np.concatenate(cd2),
                               np.concatenate(ca), np.concatenate(cb))
        d0 = float(np.sqrt(d0sq))
        if d0 == 0.0:
            return d0sq, a0, b0
        cell = np.floor(np.clip(x / d0, -2.0**62, 2.0**62)) \
            .astype(np.int64)
        cells = np.r_[cell, cell + 1]
        ii = np.r_[ids, ids]; xx = np.r_[x, x]; yy = np.r_[y, y]
        o = np.lexsort((ii, yy, cells))
        cells, ii, xx, yy = cells[o], ii[o], xx[o], yy[o]
        n = len(ii)
        cd2, ca, cb = [np.array([d0sq])], [np.array([a0])], [np.array([b0])]
        for k in range(1, n):
            i = np.arange(n - k)
            dy = yy[i + k] - yy[i]
            live = (cells[i] == cells[i + k]) & (dy <= d0)
            if not live.any():
                break
            j = i[live]
            dx = xx[j] - xx[j + k]
            keep = ii[j] != ii[j + k]
            cd2.append((dx * dx + dy[live] * dy[live])[keep])
            ca.append(ii[j][keep]); cb.append(ii[j + k][keep])
        return best_of(np.concatenate(cd2), np.concatenate(ca),
                       np.concatenate(cb))

    @given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False),
                              st.floats(-100, 100, allow_nan=False)),
                    min_size=2, max_size=40, unique=True))
    @settings(max_examples=150, deadline=None)
    def test_closest_pair_plan_equals_bruteforce(self, pts):
        x = np.array([p[0] for p in pts], np.float64)
        y = np.array([p[1] for p in pts], np.float64)
        ids = np.arange(len(pts), dtype=np.int64)
        d2, a, b = self._phase_plan(ids, x, y)
        dx = x[:, None] - x[None, :]; dy = y[:, None] - y[None, :]
        dd = dx * dx + dy * dy
        iu = np.triu_indices(len(pts), 1)
        best = dd[iu].min()
        assert d2 == best
        assert dd[a, b] == best

    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)),
                    min_size=1, max_size=60))
    @settings(max_examples=150, deadline=None)
    def test_rle_runs_equal_bruteforce(self, rows):
        """(user, type) stream in arrival order: the vectorized
        break-detection over the (user, pos) sort equals a Python scan."""
        u = np.array([r[0] for r in rows], np.int64)
        c = np.array([r[1] for r in rows], np.int64)
        pos = np.arange(len(u), dtype=np.int64)
        o = np.lexsort((pos, u))
        us, cs = u[o], c[o]
        brk = np.r_[True, (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, len(us)])
        # brute force
        runs = []
        for uu in sorted(set(u.tolist())):
            seq = c[u == uu]
            i = 0
            while i < len(seq):
                j = i
                while j < len(seq) and seq[j] == seq[i]:
                    j += 1
                runs.append(j - i)
                i = j
        assert sorted(lens.tolist()) == sorted(runs)
