"""Round-4j units: adversarial edges for the session-9 sketch kernels.

The queries are covered by the parameterized oracle gate at sf0.01; this
file pins the edges the corpus may not exercise — the CUSUM closed form
vs the literal recursion and the strict > alarm boundary, HdrHistogram
buckets at exact powers of two (where a float log2 would misround), and
count-min monotonicity (estimate >= exact, always) under forced
collisions — each against the same DuckDB oracle over tiny tables.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
BASE = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
DAY = 86_400


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


def _write(tmp_path, df: pd.DataFrame, name: str) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _oracle(tmp_path, sql: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _cusum_reference(counts):
    """The literal textbook recursion the closed form must equal."""
    total, nd = sum(counts), len(counts)
    k2 = -(-2 * total // nd)
    s, out = 0, []
    for n in counts:
        s = max(0, s + 2 * n - k2)
        out.append(s)
    return out, k2


class TestCusumEdges:
    def _sf(self, tmp_path, counts):
        rows, eid = [], 0
        for day, n in enumerate(counts):
            for _ in range(n):
                eid += 1
                rows.append((eid, 1, "view", day * DAY, 1.0))
        return _write(tmp_path, _events(rows), "events")

    def test_closed_form_equals_recursion_and_alarm_day(
            self, ray_session, tmp_path):
        from crawlray.queries import (CUSUM_H_MULT, SQL_CUSUM_DRIFT,
                                      q_cusum_drift)

        # flat traffic then a late sustained drift
        counts = [4, 4, 4, 4, 20, 20, 20]
        sf = self._sf(tmp_path, counts)
        ref, k2 = _cusum_reference(counts)
        got = q_cusum_drift(sf).to_pandas().iloc[0]
        assert got["max_s"] == max(ref)
        alarms = [d + 1 for d, s in enumerate(ref)
                  if s > CUSUM_H_MULT * k2]
        assert got["n_alarms"] == len(alarms)
        assert got["first_alarm_day"] == (alarms[0] if alarms else -1)
        ora = _oracle(tmp_path, SQL_CUSUM_DRIFT, ["events"]).iloc[0]
        for c in ("n_days", "n_alarms", "max_s", "first_alarm_day"):
            assert got[c] == ora[c], c

    def test_boundary_is_strict_and_no_drift_no_alarm(
            self, ray_session, tmp_path):
        from crawlray.queries import SQL_CUSUM_DRIFT, q_cusum_drift

        # perfectly flat: S returns to 0 every day, never alarms
        counts = [7, 7, 7, 7]
        sf = self._sf(tmp_path, counts)
        got = q_cusum_drift(sf).to_pandas().iloc[0]
        assert got["n_alarms"] == 0
        assert got["first_alarm_day"] == -1
        assert got["max_s"] == 0
        ora = _oracle(tmp_path, SQL_CUSUM_DRIFT, ["events"]).iloc[0]
        for c in ("n_days", "n_alarms", "max_s", "first_alarm_day"):
            assert got[c] == ora[c], c


class TestHdrEdges:
    def test_powers_of_two_bucket_exactly(self, ray_session, tmp_path):
        from crawlray.queries import SQL_HDR_QUANTILES, q_hdr_quantiles

        # cents exactly at 2^k must land in bucket k+1 (bin length),
        # cents at 2^k - 1 in bucket k; a float floor(log2) misrounds
        # the first class.  1.28 -> 128 = 2^7 -> bucket 8; 1.27 -> 127
        # -> bucket 7; 81.92 -> 8192 = 2^13 -> bucket 14.
        prices = [1.28, 1.27, 81.92, 0.01, 655.36]
        orders = pd.DataFrame({
            "o_orderkey": range(1, len(prices) + 1),
            "o_custkey": [1] * len(prices),
            "o_orderstatus": ["F"] * len(prices),
            "o_totalprice": prices,
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * len(prices)).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * len(prices),
        })
        sf = _write(tmp_path, orders, "orders")
        got = q_hdr_quantiles(sf).to_pandas()
        byp = {int(r["pct"]): r for _, r in got.iterrows()}
        # sorted buckets: [1, 7, 8, 14, 17]; ranks ceil(p*5/100):
        # p50 -> rank 3 -> bucket 8 (the 2^7 edge), p90 -> rank 5 ->
        # bucket 17, p99 -> rank 5 -> bucket 17
        assert int(byp[50]["bucket"]) == 8
        assert int(byp[50]["lo_cents"]) == 128
        assert int(byp[50]["hi_cents"]) == 255
        assert int(byp[90]["bucket"]) == 17
        ora = _oracle(tmp_path, SQL_HDR_QUANTILES, ["orders"])
        pd.testing.assert_frame_equal(
            got.sort_values("pct").reset_index(drop=True),
            ora.sort_values("pct").reset_index(drop=True),
            check_dtype=False)


class TestCmsEdges:
    def test_estimate_dominates_exact_under_collisions(
            self, ray_session, tmp_path):
        from crawlray.queries import SQL_CMS_ESTIMATES, q_cms_estimates

        # 40 distinct types into 16 buckets forces collisions in every
        # row of the sketch; CMS must still never under-estimate
        rows, eid = [], 0
        for i in range(40):
            for _ in range(i % 5 + 1):
                eid += 1
                rows.append((eid, 1, f"type_{i:02d}", eid, 1.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = q_cms_estimates(sf).to_pandas()
        assert len(got) == 40
        assert (got["cms_n"] >= got["exact_n"]).all()
        assert (got["overestimate"] >= 0).all()
        # the tiny width must actually show a collision somewhere
        assert got["overestimate"].sum() > 0
        ora = _oracle(tmp_path, SQL_CMS_ESTIMATES, ["events"])
        key = ["event_type"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


def _docs(texts, langs=None) -> pd.DataFrame:
    langs = langs or ["en"] * len(texts)
    return pd.DataFrame({
        "doc_id": range(1, len(texts) + 1),
        "text": texts,
        "lang": langs,
        "source": ["src0"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })


class TestBpeFirstMergesEdges:
    def test_weighting_whitespace_and_single_chars(
            self, ray_session, tmp_path):
        from crawlray.queries import SQL_BPE_FIRST_MERGES, q_bpe_first_merges

        # 'ab' occurs 3x (pair ab x3), 'aab' 1x (aa, ab), 'x' has no
        # pair, leading/multi whitespace must not create empty tokens
        texts = ["ab ab  aab", "  ab x ", ""]
        sf = _write(tmp_path, _docs(texts), "documents")
        got = q_bpe_first_merges(sf).to_pandas()
        byp = dict(zip(got["pair"], got["n"]))
        assert byp["ab"] == 4
        assert byp["aa"] == 1
        assert "x" not in byp and " a" not in byp
        ora = _oracle(tmp_path, SQL_BPE_FIRST_MERGES, ["documents"])
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ora.reset_index(drop=True),
            check_dtype=False)


class TestStopgramCoverageEdges:
    def test_empty_docs_and_uncovered_lang(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_STOPGRAM_COVERAGE,
                                      q_stopgram_coverage)

        # 25 distinct words: top-20 excludes the 5 rarest; 'zz' lang has
        # only excluded words; the empty doc counts as a doc, 0 tokens
        common = [f"w{i:02d}" for i in range(20)]
        rare = [f"r{i}" for i in range(5)]
        texts = [" ".join(common) + " " + " ".join(common),
                 " ".join(rare), ""]
        langs = ["en", "zz", "zz"]
        sf = _write(tmp_path, _docs(texts, langs), "documents")
        got = q_stopgram_coverage(sf).to_pandas().set_index("lang")
        assert got.loc["en", "covered_tokens"] == 40
        assert got.loc["en", "total_tokens"] == 40
        assert got.loc["zz", "n_docs"] == 2
        assert got.loc["zz", "total_tokens"] == 5
        assert got.loc["zz", "covered_tokens"] == 0
        ora = _oracle(tmp_path, SQL_STOPGRAM_COVERAGE, ["documents"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("lang").reset_index(drop=True),
            ora.sort_values("lang").reset_index(drop=True),
            check_dtype=False)


class TestBehaviorSignaturesEdges:
    def test_signature_sets_cross_batch(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_BEHAVIOR_SIGNATURES,
                                      q_behavior_signatures)

        # user 1: {a,b} seen out of order and duplicated; user 2: {a};
        # user 3: {a,b,c}; user 4: {b} — sets, not sequences
        rows = [(1, 1, "b", 1, 0.0), (2, 1, "a", 2, 0.0),
                (3, 1, "b", 3, 0.0), (4, 2, "a", 4, 0.0),
                (5, 3, "c", 5, 0.0), (6, 3, "a", 6, 0.0),
                (7, 3, "b", 7, 0.0), (8, 4, "b", 8, 0.0)]
        sf = _write(tmp_path, _events(rows), "events")
        got = q_behavior_signatures(sf).to_pandas()
        bys = dict(zip(got["signature"], got["n_users"]))
        assert bys == {"a,b": 1, "a": 1, "a,b,c": 1, "b": 1}
        ora = _oracle(tmp_path, SQL_BEHAVIOR_SIGNATURES, ["events"])
        pd.testing.assert_frame_equal(
            got.sort_values("signature").reset_index(drop=True),
            ora.sort_values("signature").reset_index(drop=True),
            check_dtype=False)


class TestLd1MaskEdges:
    def test_fast_path_and_fallbacks(self):
        from crawlray.queries import _edit1, _ld1_mask

        a = np.array(["abc", "abc", "abc", "ab", "café",
                      "ab", "abcd"], object)
        b = np.array(["abd", "abc", "adc", "abc", "cafe",
                      "ba", "ab"], object)
        got = _ld1_mask(a, b)
        exp = np.array([_edit1(x, y) for x, y in zip(a, b)])
        assert (got == exp).all()
        # transposition is LD 2, must be rejected by the byte path
        assert not got[5]
        # length diff 2 is never LD 1
        assert not got[6]


class TestTheilSenEdges:
    def test_negative_slope_reduction_and_even_pairs(
            self, ray_session, tmp_path):
        from crawlray.queries import SQL_THEILSEN_TREND, q_theilsen_trend

        # days 1..4 with counts 9, 7, 4, 1: slopes {-2,-5/2,-8/3,-3,
        # -3,-3}; sorted asc the lower median (rank 3 of 6) is -3;
        # gcd reduction must keep dx positive and sign on dy
        counts = {1: 9, 2: 7, 3: 4, 4: 1}
        rows, eid = [], 0
        for day, n in counts.items():
            for _ in range(n):
                eid += 1
                rows.append((eid, 1, "view", (day - 1) * DAY, 1.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = q_theilsen_trend(sf).to_pandas().iloc[0]
        assert int(got["n_pairs"]) == 6
        assert (int(got["med_dy"]), int(got["med_dx"])) == (-3, 1)
        ora = _oracle(tmp_path, SQL_THEILSEN_TREND, ["events"]).iloc[0]
        for c in ("n_pairs", "med_dy", "med_dx"):
            assert got[c] == ora[c], c


class TestDeltaEncodingEdges:
    def test_gap_bits_and_first_id(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_DELTA_ENCODING_ESTIMATE,
                                      q_delta_encoding_estimate)

        # user 1 ids {8, 9, 12}: raw bits 4+4+4=12, delta bits
        # bin(8)+bin(1)+bin(3) = 4+1+2 = 7; user 2 id {1}: raw 1,
        # delta 1 (first id raw)
        rows = [(8, 1, "v", 1, 0.0), (9, 1, "v", 2, 0.0),
                (12, 1, "v", 3, 0.0), (1, 2, "v", 4, 0.0)]
        sf = _write(tmp_path, _events(rows), "events")
        got = q_delta_encoding_estimate(sf).to_pandas().iloc[0]
        assert int(got["raw_bits"]) == 13
        assert int(got["delta_bits"]) == 8
        assert int(got["n_ids"]) == 4
        ora = _oracle(tmp_path, SQL_DELTA_ENCODING_ESTIMATE,
                      ["events"]).iloc[0]
        for c in ("raw_bits", "delta_bits", "n_ids"):
            assert got[c] == ora[c], c


class TestCompactionPlanEdges:
    def test_oversized_segment_gets_own_bin(self, ray_session, tmp_path):
        from crawlray.queries import (COMPACTION_TARGET_BYTES,
                                      SQL_COMPACTION_PLAN,
                                      q_compaction_plan)

        # one segment bigger than the target must not split; the next
        # segment starts a later bin (cum-before rule)
        big = "x" * (COMPACTION_TARGET_BYTES + 5)
        small = "y" * 10
        df = pd.DataFrame({
            "doc_id": [1, 101, 201],
            "text": [big, small, small],
            "lang": ["en", "en", "en"],
            "source": ["s"] * 3,
            "n_chars": [len(big), len(small), len(small)],
        })
        sf = _write(tmp_path, df, "documents")
        got = q_compaction_plan(sf).to_pandas()
        assert int(got.loc[got["bin"] == 0, "n_segments"].iloc[0]) == 1
        assert int(got.loc[got["bin"] == 1, "n_segments"].iloc[0]) == 2
        ora = _oracle(tmp_path, SQL_COMPACTION_PLAN, ["documents"])
        pd.testing.assert_frame_equal(
            got.sort_values("bin").reset_index(drop=True),
            ora.sort_values("bin").reset_index(drop=True),
            check_dtype=False)


class TestSimpsonReversalEdges:
    def test_true_reversal_detected(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_SIMPSON_REVERSAL_AUDIT,
                                      q_simpson_reversal_audit)

        # classic construction: within each nation avg(F) > avg(O),
        # but O concentrates in the high-value nation so overall
        # avg(O) > avg(F)
        cust = pd.DataFrame({
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": np.array([0, 1], dtype="int32"),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["A", "A"],
        })
        # nation 0 cheap: F=2.00 x1, O=1.00 x9 ; nation 1 pricey:
        # F=10.00 x9, O=9.00 x1
        rows = ([(1, "F", 2.00)] + [(1, "O", 1.00)] * 9
                + [(2, "F", 10.00)] * 9 + [(2, "O", 9.00)])
        orders = pd.DataFrame({
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [r[0] for r in rows],
            "o_orderstatus": [r[1] for r in rows],
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * len(rows)).astype("datetime64[us]"),
            "o_orderpriority": ["1"] * len(rows),
        })
        _write(tmp_path, cust, "customer")
        sf = _write(tmp_path, orders, "orders")
        got = q_simpson_reversal_audit(sf).to_pandas().iloc[0]
        # overall: avg F = (2 + 90)/10 = 9.2, avg O = (9+9)/10 = 1.8
        # -> F > O overall; per nation F > O in both too? nation0:
        # F 2.00 vs O 1.00 -> F>O; so NOT a reversal with this data --
        # flip: compare O vs F ordering ('F' < 'O' so a='F')
        assert got["status_a"] == "F" and got["status_b"] == "O"
        assert int(got["overall_sign"]) == 1
        assert int(got["n_nations_a_gt_b"]) == 2
        ora = _oracle(tmp_path, SQL_SIMPSON_REVERSAL_AUDIT,
                      ["orders", "customer"]).iloc[0]
        for c in ("status_a", "status_b", "overall_sign",
                  "n_nations_a_gt_b", "n_nations_a_lt_b",
                  "n_nations_tied"):
            assert got[c] == ora[c], c

    def test_reversal_direction(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_SIMPSON_REVERSAL_AUDIT,
                                      q_simpson_reversal_audit)

        # make every nation prefer F yet overall prefer O: O lives in
        # the expensive nation
        cust = pd.DataFrame({
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": np.array([0, 1], dtype="int32"),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["A", "A"],
        })
        rows = ([(1, "F", 2.00)] * 9 + [(1, "O", 1.00)]
                + [(2, "F", 100.00)] + [(2, "O", 99.00)] * 9)
        orders = pd.DataFrame({
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [r[0] for r in rows],
            "o_orderstatus": [r[1] for r in rows],
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * len(rows)).astype("datetime64[us]"),
            "o_orderpriority": ["1"] * len(rows),
        })
        _write(tmp_path, cust, "customer")
        sf = _write(tmp_path, orders, "orders")
        got = q_simpson_reversal_audit(sf).to_pandas().iloc[0]
        # per nation: F beats O in both (2>1, 100>99); overall:
        # avg F = (18+100)/10 = 11.8, avg O = (1+891)/10 = 89.2 -> O
        assert int(got["overall_sign"]) == -1
        assert int(got["n_nations_a_gt_b"]) == 2
        assert int(got["n_nations_a_lt_b"]) == 0
        ora = _oracle(tmp_path, SQL_SIMPSON_REVERSAL_AUDIT,
                      ["orders", "customer"]).iloc[0]
        for c in ("overall_sign", "n_nations_a_gt_b",
                  "n_nations_a_lt_b", "n_nations_tied"):
            assert got[c] == ora[c], c


class TestSkipgramEdges:
    def test_window_respects_doc_boundaries(self, ray_session, tmp_path):
        from crawlray.queries import SQL_SKIPGRAM_PAIRS, q_skipgram_pairs

        # 'a b c' gives (a,b),(b,a),(b,c),(c,b),(a,c),(c,a); the second
        # doc 'd e' must NOT pair across the boundary with 'c'
        texts = ["a b c", "d e"]
        sf = _write(tmp_path, _docs(texts), "documents")
        got = q_skipgram_pairs(sf).to_pandas()
        pairs = set(zip(got["center"], got["context"]))
        assert ("c", "d") not in pairs and ("d", "c") not in pairs
        assert ("a", "c") in pairs and ("c", "a") in pairs
        assert ("d", "e") in pairs
        ora = _oracle(tmp_path, SQL_SKIPGRAM_PAIRS, ["documents"])
        key = ["center", "context"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestPartBandPairsEdges:
    def test_boundary_replication_counts_once(self, ray_session, tmp_path):
        from crawlray.queries import SQL_PART_BAND_PAIRS, q_part_band_pairs

        # sizes 5,5,6 at prices within/outside the 100-cent band:
        # (k1,k2) same size |diff|=50 -> bucket 5; (k1,k3) cross size
        # |diff|=100 exactly -> bucket 5; (k2,k3) |diff|=150 -> out
        parts = pd.DataFrame({
            "p_partkey": [1, 2, 3],
            "p_name": ["a", "b", "c"],
            "p_brand": ["B"] * 3,
            "p_type": ["T"] * 3,
            "p_size": np.array([5, 5, 6], dtype="int32"),
            "p_retailprice": [10.00, 10.50, 9.00],
        })
        sf = _write(tmp_path, parts, "part")
        got = q_part_band_pairs(sf).to_pandas()
        assert dict(zip(got["size_bucket"], got["n_pairs"])) == {5: 2}
        ora = _oracle(tmp_path, SQL_PART_BAND_PAIRS, ["part"])
        pd.testing.assert_frame_equal(
            got.sort_values("size_bucket").reset_index(drop=True),
            ora.sort_values("size_bucket").reset_index(drop=True),
            check_dtype=False)


class TestKendallEdges:
    def test_tie_and_direction_counts(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_KENDALL_INGREDIENTS,
                                      q_kendall_ingredients)

        # user 1 values by event_id order: 1, 3, 3, 2 ->
        # pairs: (1,3)+ (1,3)+ (1,2)+ (3,3)0 (3,2)- (3,2)-
        rows = [(1, 1, "v", 1, 0.01), (2, 1, "v", 2, 0.03),
                (3, 1, "v", 3, 0.03), (4, 1, "v", 4, 0.02),
                (5, 2, "v", 5, 9.99)]
        sf = _write(tmp_path, _events(rows), "events")
        got = q_kendall_ingredients(sf).to_pandas().iloc[0]
        assert int(got["n_pairs"]) == 6
        assert int(got["n_concordant"]) == 3
        assert int(got["n_discordant"]) == 2
        assert int(got["n_ties"]) == 1
        ora = _oracle(tmp_path, SQL_KENDALL_INGREDIENTS,
                      ["events"]).iloc[0]
        for c in ("n_pairs", "n_concordant", "n_discordant", "n_ties"):
            assert got[c] == ora[c], c


class TestMerkleDiffEdges:
    def test_only_lossy_buckets_reported(self, ray_session, tmp_path):
        from crawlray.queries import (MERKLE_LOSS_MOD, SQL_MERKLE_DIFF,
                                      q_merkle_diff)

        # user 0's bucket loses event_id 101 and 202; user 1's bucket
        # is clean and must NOT appear
        rows = [(MERKLE_LOSS_MOD, 0, "v", 1, 0.0),
                (2 * MERKLE_LOSS_MOD, 0, "v", 2, 0.0),
                (5, 0, "v", 3, 0.0),
                (7, 1, "v", 4, 0.0), (8, 1, "v", 5, 0.0)]
        sf = _write(tmp_path, _events(rows), "events")
        got = q_merkle_diff(sf).to_pandas()
        assert list(got["bucket"]) == [0]
        assert int(got["missing_rows"].iloc[0]) == 2
        assert int(got["n_a"].iloc[0]) == 3
        assert int(got["n_b"].iloc[0]) == 1
        ora = _oracle(tmp_path, SQL_MERKLE_DIFF, ["events"])
        pd.testing.assert_frame_equal(
            got.sort_values("bucket").reset_index(drop=True),
            ora.sort_values("bucket").reset_index(drop=True),
            check_dtype=False)


class TestMaxminFairEdges:
    def test_water_level_fraction(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_MAXMIN_FAIR_ALLOC,
                                      q_maxmin_fair_alloc)

        # demands 1, 2, 7: total 10, cap 5; rank1: 1 + 2*1 = 3 <= 5
        # full; rank2: 3 + 1*2 = 5 <= 5 full; rank3: 10 > 5 capped.
        # level = (5 - 3) / 1 = 2/1
        rows, eid = [], 0
        for uid, n in [(1, 1), (2, 2), (3, 7)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, uid, "v", eid, 0.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = q_maxmin_fair_alloc(sf).to_pandas().iloc[0]
        assert int(got["n_users"]) == 3
        assert int(got["capacity"]) == 5
        assert int(got["n_full"]) == 2
        assert (int(got["level_num"]), int(got["level_den"])) == (2, 1)
        ora = _oracle(tmp_path, SQL_MAXMIN_FAIR_ALLOC,
                      ["events"]).iloc[0]
        for c in ("n_users", "capacity", "n_full", "level_num",
                  "level_den"):
            assert got[c] == ora[c], c

    def test_fraction_reduces(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_MAXMIN_FAIR_ALLOC,
                                      q_maxmin_fair_alloc)

        # demands 2,2,8,8: total 20, cap 10; rank1: 2+3*2=8<=10 full;
        # rank2: 4+2*2=8<=10 full; rank3: 12+8=20>10 capped ->
        # level = (10-4)/2 = 6/2 -> reduced 3/1
        rows, eid = [], 0
        for uid, n in [(1, 2), (2, 2), (3, 8), (4, 8)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, uid, "v", eid, 0.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = q_maxmin_fair_alloc(sf).to_pandas().iloc[0]
        assert (int(got["level_num"]), int(got["level_den"])) == (3, 1)
        ora = _oracle(tmp_path, SQL_MAXMIN_FAIR_ALLOC,
                      ["events"]).iloc[0]
        for c in ("n_full", "level_num", "level_den"):
            assert got[c] == ora[c], c


class TestCountSketchEdges:
    def test_signed_cancellation_and_median(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_COUNTSKETCH_ESTIMATES,
                                      q_countsketch_estimates)

        rows, eid = [], 0
        for i in range(30):
            for _ in range(i % 4 + 1):
                eid += 1
                rows.append((eid, 1, f"t{i:02d}", eid, 1.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = q_countsketch_estimates(sf).to_pandas()
        assert len(got) == 30
        # signed sketch: errors may be negative, exact rows exist
        assert (got["csk_n"] - got["exact_n"] == got["err"]).all()
        ora = _oracle(tmp_path, SQL_COUNTSKETCH_ESTIMATES, ["events"])
        key = ["event_type"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestIdRangeRunsEdges:
    def test_runs_merge_across_bucket_boundary(self, ray_session, tmp_path):
        from crawlray.queries import (IDRUN_BUCKET, SQL_ID_RANGE_RUNS,
                                      q_id_range_runs)

        B = IDRUN_BUCKET
        # run crossing the bucket boundary (B-1, B) must merge; the
        # duplicate key must not double count; gap inside bucket 0
        keys = [1, 2, 3, 10, B - 1, B, B + 1, B + 1, 3 * B]
        orders = pd.DataFrame({
            "o_orderkey": keys,
            "o_custkey": [1] * len(keys),
            "o_orderstatus": ["F"] * len(keys),
            "o_totalprice": [1.0] * len(keys),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * len(keys)).astype("datetime64[us]"),
            "o_orderpriority": ["1"] * len(keys),
        })
        sf = _write(tmp_path, orders, "orders")
        got = q_id_range_runs(sf).to_pandas().iloc[0]
        # runs: [1-3], [10], [B-1 .. B+1], [3B] -> 4; ids distinct 8;
        # max gap: between B+1 and 3B -> 3B - (B+1) - 1 = 2B - 2
        assert int(got["n_runs"]) == 4
        assert int(got["n_ids"]) == 8
        assert int(got["max_gap"]) == 2 * B - 2
        ora = _oracle(tmp_path, SQL_ID_RANGE_RUNS, ["orders"]).iloc[0]
        for c in ("n_runs", "n_ids", "max_gap"):
            assert got[c] == ora[c], c


class TestWeightedJaccardEdges:
    def test_multiset_min_max(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_WEIGHTED_JACCARD_SOURCES,
                                      q_weighted_jaccard_sources)

        # src0: a a a b ; src1: a b b c ; other source ignored
        # min: a1->... min(3,1)=1? no: min(3,1)+min(1,2)+min(0,1)=1+1+0=2... wait a: min(3,1)=1, b: min(1,2)=1, c: 0 -> 2
        # max: a 3, b 2, c 1 -> 6
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a a a b", "a b b c", "zzz zzz"],
            "lang": ["en"] * 3,
            "source": ["src0", "src1", "src9"],
            "n_chars": [7, 7, 7],
        })
        sf = _write(tmp_path, df, "documents")
        got = q_weighted_jaccard_sources(sf).to_pandas().iloc[0]
        assert int(got["sum_min"]) == 2
        assert int(got["sum_max"]) == 6
        ora = _oracle(tmp_path, SQL_WEIGHTED_JACCARD_SOURCES,
                      ["documents"]).iloc[0]
        assert got["sum_min"] == ora["sum_min"]
        assert got["sum_max"] == ora["sum_max"]


class TestTopWithTiesEdges:
    def test_ties_extend_output(self, ray_session, tmp_path):
        from crawlray.queries import SQL_TOP_WITH_TIES, q_top_with_ties

        # brands B1 B2 B3 with revenues 10, 10, 10 -> all rank 1;
        # brand B4 at 5 -> rank 4, excluded even though k=2
        part = pd.DataFrame({
            "p_partkey": [1, 2, 3, 4],
            "p_name": ["a", "b", "c", "d"],
            "p_brand": ["B1", "B2", "B3", "B4"],
            "p_type": ["T"] * 4,
            "p_size": np.array([1] * 4, dtype="int32"),
            "p_retailprice": [1.0] * 4,
        })
        li = pd.DataFrame({
            "l_orderkey": [1, 1, 1, 1],
            "l_partkey": [1, 2, 3, 4],
            "l_suppkey": [1] * 4,
            "l_linenumber": np.array([1, 2, 3, 4], dtype="int32"),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [10.0, 10.0, 10.0, 5.0],
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pd.to_datetime(
                ["2024-01-01"] * 4).astype("datetime64[us]"),
        })
        _write(tmp_path, part, "part")
        sf = _write(tmp_path, li, "lineitem")
        got = q_top_with_ties(sf).to_pandas()
        assert set(got["brand"]) == {"B1", "B2", "B3"}
        assert (got["rnk"] == 1).all()
        ora = _oracle(tmp_path, SQL_TOP_WITH_TIES, ["lineitem", "part"])
        key = ["brand"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestSchemaEvolutionUnionEdges:
    def test_null_columns_and_counts(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_SCHEMA_EVOLUTION_UNION,
                                      q_schema_evolution_union)

        rows = [(1, 1, "a", 1, 1.0), (2, 1, "b", 2, 2.0),
                (3, 2, "c", 3, 3.0), (4, 2, "d", 4, 4.0)]
        sf = _write(tmp_path, _events(rows), "events")
        got = q_schema_evolution_union(sf).to_pandas().iloc[0]
        # evens (2,4) keep value; odds (1,3) keep type
        assert int(got["n_rows"]) == 4
        assert int(got["n_value"]) == 2
        assert int(got["n_type"]) == 2
        assert int(got["n_users"]) == 2
        ora = _oracle(tmp_path, SQL_SCHEMA_EVOLUTION_UNION,
                      ["events"]).iloc[0]
        for c in ("n_rows", "n_value", "n_type", "n_users"):
            assert got[c] == ora[c], c


class TestNextWordTopEdges:
    def test_argmax_ties_and_unfollowed_words(self, ray_session, tmp_path):
        from crawlray.queries import SQL_NEXT_WORD_TOP, q_next_word_top

        # 'a' followed by c, b, b -> argmax b (count 2); second doc's
        # trailing 'z' is never followed (next_word ''); 'a c' vs
        # 'a b': tie among singles broken by next-word asc
        texts = ["a c a b a b", "z"]
        sf = _write(tmp_path, _docs(texts), "documents")
        got = q_next_word_top(sf).to_pandas().set_index("word")
        assert got.loc["a", "next_word"] == "b"
        assert int(got.loc["a", "n_pair"]) == 2
        assert int(got.loc["a", "n_word"]) == 3
        assert got.loc["z", "next_word"] == ""
        assert int(got.loc["z", "n_pair"]) == 0
        ora = _oracle(tmp_path, SQL_NEXT_WORD_TOP, ["documents"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("word").reset_index(drop=True),
            ora.sort_values("word").reset_index(drop=True),
            check_dtype=False)

    def test_next_word_tie_breaks_ascending(self, ray_session, tmp_path):
        from crawlray.queries import SQL_NEXT_WORD_TOP, q_next_word_top

        # 'a' followed once by 'c' and once by 'b': tie -> 'b'
        texts = ["a c", "a b"]
        sf = _write(tmp_path, _docs(texts), "documents")
        got = q_next_word_top(sf).to_pandas().set_index("word")
        assert got.loc["a", "next_word"] == "b"
        ora = _oracle(tmp_path, SQL_NEXT_WORD_TOP, ["documents"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("word").reset_index(drop=True),
            ora.sort_values("word").reset_index(drop=True),
            check_dtype=False)


class TestVocabCoverageEdges:
    def test_partial_class_ceil(self, ray_session, tmp_path):
        from crawlray.queries import SQL_VOCAB_COVERAGE, q_vocab_coverage

        # counts: x:4, y:2, z:2, w:1, v:1 -> tot 10
        # p50: need 5 -> x(4) + 1 word of count-2 class -> vocab 2,
        #   covered 6
        # p90: need 9 -> x + y + z (8) + 1 word of count-1 -> vocab 4,
        #   covered 9
        # p99: need 10 -> all 5 words
        texts = ["x x x x y y", "z z w v"]
        sf = _write(tmp_path, _docs(texts), "documents")
        got = q_vocab_coverage(sf).to_pandas().set_index("pct")
        assert (int(got.loc[50, "vocab_size"]),
                int(got.loc[50, "covered_tokens"])) == (2, 6)
        assert (int(got.loc[90, "vocab_size"]),
                int(got.loc[90, "covered_tokens"])) == (4, 9)
        assert (int(got.loc[99, "vocab_size"]),
                int(got.loc[99, "covered_tokens"])) == (5, 10)
        ora = _oracle(tmp_path, SQL_VOCAB_COVERAGE, ["documents"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("pct").reset_index(drop=True),
            ora.sort_values("pct").reset_index(drop=True),
            check_dtype=False)


class TestJointDecileGridEdges:
    def test_rank_ties_share_cells(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_JOINT_DECILE_GRID,
                                      q_joint_decile_grid)

        # 5 rows; qty all equal -> every row rank 1 -> dq 0 for all;
        # prices distinct -> dp = (rank-1)*10//5 = 0,2,4,6,8
        li = pd.DataFrame({
            "l_orderkey": range(1, 6),
            "l_partkey": [1] * 5,
            "l_suppkey": [1] * 5,
            "l_linenumber": np.array([1] * 5, dtype="int32"),
            "l_quantity": [7.0] * 5,
            "l_extendedprice": [1.0, 2.0, 3.0, 4.0, 5.0],
            "l_discount": [0.0] * 5,
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": pd.to_datetime(
                ["2024-01-01"] * 5).astype("datetime64[us]"),
        })
        sf = _write(tmp_path, li, "lineitem")
        got = q_joint_decile_grid(sf).to_pandas()
        assert (got["dq"] == 0).all()
        assert sorted(got["dp"]) == [0, 2, 4, 6, 8]
        assert (got["n_rows"] == 1).all()
        ora = _oracle(tmp_path, SQL_JOINT_DECILE_GRID, ["lineitem"])
        key = ["dq", "dp"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestSelectivityAuditEdges:
    def test_correlation_sign(self, ray_session, tmp_path):
        from crawlray.queries import (SEL_CENTS_MIN, SEL_QTY_MIN,
                                      SQL_SELECTIVITY_AUDIT,
                                      q_selectivity_audit)

        # perfectly correlated predicates: rows either satisfy both or
        # neither -> exact = n_a = n_b, n_ab*n - n_a*n_b > 0
        hi_q, hi_p = float(SEL_QTY_MIN), SEL_CENTS_MIN / 100.0
        rows = [(hi_q, hi_p)] * 3 + [(1.0, 1.0)] * 7
        li = pd.DataFrame({
            "l_orderkey": range(1, 11),
            "l_partkey": [1] * 10,
            "l_suppkey": [1] * 10,
            "l_linenumber": np.array([1] * 10, dtype="int32"),
            "l_quantity": [r[0] for r in rows],
            "l_extendedprice": [r[1] for r in rows],
            "l_discount": [0.0] * 10,
            "l_tax": [0.0] * 10,
            "l_returnflag": ["N"] * 10,
            "l_linestatus": ["O"] * 10,
            "l_shipdate": pd.to_datetime(
                ["2024-01-01"] * 10).astype("datetime64[us]"),
        })
        sf = _write(tmp_path, li, "lineitem")
        got = q_selectivity_audit(sf).to_pandas().iloc[0]
        assert int(got["n_ab"]) == 3
        assert int(got["corr_sign"]) == 1   # 3*10 > 3*3
        ora = _oracle(tmp_path, SQL_SELECTIVITY_AUDIT,
                      ["lineitem"]).iloc[0]
        for c in ("n", "n_a", "n_b", "n_ab", "corr_sign"):
            assert got[c] == ora[c], c


class TestRevenueIdentityEdges:
    def test_identity_holds_with_discount_and_tax(
            self, ray_session, tmp_path):
        from crawlray.queries import (SQL_REVENUE_IDENTITY_AUDIT,
                                      q_revenue_identity_audit)

        li = pd.DataFrame({
            "l_orderkey": [1, 2],
            "l_partkey": [1, 2],
            "l_suppkey": [1, 1],
            "l_linenumber": np.array([1, 1], dtype="int32"),
            "l_quantity": [1.0, 1.0],
            "l_extendedprice": [123.45, 67.89],
            "l_discount": [0.05, 0.10],
            "l_tax": [0.08, 0.02],
            "l_returnflag": ["N"] * 2,
            "l_linestatus": ["O"] * 2,
            "l_shipdate": pd.to_datetime(
                ["2024-01-01"] * 2).astype("datetime64[us]"),
        })
        sf = _write(tmp_path, li, "lineitem")
        got = q_revenue_identity_audit(sf).to_pandas().iloc[0]
        assert int(got["identity_delta"]) == 0
        # net: 12345*95*108 + 6789*90*102
        assert int(got["net_e4"]) == 12345 * 95 * 108 + 6789 * 90 * 102
        ora = _oracle(tmp_path, SQL_REVENUE_IDENTITY_AUDIT,
                      ["lineitem"]).iloc[0]
        for c in ("n", "gross_cents", "net_e4", "identity_delta"):
            assert got[c] == ora[c], c


class TestWidestPathEdges:
    def test_bottleneck_beats_shortest(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from crawlray.pipelines.graph import (WIDEST_SEED_W,
                                              cheapest_paths,
                                              widest_paths)

        # s -> a (w 1) -> t (w 9)  vs  s -> b (w 5) -> t (w 5):
        # shortest-cost path to t is via a (1+9=10 for min-plus), but
        # the WIDEST path is via b (min(5,5)=5 > min(1,9)=1)
        edges = rd.from_arrow(pa.table({
            "src": ["s", "a", "s", "b"],
            "dst": ["a", "t", "b", "t"],
            "w": pa.array([1, 9, 5, 5], pa.int64()),
        }))
        wide = dict(widest_paths(edges, ["s"], n_shards=2, max_hops=4)
                    .to_pandas().itertuples(index=False, name=None))
        assert wide["s"] == WIDEST_SEED_W
        assert wide["a"] == 1
        assert wide["b"] == 5
        assert wide["t"] == 5
        cheap = dict(cheapest_paths(edges, ["s"], n_shards=2,
                                    max_hops=4)
                     .to_pandas().itertuples(index=False, name=None))
        assert cheap["t"] == 10   # min-plus semantics untouched


class TestGraphVoronoiEdges:
    def test_lexicographic_tie_goes_to_lowest_seed(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from crawlray.pipelines.graph import cheapest_paths

        PACK = 1024
        # t is 1 hop (w 2) from BOTH seeds s0 and s1: equal distance,
        # label must be the LOWER seed rank; u is closer to s1 only
        edges = rd.from_arrow(pa.table({
            "src": ["s0", "s1", "s1"],
            "dst": ["t", "t", "u"],
            "w": pa.array([2 * PACK, 2 * PACK, 1 * PACK], pa.int64()),
        }))
        out = cheapest_paths(edges, ["s0", "s1"], n_shards=2,
                             max_hops=4, seed_values=[0, 1])
        got = {u: (c // PACK, c % PACK) for u, c in
               out.to_pandas().itertuples(index=False, name=None)}
        assert got["t"] == (2, 0)     # tie -> seed 0
        assert got["u"] == (1, 1)     # strictly closer to seed 1
        assert got["s0"] == (0, 0) and got["s1"] == (0, 1)


class TestFdAuditEdges:
    def test_fd_holds_and_fails(self, ray_session, tmp_path):
        from crawlray.queries import SQL_FD_AUDIT, q_fd_audit

        # orderkey->custkey holds (key); custkey->priority fails
        # (cust 1 uses two priorities); priority->status fails
        # (priority '1' maps to F and O)
        orders = pd.DataFrame({
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 2, 2],
            "o_orderstatus": ["F", "O", "F", "F"],
            "o_totalprice": [1.0] * 4,
            "o_orderdate": pd.to_datetime(
                ["2024-01-01"] * 4).astype("datetime64[us]"),
            "o_orderpriority": ["1", "1", "2", "2"],
        })
        sf = _write(tmp_path, orders, "orders")
        got = (q_fd_audit(sf).to_pandas()
               .set_index(["lhs", "rhs"]))
        assert int(got.loc[("o_orderkey", "o_custkey"), "holds"]) == 1
        assert int(got.loc[("o_custkey", "o_orderpriority"),
                           "holds"]) == 1   # here custkey determines pri
        assert int(got.loc[("o_orderpriority", "o_orderstatus"),
                           "holds"]) == 0   # pri 1 -> {F, O}
        ora = _oracle(tmp_path, SQL_FD_AUDIT, ["orders"])
        key = ["lhs", "rhs"]
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values(key).reset_index(drop=True),
            ora.sort_values(key).reset_index(drop=True),
            check_dtype=False)


class TestZeroActivityEdges:
    def test_missing_days_and_full_coverage(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_ZERO_ACTIVITY_CELLS,
                                      q_zero_activity_cells)

        # type 'a' active on days 1 and 3 only (missing 2, 4..31 ->
        # 29 missing, first 2); type 'b' active every day
        rows, eid = [], 0
        for d in (1, 3):
            eid += 1
            rows.append((eid, 1, "a", (d - 1) * DAY, 0.0))
        for d in range(1, 32):
            eid += 1
            rows.append((eid, 1, "b", (d - 1) * DAY, 0.0))
        sf = _write(tmp_path, _events(rows), "events")
        got = (q_zero_activity_cells(sf).to_pandas()
               .set_index("event_type"))
        assert int(got.loc["a", "n_missing_days"]) == 29
        assert int(got.loc["a", "first_missing_day"]) == 2
        assert int(got.loc["b", "n_missing_days"]) == 0
        assert int(got.loc["b", "first_missing_day"]) == -1
        ora = _oracle(tmp_path, SQL_ZERO_ACTIVITY_CELLS, ["events"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("event_type")
            .reset_index(drop=True),
            ora.sort_values("event_type").reset_index(drop=True),
            check_dtype=False)


class TestDominanceCountsEdges:
    def test_ties_count_and_self_excluded(self, ray_session, tmp_path):
        from crawlray.queries import (SQL_DOMINANCE_COUNTS,
                                      q_dominance_counts)

        # part 1 (size 1, $1) dominates nothing; part 2 (size 2, $2)
        # dominates 1; part 3 ties part 2 exactly -> each dominates
        # the other (<=) plus part 1 -> 2; part 4 (size 3, $1.50)
        # dominates only part 1 (price < parts 2/3)
        parts = pd.DataFrame({
            "p_partkey": [1, 2, 3, 4],
            "p_name": list("abcd"),
            "p_brand": ["B"] * 4,
            "p_type": ["T"] * 4,
            "p_size": np.array([1, 2, 2, 3], dtype="int32"),
            "p_retailprice": [1.00, 2.00, 2.00, 1.50],
        })
        sf = _write(tmp_path, parts, "part")
        got = (q_dominance_counts(sf).to_pandas()
               .set_index("p_partkey"))
        assert int(got.loc[1, "n_dominated"]) == 0
        assert int(got.loc[2, "n_dominated"]) == 2
        assert int(got.loc[3, "n_dominated"]) == 2
        assert int(got.loc[4, "n_dominated"]) == 1
        ora = _oracle(tmp_path, SQL_DOMINANCE_COUNTS, ["part"])
        pd.testing.assert_frame_equal(
            got.reset_index().sort_values("p_partkey")
            .reset_index(drop=True),
            ora.sort_values("p_partkey").reset_index(drop=True),
            check_dtype=False)
