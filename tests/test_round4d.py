"""Round-4d units: longest-prefix-match classification join.

The robots_lpm query is covered by the parameterized oracle gate in
test_queries.py; this file pins the operator-level contract.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from crawlray.pipelines.relational import longest_prefix_match


def _run(rows, rules):
    ds = rd.from_arrow(pa.table({"url": pa.array(rows, pa.string())}))
    df = longest_prefix_match(ds, "url", rules).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


class TestLongestPrefixMatch:
    def test_longest_wins(self, ray_session):
        rules = {
            "https://": "allow",
            "https://a.com/": "host",
            "https://a.com/private": "deny",
        }
        df = _run(
            ["https://a.com/x", "https://a.com/private/1", "https://b.com/"],
            rules,
        )
        got = dict(zip(df["url"], df["action"]))
        assert got == {
            "https://a.com/x": "host",
            "https://a.com/private/1": "deny",
            "https://b.com/": "allow",
        }
        # the winning rule itself is reported
        assert dict(zip(df["url"], df["rule"]))["https://a.com/private/1"] \
            == "https://a.com/private"

    def test_unmatched_rows_dropped_and_exact_match(self, ray_session):
        rules = {"ab": "x", "abcd": "y"}
        df = _run(["abcd", "abc", "zz"], rules)
        # "zz" matches nothing -> dropped; "abcd" takes the length-4 rule
        assert list(df["url"]) == ["abc", "abcd"]
        assert list(df["action"]) == ["x", "y"]

    def test_null_and_empty_keys(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"url": pa.array(["a1", None, ""], pa.string())}))
        df = longest_prefix_match(ds, "url", {"a": "hit"}).to_pandas()
        # null / empty never match a non-empty rule
        assert list(df["url"]) == ["a1"]

    def test_many_blocks_parity(self, ray_session):
        rules = {f"p{i}/": f"r{i}" for i in range(20)}
        rules["p"] = "fallback"
        rows = [f"p{i % 25}/doc" for i in range(500)]
        ds = rd.from_arrow(
            pa.table({"url": pa.array(rows, pa.string())})).repartition(7)
        df = longest_prefix_match(ds, "url", rules).to_pandas()
        assert len(df) == 500
        for u, a in zip(df["url"], df["action"]):
            i = u[1:].split("/")[0]
            assert a == (f"r{i}" if int(i) < 20 else "fallback")


class TestBM25:
    def _docs(self):
        rows = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([
                "join join scan",            # tf(join)=2, dl=3
                "join scan scan scan",       # tf(join)=1, dl=4
                "scan scan",                 # no query term
                "vector join",               # two terms, short doc
                None,                        # null text
            ], pa.string()),
        })
        return rd.from_arrow(rows).repartition(3)

    def test_scores_match_brute_force(self, ray_session):
        from crawlray.pipelines.textops import bm25_topk_ds

        out = bm25_topk_ds(self._docs(), ["join", "vector"], k=10).to_pandas()
        # brute-force the documented rational-BM25 by hand
        N, L = 5, 11          # null counts toward N, not L
        docs = {1: {"join": 2, "_dl": 3}, 2: {"join": 1, "_dl": 4},
                4: {"join": 1, "vector": 1, "_dl": 2}}
        df = {"join": 3, "vector": 1}
        exp = {}
        for d, tfs in docs.items():
            s = 0.0
            for t in sorted(["join", "vector"]):
                tf = tfs.get(t, 0)
                if tf:
                    w = float(20 * tf * L) / float(8 * L * tf + 3 * L
                                                   + 9 * tfs["_dl"] * N)
                    s += w * (float(2 * N + 1) / float(2 * df[t] + 1))
            exp[d] = s
        got = dict(zip(out["doc_id"], out["score"]))
        assert got == exp                      # bit-exact, incl. order of sums
        # ranking: doc 4 (both terms, short) must outrank the rest
        assert list(out["doc_id"])[0] == 4

    def test_topk_prune_parity(self, ray_session):
        # per-batch prune must not change the exact global top-k
        from crawlray.pipelines.textops import bm25_topk_ds

        t = pa.table({
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(["join " * (i % 7 + 1) + "pad " * (i % 13)
                              for i in range(200)], pa.string()),
        })
        ds = rd.from_arrow(t).repartition(8)
        a = bm25_topk_ds(ds, ["join"], k=5).to_pandas()
        b = bm25_topk_ds(ds, ["join"], k=5, per_batch_prune=False).to_pandas()
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert list(a["score"]) == list(b["score"])
        assert len(a) == 5


class TestPHash:
    def test_dhash_bit_semantics(self):
        from crawlray.pipelines.media import PHasher

        # strictly increasing grid -> every left<right -> no bits set
        assert PHasher.dhash64(bytes(range(72))) == 0
        # strictly decreasing -> every bit set
        assert PHasher.dhash64(bytes(range(255, 255 - 72, -1))) == (1 << 64) - 1

    def test_stub_raises_and_fake_deterministic(self, ray_session):
        import pyarrow as pa
        import pytest as _pytest

        from crawlray.pipelines.media import PHasher

        batch = pa.table({"media_ref": pa.array(["a.png"], pa.string()),
                          "payload": pa.array([b"xyz"], pa.binary())})
        with _pytest.raises(NotImplementedError):
            PHasher(backend="stub")(batch)
        t1, t2 = PHasher()(batch), PHasher()(batch)
        assert t1.equals(t2)
        sig = np.uint64(t1["simhash"][0].as_py())
        for band in range(4):
            assert t1[f"sh_band{band}"][0].as_py() == int(
                (sig >> np.uint64(band * 16)) & np.uint64(0xFFFF))

    def test_null_payload_dropped(self, ray_session):
        import pyarrow as pa

        from crawlray.pipelines.media import PHasher

        batch = pa.table({"media_ref": pa.array(["a", "b"], pa.string()),
                          "payload": pa.array([None, b"ok"], pa.binary())})
        out = PHasher()(batch)
        assert out["media_ref"].to_pylist() == ["b"]

    def test_banding_complete_vs_bruteforce(self, ray_session):
        # the banded pair set == brute-force all-pairs at hamming <= 3
        import itertools

        from crawlray.pipelines.dedup import banded_hamming_pairs
        from crawlray.pipelines.media import MediaFetcher, PHasher

        refs = [f"https://x.org/img/{i}.png" for i in range(150)]
        f, p = MediaFetcher(), PHasher()
        sigs, ids = {}, {}
        work = pa.table({"media_ref": pa.array(refs, pa.string())})
        fetched = f(work)
        sig_t = p(fetched)
        ds = rd.from_arrow(sig_t).repartition(5)
        got = banded_hamming_pairs(ds, max_hamming=3).to_pandas()
        got_pairs = set(zip(got["a"], got["b"], got["hamming"]))
        id_arr = sig_t["doc_id"].to_pylist()
        sg = sig_t["simhash"].to_pylist()
        exp = set()
        for (ia, sa), (ib, sb) in itertools.combinations(zip(id_arr, sg), 2):
            h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                a, b = sorted((ia, ib))
                exp.add((a, b, h))
        assert got_pairs == exp and len(exp) > 0


class TestBagSetOps:
    def _ds(self, vals):
        return rd.from_arrow(
            pa.table({"k": pa.array(vals, pa.int64())})).repartition(3)

    def test_intersect_all_multiplicity(self, ray_session):
        from crawlray.pipelines.relational import bucketed_set_op

        out = bucketed_set_op(self._ds([1, 1, 1, 2, 3]),
                              self._ds([1, 1, 2, 2, 4]),
                              ["k"], op="intersect all",
                              n_buckets=4).to_pandas()
        assert sorted(out["k"]) == [1, 1, 2]   # min(3,2)=2 ones, min(1,2)=1 two

    def test_except_all_multiplicity(self, ray_session):
        from crawlray.pipelines.relational import bucketed_set_op

        out = bucketed_set_op(self._ds([1, 1, 1, 2, 3]),
                              self._ds([1, 2, 2]),
                              ["k"], op="except all",
                              n_buckets=4).to_pandas()
        assert sorted(out["k"]) == [1, 1, 3]   # 3-1 ones, max(1-2,0) twos

    def test_null_matches_null_bag(self, ray_session):
        # SQL set ops treat NULL as equal to NULL — ALL variants too
        from crawlray.pipelines.relational import bucketed_set_op

        out = bucketed_set_op(self._ds([None, None, 5]),
                              self._ds([None, 6]),
                              ["k"], op="except all",
                              n_buckets=2).to_pandas()
        got = sorted((None if pd.isna(v) else int(v) for v in out["k"]),
                     key=lambda v: (v is not None, v))
        assert got == [None, 5]

    def test_empty_right_and_duckdb_parity(self, ray_session):
        import duckdb

        from crawlray.pipelines.relational import bucketed_set_op

        l = [1, 1, 2, 2, 2, 7, None, None]
        r = [2, 2, 2, 2, 7, None]
        for op, sql in [("intersect all", "INTERSECT ALL"),
                        ("except all", "EXCEPT ALL")]:
            out = bucketed_set_op(self._ds(l), self._ds(r), ["k"], op=op,
                                  n_buckets=3).to_pandas()
            lv = ",".join("(NULL)" if v is None else f"({v})" for v in l)
            rv = ",".join("(NULL)" if v is None else f"({v})" for v in r)
            exp = duckdb.sql(
                f"SELECT * FROM (VALUES {lv}) t(k) {sql} "
                f"SELECT * FROM (VALUES {rv}) s(k)").df()
            key = lambda v: (v is not None, v if v is not None else 0)
            a = sorted((None if pd.isna(v) else int(v) for v in out["k"]),
                       key=key)
            b = sorted((None if pd.isna(v) else int(v) for v in exp["k"]),
                       key=key)
            assert a == b, (op, a, b)
        # empty right: except all -> left bag unchanged (no repartition on
        # the empty side: Ray loses the schema of an empty repartition)
        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        out = bucketed_set_op(self._ds([1, 1]), empty, ["k"],
                              op="except all", n_buckets=2).to_pandas()
        assert sorted(out["k"]) == [1, 1]
