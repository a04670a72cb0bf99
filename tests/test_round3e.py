"""Wave-4 operator unit tests (round 3): semi join, rolling rows-window,
Misra-Gries heavy hitters, PII scan, normalization, table profile."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# -- semi join ---------------------------------------------------------------

def test_bucketed_semi_join_matches_pandas():
    from crawlray.pipelines.relational import bucketed_semi_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 50, 200), "v": np.arange(200)})
    right = pd.DataFrame({"k": rng.integers(25, 75, 300)})
    got = bucketed_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", n_buckets=4
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    exp = left[left["k"].isin(set(right["k"]))].sort_values(
        ["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # no multiplicity blow-up: output rows <= left rows even with dup keys
    assert len(got) <= len(left)


def test_bucketed_semi_join_empty_right():
    from crawlray.pipelines.relational import bucketed_semi_join

    left = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    right = pd.DataFrame({"k": pd.array([], dtype="int64")})
    out = bucketed_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", n_buckets=2
    )
    # all-empty Datasets lose their schema at to_pandas (known Ray quirk);
    # assert the typed schema on the Dataset itself
    assert out.schema().names == ["k", "v"]
    assert out.count() == 0


# -- rolling rows-window -----------------------------------------------------

def test_rolling_sum_rows_matches_pandas():
    from crawlray.pipelines.streaming import rolling_sum_rows

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "value": rng.uniform(-5, 5, n),
    })
    got = rolling_sum_rows(
        rd.from_pandas(df), key="user_id", ts="ts", id_col="event_id",
        val="value", window=4, n_partitions=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    s = df.copy()
    s["iv"] = np.floor(s["value"]).astype("int64")
    s = s.sort_values(["user_id", "ts", "event_id"])
    s["roll_sum"] = s.groupby("user_id")["iv"].transform(
        lambda x: x.rolling(4, min_periods=1).sum()
    ).astype("int64")
    exp = s.sort_values("event_id")[["event_id", "roll_sum"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["event_id", "roll_sum"]], exp,
                                  check_dtype=False)


# -- Misra-Gries heavy hitters -----------------------------------------------

def test_mg_reduce_undercount_bound():
    from crawlray.pipelines.sketch import _mg_reduce

    rng = np.random.default_rng(3)
    words = np.array([f"w{i}" for i in range(100)], dtype=object)
    counts = rng.integers(1, 50, 100).astype(np.int64)
    k = 10
    w, c = _mg_reduce(words, counts, k)
    assert len(w) <= k
    kept = dict(zip(w, c))
    # every estimate undercounts, by at most the subtracted (k+1)-th value
    sub = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    for word, true in zip(words, counts):
        est = kept.get(word, 0)
        assert est <= true
        assert true - est <= sub


def test_heavy_hitters_exact_on_skewed():
    from crawlray.pipelines.sketch import heavy_hitters

    # skewed corpus: 'hot' words comfortably above 1%, a long tail below
    rng = np.random.default_rng(5)
    docs = []
    for i in range(60):
        words = ["hot1"] * 30 + ["hot2"] * 20 + [
            f"tail{rng.integers(0, 5000)}" for _ in range(100)
        ]
        rng.shuffle(words)
        docs.append(" ".join(words))
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    got = heavy_hitters(ds, text_col="text", threshold_pm=10, k=256).to_pandas()

    all_words = [w for d in docs for w in d.split()]
    n = len(all_words)
    exact = pd.Series(all_words).value_counts()
    exp = exact[exact * 1000 >= n * 10]
    assert sorted(got["word"]) == sorted(exp.index)
    assert dict(zip(got["word"], got["n"])) == exp.to_dict()


def test_heavy_hitters_empty_docs():
    from crawlray.pipelines.sketch import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"text": ["", "  ", "a a a b"]}))
    got = heavy_hitters(ds, text_col="text", threshold_pm=500, k=8).to_pandas()
    # a: 3/4 = 750pm >= 500pm; b: 250pm < 500pm
    assert dict(zip(got["word"], got["n"])) == {"a": 3}


# -- PII scan + normalization (pure kernels, no Ray needed) -------------------

def test_pii_scanner_counts_and_redacts():
    from crawlray.pipelines.textops import PiiScanner

    scan = PiiScanner("id", "s")
    out = scan(pd.DataFrame({
        "id": [1, 2, 3],
        "s": ["call 25-989-741-2988 or 11-222-333-4444",
              "no numbers here",
              "x 99-111-222-3333 y"],
    }))
    assert out["n_pii"].tolist() == [2, 0, 1]
    assert out["redacted"].tolist() == [
        "call <PHONE> or <PHONE>", "no numbers here", "x <PHONE> y",
    ]


def test_text_normalizer():
    from crawlray.pipelines.textops import TextNormalizer

    import hashlib

    norm = TextNormalizer()
    out = norm(pd.DataFrame({"doc_id": [1, 2],
                             "text": ["  Hello, WORLD!!  x9 ", ""]}))
    assert out["norm_len"].tolist() == [len("hello world x9"), 0]
    assert out["norm_fp"][0] == hashlib.md5(b"hello world x9").hexdigest()


# -- table profile -----------------------------------------------------------

def test_table_profile_nulls_and_minmax():
    from crawlray.pipelines.stats import table_profile

    df = pd.DataFrame({
        "a": pd.array([1, None, 5, 3], dtype="Int64"),
        "b": pd.array([10, 20, 30, 40], dtype="Int64"),
    })
    got = table_profile(
        rd.from_arrow(pa.Table.from_pandas(df)), ["a", "b"]
    ).to_pandas().set_index("col")
    assert got.loc["a", "n_rows"] == 4 and got.loc["a", "n_nulls"] == 1
    assert got.loc["a", "min_v"] == 1 and got.loc["a", "max_v"] == 5
    assert got.loc["b", "n_nulls"] == 0 and got.loc["b", "max_v"] == 40


# -- shared ngram stats --------------------------------------------------------

def test_shared_ngram_stats_matches_bruteforce():
    from crawlray.pipelines.dedup import shared_ngram_stats, word_shingles

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e f",          # shares 'a b c d'... with doc 2
            "a b c d x y",
            "p q r s t",            # unique grams
            "too short",            # < 4 words -> no grams, absent from output
            "a b c d e f",          # exact dup of doc 1
        ],
    })
    got = shared_ngram_stats(
        rd.from_pandas(docs), n=4, n_buckets=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    grams = {i: set(word_shingles(t, 4)) for i, t in
             zip(docs["doc_id"], docs["text"])}
    from collections import Counter
    cnt = Counter(g for gs in grams.values() for g in gs)
    exp = pd.DataFrame([
        {"doc_id": i, "n_grams": len(gs),
         "n_shared": sum(1 for g in gs if cnt[g] >= 2)}
        for i, gs in grams.items() if gs
    ])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # doc 4 has no 4-grams and must be absent
    assert 4 not in set(got["doc_id"])


# -- corpus mix + group sample -------------------------------------------------

def test_mix_corpora_deterministic_across_batching():
    from crawlray.pipelines.textops import mix_corpora

    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "source": pa.array(["a" if i % 3 else "b" for i in range(200)])})
    rates = {"b": 300}
    whole = mix_corpora(t, rates)
    # same rows regardless of how the input was batched
    parts = pa.concat_tables([mix_corpora(t.slice(0, 67), rates),
                              mix_corpora(t.slice(67, 70), rates),
                              mix_corpora(t.slice(137), rates)])
    assert whole.equals(parts)
    # kept 'b' rows are a strict subset at rate 300pm; 'a' keeps all
    kept = whole.to_pandas()
    assert (kept[kept.source == "a"].shape[0]
            == sum(1 for i in range(200) if i % 3))
    assert 0 < kept[kept.source == "b"].shape[0] < sum(
        1 for i in range(200) if i % 3 == 0)
    # mix_pos is a pure function of doc_id (stable shuffle key)
    again = mix_corpora(t, rates).to_pandas()
    assert dict(zip(kept.doc_id, kept.mix_pos)) == dict(
        zip(again.doc_id, again.mix_pos))


def test_group_sample_query_shape():
    import __ray_entry__ as em

    df = em.queries()["group_sample"]("/root/testdata/sf0.001").to_pandas()
    # at most k rows per group, deterministic across calls
    assert df.groupby("lang").size().max() <= 20
    df2 = em.queries()["group_sample"]("/root/testdata/sf0.001").to_pandas()
    a = df.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = df2.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# -- left outer join -----------------------------------------------------------

def test_bucketed_hash_join_left_outer():
    from crawlray.pipelines.relational import bucketed_hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": [2, 4, 4], "rv": [20, 40, 41]})
    got = bucketed_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k",
        n_buckets=2, join_type="left outer",
    ).to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
    exp = left.merge(right, on="k", how="left").sort_values(
        ["k", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # unmatched keys survive with null right columns
    assert got[got.k == 1]["rv"].isna().all()


def test_bucketed_hash_join_left_outer_empty_right():
    from crawlray.pipelines.relational import bucketed_hash_join

    left = pd.DataFrame({"k": [1, 2], "lv": ["a", "b"]})
    right = pd.DataFrame({"k": pd.array([], dtype="int64"),
                          "rv": pd.array([], dtype="int64")})
    got = bucketed_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", n_buckets=2, join_type="left outer",
    ).to_pandas()
    assert len(got) == 2 and got["rv"].isna().all()


# -- ntile -----------------------------------------------------------------------

def test_ntile_distribution_and_order():
    from crawlray.pipelines.streaming import ntile_per_key

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 100_000, n), unit="s"),
    })
    k = 4
    got = ntile_per_key(
        rd.from_pandas(df), key="user_id", ts="ts", id_col="event_id",
        k=k, n_partitions=4,
    ).to_pandas()
    m = df.merge(got, on="event_id")
    for uid, g in m.groupby("user_id"):
        sizes = g["tile"].value_counts()
        n_u = len(g)
        # SQL ntile: first n%k tiles get ceil(n/k), rest floor(n/k)
        big, small, r = -(-n_u // k), n_u // k, n_u % k
        exp = {t: (big if t <= r else small) for t in range(1, k + 1)
               if (big if t <= r else small) > 0}
        assert sizes.to_dict() == exp, uid
        # tiles are non-decreasing in (ts, event_id) order
        ordered = g.sort_values(["ts", "event_id"])["tile"].to_numpy()
        assert (np.diff(ordered) >= 0).all()


def test_ntile_fewer_rows_than_tiles():
    from crawlray.pipelines.streaming import ntile_per_key

    df = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [9, 9],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
    })
    got = ntile_per_key(
        rd.from_pandas(df), key="user_id", ts="ts", id_col="event_id",
        k=8, n_partitions=2,
    ).to_pandas().sort_values("event_id")
    assert got["tile"].tolist() == [1, 2]
