"""Round-3 wave 3: anti join, lag windows, sequence packing, decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_anti_join_matches_pandas():
    from crawlray.pipelines.relational import bucketed_anti_join

    rs = np.random.RandomState(7)
    left = pd.DataFrame({"k": np.arange(200), "name": [f"n{i}" for i in range(200)]})
    right = pd.DataFrame({"k": rs.randint(0, 150, 500), "x": rs.rand(500)})
    got = bucketed_anti_join(
        rd.from_pandas(left, override_num_blocks=4),
        rd.from_pandas(right, override_num_blocks=3),
        key="k", n_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = (
        left[~left["k"].isin(set(right["k"]))]
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(exp) > 0
    assert list(got.columns) == ["k", "name"]   # left columns only


def test_anti_join_empty_right_keeps_all():
    from crawlray.pipelines.relational import bucketed_anti_join

    left = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    right = pd.DataFrame({"k": pd.array([], dtype="int64")})
    got = bucketed_anti_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", n_buckets=2
    ).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, left, check_dtype=False)


def test_lag_gap_matches_pandas():
    from crawlray.pipelines.streaming import lag_gap

    rs = np.random.RandomState(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rs.randint(0, 25, n),
        "ts": rs.randint(0, 10_000_000, n).astype("datetime64[us]"),
    })
    got = (
        lag_gap(rd.from_pandas(df, override_num_blocks=4),
                key="user_id", ts="ts", id_col="event_id", n_partitions=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    tus = s["ts"].astype("datetime64[us]").astype("int64")
    prev = tus.groupby(s["user_id"]).shift()
    exp = pd.DataFrame({
        "event_id": s["event_id"],
        "gap_us": (tus - prev).fillna(-1).astype("int64"),
    }).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (exp["gap_us"] == -1).sum() == 25   # one first-event per user


def test_pack_chunks_matches_numpy():
    from crawlray.pipelines.streaming import pack_chunks

    rs = np.random.RandomState(9)
    wc = rs.randint(0, 900, 300)
    wc[::17] = 0                      # zero-token docs occupy their chunk
    wc[5] = 5000                      # a doc straddling multiple chunks
    df = pd.DataFrame({"doc_id": np.arange(300), "word_count": wc})
    shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    got = (
        pack_chunks(rd.from_pandas(shuffled, override_num_blocks=5),
                    order_col="doc_id", tokens_col="word_count", capacity=256)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    off = np.cumsum(wc) - wc
    exp = pd.DataFrame({
        "doc_id": np.arange(300),
        "n_tokens": wc.astype("int64"),
        "token_offset": off.astype("int64"),
        "chunk_start": (off // 256).astype("int64"),
        "chunk_end": ((off + np.maximum(wc, 1) - 1) // 256).astype("int64"),
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the global stream is contiguous: each doc starts where the previous ended
    assert (np.diff(got["token_offset"]) == wc[:-1]).all()
    assert (got.loc[5, "chunk_end"] - got.loc[5, "chunk_start"]) >= 19


def test_hll_approx_distinct_within_error():
    from crawlray.pipelines.sketch import approx_distinct

    rs = np.random.RandomState(2)
    n_distinct = 20_000
    vals = rs.randint(0, n_distinct, 60_000)        # heavy duplication
    # int column AND string column paths
    df = pd.DataFrame({"k": vals, "s": [f"url-{v}" for v in vals]})
    ds = rd.from_pandas(df, override_num_blocks=6)
    true = len(np.unique(vals))
    for col in ("k", "s"):
        est = approx_distinct(ds, col, p=12)
        assert abs(est - true) / true < 0.05, (col, est, true)


def test_hll_merge_equals_single_fold():
    """Register-max merge over split blocks == one fold over all rows
    (the mergeability contract that makes the sketch distributable)."""
    from crawlray.pipelines.sketch import _hll_fold, hll_estimate
    from crawlray.util import hash64

    vals = [f"v{i}" for i in range(5000)]
    h = hash64(vals)
    whole = _hll_fold(h, 10)
    merged = np.maximum(_hll_fold(h[:2000], 10), _hll_fold(h[2000:], 10))
    assert (whole == merged).all()
    assert hll_estimate(whole) > 0


def test_decontaminate_counts_planted_overlap():
    """The eval-set broadcast + per-batch distinct-shingle intersection
    counts exactly, verified against a pure-python pass at sf0.001."""
    from crawlray.pipelines.dedup import word_shingles
    from crawlray.queries import DECON_EVAL_MOD, DECON_NGRAM, q_decontaminate

    sf = "/root/testdata/sf0.001"
    got = q_decontaminate(sf).to_pandas().set_index("doc_id")["n_hits"]
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ev = set()
    for t in docs[docs["doc_id"] % DECON_EVAL_MOD == 0]["text"]:
        ev.update(word_shingles(t, DECON_NGRAM))
    train = docs[docs["doc_id"] % DECON_EVAL_MOD != 0]
    for did, text in zip(train["doc_id"], train["text"]):
        assert got[did] == len(set(word_shingles(text, DECON_NGRAM)) & ev)
    assert len(got) == len(train)
    assert set(got.index) == set(train["doc_id"])
