"""Round-3 additions: as-of join, sliding windows, repetition filters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame):
    """O(n*m) reference: latest right row with same key and rt <= lt."""
    out = []
    for _, lr in left.iterrows():
        cand = right[(right["user_id"] == lr["user_id"]) & (right["rt"] <= lr["lt"])]
        if len(cand):
            best = cand.sort_values("rt").iloc[-1]
            out.append((lr["lid"], best["rid"]))
        else:
            out.append((lr["lid"], None))
    return sorted(out, key=lambda x: x[0])


def test_asof_join_matches_brute_force():
    from crawlray.pipelines.relational import asof_join

    rs = np.random.RandomState(7)
    left = pd.DataFrame({
        "lid": np.arange(200),
        "user_id": rs.randint(0, 12, 200),
        "lt": rs.randint(0, 10_000, 200).astype("datetime64[us]"),
    })
    right = pd.DataFrame({
        "rid": np.arange(300) + 1000,
        "user_id": rs.randint(0, 15, 300),   # some keys only on one side
        "rt": rs.randint(0, 10_000, 300).astype("datetime64[us]"),
    })
    res = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="user_id", left_ts="lt", right_ts="rt", n_buckets=4,
    ).to_pandas()
    assert len(res) == len(left)
    got = sorted(
        (int(r["lid"]), None if pd.isna(r["rid"]) else int(r["rid"]))
        for _, r in res.iterrows()
    )
    assert got == _brute_asof(left, right)


def test_asof_join_exact_ts_matches_inclusive():
    # rt == lt must match (backward as-of is <=)
    from crawlray.pipelines.relational import asof_join

    left = pd.DataFrame({"lid": [1], "user_id": [5],
                         "lt": np.array([100], dtype="datetime64[us]")})
    right = pd.DataFrame({"rid": [9], "user_id": [5],
                          "rt": np.array([100], dtype="datetime64[us]")})
    res = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="user_id", left_ts="lt", right_ts="rt",
                    n_buckets=2).to_pandas()
    assert int(res["rid"].iloc[0]) == 9


def test_asof_join_empty_right_all_null():
    from crawlray.pipelines.relational import asof_join

    left = pd.DataFrame({"lid": [1, 2], "user_id": [5, 6],
                         "lt": np.array([100, 200], dtype="datetime64[us]")})
    right = pd.DataFrame({"rid": pd.array([], dtype="int64"),
                          "user_id": pd.array([], dtype="int64"),
                          "rt": np.array([], dtype="datetime64[us]")})
    res = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="user_id", left_ts="lt", right_ts="rt",
                    n_buckets=2).to_pandas()
    assert len(res) == 2
    assert res["rid"].isna().all()


def test_sliding_window_agg_matches_brute_force():
    from crawlray.pipelines.streaming import sliding_window_agg

    rs = np.random.RandomState(3)
    hours = rs.randint(0, 50, 500)
    offs = rs.randint(0, 3600_000_000, 500)
    ts = (hours.astype(np.int64) * 3600_000_000 + offs).astype("datetime64[us]")
    vals = np.round(rs.rand(500) * 50, 2)
    ev = pd.DataFrame({"ts": ts, "value": vals})
    got = (
        sliding_window_agg(rd.from_pandas(ev, override_num_blocks=4),
                           ts="ts", value="value",
                           width_hours=3, slide_hours=1)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    # brute force: every event lands in windows h-2, h-1, h
    cents = np.rint(vals * 100).astype(np.int64)
    rows = {}
    for h, c in zip(hours, cents):
        for w in (h - 2, h - 1, h):
            n, s = rows.get(w, (0, 0))
            rows[w] = (n + 1, s + c)
    exp = pd.DataFrame(
        {
            "window_start": np.array(sorted(rows), np.int64) * 3600_000_000,
            "n_events": [rows[w][0] for w in sorted(rows)],
            "cents_sum": [rows[w][1] for w in sorted(rows)],
        }
    )
    exp["window_start"] = exp["window_start"].astype("datetime64[us]")
    assert (got["window_start"].to_numpy() == exp["window_start"].to_numpy()).all()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["cents_sum"].tolist() == exp["cents_sum"].tolist()


def test_repetition_stats_hand_cases():
    from crawlray.pipelines.textops import repetition_stats

    batch = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a a b",            # top word 'a'x2, dup 2, bigrams: 'a a','a b' -> top 1
            "x y x y x",        # top 'x'x3, dup 5, bigrams 'x y'x2,'y x'x2 -> top 2
            "",                 # empty -> all zero
            "unique words only here",
        ],
    })
    out = repetition_stats(batch)
    assert out["n_words"].tolist() == [3, 5, 0, 4]
    assert out["top_word_n"].tolist() == [2, 3, 0, 1]
    assert out["dup_word_n"].tolist() == [2, 5, 0, 0]
    assert out["n_bigrams"].tolist() == [2, 4, 0, 3]
    assert out["top_bigram_n"].tolist() == [1, 2, 0, 1]


def test_crawl_values_oracle_matches_engine_rows():
    # the sequential VALUES oracle and the distributed q_crawl agree at
    # the oracle scale (the driver's check, run locally at sf0.01)
    import duckdb

    from crawlray.queries import _crawl_sql, q_crawl

    got = q_crawl("/root/testdata/sf0.01").to_pandas()
    exp = duckdb.sql(_crawl_sql()).df()
    got = got.sort_values("seq").reset_index(drop=True)
    exp = exp.sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
