"""Property-based robustness tests (hypothesis) for the pure kernels.

These guard the crawl invariants the conformance fixtures can't enumerate:
canonicalization idempotence, parser totality on arbitrary input, span
offset integrity, dedup stability.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlray.canon import canonicalize, host_of, is_valid_url, normalize_url
from crawlray.htmlx import parse_document

url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=80,
)
host_st = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,20}[a-z0-9])?(\.[a-z]{2,6}){1,2}",
                        fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)


@given(host=host_st, path=path_st,
       frag=st.text(alphabet="abc123", max_size=8),
       scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_wellformed(host, path, frag, scheme):
    url = f"{scheme}://{host.upper()}{path}#{frag}"
    c = canonicalize(url)
    assert c == canonicalize(c)          # idempotent
    assert "#" not in c                  # fragment stripped
    assert c.startswith(("http://", "https://"))
    assert host_of(c) == host            # host folded
    assert is_valid_url(c)


@given(raw=url_text, base_host=host_st)
@settings(max_examples=200, deadline=None)
def test_normalize_total(raw, base_host):
    # never raises on arbitrary href text
    base = f"https://{base_host}/a/b"
    out = normalize_url(raw, base)
    assert isinstance(out, str)
    canonicalize(raw, base)  # also total


@given(html=st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_parser_total_on_garbage(html):
    res = parse_document(html, "https://example.com")
    # spans are well-formed triples with contiguous offsets
    for i, (kind, text, ref) in enumerate(res.spans):
        assert kind in ("text", "heading", "image", "link")
        assert isinstance(text, str) and isinstance(ref, str)
    # text lines never contain newlines (line-per-span invariant)
    assert all("\n" not in t for t in res.text_lines())


@given(words=st.lists(st.sampled_from("alpha beta gamma delta".split()),
                      min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_parser_paragraph_roundtrip(words):
    html = "<html><body>" + "".join(f"<p>{w}</p>" for w in words) + "</body></html>"
    res = parse_document(html)
    assert [t for _, t, _ in res.spans] == words


@given(hrefs=st.lists(host_st, min_size=0, max_size=15))
@settings(max_examples=100, deadline=None)
def test_link_dedup_first_occurrence(hrefs):
    html = "<html><body>" + "".join(
        f'<a href="https://{h}/p">x</a>' for h in hrefs
    ) + "</body></html>"
    res = parse_document(html, "https://base.org")
    got = [l.url for l in res.links]
    expected, seen = [], set()
    for h in hrefs:
        u = f"https://{h}/p"
        if u not in seen:
            seen.add(u)
            expected.append(u)
    assert got == expected
    assert [l.rank for l in res.links] == list(range(len(got)))


# -- round-2 kernels ---------------------------------------------------------

@given(
    n=st.integers(1, 300),
    n_keys=st.integers(1, 8),
    gap=st.integers(1, 50),
    seed=st.integers(0, 1000),
)
@settings(max_examples=60, deadline=None)
def test_session_segmentation_matches_pandas(n, n_keys, gap, seed):
    """The vectorized segment kernel inside sessionize (boundaries,
    per-key numbering, per-segment aggregates) vs a pandas reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from crawlray.pipelines.streaming import sessionize

    rs = np.random.RandomState(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(rs.randint(0, 500, n), unit="s"),
        "user_id": rs.randint(0, n_keys, n),
        "cents": rs.randint(1, 100, n).astype("int64"),
    })
    # reference: per-user sorted gap segmentation
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    newkey = ref["user_id"].ne(ref["user_id"].shift())
    gap_break = (ref["ts"] - ref["ts"].shift()).dt.total_seconds() > gap
    bound = (newkey | gap_break)
    ref["sid"] = bound.cumsum()
    base = ref.loc[newkey, ["user_id", "sid"]].rename(columns={"sid": "base"})
    ref = ref.merge(base, on="user_id")
    ref["session_id"] = ref["sid"] - ref["base"] + 1
    exp = (ref.groupby(["user_id", "session_id"])
           .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                n_events=("cents", "size"), cents_sum=("cents", "sum"))
           .reset_index())
    # kernel under test (single in-process call of the map_groups fn)
    import crawlray.pipelines.streaming as strm

    tagged = pa.Table.from_pandas(df, preserve_index=False)
    got = None
    # run the inner sessions() by borrowing sessionize's machinery on one
    # partition: n_partitions=1 puts every key in one group
    import ray.data as rd

    out = sessionize(rd.from_pandas(df).repartition(3), "user_id", "ts",
                     "cents", "event_id", gap_seconds=float(gap),
                     n_partitions=2).to_pandas()
    got = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["cents_sum"].tolist() == exp["cents_sum"].tolist()
    assert got["session_start"].tolist() == exp["session_start"].tolist()
    assert got["session_end"].tolist() == exp["session_end"].tolist()


@given(
    n=st.integers(0, 200),
    n_groups=st.integers(1, 10),
    seed=st.integers(0, 1000),
)
@settings(max_examples=40, deadline=None)
def test_adjacent_pairs_chain_property(n, n_groups, seed):
    """adjacent_pairs_sorted emits exactly (size-1) chain pairs per group
    regardless of how block boundaries split the runs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from crawlray.util import adjacent_pairs_sorted

    rs = np.random.RandomState(seed)
    df = pd.DataFrame({
        "g": rs.randint(0, n_groups, n),
        "v": np.arange(n),
    })
    if n == 0:
        return
    ds = rd.from_pandas(df).repartition(4).sort(["g", "v"])
    out = adjacent_pairs_sorted(ds, ["g"], "v").to_pandas()
    sizes = df.groupby("g").size()
    expected = int((sizes - 1).clip(lower=0).sum())
    assert len(out) == expected
    if expected == 0:
        return  # empty Datasets lose their schema at to_pandas (known Ray quirk)
    # every pair is consecutive within its group
    byg = {g: sorted(s["v"]) for g, s in df.groupby("g")}
    pos = {g: {v: i for i, v in enumerate(vs)} for g, vs in byg.items()}
    gof = df.set_index("v")["g"].to_dict()
    for a, b in zip(out["a"], out["b"]):
        g = gof[a]
        assert gof[b] == g and pos[g][b] - pos[g][a] == 1


@given(seed=st.integers(0, 2000), n=st.integers(0, 600))
@settings(max_examples=40, deadline=None)
def test_cuckoo_vectorized_insert_properties(seed, n):
    """No false negatives after the vectorized insert path; idempotent."""
    import numpy as np

    from crawlray.state.cuckoo import CuckooFilter

    rs = np.random.RandomState(seed)
    h = rs.randint(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(capacity=max(64, n * 2))
    f.add_many(h)
    if n:
        assert f.contains_many(h).all()       # zero false negatives
    before = f.count
    f.add_many(h)                             # re-add: all present -> no-op
    assert f.count == before


@given(seed=st.integers(0, 2**16), n=st.integers(2, 400))
@settings(max_examples=60, deadline=None)
def test_count_min_linear_and_overestimates(seed, n):
    import numpy as np
    import pyarrow as pa

    from crawlray.pipelines.sketch import _cm_fold, _cm_row_idx, hash_col

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 50, n).astype(np.int64)
    a, b = vals[: n // 2], vals[n // 2:]
    d, w = 4, 1 << 8
    ha, hb, hall = (hash_col(pa.array(x, pa.int64())) for x in (a, b, vals))
    # linearity: sketch(A ∪ B) == sketch(A) + sketch(B), elementwise
    assert (_cm_fold(ha, d, w) + _cm_fold(hb, d, w)
            == _cm_fold(hall, d, w)).all()
    # point estimates never undercount
    keys = np.unique(vals)
    kh = hash_col(pa.array(keys, pa.int64()))
    tbl = _cm_fold(hall, d, w)
    est = np.full(len(keys), np.iinfo(np.int64).max)
    for r in range(d):
        est = np.minimum(est, tbl[r, _cm_row_idx(kh, r, w)])
    true = np.array([(vals == k).sum() for k in keys])
    assert (est >= true).all()


def _ed_dp(a: str, b: str) -> int:
    """Reference Levenshtein DP."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


short_name = st.text(alphabet="abc0", min_size=0, max_size=6)


@settings(max_examples=300, deadline=None)
@given(st.lists(short_name, min_size=2, max_size=12, unique=True))
def test_deletion_blocking_complete_and_verify_exact(names):
    """The q_host_near_matches kernel contracts: (1) _ed_le1 == DP <= 1
    on every pair; (2) deletion-neighborhood blocking is COMPLETE at
    radius 1 — every true pair shares a {s} ∪ del1(s) key."""
    from crawlray.queries import _ed_le1 as ed_le1

    def dkeys(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}

    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            truth = _ed_dp(a, b) <= 1
            assert ed_le1(a, b) == truth, (a, b)
            if truth:
                assert dkeys(a) & dkeys(b), (a, b)
