"""Round-4 regression tests: the near-dup family's size-gated regime
switch (no unique()-to-driver above the cap — round-3 VERDICT task 1),
auto-sized broadcast caps, null-key semi/anti join semantics and
null-text kernels (round-3 ADVICE)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def _dup_doc_rows():
    rows = [{"doc_id": i, "text": "alpha beta gamma delta epsilon zeta " * 6}
            for i in (1, 2)]
    rows.append({"doc_id": 3, "text": "unrelated totally different corpus text " * 6})
    return rows


def _planted_emb_rows():
    rs = np.random.RandomState(0)
    base = rs.randn(40, 16)
    vecs = {i: base[i] for i in range(40)}
    vecs[40] = base[7] + rs.randn(16) * 0.01
    vecs[41] = base[7].copy()
    return [{"vec_id": i, "embedding": v.tolist()} for i, v in vecs.items()]


def _forbid_driver_collection(monkeypatch):
    def boom(self, *a, **k):
        raise AssertionError("driver funnel: Dataset collected on the driver")

    monkeypatch.setattr(rd.Dataset, "iter_batches", boom)
    monkeypatch.setattr(rd.Dataset, "to_pandas", boom)
    # the round-3 residual: unique() materializes a Python list on the
    # driver — above the broadcast cap it must never be called
    monkeypatch.setattr(rd.Dataset, "unique", boom)
    # take_all stays allowed: the embedding path's limit(1).take_all()
    # dim probe is O(1), not a candidate-sized funnel


def test_minhash_join_regime_never_calls_unique(monkeypatch):
    from crawlray.pipelines.dedup import minhash_lsh_pairs

    ds = rd.from_items(_dup_doc_rows())
    _forbid_driver_collection(monkeypatch)
    out = minhash_lsh_pairs(ds, jaccard_threshold=0.5, broadcast_max_docs=0)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    got = sorted(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    assert got == [(1, 2)]


def test_embedding_lsh_join_regime_never_calls_unique(monkeypatch):
    from crawlray.pipelines.ann import embedding_lsh_pairs

    ds = rd.from_items(_planted_emb_rows())
    _forbid_driver_collection(monkeypatch)
    out = embedding_lsh_pairs(ds, cos_threshold=0.95, broadcast_max_docs=0)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    assert t.num_rows >= 2


def test_auto_broadcast_cap_budget_math():
    from crawlray.util import auto_broadcast_cap

    # explicit store size: budget = fraction * store // item_bytes
    assert auto_broadcast_cap(1024, fraction=0.25,
                              object_store_bytes=1 << 30) == (1 << 28) // 1024
    # degenerate budgets still allow the trivially-small case
    assert auto_broadcast_cap(1 << 40, object_store_bytes=1024) == 1
    # store discovery path returns something positive in a live session
    assert auto_broadcast_cap(8192) >= 1


def test_lsh_auto_cap_regimes_match_fixed(monkeypatch):
    # broadcast_max_docs=None (auto) must produce the identical pair set
    # (regime choice never changes results — both share one verify kernel)
    from crawlray.pipelines.dedup import minhash_lsh_pairs

    ds = rd.from_items(_dup_doc_rows())

    def norm(d):
        t = pa.concat_tables(ray.get(d.to_arrow_refs()))
        return sorted(zip(t["a"].to_pylist(), t["b"].to_pylist(),
                          t["jaccard"].to_pylist()))

    fixed = norm(minhash_lsh_pairs(ds, jaccard_threshold=0.5))
    auto = norm(minhash_lsh_pairs(ds, jaccard_threshold=0.5,
                                  broadcast_max_docs=None))
    assert fixed == auto and len(fixed) == 1


def test_semi_join_null_keys_never_match():
    # SQL EXISTS: NULL = NULL is never true — a null left key must not
    # survive a semi join even when the right side also has a null key
    from crawlray.pipelines.relational import bucketed_semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "v": pa.array(["a", "b", "c"]),
    }))
    right = rd.from_arrow(pa.table({"k": pa.array([2, None], pa.int64())}))
    out = pa.concat_tables(
        ray.get(bucketed_semi_join(left, right, "k", n_buckets=4).to_arrow_refs())
    )
    assert out["v"].to_pylist() == ["b"]


def test_anti_join_null_keys_are_kept():
    # SQL NOT EXISTS: a NULL-key left row is kept (NULL = x never true),
    # even when the right side contains a null key
    from crawlray.pipelines.relational import bucketed_anti_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "v": pa.array(["a", "b", "c"]),
    }))
    right = rd.from_arrow(pa.table({"k": pa.array([2, None], pa.int64())}))
    out = pa.concat_tables(
        ray.get(bucketed_anti_join(left, right, "k", n_buckets=4).to_arrow_refs())
    )
    assert sorted(out["v"].to_pylist()) == ["a", "c"]


def test_full_outer_join_two_sided():
    # unmatched rows on BOTH sides survive with the other side's columns
    # null and the key coalesced (Acero full outer behavior, bucketed)
    from crawlray.pipelines.relational import bucketed_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 4], pa.int64()),
        "a": pa.array(["x", "y", "w"]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()),
        "b": pa.array([20, 30], pa.int64()),
    }))
    out = pa.concat_tables(ray.get(
        bucketed_hash_join(left, right, "k", n_buckets=4,
                           join_type="full outer").to_arrow_refs()
    )).sort_by("k")
    assert out["k"].to_pylist() == [1, 2, 3, 4]
    assert out["a"].to_pylist() == ["x", "y", None, "w"]
    assert out["b"].to_pylist() == [None, 20, 30, None]


def test_pii_scanner_null_text():
    from crawlray.pipelines.textops import PiiScanner

    sc = PiiScanner("id", "txt", pattern=r"\d+", repl="<N>")
    out = sc(pd.DataFrame({"id": [1, 2], "txt": ["a 42 b", None]}))
    assert out["n_pii"].tolist() == [1, 0]
    assert out["redacted"].tolist() == ["a <N> b", ""]


def test_text_normalizer_null_text():
    import hashlib

    from crawlray.pipelines.textops import TextNormalizer

    tn = TextNormalizer()
    out = tn(pd.DataFrame({"doc_id": [1, 2], "text": ["A-B", None]}))
    assert out["norm_len"].tolist() == [3, 0]
    assert out["norm_fp"].tolist()[1] == hashlib.md5(b"").hexdigest()


def test_soak_trace_parser():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    text = (
        "[trace r0] politeness-select: 0.10s\n"
        "noise line\n"
        "[trace r0] write-frontier: 2.15s\n"
        "[trace r12] candidates+winners: 47.90s\n"
    )
    got = bench._parse_trace(text)
    assert got == {0: {"politeness-select": 0.10, "write-frontier": 2.15},
                   12: {"candidates+winners": 47.90}}


def test_ann_ivf_sql_uses_oracle_sf_dir():
    # ADVICE: the centroid-literal oracle must read the gate's SF dir,
    # not a second hardcoded path that can silently diverge
    import inspect

    from crawlray import queries

    src = inspect.getsource(queries._ann_ivf_sql.__wrapped__)
    assert "_ORACLE_SF_DIR" in src
    assert "/root/testdata/sf0.01/embeddings.parquet" not in src
