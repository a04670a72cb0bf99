"""Deduplication family over the ``documents`` table.

Exact + near-dup operators, each expressed Ray-Data-first:

- **exact**: md5 content hash in a vectorized ``map_batches`` + one
  ``groupby(hash)`` over the (hash, doc_id) projection only — never the
  payload; keep min doc_id.
- **MinHash + LSH**: per-batch shingle->minhash signatures (numpy,
  vectorized over each doc's shingle-hash array), explode to
  ``(band_id, band_hash)`` rows, sort by (band, hash, doc) and extract
  adjacent chain pairs per bucket vectorized (connectivity-equivalent to
  star pairing, O(bucket) rows, NO per-group ``map_groups`` call
  explosion), distributed pair dedup, then a DISTRIBUTED exact-Jaccard
  verify: candidate docs' shingle-hash sets pack to binary and resolve
  via a broadcast dict (small-candidate regime) or two
  ``bucketed_hash_join``s (huge-candidate regime); the Jaccard check
  runs inside ``map_batches``. No full-corpus driver scan.
- **SimHash**: 64-bit signatures via sign-aggregated token hashes;
  near-dup blocking by 4x16-bit band exact match (complete for
  Hamming<=3 by pigeonhole). ALL intra-bucket pairs are emitted and
  Hamming-verified vectorized inside the bucket task; buckets larger
  than ``max_bucket`` (hash-degenerate hot buckets) degrade to
  bucket-min star pairing, which preserves connectivity but not pair
  completeness — documented, bounded fallback.
- **n-gram Jaccard**: exact pairwise Jaccard over word n-gram sets for a
  bounded candidate set (the verify kernel of the LSH path, exposed
  standalone).

At 100 TB, only hashes/signatures and candidate-pair ids ever shuffle
(fixed-width); payload text stays columnar at rest — the verify join ships
packed shingle hashes for candidate docs only. The small sf tables here
exercise the same plans.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

_log = logging.getLogger("crawlray.dedup")

_MERSENNE = (1 << 61) - 1


def _stable_u64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of a token list (polars SipHash with a fixed
    seed — process-independent and vectorized; a per-token Python
    hashlib loop here was the MinHash signature stage's bottleneck)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    from ..util import hash64

    return hash64(tokens)


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Word n-grams; docs shorter than ``n`` words have NO shingles (the
    same contract as the DuckDB oracle's range comprehension in
    ``SQL_NGRAM_JACCARD`` — two shingle-less docs are trivially identical
    under Jaccard-with-empty-union = 1)."""
    words = text.split()
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


# -- exact dedup -------------------------------------------------------------

def exact_dedup_groups(docs: rd.Dataset) -> rd.Dataset:
    """(fp, n_dups, keep_doc_id): one row per distinct content hash."""
    from .textops import fingerprint

    hashed = docs.map_batches(fingerprint, batch_format="pyarrow")
    return hashed.groupby("fp").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="keep_doc_id")
    )


# -- MinHash + LSH -----------------------------------------------------------

def _md5_u64(tokens: list[str], cache: dict) -> np.ndarray:
    """md5-upper-8 little-endian per token (== DuckDB ``md5_number_upper``)
    — the md5 loop runs once per UNIQUE token, cached across batches."""
    uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    vals = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            cache[t] = v
        vals[i] = v
    return vals[inv]


class MinHasher:
    """Per-batch MinHash signatures: ``num_perm`` universal hashes
    ``(a*x + b) mod p`` over word-``n``-gram shingle hashes. The
    permutation table builds once per actor.

    ``token_hash``: "sip" (polars SipHash — fastest, the scale default)
    or "md5" (md5-upper-8 == DuckDB ``md5_number_upper``, so the whole
    signature->band->pair chain is restatable in the SQL oracle,
    ``SQL_MINHASH_DEDUP``)."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 13,
                 token_hash: str = "sip"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        assert token_hash in ("sip", "md5")
        self.token_hash = token_hash
        self._cache: dict[str, int] = {}

    def _hash_shingles(self, sh: list[str]) -> np.ndarray:
        if self.token_hash == "md5":
            return _md5_u64(sh, self._cache)
        return _stable_u64(sh)

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.shingle_n)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = self._hash_shingles(sh) % _MERSENNE
        # (num_perm, n_shingles) without materializing huge intermediates:
        # chunk shingles if very long
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"], "sig": sigs})


def _band_rows(batch: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    """Explode signatures to (doc_id, band_id, band_hash) rows. The band
    hash is a vectorized FNV-1a fold over the band's minhash values — one
    numpy pass per band column, no per-row Python hashing."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "band_id": pd.Series([], dtype=np.int64),
            "band_hash": pd.Series([], dtype=np.int64),
        })
    sig = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig"]])
    hashes = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        h = np.full(n, 0xCBF29CE484222325, np.uint64)
        for c in range(chunk.shape[1]):
            h = (h ^ chunk[:, c]) * np.uint64(0x100000001B3)
        hashes[:, b] = h
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(ids, bands),
            "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": (hashes >> np.uint64(1)).astype(np.int64).ravel(),
        }
    )


class ShinglePacker:
    """(doc_id, sh): sorted unique shingle hashes packed as little-endian
    uint64 bytes (binary is joinable through Acero, list columns are not).
    ``ids_ref`` (a broadcast candidate-id set, fetched from the object
    store once per actor) filters the batch first; ``None`` means the
    input was already reduced to candidates (the semi-join regime) and
    every row packs."""

    def __init__(self, ids_ref, shingle_n: int):
        import ray

        self.ids = None if ids_ref is None else ray.get(ids_ref)
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (np.ones(len(ids), dtype=bool) if self.ids is None
             else np.isin(ids, self.ids))
        texts = batch["text"].to_pylist()
        packs = [
            np.unique(_stable_u64(word_shingles(texts[i], self.shingle_n))).tobytes()
            for i in np.flatnonzero(m)
        ]
        # typed Arrow output even when empty: an empty pandas frame here
        # degrades the unioned block schema (null/float columns) and breaks
        # the downstream Acero joins
        return pa.table(
            {"doc_id": pa.array(ids[m], pa.int64()), "sh": pa.array(packs, pa.binary())}
        )


def _jaccard_rows(a, b, packs_a, packs_b, threshold: float) -> pa.Table:
    """Exact-Jaccard verify kernel over packed shingle-hash arrays."""
    oa, ob, oj = [], [], []
    for i in range(len(a)):
        A = np.frombuffer(packs_a[i], dtype=np.uint64)
        B = np.frombuffer(packs_b[i], dtype=np.uint64)
        ni = np.intersect1d(A, B, assume_unique=True).size
        union = A.size + B.size - ni
        # raw IEEE quotient: ni/union is the same double in numpy and in
        # DuckDB (ni::DOUBLE / union), so the oracle hash-matches bit-exact
        j = (ni / union) if union else 1.0
        if j >= threshold:
            oa.append(int(a[i])); ob.append(int(b[i])); oj.append(j)
    return pa.table(
        {"a": pa.array(oa, pa.int64()), "b": pa.array(ob, pa.int64()),
         "jaccard": pa.array(oj, pa.float64())}
    )


class _VerifyBroadcast:
    """Exact-Jaccard verify against a broadcast {doc_id: packed shingles}
    dict (candidate docs only — the small side; ``ray.put`` once, fetched
    per actor)."""

    def __init__(self, lookup_ref, threshold: float):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        lk = self.lookup
        return _jaccard_rows(a, b, [lk[int(x)] for x in a],
                             [lk[int(x)] for x in b], self.threshold)


def minhash_lsh_pairs(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    broadcast_max_docs: int | None = None,
    token_hash: str = "sip",
    est_doc_bytes: int = 2048,
) -> rd.Dataset:
    """Verified near-dup pairs (a, b, jaccard >= threshold) via banded
    MinHash-LSH. Every stage is distributed:

    band rows -> sort by (band, hash, doc) -> vectorized adjacent chain
    pairs per bucket (connectivity-equivalent to star pairing, no
    per-group map_groups call explosion) -> sort+keep-first pair dedup ->
    shingle packs for candidate docs only -> exact-Jaccard verify inside
    ``map_batches``.

    Regime switch (size-gated BEFORE anything reaches the driver, on the
    materialized pair count — distinct candidate ids are bounded by
    2 x pairs): while ``2*pairs <= broadcast_max_docs`` the candidate ids
    collect once into a sorted int64 vector (``ray.put``) and the verify
    resolves shingles via a broadcast dict; beyond that NOTHING
    candidate-sized touches the driver — the distinct-id *Dataset* filters
    the doc side via :func:`~crawlray.pipelines.relational.bucketed_semi_join`
    and the verify resolves shingles via two ``bucketed_hash_join``s
    pairs<-shingles. ``broadcast_max_docs=None`` derives the cap from the
    object-store budget (:func:`~crawlray.util.auto_broadcast_cap`,
    ``est_doc_bytes`` per candidate doc); the chosen regime is logged.
    """
    import ray

    from ..util import (adjacent_pairs_sorted, auto_broadcast_cap,
                        drop_empty_blocks, keep_first_sorted)
    from .relational import bucketed_hash_join, bucketed_semi_join

    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_args=(num_perm, shingle_n, 13, token_hash),
        batch_format="pandas",
        batch_size=1024,
        concurrency=(2, 12),
        num_cpus=1,
    )
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )
    cand = adjacent_pairs_sorted(
        banded.sort(["band_id", "band_hash", "doc_id"]),
        ["band_id", "band_hash"], "doc_id",
    )
    # distinct (a, b): sort + adjacent keep-first, no driver pass
    cand = keep_first_sorted(cand.sort(["a", "b"]), ["a", "b"])

    def ids_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )
        import pyarrow.compute as pc

        return pa.table({"doc_id": pc.unique(both)})

    empty = pa.table(
        {"a": pa.nulls(0, pa.int64()), "b": pa.nulls(0, pa.int64()),
         "jaccard": pa.nulls(0, pa.float64())}
    )
    cand = cand.materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return rd.from_arrow(empty)
    cap = (auto_broadcast_cap(est_doc_bytes) if broadcast_max_docs is None
           else broadcast_max_docs)

    if 2 * n_pairs <= cap:
        # small-candidate regime: distinct ids (bounded by 2*pairs <= cap)
        # collect once into a sorted int64 vector, broadcast via ray.put
        _log.info("minhash_lsh_pairs: regime=broadcast pairs=%d cap=%d",
                  n_pairs, cap)
        involved = np.array(
            sorted(cand.map_batches(ids_of, batch_format="pyarrow").unique("doc_id")),
            dtype=np.int64,
        )
        ids_ref = ray.put(involved)
        shingles = docs.map_batches(
            ShinglePacker,
            fn_constructor_args=(ids_ref, shingle_n),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=1,
        ).materialize()  # small side (candidate docs only)
        lookup: dict[int, bytes] = {}
        for t in ray.get(shingles.to_arrow_refs()):
            if t.num_rows == 0:
                # Ray can emit a schema-LESS empty block from an actor
                # batch that produced no rows (tiny-input worlds);
                # indexing t["doc_id"] on it raises
                continue
            lookup.update(zip(t["doc_id"].to_pylist(), t["sh"].to_pylist()))
        lk_ref = ray.put(lookup)
        return cand.map_batches(
            _VerifyBroadcast,
            fn_constructor_args=(lk_ref, jaccard_threshold),
            batch_format="pyarrow",
            concurrency=2,
            num_cpus=0.5,
        )

    # huge-candidate regime: candidate ids stay a Dataset end-to-end — the
    # distinct-id Dataset (sort + keep-first, never unique()-to-driver)
    # semi-joins the doc side down to candidates before shingling
    _log.info("minhash_lsh_pairs: regime=semi-join pairs=%d cap=%d",
              n_pairs, cap)
    ids_ds = keep_first_sorted(
        cand.map_batches(ids_of, batch_format="pyarrow").sort("doc_id"),
        ["doc_id"],
    )
    # bloom pre-filter: non-candidate docs drop inside the split task, so
    # their text payloads never enter the exchange
    shingles = drop_empty_blocks(bucketed_semi_join(
        docs.select_columns(["doc_id", "text"]), ids_ds, "doc_id",
        n_buckets=8, bloom_bits=1 << 22
    )).map_batches(
        ShinglePacker,
        fn_constructor_args=(None, shingle_n),
        batch_format="pyarrow",
        concurrency=(2, 8),
        num_cpus=1,
    ).materialize()

    sh_a = shingles.map_batches(
        lambda t: t.rename_columns(["a", "sh_a"]), batch_format="pyarrow"
    )
    sh_b = shingles.map_batches(
        lambda t: t.rename_columns(["b", "sh_b"]), batch_format="pyarrow"
    )
    joined = drop_empty_blocks(bucketed_hash_join(
        bucketed_hash_join(cand, sh_a, "a", n_buckets=8), sh_b, "b", n_buckets=8
    ))

    def verify(t: pa.Table) -> pa.Table:
        return _jaccard_rows(
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["sh_a"].to_pylist(), t["sh_b"].to_pylist(), jaccard_threshold,
        )

    # typed 0-row head block keeps the unioned schema stable even if
    # every verify block comes back empty
    return rd.from_arrow(empty).union(
        joined.map_batches(verify, batch_format="pyarrow")
    )


def fuzzy_decontaminate(
    docs: rd.Dataset,
    eval_mod: int = 10,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    token_hash: str = "sip",
) -> rd.Dataset:
    """ASYMMETRIC MinHash-LSH decontamination: verified (train_id,
    eval_id, jaccard >= threshold) pairs where the eval side is the
    docs with ``doc_id % eval_mod == 0`` (membership a pure function of
    the id, so the oracle restates it) — the fuzzy complement of the
    exact 5-gram ``decontaminate``: an eval document rewritten or
    lightly edited into the training corpus still collides in a band.

    Unlike :func:`minhash_lsh_pairs`' symmetric within-bucket CHAIN
    pairing (connectivity-equivalent, but a train-eval pair bridged by
    another train doc would not surface as an edge), candidates here
    are ALL cross-side band collisions: train band rows composite-join
    eval band rows on (band_hash, band_id) — the eval side is tiny, so
    each bucket's join is small-side-bounded — then distinct pairs via
    sort + keep-first, then the same fully distributed verify as the
    huge-candidate regime (bloom-gated semi-join shingle resolution +
    two hash joins; nothing candidate-sized on the driver)."""
    import ray

    from ..util import drop_empty_blocks, keep_first_sorted
    from .relational import bucketed_hash_join, bucketed_semi_join

    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_args=(num_perm, shingle_n, 13, token_hash),
        batch_format="pandas",
        batch_size=1024,
        concurrency=(2, 12),
        num_cpus=1,
    )
    # materialize: BOTH sides consume the band rows — left lazy, Ray
    # re-executes the whole signature chain once per consumer (measured
    # 13.8 s -> 8.3 s at sf0.1). Fixed-width rows; spillable at scale.
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    ).materialize()

    def side(is_eval: bool, out: str):
        def pick(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % eval_mod == 0) == is_eval
            t = t.filter(pa.array(m))
            return pa.table({
                "band_hash": t["band_hash"],
                "band_id": t["band_id"],
                out: t["doc_id"],
            })
        return banded.map_batches(pick, batch_format="pyarrow")

    coll = drop_empty_blocks(bucketed_hash_join(
        side(False, "train_id"), side(True, "eval_id"),
        key=["band_hash", "band_id"], n_buckets=8,
    ))
    cand = keep_first_sorted(
        coll.map_batches(
            lambda t: t.select(["train_id", "eval_id"]),
            batch_format="pyarrow",
        ).sort(["train_id", "eval_id"]),
        ["train_id", "eval_id"],
    ).materialize()

    empty = pa.table({
        "train_id": pa.nulls(0, pa.int64()),
        "eval_id": pa.nulls(0, pa.int64()),
        "jaccard": pa.nulls(0, pa.float64()),
    })
    n_pairs = cand.count()
    if n_pairs == 0:
        return rd.from_arrow(empty)

    from ..util import auto_broadcast_cap

    cap = auto_broadcast_cap(2048)
    if 2 * n_pairs <= cap:
        # small-candidate regime (the minhash_lsh_pairs switch): distinct
        # ids broadcast once, shingle packs resolve via a dict
        _log.info("fuzzy_decontaminate: regime=broadcast pairs=%d cap=%d",
                  n_pairs, cap)
        pairs_ab = cand.map_batches(
            lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow")
        both = pairs_ab.map_batches(
            lambda t: pa.table({"doc_id": pc.unique(pa.concat_arrays([
                t["a"].combine_chunks().cast(pa.int64()),
                t["b"].combine_chunks().cast(pa.int64()),
            ]))}),
            batch_format="pyarrow",
        )
        involved = np.array(sorted(both.unique("doc_id")), dtype=np.int64)
        ids_ref = ray.put(involved)
        shingles = docs.map_batches(
            ShinglePacker,
            fn_constructor_args=(ids_ref, shingle_n),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=1,
        ).materialize()
        lookup: dict[int, bytes] = {}
        for t in ray.get(shingles.to_arrow_refs()):
            if t.num_rows == 0:
                # Ray can emit a schema-LESS empty block from an actor
                # batch that produced no rows (tiny-input worlds);
                # indexing t["doc_id"] on it raises
                continue
            lookup.update(zip(t["doc_id"].to_pylist(), t["sh"].to_pylist()))
        lk_ref = ray.put(lookup)
        out = pairs_ab.map_batches(
            _VerifyBroadcast,
            fn_constructor_args=(lk_ref, jaccard_threshold),
            batch_format="pyarrow",
            concurrency=2,
            num_cpus=0.5,
        ).map_batches(
            lambda t: t.rename_columns(["train_id", "eval_id", "jaccard"]),
            batch_format="pyarrow",
        )
        return rd.from_arrow(empty).union(out)

    _log.info("fuzzy_decontaminate: regime=semi-join pairs=%d cap=%d",
              n_pairs, cap)

    def ids_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        both = pa.concat_arrays([
            t["train_id"].combine_chunks().cast(pa.int64()),
            t["eval_id"].combine_chunks().cast(pa.int64()),
        ])
        return pa.table({"doc_id": pc.unique(both)})

    ids_ds = keep_first_sorted(
        cand.map_batches(ids_of, batch_format="pyarrow").sort("doc_id"),
        ["doc_id"],
    )
    shingles = drop_empty_blocks(bucketed_semi_join(
        docs.select_columns(["doc_id", "text"]), ids_ds, "doc_id",
        n_buckets=8, bloom_bits=1 << 22
    )).map_batches(
        ShinglePacker,
        fn_constructor_args=(None, shingle_n),
        batch_format="pyarrow",
        concurrency=(2, 8),
        num_cpus=1,
    ).materialize()

    sh_t = shingles.map_batches(
        lambda t: t.rename_columns(["train_id", "sh_a"]),
        batch_format="pyarrow",
    )
    sh_e = shingles.map_batches(
        lambda t: t.rename_columns(["eval_id", "sh_b"]),
        batch_format="pyarrow",
    )
    joined = drop_empty_blocks(bucketed_hash_join(
        bucketed_hash_join(cand, sh_t, "train_id", n_buckets=8),
        sh_e, "eval_id", n_buckets=8,
    ))

    def verify(t: pa.Table) -> pa.Table:
        out = _jaccard_rows(
            t["train_id"].to_numpy(zero_copy_only=False),
            t["eval_id"].to_numpy(zero_copy_only=False),
            t["sh_a"].to_pylist(), t["sh_b"].to_pylist(), jaccard_threshold,
        )
        return out.rename_columns(["train_id", "eval_id", "jaccard"])

    return rd.from_arrow(empty).union(
        joined.map_batches(verify, batch_format="pyarrow")
    )


_CC_PHI = 0x9E3779B97F4A7C15


def _cc_shard_of(v: np.ndarray, k: int) -> np.ndarray:
    return ((v.astype(np.uint64) * np.uint64(_CC_PHI)) % np.uint64(k)).astype(np.int64)


def _cc_split(src: np.ndarray, dst: np.ndarray, k: int) -> list:
    sh = _cc_shard_of(src, k)
    return [(src[sh == i], dst[sh == i]) for i in range(k)]


def connected_components_ds(pairs: rd.Dataset, n_shards: int = 8,
                            max_iters: int = 200) -> rd.Dataset:
    """(doc_id, cluster) for every node in the pair graph — distributed
    min-label propagation over hash-sharded state held in the object
    store. This is the one operator implemented with RAW Ray tasks (the
    prompt's case (c)): an iterative graph algorithm whose per-round
    working set is tiny keyed state — Ray Data's per-operator overhead on
    such iterations dwarfs the compute, while K plain tasks per round are
    milliseconds.

    Partitioning assumption: nodes (and the symmetric edge set, by src)
    are hash-sharded; every node's label lives in exactly one shard, so a
    shard-local ``np.minimum.at`` reduce is the global min. Every round
    also POINTER-JUMPS (``label <- label[label]`` via a cross-shard
    lookup wave), halving distances to each component's minimum —
    O(log diameter) rounds instead of O(diameter). Fixpoint detected by
    the monotone label-sum going flat (one scalar per shard per round
    reaches the driver; all arrays stay in the object store via
    ``num_returns``)."""
    import ray

    k = n_shards

    @ray.remote(num_returns=k)
    def split_block(t: pa.Table):
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = _cc_split(np.r_[a, b], np.r_[b, a], k)
        return out if k > 1 else out[0]

    @ray.remote
    def build_shard(*parts) -> dict:
        src = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        dst = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
        nodes = np.unique(src)       # symmetric edges: every node appears as src
        order = np.argsort(src, kind="stable")
        return {"src": src[order], "dst": dst[order], "nodes": nodes,
                "labels": nodes.copy()}

    @ray.remote(num_returns=k)
    def propose(state: dict):
        # current label of each edge's src, shipped to the dst's shard
        lab = state["labels"][np.searchsorted(state["nodes"], state["src"])]
        sh = _cc_shard_of(state["dst"], k)
        out = [(state["dst"][sh == i], lab[sh == i]) for i in range(k)]
        return out if k > 1 else out[0]

    @ray.remote
    def reduce_shard(state: dict, *proposals) -> dict:
        d = np.concatenate([p[0] for p in proposals]) if proposals else np.empty(0, np.int64)
        l = np.concatenate([p[1] for p in proposals]) if proposals else np.empty(0, np.int64)
        new = state["labels"].copy()
        if len(d):
            np.minimum.at(new, np.searchsorted(state["nodes"], d), l)
        return {**state, "labels": new}

    @ray.remote(num_returns=k)
    def split_labels(state: dict):
        # (positions, label values) per owner shard of each label value
        sh = _cc_shard_of(state["labels"], k)
        out = [(np.flatnonzero(sh == i), state["labels"][sh == i]) for i in range(k)]
        return out if k > 1 else out[0]

    @ray.remote(num_returns=k)
    def answer(state: dict, *queries):
        # label-of-label lookups for each querying shard (label values are
        # node ids, and every node id lives in exactly its owner shard)
        outs = []
        for _pos, vals in queries:
            outs.append(
                state["labels"][np.searchsorted(state["nodes"], vals)]
                if len(vals) else np.empty(0, np.int64)
            )
        return outs if k > 1 else outs[0]

    @ray.remote(num_returns=2)
    def apply_jump(state: dict, *refs):
        # refs = k (pos, vals) splits followed by k answer arrays
        splits, answers = refs[:k], refs[k:]
        new = state["labels"].copy()
        for (pos, _vals), ans in zip(splits, answers):
            if len(pos):
                new[pos] = ans          # label <- label[label] (monotone)
        return {**state, "labels": new}, int(new.sum())

    @ray.remote
    def to_table(state: dict) -> pa.Table:
        return pa.table({"doc_id": pa.array(state["nodes"], pa.int64()),
                         "cluster": pa.array(state["labels"], pa.int64())})

    def _rows(refs):
        return [[r] for r in refs] if k == 1 else refs

    block_parts = _rows([split_block.remote(r) for r in pairs.to_arrow_refs()])
    states = [build_shard.remote(*[bp[i] for bp in block_parts]) for i in range(k)]
    prev = None
    for _ in range(max_iters):
        prop_refs = _rows([propose.remote(s) for s in states])
        states = [
            reduce_shard.remote(states[i], *[pr[i] for pr in prop_refs])
            for i in range(k)
        ]
        # pointer jump: label <- label[label] across shards
        splits = _rows([split_labels.remote(s) for s in states])
        answers = _rows([
            answer.remote(states[j], *[splits[i][j] for i in range(k)])
            for j in range(k)
        ])
        stepped = [
            apply_jump.remote(
                states[i],
                *[splits[i][j] for j in range(k)],
                *[answers[j][i] for j in range(k)],
            )
            for i in range(k)
        ]
        states = [st for st, _ in stepped]
        s = sum(ray.get([ssum for _, ssum in stepped]))
        if prev is not None and s == prev:
            break
        prev = s
    return rd.from_arrow_refs([to_table.remote(s) for s in states])


def connected_components(pairs: pd.DataFrame, ids: list) -> pd.DataFrame:
    """Min-label propagation over verified pairs (driver-side variant for
    small pair sets; :func:`connected_components_ds` is the distributed
    groupby-min form of the same iteration)."""
    label = {i: i for i in ids}
    edges = list(zip(pairs["a"], pairs["b"]))
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            la, lb = label[a], label[b]
            m = min(la, lb)
            if la != m or lb != m:
                label[a] = label[b] = m
                changed = True
    return pd.DataFrame(
        {"doc_id": list(label), "cluster": [label[i] for i in label]}
    )


# -- SimHash -----------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word tokens (Charikar's similarity hash).

    Token hash = first 8 md5 bytes little-endian, which is exactly
    DuckDB's ``md5_number_upper`` — chosen so the whole signature is
    restatable in the SQL oracle (``SQL_SIMHASH``). The md5 Python loop
    runs ONCE per unique batch-vocabulary token (``np.unique`` over the
    whole batch, then a gather), with a per-actor cache carrying the
    vocabulary across batches — the per-token-occurrence loop this
    replaces was the signature stage's hot spot."""

    _CACHE_CAP = 1 << 20

    def __init__(self):
        self.bit_weights = 1 << np.arange(64, dtype=np.uint64)
        self._cache: dict[str, int] = {}

    def _vocab_u64(self, uniq: np.ndarray) -> np.ndarray:
        """md5-upper-8 of each UNIQUE token (cached across batches)."""
        cache = self._cache
        if len(cache) > self._CACHE_CAP:
            cache.clear()
        out = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            v = cache.get(t)
            if v is None:
                v = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                cache[t] = v
            out[i] = v
        return out

    def _token_u64(self, tokens: list[str]) -> np.ndarray:
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
        return self._vocab_u64(uniq)[inv]

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        h = self._token_u64(words)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) * self.bit_weights).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        words_per_doc = [t.split() for t in batch["text"]]
        counts = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        sh = np.zeros(n, dtype=np.uint64)
        nz = np.flatnonzero(counts)
        if nz.size:
            all_words = np.concatenate(
                [np.asarray(words_per_doc[i], dtype=object) for i in nz]
            )
            # ONE unique+md5 pass for the whole batch, then gather
            uniq, inv = np.unique(all_words, return_inverse=True)
            h = self._vocab_u64(uniq)[inv]
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            ).astype(np.int32)
            contrib = 2 * bits - 1                       # (total_words, 64)
            starts = np.r_[0, np.cumsum(counts[nz])[:-1]]
            sums = np.add.reduceat(contrib, starts, axis=0)   # (n_docs, 64)
            sh[nz] = ((sums > 0).astype(np.uint64) * self.bit_weights).sum(axis=1)
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["simhash"] = sh.astype(np.int64)  # arrow-friendly
        for band in range(4):
            out[f"sh_band{band}"] = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
        return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8)).reshape(x.size, 64).sum(axis=1).astype(np.int64)


def _ham_pairs(group: pd.DataFrame, max_hamming: int, max_bucket: int) -> pd.DataFrame:
    """All intra-bucket pairs with Hamming <= max_hamming, vectorized
    (triu index fan-out + popcount of xor). Buckets over ``max_bucket``
    fall back to bucket-min star pairing: still verified, connectivity-
    preserving, but pair-incomplete — the documented hot-bucket bound."""
    g = group.sort_values("doc_id")
    n = len(g)
    empty = pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
         "hamming": pd.Series([], dtype=np.int64)}
    )
    if n < 2:
        return empty
    ids = g["doc_id"].to_numpy().astype(np.int64)
    h = g["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
    if n > max_bucket:
        a, b = np.full(n - 1, ids[0]), ids[1:]
        x = h[0] ^ h[1:]
    else:
        ii, jj = np.triu_indices(n, 1)
        a, b = ids[ii], ids[jj]
        x = h[ii] ^ h[jj]
    ham = _popcount64(x)
    m = ham <= max_hamming
    if not m.any():
        return empty
    return pd.DataFrame({"a": a[m], "b": b[m], "hamming": ham[m]})


def simhash_near_dups(
    docs: rd.Dataset, max_hamming: int = 3, max_bucket: int = 2048
) -> rd.Dataset:
    """Near-dup pairs by SimHash banding: any pair with Hamming distance
    <= 3 shares at least one of the 4 16-bit bands (pigeonhole), so
    band-exact-match buckets are a complete candidate blocking — and all
    intra-bucket pairs are emitted and verified (complete for buckets up
    to ``max_bucket``; larger hash-degenerate buckets degrade to
    connectivity-only star pairing, see :func:`_ham_pairs`).
    The banding/pairing machinery is :func:`banded_hamming_pairs`
    (shared with the image perceptual-hash near-dup path)."""
    sigs = docs.map_batches(SimHasher, batch_format="pandas", batch_size=1024, concurrency=(2, 12), num_cpus=1)
    return banded_hamming_pairs(sigs, max_hamming, max_bucket)


def banded_hamming_pairs(
    sigs: rd.Dataset, max_hamming: int = 3, max_bucket: int = 2048
) -> rd.Dataset:
    """Banding + Hamming verify over ANY 64-bit signature dataset with
    columns (doc_id:int64, simhash:int64, sh_band0..3:int64) — the
    signature-agnostic core under :func:`simhash_near_dups` (text) and
    ``media.PHasher`` (image dHash).

    One melt pass -> ONE ``groupby`` over (band_id, band_key) with the
    Hamming verify vectorized inside each bucket task -> distributed
    sort+keep-first pair dedup. Nothing row-shaped funnels through the
    driver: the multi-member key fold is bounded by the 4 x 2^16
    composite domain (~262k keys max at ANY corpus size).
    """

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                    "band_id": np.int64(band),
                    "band_key": df[f"sh_band{band}"].to_numpy().astype(np.int64),
                    "simhash": df["simhash"].to_numpy().astype(np.int64),
                }
            )
            for band in range(4)
        ]
        return pd.concat(frames, ignore_index=True)

    melted = sigs.map_batches(melt, batch_format="pandas").materialize()
    # prefilter to multi-member buckets before the pairing exchange:
    # most (band, key) buckets are singletons. Per-block composite
    # count partials fold on the driver — bounded by the 4 x 2^16
    # composite DOMAIN, not by the corpus — and the multi-member key
    # set (~2 MB worst case) broadcasts once.
    import ray

    def comp_counts(df: pd.DataFrame) -> pa.Table:
        comp = (df["band_id"].to_numpy() << 16) | df["band_key"].to_numpy()
        u, c = np.unique(comp, return_counts=True)
        return pa.table({"ck": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    tbls = [t for t in ray.get(
        melted.map_batches(comp_counts,
                           batch_format="pandas").to_arrow_refs())
        if t.num_rows]
    if tbls:
        cnt = (pa.concat_tables(tbls).to_pandas()
               .groupby("ck")["n"].sum())
        multi = np.sort(cnt[cnt > 1].index.to_numpy(np.int64))
    else:
        multi = np.array([], np.int64)
    if multi.size == 0:
        return rd.from_arrow(pa.table(
            {"a": pa.nulls(0, pa.int64()), "b": pa.nulls(0, pa.int64()),
             "hamming": pa.nulls(0, pa.int64())}
        ))
    multi_ref = ray.put(multi)

    # pairing as ONE explicit composite-key exchange instead of a
    # Ray-Data groupby().map_groups(): the multi-member buckets are
    # tiny and numerous, and the groupby's per-group task scheduling
    # dominated the stage (~20 s at sf0.1 for sub-second compute —
    # the same small-group pathology shared_ngram_stats documents);
    # each exchange bucket now verifies all of its (band, key) groups
    # inside one task.
    from .relational import bucketed_reduce

    def keyed_multi(df: pd.DataFrame) -> pa.Table:
        keys = ray.get(multi_ref)
        comp = (df["band_id"].to_numpy() << 16) | df["band_key"].to_numpy()
        m = np.isin(comp, keys)
        return pa.table({
            "ck": pa.array(comp[m].astype(np.int64)),
            "doc_id": pa.array(df["doc_id"].to_numpy()[m].astype(np.int64)),
            "simhash": pa.array(df["simhash"].to_numpy()[m].astype(np.int64)),
        })

    PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("hamming", pa.int64())])
    pair_empty = pa.table({"a": pa.nulls(0, pa.int64()),
                           "b": pa.nulls(0, pa.int64()),
                           "hamming": pa.nulls(0, pa.int64())})

    def pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_empty
        df = t.to_pandas()
        outs = [_ham_pairs(g, max_hamming, max_bucket)
                for _, g in df.groupby("ck", sort=False)]
        o = pd.concat(outs, ignore_index=True) if outs else None
        if o is None or o.empty:
            return pair_empty
        return pa.table({"a": pa.array(o["a"].to_numpy(np.int64)),
                         "b": pa.array(o["b"].to_numpy(np.int64)),
                         "hamming": pa.array(o["hamming"].to_numpy(np.int64))})

    paired = bucketed_reduce(
        melted.map_batches(keyed_multi, batch_format="pandas"),
        "ck", pair_bucket, n_buckets=16,
        schema=pa.schema([("ck", pa.int64()), ("doc_id", pa.int64()),
                          ("simhash", pa.int64())]))

    # a pair can surface from several bands with identical hamming —
    # dedup inside an 'a'-keyed exchange (all copies share 'a')
    def dedup_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_empty
        df = (t.to_pandas().sort_values(["a", "b"])
              .drop_duplicates(["a", "b"]))
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64)),
                         "b": pa.array(df["b"].to_numpy(np.int64)),
                         "hamming": pa.array(df["hamming"]
                                             .to_numpy(np.int64))})

    return bucketed_reduce(paired, "a", dedup_bucket, n_buckets=16,
                           schema=PAIR_SCHEMA)

# -- shared-ngram duplication signal ------------------------------------------

def shared_ngram_stats(
    docs: rd.Dataset, n: int = 4, n_buckets: int = 32
) -> rd.Dataset:
    """Cross-document exact substring-duplication signal (the n-gram form
    of Lee et al. 2022's dedup analysis): per document, its distinct
    word-n-gram count and how many of those n-grams occur in >= 2
    documents. Output: (doc_id, n_grams, n_shared); docs with < n words
    contribute nothing (same contract as :func:`word_shingles`).

    Two explicit K x K hash exchanges and ZERO Ray-Data groupbys: the
    Aggregate operator's sort-map coalesces many small blocks into one
    task (the measured small-block pathology — 2 x ~5 s at sf0.1 for a
    sub-second compute), so the per-gram doc counts, the shared flag AND
    the per-doc partial sums all happen inside the gram-bucket task
    (``np.unique`` over that bucket's grams only), and the partials
    re-exchange by doc hash for the final sum. Only fixed-width
    (doc_id, int) partials cross the second exchange; gram strings cross
    the first once."""
    import ray

    from .relational import _as_table, _bucket_of

    b = n_buckets
    empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                      "n_grams": pa.nulls(0, pa.int64()),
                      "n_shared": pa.nulls(0, pa.int64())})

    def pairs(t: pa.Table) -> pa.Table:
        ids, grams = [], []
        for i, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            gs = set(word_shingles(text, n))
            ids.extend([i] * len(gs))
            grams.extend(gs)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "g": pa.array(grams, pa.string())})

    @ray.remote(num_returns=b)
    def split_by_gram(t):
        t = _as_table(t)
        if t.num_rows == 0:
            pe = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                           "g": pa.nulls(0, pa.string())})
            return [pe] * b if b > 1 else pe
        buckets = _bucket_of(t["g"], b)
        out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b)
    def gram_bucket(*shards):
        tbl = pa.concat_tables([_as_table(s) for s in shards])
        if tbl.num_rows == 0:
            return [empty] * b if b > 1 else empty
        g = np.asarray(tbl["g"].to_pylist(), dtype=object)
        uniq, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
        shared = (cnt[inv] >= 2).astype(np.int64)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        # per-doc partial sums within this gram bucket (sort + segment sum)
        order = np.argsort(doc, kind="stable")
        d, s = doc[order], shared[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(d)])
        csum = np.concatenate([[0], np.cumsum(s)])
        part = pa.table({
            "doc_id": pa.array(d[starts], pa.int64()),
            "n_grams": pa.array(counts.astype(np.int64)),
            "n_shared": pa.array(csum[np.r_[starts[1:], len(d)]] - csum[starts],
                                 pa.int64()),
        })
        buckets = _bucket_of(part["doc_id"], b)
        out = [part.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def doc_bucket(*parts) -> pa.Table:
        tbl = pa.concat_tables([_as_table(p) for p in parts])
        if tbl.num_rows == 0:
            return empty
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        ng = tbl["n_grams"].to_numpy(zero_copy_only=False)
        ns = tbl["n_shared"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        d, g_, s_ = doc[order], ng[order], ns[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        cg = np.concatenate([[0], np.cumsum(g_)])
        cs = np.concatenate([[0], np.cumsum(s_)])
        ends = np.r_[starts[1:], len(d)]
        return pa.table({
            "doc_id": pa.array(d[starts], pa.int64()),
            "n_grams": pa.array(cg[ends] - cg[starts], pa.int64()),
            "n_shared": pa.array(cs[ends] - cs[starts], pa.int64()),
        })

    p = docs.map_batches(pairs, batch_format="pyarrow")
    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs
    psplit = _rows([split_by_gram.remote(t) for t in p.to_arrow_refs()])
    gsplit = _rows([
        gram_bucket.remote(*[ps[i] for ps in psplit]) for i in range(b)
    ])
    out = [doc_bucket.remote(*[gs[i] for gs in gsplit]) for i in range(b)]
    return rd.from_arrow_refs(out)


def dedup_spans(
    docs: rd.Dataset, n: int = 5, n_buckets: int = 32
) -> rd.Dataset:
    """Exact substring deduplication as a TRANSFORM (the removal half of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): rewrite every document with all token spans covered by a
    globally duplicated word-``n``-gram (one occurring in >= 2 DISTINCT
    documents) removed. Output: ``(doc_id, n_tokens, n_removed,
    clean_text)`` — tokens are whitespace runs (``str.split()``), the
    cleaned text re-joins surviving tokens with single spaces, and
    zero-token documents are dropped (the ``word_shingles`` contract).

    Dataflow — two fixed-width hash exchanges plus one payload exchange,
    and unlike :func:`shared_ngram_stats` the GRAM STRINGS NEVER
    SHUFFLE: each batch hashes its grams to the md5-upper-8 61-bit
    domain locally (``md5_id_bucket``, the repo-wide DuckDB-restatable
    contract), so exchange #1 ships only (doc_id:int64, pos:int32,
    h:int64) rows. The h-bucket task counts distinct docs per hash over
    ITS hashes only and forwards just the duplicated occurrences,
    re-split by doc hash; the documents take the same doc-hash exchange,
    so each doc-bucket task holds a doc's text AND its dup-gram start
    positions together and rewrites in place — the payload crosses the
    wire exactly once and no join materializes an intermediate (Acero
    cannot carry list payloads through a join anyway). Coverage masks
    are interval-diff cumsums, not per-position loops. At 100 TB the
    only O(corpus-tokens) shuffle mass is 20-byte fixed rows."""
    import ray

    from ..util import md5_id_bucket
    from .relational import _as_table, _bucket_of

    b = n_buckets
    rows_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                           "pos": pa.nulls(0, pa.int32()),
                           "h": pa.nulls(0, pa.int64())})
    hits_empty = rows_empty.select(["doc_id", "pos"])
    docs_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                           "text": pa.nulls(0, pa.string())})
    out_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                          "n_tokens": pa.nulls(0, pa.int64()),
                          "n_removed": pa.nulls(0, pa.int64()),
                          "clean_text": pa.nulls(0, pa.string())})

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_pos, out_h = [], [], []
        for d, text in zip(ids, t["text"].to_pylist()):
            toks = (text or "").split()
            m = len(toks) - n + 1
            if m <= 0:
                continue
            grams = [" ".join(toks[i:i + n]) for i in range(m)]
            out_h.append(md5_id_bucket("dupspan", grams, _MERSENNE))
            out_doc.append(np.full(m, d, np.int64))
            out_pos.append(np.arange(m, dtype=np.int32))
        if not out_doc:
            return rows_empty
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "pos": pa.array(np.concatenate(out_pos), pa.int32()),
            "h": pa.array(np.concatenate(out_h), pa.int64()),
        })

    @ray.remote(num_returns=b)
    def split_by_h(t):
        t = _as_table(t)
        if t.num_rows == 0:
            return [rows_empty] * b if b > 1 else rows_empty
        buckets = _bucket_of(t["h"], b)
        out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b)
    def h_bucket(*shards):
        """Forward only the occurrences of hashes seen in >= 2 distinct
        docs, re-split by doc hash for the rewrite exchange."""
        tbl = pa.concat_tables([_as_table(s) for s in shards])
        if tbl.num_rows == 0:
            return [hits_empty] * b if b > 1 else hits_empty
        h = tbl["h"].to_numpy(zero_copy_only=False)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        hs, ds = h[order], doc[order]
        # distinct (h, doc) boundaries -> distinct-doc count per h
        pair_new = np.r_[True, (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])]
        h_new = np.r_[True, hs[1:] != hs[:-1]]
        group_id = np.cumsum(h_new) - 1            # h group per sorted row
        ndocs = np.bincount(group_id[pair_new])    # distinct docs per h
        dup_rows = order[ndocs[group_id] >= 2]     # original row indices
        hits = tbl.select(["doc_id", "pos"]).take(pa.array(dup_rows))
        if hits.num_rows == 0:
            return [hits_empty] * b if b > 1 else hits_empty
        buckets = _bucket_of(hits["doc_id"], b)
        out = [hits.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b)
    def split_docs(t):
        t = _as_table(t)
        if t.num_rows == 0:
            return [docs_empty] * b if b > 1 else docs_empty
        t = t.select(["doc_id", "text"])
        buckets = _bucket_of(t["doc_id"], b)
        out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def rewrite_bucket(n_d: int, *parts) -> pa.Table:
        """Rewrite this doc-bucket's documents against its dup-gram start
        positions — the payload text arrives here once and never moves
        again."""
        dtbl = pa.concat_tables([_as_table(p) for p in parts[:n_d]])
        hits = pa.concat_tables([_as_table(p) for p in parts[n_d:]])
        if dtbl.num_rows == 0:
            return out_empty
        hd = hits["doc_id"].to_numpy(zero_copy_only=False)
        hp = hits["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hp, hd))
        hd, hp = hd[order], hp[order]
        if len(hd):
            bounds = np.r_[0, np.flatnonzero(hd[1:] != hd[:-1]) + 1, len(hd)]
            slices = {int(hd[s]): hp[s:e]
                      for s, e in zip(bounds[:-1], bounds[1:])}
        else:
            slices = {}
        ids = dtbl["doc_id"].to_numpy(zero_copy_only=False)
        o_id, o_nt, o_nr, o_clean = [], [], [], []
        for d, text in zip(ids, dtbl["text"].to_pylist()):
            toks = (text or "").split()
            m = len(toks)
            if m == 0:
                continue
            st = slices.get(int(d))
            if st is not None and len(st):
                # interval-diff coverage: +1 at each start, -1 past its end
                diff = np.zeros(m + 1, np.int64)
                s = st.astype(np.int64)
                np.add.at(diff, s, 1)
                np.add.at(diff, np.minimum(s + n, m), -1)
                covered = np.cumsum(diff[:-1]) > 0
                nr = int(covered.sum())
                clean = " ".join(tok for tok, c in zip(toks, covered)
                                 if not c)
            else:
                nr, clean = 0, " ".join(toks)
            o_id.append(d)
            o_nt.append(m)
            o_nr.append(nr)
            o_clean.append(clean)
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "n_tokens": pa.array(o_nt, pa.int64()),
            "n_removed": pa.array(o_nr, pa.int64()),
            "clean_text": pa.array(o_clean, pa.string()),
        })

    docs = docs.select_columns(["doc_id", "text"])
    rows = docs.map_batches(explode, batch_format="pyarrow")

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    doc_refs = docs.to_arrow_refs()
    rsplit = _rows([split_by_h.remote(t) for t in rows.to_arrow_refs()])
    hsplit = _rows([h_bucket.remote(*[rs[i] for rs in rsplit])
                    for i in range(b)])
    dsplit = _rows([split_docs.remote(t) for t in doc_refs])
    out = [rewrite_bucket.remote(len(dsplit),
                                 *[ds[i] for ds in dsplit],
                                 *[hs[i] for hs in hsplit])
           for i in range(b)]
    return rd.from_arrow_refs(out)


def sorted_window_pairs(ordered: rd.Dataset, id_col: str,
                        window: int) -> rd.Dataset:
    """Sorted-neighborhood pair emission: given a dataset whose BLOCKS
    are globally ordered (the output of ``Dataset.sort`` — range-
    partitioned, blocks in rank order), emit every (earlier, later) id
    pair at rank distance 1..window-1. Each block pairs locally; the
    only cross-block state is the (window-1)-row TAIL of the previous
    block, collected once — O(blocks x window) rows on the driver,
    never the data. Tiny blocks shorter than the window extend the
    carried tail so a pair can span an entire intermediate block."""
    import ray

    refs = ordered.to_arrow_refs()
    w = window

    @ray.remote
    def tail_of(t) -> np.ndarray:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return ids[max(0, len(ids) - (w - 1)):].astype(np.int64)

    tails = ray.get([tail_of.remote(r) for r in refs])
    prev: list[np.ndarray] = []
    carry = np.empty(0, np.int64)
    for tl in tails:
        prev.append(carry)
        carry = (np.concatenate([carry, tl])[-(w - 1):]
                 if len(tl) < (w - 1) else tl)

    @ray.remote
    def pairs_of(t, tail_ids: np.ndarray) -> pa.Table:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        ids = np.concatenate([
            tail_ids,
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)])
        p = len(tail_ids)
        aa, bb = [], []
        idx = np.arange(p, len(ids))
        for d in range(1, w):
            sel = idx[idx - d >= 0]
            aa.append(ids[sel - d])
            bb.append(ids[sel])
        a = np.concatenate(aa) if aa else np.empty(0, np.int64)
        b = np.concatenate(bb) if bb else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    return rd.from_arrow_refs(
        [pairs_of.remote(r, p) for r, p in zip(refs, prev)])


# -- exact all-pairs Jaccard via prefix filtering (AllPairs / PPJoin) --------

def prefix_filter_pairs(
    docs: rd.Dataset,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    n_buckets: int = 16,
) -> rd.Dataset:
    """EXACT tau-Jaccard all-pairs self-join via PREFIX FILTERING
    (Bayardo et al. AllPairs / PPJoin, WWW'07) — the deterministic
    complement of ``minhash_lsh_pairs``: no bands, no probability of a
    missed pair. Correctness lemma: order every doc's shingle set by a
    GLOBAL total order and keep only the first
    p = |d| - ceil(tau * |d|) + 1 tokens (the prefix); if
    J(A, B) >= tau then |A&B| >= ceil(tau * max(|A|, |B|)), so the
    smallest-in-order shared token provably sits inside BOTH prefixes
    — docs that share no prefix token cannot pass the threshold. The
    global order is DOCUMENT FREQUENCY ascending (rarest first, the
    classic choice: rare tokens head the prefixes, so hot tokens never
    fan out quadratically), tie-broken by token hash.

    Every stage is an exchange, nothing row-shaped on the driver:

    1. shingle packs (``ShinglePacker``: sorted unique SipHash u64) —
       materialized once, reused by prefix build AND verify;
    2. flat (tok, doc, size) rows -> df counts (exchange by tok);
    3. df joins back (exchange by tok), per-doc (df, tok) sort keeps
       the prefix (exchange by doc);
    4. candidate pairs inside each tok group (exchange by tok; doc ids
       sorted so a < b; the LAG-DISTANCE pair loop bounded by the
       hottest PREFIX token, which df-ordering keeps cold), size
       pre-filter 100*min >= tau_cents*max (J <= min/max);
    5. global pair dedup: sort + keep-first (pairs sharing several
       prefix tokens collapse);
    6. exact verify == ``minhash_lsh_pairs``' huge regime: two
       ``bucketed_hash_join``s resolve packs, ``_jaccard_rows`` emits
       the IEEE quotient the oracle restates bit-for-bit.

    The oracle is the brute-force all-pairs SQL — the gate therefore
    PROVES candidate completeness on the corpus, not just precision
    (the verify step makes any candidate superset exact).
    """
    from ..util import drop_empty_blocks, keep_first_sorted
    from .relational import bucketed_hash_join, bucketed_reduce

    tau_c = int(round(jaccard_threshold * 100))

    packs = docs.map_batches(
        ShinglePacker,
        fn_constructor_args=(None, shingle_n),
        batch_format="pyarrow",
        concurrency=(2, 8),
        num_cpus=1,
    ).materialize()

    def tok_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.nulls(0, pa.int64()),
                          "doc": pa.nulls(0, pa.int64()),
                          "size": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks, dids, sizes = [], [], []
        for i, buf in enumerate(t["sh"].to_pylist()):
            arr = np.frombuffer(buf, dtype=np.uint64)
            if arr.size == 0:
                continue
            toks.append(arr.view(np.int64))
            dids.append(np.full(arr.size, ids[i], np.int64))
            sizes.append(np.full(arr.size, arr.size, np.int64))
        if not toks:
            return empty
        return pa.table({"tok": pa.array(np.concatenate(toks)),
                         "doc": pa.array(np.concatenate(dids)),
                         "size": pa.array(np.concatenate(sizes))})

    toks = packs.map_batches(tok_rows, batch_format="pyarrow")
    TOKS_SCHEMA = pa.schema([("tok", pa.int64()), ("doc", pa.int64()),
                             ("size", pa.int64())])

    def df_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tok": pa.nulls(0, pa.int64()),
                             "df": pa.nulls(0, pa.int64())})
        g = t.group_by(["tok"]).aggregate([("doc", "count")])
        return pa.table({"tok": g["tok"],
                         "df": g["doc_count"].cast(pa.int64())})

    df = bucketed_reduce(toks, "tok", df_fn, n_buckets=n_buckets,
                         schema=TOKS_SCHEMA)
    ranked = drop_empty_blocks(
        bucketed_hash_join(toks, df, "tok", n_buckets=n_buckets))

    def prefix_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.nulls(0, pa.int64()),
                          "doc": pa.nulls(0, pa.int64()),
                          "size": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        doc = t["doc"].to_numpy(zero_copy_only=False)
        tok = t["tok"].to_numpy(zero_copy_only=False)
        size = t["size"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, dfv, doc))     # per doc: df asc, tok asc
        doc, tok, size, dfv = doc[order], tok[order], size[order], dfv[order]
        n = len(doc)
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        cnt = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, cnt)
        p_len = size - (tau_c * size + 99) // 100 + 1
        keep = pos < p_len
        return pa.table({"tok": pa.array(tok[keep]),
                         "doc": pa.array(doc[keep]),
                         "size": pa.array(size[keep])})

    RANKED_SCHEMA = pa.schema([("tok", pa.int64()), ("doc", pa.int64()),
                               ("size", pa.int64()), ("df", pa.int64())])
    prefix = bucketed_reduce(ranked, "doc", prefix_fn, n_buckets=n_buckets,
                             schema=RANKED_SCHEMA)

    def pair_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.nulls(0, pa.int64()),
                          "b": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        tok = t["tok"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        size = t["size"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, tok))
        tok, doc, size = tok[order], doc[order], size[order]
        n = len(tok)
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        cnt = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, cnt)
        out_a, out_b = [], []
        for dist in range(1, int(cnt.max()) if n else 0):
            j = np.flatnonzero(pos >= dist)
            if j.size == 0:
                break
            i = j - dist
            lo = np.minimum(size[i], size[j])
            hi = np.maximum(size[i], size[j])
            hit = 100 * lo >= tau_c * hi        # J <= min/max size bound
            out_a.append(doc[i[hit]])
            out_b.append(doc[j[hit]])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # in-bucket dedup (a pair may share several prefix tokens routed
        # to the same bucket)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"a": pa.array(a[first]), "b": pa.array(b[first])})

    cand = bucketed_reduce(prefix, "tok", pair_fn, n_buckets=n_buckets,
                           schema=TOKS_SCHEMA)
    cand = keep_first_sorted(cand.sort(["a", "b"]), ["a", "b"])

    empty = pa.table(
        {"a": pa.nulls(0, pa.int64()), "b": pa.nulls(0, pa.int64()),
         "jaccard": pa.nulls(0, pa.float64())}
    )
    sh_a = packs.map_batches(
        lambda t: t.rename_columns(["a", "sh_a"]), batch_format="pyarrow")
    sh_b = packs.map_batches(
        lambda t: t.rename_columns(["b", "sh_b"]), batch_format="pyarrow")
    joined = drop_empty_blocks(bucketed_hash_join(
        bucketed_hash_join(cand, sh_a, "a", n_buckets=8), sh_b, "b",
        n_buckets=8))

    def verify(t: pa.Table) -> pa.Table:
        return _jaccard_rows(
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["sh_a"].to_pylist(), t["sh_b"].to_pylist(), jaccard_threshold,
        )

    return rd.from_arrow(empty).union(
        joined.map_batches(verify, batch_format="pyarrow")
    )
