"""Deduplication family over the ``documents`` table.

Exact + near-dup operators, each expressed Ray-Data-first:

- **exact**: md5 content hash in a vectorized ``map_batches`` + one
  ``groupby(hash)`` over the (hash, doc_id) projection only — never the
  payload; keep min doc_id.
- **MinHash + LSH**: per-batch shingle->minhash signatures (numpy,
  vectorized over each doc's shingle-hash array), explode to
  ``(band_id, band_hash)`` rows, ``groupby`` band buckets to candidate
  pairs, verify exact Jaccard, connected components by iterated min-label
  propagation (a few small groupby rounds — no driver union-find on big
  data).
- **SimHash**: 64-bit signatures via sign-aggregated token hashes;
  near-dup blocking by 4x16-bit band exact match (Hamming<=3 within
  verified pairs).
- **n-gram Jaccard**: exact pairwise Jaccard over word n-gram sets for a
  bounded candidate set (the verify kernel of the LSH path, exposed
  standalone).

At 100 TB, only hashes/signatures ever shuffle (fixed-width, ~100 bytes/doc);
payload text stays columnar at rest. The small sf tables here exercise the
same plans.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _stable_u64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of a token list (blake2b, process-independent)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
        )
    return out


def word_shingles(text: str, n: int = 3) -> list[str]:
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
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

class MinHasher:
    """Per-batch MinHash signatures: ``num_perm`` universal hashes
    ``(a*x + b) mod p`` over word-``n``-gram shingle hashes. The
    permutation table builds once per actor."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.shingle_n)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = _stable_u64(sh) % _MERSENNE
        # (num_perm, n_shingles) without materializing huge intermediates:
        # chunk shingles if very long
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"], "sig": sigs})


def _band_rows(batch: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    doc_ids, band_ids, band_hashes = [], [], []
    for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            doc_ids.append(doc_id)
            band_ids.append(b)
            band_hashes.append(int.from_bytes(h, "little") >> 1)  # fits int64
    return pd.DataFrame(
        {"doc_id": doc_ids, "band_id": band_ids, "band_hash": band_hashes}
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []})
    # pair every member with the bucket minimum — enough for connectivity,
    # O(bucket) rows instead of O(bucket^2)
    a0 = ids[0]
    return pd.DataFrame({"a": [a0] * (len(ids) - 1), "b": ids[1:]})


def minhash_lsh_pairs(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> pd.DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, verified with exact
    n-gram Jaccard. Returns a small pandas frame (a, b, jaccard>=thr).

    Verification broadcasts only the texts of docs appearing in candidate
    pairs (small side); at 100 TB you would hash-join candidates back to
    the corpus instead — documented scale path.
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_args=(num_perm, shingle_n),
        batch_format="pandas",
        concurrency=2,
        num_cpus=0.5,
    )
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )
    pairs = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    # verify with exact Jaccard over the involved docs only
    involved = set(pairs["a"]) | set(pairs["b"])
    texts = {}
    for b in docs.iter_batches(batch_size=4096, batch_format="pandas"):
        m = b[b["doc_id"].isin(involved)]
        texts.update(zip(m["doc_id"], m["text"]))
    out = []
    for a, bb in zip(pairs["a"], pairs["b"]):
        sa = set(word_shingles(texts[a], shingle_n))
        sb = set(word_shingles(texts[bb], shingle_n))
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        if j >= jaccard_threshold:
            out.append((a, bb, round(j, 6)))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


def connected_components(pairs: pd.DataFrame, ids: list) -> pd.DataFrame:
    """Min-label propagation over verified pairs (driver-side here because
    the verified pair set is small; the same iteration is expressible as
    repeated groupby-min rounds for huge graphs)."""
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
    """64-bit SimHash over word tokens (Charikar's similarity hash)."""

    def __init__(self):
        self.bit_weights = 1 << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        h = _stable_u64(words)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) * self.bit_weights).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.fromiter(
            (self.simhash(t) for t in batch["text"]), dtype=np.uint64,
            count=len(batch),
        )
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["simhash"] = sh.astype(np.int64)  # arrow-friendly
        for band in range(4):
            out[f"sh_band{band}"] = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
        return out


def simhash_near_dups(docs: rd.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: any pair with Hamming distance
    <= 3 shares at least one of the 4 16-bit bands (pigeonhole), so
    band-exact-match buckets are a complete candidate blocking."""
    sigs = docs.map_batches(SimHasher, batch_format="pandas", concurrency=2, num_cpus=0.5)
    frames = []
    for band in range(4):
        buckets = (
            sigs.select_columns(["doc_id", "simhash", f"sh_band{band}"])
            .groupby(f"sh_band{band}")
            .map_groups(_bucket_pairs_sim, batch_format="pandas")
        )
        frames.append(buckets.to_pandas())
    cand = pd.concat(frames, ignore_index=True).drop_duplicates(["a", "b"])
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    ham = [
        int(bin(int(x) ^ int(y)).count("1"))
        for x, y in zip(cand["ha"].astype(np.uint64), cand["hb"].astype(np.uint64))
    ]
    cand = cand.assign(hamming=ham)
    keep = cand[cand["hamming"] <= max_hamming]
    return keep[["a", "b", "hamming"]].reset_index(drop=True)


def _bucket_pairs_sim(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("doc_id")
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": [], "ha": [], "hb": []})
    a0 = g.iloc[0]
    rest = g.iloc[1:]
    return pd.DataFrame(
        {
            "a": [a0["doc_id"]] * len(rest),
            "b": rest["doc_id"].tolist(),
            "ha": [np.uint64(a0["simhash"])] * len(rest),
            "hb": rest["simhash"].astype(np.int64).astype(np.uint64).tolist(),
        }
    )
