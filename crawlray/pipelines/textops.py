"""Text-analysis operators over the ``documents`` table.

The large-scale training-data operators the crawl corpus feeds: token
counting, quality scoring, fingerprinting, language ID. All are
single-pass ``map_batches`` stages (no shuffle except the final small
aggregates); stateful pieces (compiled regexes, stopword tables) live in
callable-class ``__init__`` so they build once per actor.

These generalize the reference's content statistics
(``backend/crawler/parser.py:257-266``: whitespace word_count +
character_count) to corpus scale; semantics of ``word_count`` match
Python's ``str.split()`` (any-whitespace runs, no empties) so the DuckDB
oracle can restate them exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# tiny deterministic per-language stopword tables for the n-gram/stopword
# language heuristic (public-knowledge function words)
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "que", "por"},
}

QUALITY_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def doc_stats(batch: pa.Table) -> pa.Table:
    """Per-doc word/char counts (A2 analog). Vectorized Arrow kernels:
    word_count = count of whitespace-delimited tokens (== len(text.split()))."""
    text = batch["text"]
    stripped = pc.utf8_trim_whitespace(text)
    # tokens = runs of non-whitespace; empty string -> 0
    n_tokens = pc.list_value_length(pc.split_pattern_regex(stripped, r"\s+"))
    n_tokens = pc.if_else(pc.equal(stripped, ""), pa.scalar(0, pa.int32()),
                          n_tokens.cast(pa.int32()))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "word_count": n_tokens.cast(pa.int64()),
            "char_count": pc.utf8_length(text).cast(pa.int64()),
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (exact-dup key; the
    scalable stand-in for the reference's per-file identity)."""
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return pa.table({"doc_id": batch["doc_id"],
                     "fp": pa.array(fps, pa.string())})


class QualityScorer:
    """Quality-signal stage: stopword ratio, alpha ratio, mean token length.

    Callable class -> actor pool; the token regex is compiled once per
    actor. Ratios are derived from exact integer counts so the DuckDB
    oracle reproduces them bit-for-bit.
    """

    def __init__(self):
        import re

        self.token_re = re.compile(r"\S+")
        self.stop = set(QUALITY_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.findall(self.token_re)
        n_tok = toks.str.len().astype("int64")
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in self.stop)).astype("int64")
        n_alpha = batch["text"].str.count(r"[a-zA-Z]").astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_stopwords": n_stop,
                "n_alpha": n_alpha,
                "n_chars": n_chars,
            }
        )


# GPT-2-style pretokenizer shape, restricted to the RE2-safe subset so
# the DuckDB oracle (regexp_extract_all) tokenizes identically: contraction
# suffixes, space-prefixed letter/digit runs, punctuation runs, whitespace
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


class BpeTokenCounter:
    """BPE-ish token counting (the pretokenizer pass of byte-pair
    encoders): one vectorized regex count per batch; the compiled pattern
    lives in the actor."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_TOKEN_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": batch["text"].str.count(self.pat).astype("int64"),
            }
        )


class LangId:
    """Stopword-hit language heuristic: argmax over per-language function
    word hits (occurrences, not distinct words); ties break to the
    alphabetically first language, zero-hit docs -> 'und'. Vectorized:
    explode words, merge against the stopword table, grouped count,
    sort-based argmax — no per-row Python loop. SQL-restatable
    (``SQL_LANG_ID``)."""

    def __init__(self):
        rows = sorted(
            (w, lang) for lang, ws in STOPWORDS.items() for w in ws
        )
        self.stop_df = pd.DataFrame(rows, columns=["word", "lang"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        ex = pd.DataFrame(
            {"doc_id": ids, "word": batch["text"].str.lower().str.split().to_numpy()}
        ).explode("word").dropna(subset=["word"])
        hits = ex.merge(self.stop_df, on="word")
        if hits.empty:
            return pd.DataFrame({"doc_id": ids, "lang_pred": ["und"] * len(ids)})
        counts = hits.groupby(["doc_id", "lang"]).size().reset_index(name="n")
        best = (
            counts.sort_values(["n", "lang"], ascending=[False, True], kind="stable")
            .groupby("doc_id", sort=False)
            .head(1)
        )
        pred = dict(zip(best["doc_id"], best["lang"]))
        return pd.DataFrame(
            {"doc_id": ids, "lang_pred": [pred.get(i, "und") for i in ids]}
        )


def rolling_hashes(text: str, window: int = 16, base: int = 257,
                   mod: int = (1 << 61) - 1) -> np.ndarray:
    """Rabin-Karp rolling hash over characters (document fingerprinting /
    chunking primitive)."""
    data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    if len(data) < window:
        return np.array([], dtype=np.uint64)
    h = 0
    out = np.empty(len(data) - window + 1, dtype=np.uint64)
    top = pow(base, window - 1, mod)
    for i in range(window):
        h = (h * base + int(data[i])) % mod
    out[0] = h
    for i in range(window, len(data)):
        h = ((h - int(data[i - window]) * top) * base + int(data[i])) % mod
        out[i - window + 1] = h
    return out
