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

    Arrow-native full-corpus scan (round 5; was a pandas actor stage):
    token/alpha counts via RE2 ``count_substring_regex``, stopword hits
    via whitespace explode + ``index_in`` + parent bincount — zero
    pandas conversion, and state is tiny so it runs as a task-pool
    closure (``map_batches(QualityScorer())``). Counts stay exact
    integers so the DuckDB oracle reproduces them bit-for-bit.
    """

    def __init__(self):
        self.stop = pa.array(sorted(set(QUALITY_STOPWORDS)), pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks().cast(pa.string())
        n = t.num_rows
        lists = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(lists)
        m = pc.is_valid(pc.index_in(flat, value_set=self.stop)) \
            .to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n_stop = (np.bincount(parent[m], minlength=n) if m.any()
                  else np.zeros(n, np.int64))
        # NOTE: arrow split_whitespace emits boundary empty strings, so
        # list_value_length over-counts — \S+ run count is the exact
        # findall(\S+) token count (empties can't hit the stopword set,
        # so the explode above stays correct for n_stopwords)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.count_substring_regex(text, r"\S+")
            .cast(pa.int64()),
            "n_stopwords": pa.array(n_stop.astype(np.int64)),
            "n_alpha": pc.count_substring_regex(text, "[a-zA-Z]")
            .cast(pa.int64()),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
        })


# GPT-2-style pretokenizer shape, restricted to the RE2-safe subset so
# the DuckDB oracle (regexp_extract_all) tokenizes identically: contraction
# suffixes, space-prefixed letter/digit runs, punctuation runs, whitespace
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


class BpeTokenCounter:
    """BPE-ish token counting (the pretokenizer pass of byte-pair
    encoders): one vectorized regex count per batch; the compiled pattern
    lives in the actor."""

    def __call__(self, t: pa.Table) -> pa.Table:
        # arrow-native (round 5): the pattern is RE2-safe by
        # construction, so count_substring_regex tokenizes identically
        # to the Python/duckdb dialects; stateless -> task-pool closure
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bpe_tokens": pc.count_substring_regex(
                t["text"].combine_chunks().cast(pa.string()),
                BPE_TOKEN_PATTERN).cast(pa.int64()),
        })


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1):
    the filters a training-data pipeline cuts boilerplate/spam with.
    Emitted as EXACT integer counts (numerator/denominator pairs) so the
    DuckDB oracle reproduces them bit-for-bit; callers derive the ratio
    thresholds (e.g. drop if top_word_n/n_words > 0.2).

    - ``top_word_n``   occurrences of the doc's most frequent word
      (ties irrelevant: count of the max)
    - ``dup_word_n``   words occurring more than once (sum of their counts)
    - ``top_bigram_n`` occurrences of the most frequent adjacent word pair
    - ``n_words`` / ``n_bigrams`` denominators

    Vectorized: one explode per batch, C-level pandas groupbys — no
    per-row Python loop.
    """
    ids = batch["doc_id"].to_numpy()
    words = batch["text"].str.split()
    n_words = words.str.len().fillna(0).astype("int64").to_numpy()
    ex = pd.DataFrame({"row": np.repeat(np.arange(len(ids)), n_words),
                       "word": np.concatenate([w for w in words if w] or [[]])})
    out = pd.DataFrame({
        "doc_id": ids,
        "n_words": n_words,
        "top_word_n": np.zeros(len(ids), np.int64),
        "dup_word_n": np.zeros(len(ids), np.int64),
        "n_bigrams": np.maximum(n_words - 1, 0),
        "top_bigram_n": np.zeros(len(ids), np.int64),
    })
    if len(ex):
        wc = ex.groupby(["row", "word"], sort=False).size()
        per_row = wc.groupby(level=0)
        top = per_row.max()
        dup = wc[wc > 1].groupby(level=0).sum()
        out.loc[top.index, "top_word_n"] = top.to_numpy()
        out.loc[dup.index, "dup_word_n"] = dup.to_numpy()
        # adjacent bigrams: shift the exploded words within each row
        nxt = ex["word"].shift(-1)
        same_row = ex["row"].shift(-1) == ex["row"]
        bg = pd.DataFrame({"row": ex["row"][same_row],
                           "bigram": ex["word"][same_row] + " " + nxt[same_row]})
        if len(bg):
            bc = bg.groupby(["row", "bigram"], sort=False).size()
            topb = bc.groupby(level=0).max()
            out.loc[topb.index, "top_bigram_n"] = topb.to_numpy()
    return out


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


class LangIdArrow:
    """Arrow-native LangId: identical prediction contract to
    :class:`LangId` (argmax stopword-hit count, alphabetical tiebreak,
    zero hits -> 'und') with zero pandas conversion — the 100 TB idiom
    for a full-corpus scan: ``utf8_lower`` + ``utf8_split_whitespace``
    + ``list_parent_indices`` in Arrow C, one vectorized ``index_in``
    membership pass per language (words can belong to several
    languages' sets, e.g. fr/es 'la', so per-language passes are the
    exact restatement of the join the pandas path does), then a
    docs x langs bincount argmax in numpy. State is a few hundred
    bytes, so use as a task-pool closure (``map_batches(LangIdArrow())``)."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.sets = [pa.array(sorted(STOPWORDS[lang]), pa.string())
                     for lang in self.langs]

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        lists = pc.utf8_split_whitespace(pc.utf8_lower(text))
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        n = t.num_rows
        counts = np.zeros((n, len(self.langs)), np.int64)
        for j, vs in enumerate(self.sets):
            m = pc.is_valid(pc.index_in(flat, value_set=vs))                 .to_numpy(zero_copy_only=False)
            if m.any():
                counts[:, j] = np.bincount(parent[m], minlength=n)
        best = counts.max(axis=1)
        arg = counts.argmax(axis=1)          # first max == alphabetical tie
        langs_arr = np.array(self.langs + ["und"])
        pred = langs_arr[np.where(best > 0, arg, len(self.langs))]
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": pa.array(pred, pa.string())})


SPLIT_FRACTIONS = (("train", 0.90), ("val", 0.05), ("test", 0.05))


def stratified_split(batch: pa.Table, salt: str = "split-v1",
                     fractions=SPLIT_FRACTIONS) -> pa.Table:
    """Deterministic train/val/test assignment — the reproducible-split
    primitive a training-data pipeline needs: membership is a pure
    function of (salt, doc_id), so re-runs, resumes and incremental
    corpus additions never migrate a document across splits. Hash is
    md5-upper-8 (== DuckDB ``md5_number_upper``, the SimHash/MinHash
    oracle idiom) mod 1e6 against cumulative fraction thresholds.
    Per-row md5 is inherent to the md5 contract (cf. ``fingerprint``)."""
    from ..util import md5_id_bucket

    ids = batch["doc_id"].to_pylist()
    buckets = md5_id_bucket(salt, ids, 1_000_000)
    labels = np.empty(len(ids), dtype=object)
    lo = 0
    for name, frac in fractions:
        hi = lo + int(round(frac * 1_000_000))
        labels[(buckets >= lo) & (buckets < hi)] = name
        lo = hi
    labels[buckets >= lo] = fractions[-1][0]
    return pa.table({
        "doc_id": batch["doc_id"],
        "bucket": pa.array(buckets),
        "split": pa.array(labels.tolist(), pa.string()),
    })


def rebalance_sample(batch: pa.Table, rates_pm: dict[str, int],
                     key: str = "lang", id_col: str = "doc_id",
                     salt: str = "rebalance-v1") -> pa.Table:
    """Per-class deterministic downsampling — the class-rebalancing
    primitive (cap an over-represented language/source at a per-mille
    rate while keeping rare classes whole). Membership is a pure
    function of (salt, id): a row survives iff
    ``md5_bucket(salt:id) % 1000 < rates_pm[class]`` (classes absent
    from the map keep everything), so re-runs and incremental corpus
    additions never flip a kept row — the same md5-upper-8 contract as
    :func:`stratified_split`, hence exactly SQL-restatable."""
    from ..util import md5_id_bucket

    ids = batch[id_col].to_pylist()
    buckets = md5_id_bucket(salt, ids, 1000)
    classes = batch[key].to_pylist()
    rates = np.array([rates_pm.get(c, 1000) for c in classes], np.int64)
    out = batch.append_column("bucket", pa.array(buckets))
    return out.filter(pa.array(buckets < rates))


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

# TPC-H-shaped phone numbers; RE2-safe so the DuckDB oracle's
# regexp_extract_all / regexp_replace tokenize and rewrite identically.
PHONE_PATTERN = r"\d{2}-\d{3}-\d{3}-\d{4}"


class PiiScanner:
    """PII detection + redaction stage — the privacy pass a training-data
    pipeline runs before anything ships: count pattern hits per row and
    emit the redacted text. Generic over (id_col, text_col, pattern,
    repl); the default pattern is the production phone shape, while the
    catalog query instantiates a digit-run pattern that the test tables
    actually contain (``events.props``). Callable class -> actor
    pool; the regex compiles once per actor. Vectorized pandas
    ``str.count`` / ``str.replace`` — no per-row Python loop."""

    def __init__(self, id_col: str, text_col: str,
                 pattern: str = PHONE_PATTERN, repl: str = "<PHONE>"):
        import re

        self.id_col, self.text_col = id_col, text_col
        self.pat = re.compile(pattern)
        self.repl = repl

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # null text counts as empty text (documented contract): without
        # fillna a null row makes str.count yield NaN and the int64 cast
        # raise, killing the whole batch for one bad row
        s = batch[self.text_col].fillna("")
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_pii": s.str.count(self.pat).astype("int64"),
            "redacted": s.str.replace(self.pat, self.repl, regex=True),
        })


class TextNormalizer:
    """Canonical text normalization (lowercase, collapse non-alphanumeric
    runs to single spaces, trim) + md5 of the normalized form — the
    near-dup PREPROCESSING step exact dedup runs on when surface
    punctuation/casing should not count as difference. The [^a-z0-9]+
    pattern is RE2-safe, so DuckDB's ``regexp_replace(..., 'g')``
    restates it exactly; per-row md5 is inherent to the md5 contract
    (cf. :func:`fingerprint`)."""

    def __init__(self):
        import re

        self.pat = re.compile(r"[^a-z0-9]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # null text normalizes as empty (same contract as PiiScanner):
        # the md5 loop would otherwise call .encode() on NaN
        norm = (batch["text"].fillna("").str.lower()
                .str.replace(self.pat, " ", regex=True).str.strip())
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "norm_len": norm.str.len().astype("int64"),
            "norm_fp": [hashlib.md5(t.encode()).hexdigest() for t in norm],
        })

def mix_corpora(batch: pa.Table, rates_pm: dict[str, int],
                key: str = "source", id_col: str = "doc_id",
                rate_salt: str = "mix-rate-v1", pos_salt: str = "mix-pos-v1",
                pos_mod: int = 1_000_000_000) -> pa.Table:
    """Training-mix composer: per-class per-mille sampling (the
    :func:`rebalance_sample` contract — keep iff
    ``md5_bucket(rate_salt:id) % 1000 < rates_pm[class]``) PLUS a
    deterministic global shuffle key ``mix_pos = md5_bucket(pos_salt:id)
    % pos_mod`` — sorting the surviving rows by ``mix_pos`` interleaves
    the sources into one reproducible training stream. Both memberships
    are pure functions of (salt, id): re-runs, resumes and incremental
    corpus additions never flip a kept row or move it in the stream.
    Zero shuffle (the consumer composes the sort); exactly
    SQL-restatable via ``md5_number_upper``."""
    from ..util import md5_id_bucket

    ids = batch[id_col].to_pylist()
    rb = md5_id_bucket(rate_salt, ids, 1000)
    pos = md5_id_bucket(pos_salt, ids, pos_mod)
    classes = batch[key].to_pylist()
    rates = np.array([rates_pm.get(c, 1000) for c in classes], np.int64)
    out = pa.table({
        id_col: batch[id_col],
        key: batch[key],
        "mix_pos": pa.array(pos),
    })
    return out.filter(pa.array(rb < rates))

def tfidf_top_terms_ds(docs, n_buckets: int = 16):
    """Per-document top term by tf/df score (the exactly-SQL-restatable
    tf-idf variant: one IEEE division — no libm ``ln`` divergence), with
    integer (tf, df) evidence columns.

    Two explicit K x K hash exchanges, zero Ray-Data groupbys and zero
    sorts (the previous formulation — groupby(term) + bucketed join +
    sort-based argmax — paid three shuffles, and the Aggregate sort-map
    coalesces small blocks into one task): tf rows exchange ONCE by term
    hash (a term's df is just its row count inside its bucket, since tf
    rows are distinct per (doc, term)); scored rows re-exchange by doc
    hash; the per-doc argmax (score desc, term asc) is a vectorized pass
    inside the doc bucket."""
    import ray
    import ray.data as rd

    from .relational import _as_table, _bucket_of

    b = n_buckets
    out_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                          "term": pa.nulls(0, pa.string()),
                          "tf": pa.nulls(0, pa.int64()),
                          "df": pa.nulls(0, pa.int64())})
    mid_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                          "term": pa.nulls(0, pa.string()),
                          "tf": pa.nulls(0, pa.int64()),
                          "df": pa.nulls(0, pa.int64()),
                          "score": pa.nulls(0, pa.float64())})

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split()
        n = words.str.len().fillna(0).astype("int64").to_numpy()
        ex = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), n),
            "term": np.concatenate([w for w in words if w] or [[]]),
        })
        if not len(ex):
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "term": pd.array([], dtype="string"),
                                 "tf": pd.array([], dtype="int64")})
        return (
            ex.groupby(["doc_id", "term"], sort=False).size()
            .rename("tf").reset_index()
        )

    @ray.remote(num_returns=b)
    def split_by_term(t):
        t = _as_table(t)
        if t.num_rows == 0:
            pe = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                           "term": pa.nulls(0, pa.string()),
                           "tf": pa.nulls(0, pa.int64())})
            return [pe] * b if b > 1 else pe
        buckets = _bucket_of(t["term"], b)
        out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b)
    def term_bucket(*shards):
        tbl = pa.concat_tables([_as_table(s) for s in shards])
        if tbl.num_rows == 0:
            return [mid_empty] * b if b > 1 else mid_empty
        terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        _, inv, cnt = np.unique(terms, return_inverse=True, return_counts=True)
        dfv = cnt[inv].astype(np.int64)
        tfv = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        scored = pa.table({
            "doc_id": tbl["doc_id"].cast(pa.int64()),
            "term": tbl["term"],
            "tf": pa.array(tfv),
            "df": pa.array(dfv),
            "score": pa.array(tfv.astype(np.float64) / dfv.astype(np.float64)),
        })
        buckets = _bucket_of(scored["doc_id"], b)
        out = [scored.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def doc_bucket(*parts) -> pa.Table:
        tbl = pa.concat_tables([_as_table(p) for p in parts])
        if tbl.num_rows == 0:
            return out_empty
        df = tbl.to_pandas()
        top = (df.sort_values(["doc_id", "score", "term"],
                              ascending=[True, False, True], kind="stable")
               .groupby("doc_id", sort=False).head(1))
        return pa.Table.from_pandas(
            top[["doc_id", "term", "tf", "df"]], preserve_index=False
        ).cast(out_empty.schema)

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    tsplit = _rows([split_by_term.remote(t) for t in tf.to_arrow_refs()])
    dsplit = _rows([term_bucket.remote(*[ts[i] for ts in tsplit])
                    for i in range(b)])
    out = [doc_bucket.remote(*[ds_[i] for ds_ in dsplit]) for i in range(b)]
    return rd.from_arrow_refs(out)


def bm25_topk_ds(docs, query_terms: list[str], k: int = 100,
                 per_batch_prune: bool = True):
    """BM25 retrieval: score every document against a broadcast query
    and return the global top-k (doc_id, score) — the classic sparse
    retrieval primitive a training-data pipeline uses for corpus search
    and hard-negative mining. Generalizes the reference's per-page
    keyword statistics (``backend/crawler/parser.py:257-266``) to a
    corpus-wide ranked search.

    Scoring is the RATIONAL-IDF BM25 variant (Robertson idf without the
    log), chosen so every score is a product of two exact integer
    rationals evaluated with a fixed IEEE op order — bit-identical to a
    SQL restatement, no libm:

        idf(t)       = (2N + 1) / (2 df_t + 1)        -- == (N-df+.5)/(df+.5)+1
        w(tf, dl)    = 20 tf L / (8 L tf + 3 L + 9 dl N)
                                                       -- == tf (k1+1) / (tf + k1 (1-b + b dl/avgdl))
                                                       --    at k1=3/2, b=3/4, avgdl=L/N
        score(d)     = sum over sorted(query_terms) of idf(t) * w(tf, dl)

    (k1=1.5 and b=0.75 are exactly representable doubles; multiplying
    through by 8L clears every fraction, so numerator and denominator
    are int64 — exact up to L·tf ~ 5.7e17, far past 100 TB of text.)

    Distributed plan — two streaming passes over the corpus, nothing
    else moves: pass 1 folds O(blocks) one-row partials
    (n_docs, total_len, df per query term) on the driver (the
    ``table_profile`` pattern); pass 2 scores each batch against the
    broadcast constants and keeps only its LOCAL top-k, so the final
    exact sort+limit sees at most k × blocks rows. Per-doc term sums
    run in sorted(query_terms) order (fixed float association).
    """
    import ray.data as rd

    terms = sorted(query_terms)
    q = len(terms)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        n_tok = words.str.len().fillna(0).astype("int64").to_numpy()
        flat = np.concatenate([w for w in words if w] or [[]]).astype(object)
        ridx = np.repeat(np.arange(len(df)),
                         [len(w) if w else 0 for w in words])
        hit = np.isin(flat, np.asarray(terms, object))
        flat, ridx = flat[hit], ridx[hit]          # query tokens only
        dfv = np.zeros(q, np.int64)
        for i, t in enumerate(terms):
            dfv[i] = len(np.unique(ridx[flat == t]))
        out = {"n_docs": [len(df)], "total_len": [int(n_tok.sum())]}
        for i, t in enumerate(terms):
            out[f"df_{i}"] = [int(dfv[i])]
        return pd.DataFrame(out)

    folded = docs.map_batches(partials, batch_format="pandas").take_all()
    n_docs = sum(r["n_docs"] for r in folded)
    total_len = sum(r["total_len"] for r in folded)
    dfs = [sum(r[f"df_{i}"] for r in folded) for i in range(q)]
    # rational idf, one IEEE division each (SQL: (2N+1)::DOUBLE/(2df+1)::DOUBLE)
    idf = [np.float64(2 * n_docs + 1) / np.float64(2 * d + 1) for d in dfs]
    N, L = n_docs, total_len

    def score(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        dl = words.str.len().fillna(0).astype("int64").to_numpy()
        doc_ids = df["doc_id"].to_numpy()
        nrows = len(df)
        total = np.zeros(nrows, np.float64)
        # tf per query term: one exploded pass, then Q bincounts
        flat = np.concatenate([w for w in words if w] or [[]]).astype(object)
        ridx = np.repeat(np.arange(nrows), [len(w) if w else 0 for w in words])
        hit = np.isin(flat, np.asarray(terms, object))
        flat, ridx = flat[hit], ridx[hit]          # query tokens only
        for i, t in enumerate(terms):
            tf = np.bincount(ridx[flat == t], minlength=nrows).astype(np.int64)
            num = 20 * tf * L
            den = 8 * L * tf + 3 * L + 9 * dl * N
            w = num.astype(np.float64) / den.astype(np.float64)
            # += in sorted-term order == the SQL's left-assoc (s0+s1)+s2...
            total += np.where(tf > 0, w * np.float64(idf[i]), 0.0)
        keep = total > 0.0
        out = pd.DataFrame({"doc_id": doc_ids[keep], "score": total[keep]})
        if per_batch_prune and len(out) > k:
            out = out.sort_values(["score", "doc_id"],
                                  ascending=[False, True]).head(k)
        return out

    scored = docs.map_batches(score, batch_format="pandas")
    return scored.sort(["score", "doc_id"],
                       descending=[True, False]).limit(k)


def lm_score_ds(docs, n_buckets: int = 16):
    """Per-document BIGRAM language-model score — the corpus-fit /
    fluency signal a training-data pipeline uses alongside
    :class:`QualityScorer` (CCNet-style model filtering, Wenzek 2020,
    with counts playing the LM). Output: ``(doc_id, n_bigrams,
    score_ppm)`` where each bigram occurrence scores
    ``P(w2|w1) = c(w1 w2) / c(w1 ·)`` over the WHOLE corpus and the doc
    score is the floored mean in ppm — divisions are exact big-int-free
    floor divisions in the md5-61-bit hash domain (the repo-wide
    DuckDB-restatable contract), so no float and no libm log anywhere.
    Docs with fewer than two tokens are dropped.

    Dataflow — two K x K fixed-width hash exchanges, zero Ray-Data
    groupbys, and TOKEN STRINGS NEVER SHUFFLE: each batch hashes every
    bigram occurrence to ``(h1, h2)`` locally, and because rows key on
    the PREFIX hash, one h1-bucket holds every occurrence sharing a
    prefix — both the conditional's numerator c(h1,h2) and denominator
    c(h1) are local np.unique counts, no second count exchange. Scored
    (doc_id, prob_ppm) rows re-exchange by doc hash for the per-doc
    mean. At 100 TB the shuffle mass is 24-byte rows both hops."""
    import ray
    import ray.data as rd

    from ..util import md5_id_bucket
    from .relational import _as_table, _bucket_of

    mers = (1 << 61) - 1
    b = n_buckets
    rows_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                           "h1": pa.nulls(0, pa.int64()),
                           "h2": pa.nulls(0, pa.int64())})
    mid_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                          "prob_ppm": pa.nulls(0, pa.int64())})
    out_empty = pa.table({"doc_id": pa.nulls(0, pa.int64()),
                          "n_bigrams": pa.nulls(0, pa.int64()),
                          "score_ppm": pa.nulls(0, pa.int64())})

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_h1, out_h2 = [], [], []
        for d, text in zip(ids, t["text"].to_pylist()):
            toks = (text or "").split()
            m = len(toks) - 1
            if m <= 0:
                continue
            out_h1.append(md5_id_bucket("lmuni", toks[:-1], mers))
            out_h2.append(md5_id_bucket(
                "lmbi", [" ".join(p) for p in zip(toks[:-1], toks[1:])],
                mers))
            out_doc.append(np.full(m, d, np.int64))
        if not out_doc:
            return rows_empty
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "h1": pa.array(np.concatenate(out_h1), pa.int64()),
            "h2": pa.array(np.concatenate(out_h2), pa.int64()),
        })

    @ray.remote(num_returns=b)
    def split_by_h1(t):
        t = _as_table(t)
        if t.num_rows == 0:
            return [rows_empty] * b if b > 1 else rows_empty
        buckets = _bucket_of(t["h1"], b)
        out = [t.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote(num_returns=b)
    def h1_bucket(*shards):
        """Score every occurrence in this prefix-hash bucket: c(h1) and
        c(h1,h2) are bucket-local row counts by construction."""
        tbl = pa.concat_tables([_as_table(s) for s in shards])
        if tbl.num_rows == 0:
            return [mid_empty] * b if b > 1 else mid_empty
        h1 = tbl["h1"].to_numpy(zero_copy_only=False)
        h2 = tbl["h2"].to_numpy(zero_copy_only=False)
        # exact (h1, h2) group counts via lexsort boundaries — a packed
        # 64-bit pair key could collide distinct pairs and silently
        # merge conditionals the oracle keeps apart
        order = np.lexsort((h2, h1))
        hs1, hs2 = h1[order], h2[order]
        new1 = np.r_[True, hs1[1:] != hs1[:-1]]
        new12 = new1 | np.r_[True, hs2[1:] != hs2[:-1]]
        g1 = np.cumsum(new1) - 1
        g12 = np.cumsum(new12) - 1
        c1 = np.bincount(g1)
        c12 = np.bincount(g12)
        prob_sorted = c12[g12].astype(np.int64) * 1_000_000 // c1[g1]
        prob = np.empty_like(prob_sorted)
        prob[order] = prob_sorted
        mid = pa.table({"doc_id": tbl["doc_id"],
                        "prob_ppm": pa.array(prob, pa.int64())})
        buckets = _bucket_of(mid["doc_id"], b)
        out = [mid.filter(pa.array(buckets == i)) for i in range(b)]
        return out if b > 1 else out[0]

    @ray.remote
    def doc_bucket(*parts) -> pa.Table:
        tbl = pa.concat_tables([_as_table(p) for p in parts])
        if tbl.num_rows == 0:
            return out_empty
        agg = tbl.group_by(["doc_id"]).aggregate(
            [("prob_ppm", "sum"), ([], "count_all")])
        s = agg["prob_ppm_sum"].to_numpy(zero_copy_only=False)
        n = agg["count_all"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": agg["doc_id"].cast(pa.int64()),
            "n_bigrams": pa.array(n.astype(np.int64)),
            "score_ppm": pa.array(s // n, pa.int64()),
        })

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")

    def _rows(refs):
        return [[r] for r in refs] if b == 1 else refs

    rsplit = _rows([split_by_h1.remote(t) for t in rows.to_arrow_refs()])
    hsplit = _rows([h1_bucket.remote(*[rs[i] for rs in rsplit])
                    for i in range(b)])
    out = [doc_bucket.remote(*[hs[i] for hs in hsplit]) for i in range(b)]
    return rd.from_arrow_refs(out)


def collocations_ds(docs, min_count: int = 5, n_buckets: int = 16):
    """Corpus COLLOCATIONS — adjacent token pairs with a lift (the
    no-log PMI: P(w1 w2) / (P(w1) P(w2)) as an exact ppm rational)
    computed from global counts, thresholded at ``min_count`` pair
    occurrences (Manning & Schutze ch. 5 shape). Output ``(w1, w2,
    pair_count, lift_ppm)`` where lift_ppm = cb * N * 10^6 //
    (c1(w1) * c1(w2)) in Python-big-int floor arithmetic (cb*N*1e6
    overflows int64 at corpus scale).

    Dataflow: token-count partials and pair-count partials each fold
    through ONE hash exchange (`bucketed_reduce` keyed on the token /
    first token); the HAVING >= min_count filter lands inside the pair
    buckets BEFORE anything joins, so the two `bucketed_hash_join`s
    against the vocab-sized count table move only the rare surviving
    collocations; N folds from per-batch scalars on the driver. Token
    strings do shuffle here (the OUTPUT is strings — the tfidf/bm25
    precedent), but only once each, pre-aggregated."""
    import ray.data as rd

    from .relational import bucketed_hash_join, bucketed_reduce

    def tok_partial(t: pa.Table) -> pa.Table:
        toks = [w for text in t["text"].to_pylist()
                for w in (text or "").split()]
        if not toks:
            return pa.table({"term": pa.nulls(0, pa.string()),
                             "c": pa.nulls(0, pa.int64())})
        tmp = pa.table({"term": pa.array(toks, pa.string())})
        return (tmp.group_by(["term"]).aggregate([([], "count_all")])
                .rename_columns(["term", "c"]))

    def pair_partial(t: pa.Table) -> pa.Table:
        w1, w2 = [], []
        for text in t["text"].to_pylist():
            toks = (text or "").split()
            if len(toks) >= 2:
                w1.extend(toks[:-1])
                w2.extend(toks[1:])
        if not w1:
            return pa.table({"w1": pa.nulls(0, pa.string()),
                             "w2": pa.nulls(0, pa.string()),
                             "c": pa.nulls(0, pa.int64())})
        tmp = pa.table({"w1": pa.array(w1, pa.string()),
                        "w2": pa.array(w2, pa.string())})
        return (tmp.group_by(["w1", "w2"]).aggregate([([], "count_all")])
                .rename_columns(["w1", "w2", "c"]))

    def fold_counts(cols):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            return (t.group_by(cols).aggregate([("c", "sum")])
                    .rename_columns([*cols, "c"]))
        return fn

    def pair_fold(t: pa.Table) -> pa.Table:
        t = fold_counts(["w1", "w2"])(t)
        if t.num_rows == 0:
            return t
        return t.filter(pc.greater_equal(t["c"], min_count))

    text = docs.select_columns(["text"])
    tok_counts = bucketed_reduce(
        text.map_batches(tok_partial, batch_format="pyarrow"),
        "term", fold_counts(["term"]), n_buckets=n_buckets)
    pair_counts = bucketed_reduce(
        text.map_batches(pair_partial, batch_format="pyarrow"),
        "w1", pair_fold, n_buckets=n_buckets)

    def n_partial(t: pa.Table) -> pa.Table:
        stripped = pc.utf8_trim_whitespace(t["text"])
        nt = pc.list_value_length(
            pc.split_pattern_regex(stripped, r"\s+")).cast(pa.int64())
        nt = pc.if_else(pc.equal(stripped, ""), pa.scalar(0, pa.int64()), nt)
        npairs = pc.sum(pc.max_element_wise(
            pc.subtract(nt, 1), pa.scalar(0, pa.int64()))).as_py()
        return pa.table({"n": pa.array([int(npairs or 0)])})

    n_pairs = sum(r["n"] for r in
                  text.map_batches(n_partial,
                                   batch_format="pyarrow").take_all())

    j1 = bucketed_hash_join(
        pair_counts.map_batches(
            lambda t: t.rename_columns(["term", "w2", "cb"]),
            batch_format="pyarrow"),
        tok_counts.map_batches(
            lambda t: t.rename_columns(["term", "c1"]),
            batch_format="pyarrow"),
        key="term", n_buckets=n_buckets)
    j2 = bucketed_hash_join(
        j1.map_batches(
            lambda t: pa.table({"w1": t["term"], "term": t["w2"],
                                "cb": t["cb"], "c1": t["c1"]}),
            batch_format="pyarrow"),
        tok_counts.map_batches(
            lambda t: t.rename_columns(["term", "c2"]),
            batch_format="pyarrow"),
        key="term", n_buckets=n_buckets)

    def lift(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w1": pa.nulls(0, pa.string()),
                             "w2": pa.nulls(0, pa.string()),
                             "pair_count": pa.nulls(0, pa.int64()),
                             "lift_ppm": pa.nulls(0, pa.int64())})
        cb = t["cb"].to_numpy(zero_copy_only=False)
        c1 = t["c1"].to_numpy(zero_copy_only=False)
        c2 = t["c2"].to_numpy(zero_copy_only=False)
        lp = [int(b) * n_pairs * 1_000_000 // (int(a) * int(d))
              for b, a, d in zip(cb, c1, c2)]
        return pa.table({"w1": t["w1"], "w2": t["term"],
                         "pair_count": pa.array(cb, pa.int64()),
                         "lift_ppm": pa.array(lp, pa.int64())})

    return j2.map_batches(lift, batch_format="pyarrow")
