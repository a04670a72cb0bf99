"""Seed-list sources: CSV crawl-parameter ingestion (S2-S4 in SURVEY.md §2.1).

``read_seed_csv`` = ``ray.data.read_csv`` + one vectorized normalization
``map_batches`` implementing the reference's per-row coercions
(``backend/utils/csv_processor.py:68-136``):

- ``url`` required; rows with invalid URLs are split into a rejects table
  (recorded, not dropped — ``backend/main.py:414-422`` semantics, M19/D4);
- ``mode`` default ``content``, lowercased; ``link_type`` default ``all``;
- ``format`` split on comma/space, lowercased, default ``["txt"]``;
- booleans from {'true','yes','1','y'} (case-insensitive);
- NaN/empty -> None for scope/auth fields;
- ``seed_rank`` = file row order (crawl order round 0), ``priority``
  synthetic.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..canon import canonicalize, host_of, is_valid_url

TRUTHY = {"true", "yes", "1", "y"}
VALID_MODES = {"content", "link"}
VALID_LINK_TYPES = {"all", "internal", "external"}
VALID_FORMATS = {"txt", "md", "html", "json"}


def parse_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return False
    if isinstance(v, str):
        return v.strip().lower() in TRUTHY
    return bool(v)


def parse_formats(v) -> list[str]:
    if v is None or (isinstance(v, float) and pd.isna(v)) or not str(v).strip():
        return ["txt"]
    fs = [f.strip().lower() for f in str(v).replace(",", " ").split()]
    return [f for f in fs if f] or ["txt"]


def _strip(v) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ""
    return str(v).strip()


def normalize_seed_rows(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    out["url_raw"] = df["url"].map(_strip)
    out["valid"] = out["url_raw"].map(is_valid_url)
    out["url"] = out["url_raw"].map(lambda u: canonicalize(u) if is_valid_url(u) else "")
    out["host"] = out["url"].map(host_of)
    mode = df["mode"].map(_strip).str.lower() if "mode" in df else ""
    out["mode"] = (mode if "mode" in df else pd.Series([""] * len(df))).map(
        lambda m: m if m in VALID_MODES else "content"
    )
    out["scope_class"] = (
        df["scope_class"].map(_strip) if "scope_class" in df else ""
    )
    out["scope_id"] = df["scope_id"].map(_strip) if "scope_id" in df else ""
    out["formats"] = (
        df["format"].map(parse_formats)
        if "format" in df
        else pd.Series([["txt"]] * len(df))
    )
    out["download_images"] = (
        df["download_images"].map(parse_bool) if "download_images" in df else False
    )
    lt = df["link_type"].map(_strip).str.lower() if "link_type" in df else None
    out["link_type"] = (
        lt.map(lambda x: x if x in VALID_LINK_TYPES else "all")
        if lt is not None
        else "all"
    )
    out["exclude_anchors"] = (
        df["exclude_anchors"].map(parse_bool) if "exclude_anchors" in df else False
    )
    return out


def read_seed_csv(path: str) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (seeds, rejects). Seeds carry seed_rank = file order."""
    ds = rd.read_csv(path)
    from ..util import zip_with_index

    indexed, _ = zip_with_index(ds, "seed_rank")
    norm = indexed.map_batches(
        lambda df: normalize_seed_rows(df).assign(seed_rank=df["seed_rank"].values),
        batch_format="pandas",
    ).materialize()
    seeds = norm.map_batches(
        lambda t: t.filter(t["valid"]), batch_format="pyarrow"
    ).drop_columns(["valid", "url_raw"])
    rejects = norm.map_batches(
        lambda t: t.filter(__import__("pyarrow").compute.invert(t["valid"])),
        batch_format="pyarrow",
    ).select_columns(["url_raw"])
    return seeds, rejects
