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
- per-row auth (M18, ``backend/api/tasks.py:506-547,586-606``):
  ``auth_enabled`` bool, ``auth_type`` in {cookies, headers, basic},
  cookie strings parsed from JSON or Chrome-DevTools ``k=v; k2=v2`` form,
  ``auth_headers`` as JSON; row auth wins over a job-global auth config
  (``resolve_auth``). The fetch stage consumes the resolved credentials.
- ``seed_rank`` = file row order (crawl order round 0), ``priority``
  synthetic.
"""

from __future__ import annotations

import json

import pandas as pd
import ray.data as rd

from ..canon import canonicalize, host_of, is_valid_url

TRUTHY = {"true", "yes", "1", "y"}
VALID_MODES = {"content", "link"}
VALID_LINK_TYPES = {"all", "internal", "external"}
VALID_FORMATS = {"txt", "md", "html", "json"}
VALID_AUTH_TYPES = {"cookies", "headers", "basic"}


def parse_cookie_string(cookie_str: str | None) -> dict:
    """Cookie string -> dict (M18): JSON object form if it starts with
    '{' (malformed JSON falls through), else Chrome-DevTools
    ``k1=v1; k2=v2`` pairs. Mirrors ``tasks.py:586-606``."""
    if not cookie_str:
        return {}
    s = cookie_str.strip()
    if s.startswith("{"):
        try:
            d = json.loads(s)
            if isinstance(d, dict):
                return d
        except (ValueError, TypeError):
            pass
    cookies = {}
    for pair in s.split(";"):
        pair = pair.strip()
        if "=" in pair:
            key, value = pair.split("=", 1)
            cookies[key.strip()] = value.strip()
    return cookies


def parse_auth_headers(headers_str: str | None) -> dict:
    """JSON auth-header string -> dict; malformed -> {} (errors-as-data,
    matching the reference's silent except)."""
    if not headers_str or not headers_str.strip():
        return {}
    try:
        d = json.loads(headers_str)
        return d if isinstance(d, dict) else {}
    except (ValueError, TypeError):
        return {}


def resolve_auth(row: dict, global_auth: dict | None = None):
    """-> (cookies_dict, headers_dict, basic_tuple|None) with the
    reference's precedence: row auth when ``auth_enabled``, else the
    job-global auth config, else nothing (``tasks.py:506-547``)."""
    cookies: dict = {}
    headers: dict = {}
    basic = None
    if row.get("auth_enabled"):
        auth_type = row.get("auth_type") or "cookies"
        if auth_type == "cookies" and row.get("cookies"):
            cookies = parse_cookie_string(row["cookies"])
        elif auth_type == "headers" and row.get("auth_headers"):
            headers = parse_auth_headers(row["auth_headers"])
        elif auth_type == "basic":
            u, p = row.get("basic_auth_username"), row.get("basic_auth_password")
            if u and p:
                basic = (u, p)
    elif global_auth:
        method = global_auth.get("auth_method", "cookies")
        if method == "cookies" and global_auth.get("cookies"):
            cookies = parse_cookie_string(global_auth["cookies"])
        elif method == "headers" and global_auth.get("auth_headers"):
            headers = parse_auth_headers(global_auth["auth_headers"])
        elif method == "basic":
            u = global_auth.get("basic_auth_username")
            p = global_auth.get("basic_auth_password")
            if u and p:
                basic = (u, p)
    return cookies, headers, basic


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
    out["auth_enabled"] = (
        df["auth_enabled"].map(parse_bool) if "auth_enabled" in df else False
    )
    at = df["auth_type"].map(_strip).str.lower() if "auth_type" in df else None
    out["auth_type"] = (
        at.map(lambda x: x if x in VALID_AUTH_TYPES else "cookies")
        if at is not None
        else "cookies"
    )
    for col in ("cookies", "auth_headers", "basic_auth_username", "basic_auth_password"):
        out[col] = df[col].map(_strip) if col in df else ""
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
