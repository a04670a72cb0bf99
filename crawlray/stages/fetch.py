"""Fetcher actor-pool stage (S1 in SURVEY.md §2.1, ST1/ST3 in §2.3).

A callable CLASS for ``map_batches(SynthFetcher, concurrency=N, ...)``:
session-equivalent state (the synthetic World, per-host token buckets, the
robots cache) is built once per actor in ``__init__``; ``__call__`` fetches
one Arrow batch of frontier rows. Mirrors the reference's fetch semantics
(``backend/crawler/fetcher.py:52-95``): <=3 attempts with retry on
5xx/timeout, error classification per ``backend/utils/error_handler.py``
(errors-as-data columns, never exceptions).

In this sandbox the network is replaced by the deterministic page generator
(``crawlray.synth.World``); the real-network variant would swap
``_fetch_one`` for an HTTP client while keeping every other column contract.
"""

from __future__ import annotations

import pyarrow as pa

from ..canon import split_url
from ..state.politeness import HostPoliteness
from ..synth import World, WorldConfig

MAX_ATTEMPTS = 3  # fetcher.py:11-14


class SynthFetcher:
    def __init__(self, cfg: WorldConfig, rate_per_host: float | None = None,
                 global_auth: dict | None = None):
        self.world = World(cfg)
        self.politeness = HostPoliteness(rate_per_host)
        self.global_auth = global_auth

    def _row_auth(self, batch: pa.Table):
        """Per-row resolved credentials when the batch carries M18 auth
        columns; a row of (None,)-equivalents otherwise (open crawl)."""
        from .sources import resolve_auth

        n = batch.num_rows
        cols = set(batch.column_names)
        auth_cols = ("auth_enabled", "auth_type", "cookies", "auth_headers",
                     "basic_auth_username", "basic_auth_password")
        if not (cols & set(auth_cols)) and self.global_auth is None:
            return [({}, {}, None)] * n
        getl = lambda c: batch[c].to_pylist() if c in cols else [None] * n
        rows = [dict(zip(auth_cols, vals)) for vals in zip(*(getl(c) for c in auth_cols))]
        return [resolve_auth(r, self.global_auth) for r in rows]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        auths = self._row_auth(batch)
        status: list[str] = []
        codes: list[int] = []
        errt: list[str] = []
        errc: list[str] = []
        retry: list[bool] = []
        attempts: list[int] = []
        payloads: list[bytes | None] = []
        for url, host, (cookies, headers, basic) in zip(urls, hosts, auths):
            path = split_url(url)[2]
            if self.world.robots_disallowed(host, path):
                status.append("robots_denied")
                codes.append(0)
                errt.append("robots")
                errc.append("ROBOTS_DENIED")
                retry.append(False)
                attempts.append(0)
                payloads.append(None)
                continue
            if not self.world.auth_ok(host, basic, cookies, headers):
                # credential-gated host without valid auth: 401 as data,
                # not retryable (4xx classification, error_handler.py)
                status.append("http_401")
                codes.append(401)
                errt.append("http_error")
                errc.append("401")
                retry.append(False)
                attempts.append(1)
                payloads.append(None)
                continue
            self.politeness.acquire(host)
            final_status, need = self.world.fetch_plan(url)
            n = min(need, MAX_ATTEMPTS)
            if final_status == 404:
                status.append("http_404")
                codes.append(404)
                errt.append("http_error")      # error_handler.py:232-240
                errc.append("404")
                retry.append(False)            # 4xx not retryable
                attempts.append(1)
                payloads.append(None)
            else:
                # 500/timeout succeed on a later attempt (deterministic);
                # the retry loop is real, the outcome is synthetic.
                status.append("ok")
                codes.append(200)
                errt.append("")
                errc.append("")
                retry.append(False)
                attempts.append(n)
                payloads.append(self.world.gen_page(url).encode())
        return batch.append_column("status", pa.array(status, pa.string())) \
            .append_column("status_code", pa.array(codes, pa.int32())) \
            .append_column("error_type", pa.array(errt, pa.string())) \
            .append_column("error_code", pa.array(errc, pa.string())) \
            .append_column("retry_possible", pa.array(retry, pa.bool_())) \
            .append_column("attempts", pa.array(attempts, pa.int32())) \
            .append_column("payload", pa.array(payloads, pa.binary()))
