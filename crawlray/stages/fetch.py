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

import threading
from typing import Protocol, runtime_checkable

import pyarrow as pa

from ..canon import split_url
from ..state.politeness import HostPoliteness
from ..synth import World, WorldConfig

MAX_ATTEMPTS = 3  # fetcher.py:11-14

#: The fetch-stage column contract AS CODE: every Fetcher implementation
#: appends exactly these columns (these names, these types) to its input
#: batch. This is the swap surface between the sandbox SynthFetcher and a
#: real-network fetcher — the rest of the engine reads only these columns.
FETCH_OUTPUT_COLUMNS: dict[str, pa.DataType] = {
    "status": pa.string(),          # ok | http_<code> | robots_denied | timeout | connection_error
    "status_code": pa.int32(),      # HTTP status, 0 when none was received
    "error_type": pa.string(),      # errors.ErrorRecord.error_type, "" on ok
    "error_code": pa.string(),      # errors.ErrorRecord.error_code, "" on ok
    "retry_possible": pa.bool_(),   # caller MAY re-enqueue (5xx/timeout/conn)
    "attempts": pa.int32(),         # fetch attempts consumed (<= MAX_ATTEMPTS)
    "payload": pa.binary(),         # response body, null unless status == ok
}


@runtime_checkable
class Fetcher(Protocol):
    """Protocol for fetch stages (a callable class for
    ``map_batches(Cls, concurrency=N)``): takes an Arrow batch with at
    least ``url`` and ``host`` columns (plus optional M18 auth columns),
    returns the batch with :data:`FETCH_OUTPUT_COLUMNS` appended.
    Implementations hold session state (politeness buckets, robots cache,
    HTTP session) per actor, built once in ``__init__``."""

    def __call__(self, batch: pa.Table) -> pa.Table: ...


def validate_fetch_output(batch_in: pa.Table, batch_out: pa.Table) -> None:
    """Assert a fetch stage honored the column contract (used by the
    conformance test that every Fetcher implementation must pass)."""
    for name in batch_in.column_names:
        assert name in batch_out.column_names, f"input column {name} dropped"
    for name, typ in FETCH_OUTPUT_COLUMNS.items():
        assert name in batch_out.column_names, f"missing contract column {name}"
        got = batch_out.schema.field(name).type
        assert got == typ, f"column {name}: expected {typ}, got {got}"
    assert batch_out.num_rows == batch_in.num_rows


def resolve_batch_auth(batch: pa.Table, global_auth: dict | None):
    """Per-row resolved credentials when the batch carries M18 auth
    columns; a row of (None,)-equivalents otherwise (open crawl). Shared
    by every Fetcher implementation."""
    from .sources import resolve_auth

    n = batch.num_rows
    cols = set(batch.column_names)
    auth_cols = ("auth_enabled", "auth_type", "cookies", "auth_headers",
                 "basic_auth_username", "basic_auth_password")
    if not (cols & set(auth_cols)) and global_auth is None:
        return [({}, {}, None)] * n
    getl = lambda c: batch[c].to_pylist() if c in cols else [None] * n
    rows = [dict(zip(auth_cols, vals)) for vals in zip(*(getl(c) for c in auth_cols))]
    return [resolve_auth(r, global_auth) for r in rows]


class SynthFetcher:
    def __init__(self, cfg: WorldConfig, rate_per_host: float | None = None,
                 global_auth: dict | None = None):
        self.world = World(cfg)
        self.politeness = HostPoliteness(rate_per_host)
        self.global_auth = global_auth

    def _row_auth(self, batch: pa.Table):
        return resolve_batch_auth(batch, self.global_auth)

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


class HttpFetcher:
    """Real-network Fetcher over urllib (stdlib — no HTTP client packages
    in this sandbox), honoring the same column contract, politeness and
    error taxonomy as :class:`SynthFetcher`; the constructor seam mirrors
    the storage seam so swapping synth->real is one argument at the call
    site. Mirrors the reference's fetch semantics
    (``backend/crawler/fetcher.py:52-95``): <=MAX_ATTEMPTS tries with
    retry on 5xx/timeout/connection errors, per-row credentials, errors
    as data. Per-actor state: robots cache + politeness token buckets.

    **Concurrent in-actor fetch** (SURVEY §2.1 S1 "async fetch inside
    actor"): ``max_concurrency`` worker threads per actor drain each
    batch through one lazily-built ``ThreadPoolExecutor`` (urllib releases
    the GIL during socket waits, so threads genuinely overlap network
    time). The per-host token buckets are THREAD-SAFE and shared across
    the pool — same-host requests serialize on their bucket (the
    politeness contract) while other hosts proceed; the robots cache is
    single-flight (one thread fetches a host's robots.txt, peers wait on
    an event instead of re-fetching). Output rows keep INPUT order
    regardless of completion order, so the column contract and the
    engine's (priority, seq) ordering are untouched. ``max_concurrency=1``
    degrades to the sequential loop.

    The sandbox has no network, so this class is exercised by (a) the
    protocol/contract conformance test, (b) an offline connection-refused
    drive (the error path is fully real, concurrency included), and (c) a
    live test that skips unless the network is reachable.
    """

    def __init__(self, rate_per_host: float | None = None,
                 global_auth: dict | None = None, timeout: float = 10.0,
                 user_agent: str = "crawlray/1.0", respect_robots: bool = True,
                 max_concurrency: int = 8):
        self.politeness = HostPoliteness(rate_per_host)
        self.global_auth = global_auth
        self.timeout = timeout
        self.user_agent = user_agent
        self.respect_robots = respect_robots
        self.max_concurrency = max(1, int(max_concurrency))
        self._robots: dict[str, object] = {}   # host -> RobotFileParser | None
        self._robots_lock = threading.Lock()
        self._robots_inflight: dict[str, object] = {}   # host -> Event
        self._pool = None   # lazy ThreadPoolExecutor (unpicklable; per actor)

    def _ensure_pool(self):
        if self._pool is None and self.max_concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.max_concurrency, thread_name_prefix="fetch"
            )
        return self._pool

    # -- per-actor robots cache (ST3), single-flight across the pool ------
    def _robots_allowed(self, url: str, host: str) -> bool:
        if not self.respect_robots:
            return True
        from urllib.parse import urlsplit

        # cache + fetch by ORIGIN (scheme://netloc): host_of strips the
        # port, and robots.txt lives on the url's actual port
        parts = urlsplit(url)
        origin = f"{parts.scheme or 'https'}://{parts.netloc or host}"
        while True:
            with self._robots_lock:
                if origin in self._robots:
                    rp = self._robots[origin]
                    break
                ev = self._robots_inflight.get(origin)
                if ev is None:
                    self._robots_inflight[origin] = threading.Event()
                    ev = None   # this thread owns the fetch
            if ev is not None:
                ev.wait(self.timeout)   # a peer is fetching; wait and re-check
                continue
            import urllib.error
            import urllib.request
            import urllib.robotparser

            try:
                # fetch robots.txt OURSELVES with the fetch timeout:
                # RobotFileParser.read() calls urlopen with NO timeout, so
                # one blackholed host would hang the owning thread forever
                # while its peers spin on the in-flight event
                req = urllib.request.Request(
                    f"{origin}/robots.txt",
                    headers={"User-Agent": self.user_agent},
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    body = resp.read().decode("utf-8", errors="replace")
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(body.splitlines())
            except urllib.error.HTTPError as e:
                # mirror RobotFileParser.read(): 4xx -> allow all,
                # 5xx -> disallow all (parse of empty = allow; disallow_all
                # for server errors matches stdlib behavior)
                rp = urllib.robotparser.RobotFileParser()
                if e.code >= 500:
                    rp.disallow_all = True
                else:
                    rp.allow_all = True
            except Exception:
                rp = None                      # unreachable robots -> allow
            with self._robots_lock:
                self._robots[origin] = rp
                self._robots_inflight.pop(origin).set()
            break
        return True if rp is None else rp.can_fetch(self.user_agent, url)

    def _fetch_one(self, url: str, cookies: dict, headers: dict,
                   basic: tuple | None):
        """One URL with the reference's retry loop; returns the 7 contract
        values (status, code, error_type, error_code, retry, attempts,
        payload)."""
        import socket
        import urllib.error
        import urllib.request

        from ..errors import classify

        hdrs = {"User-Agent": self.user_agent, **(headers or {})}
        if cookies:
            hdrs["Cookie"] = "; ".join(f"{k}={v}" for k, v in cookies.items())
        if basic:
            import base64

            tok = base64.b64encode(f"{basic[0]}:{basic[1]}".encode()).decode()
            hdrs["Authorization"] = f"Basic {tok}"
        last = None
        for attempt in range(1, MAX_ATTEMPTS + 1):
            try:
                req = urllib.request.Request(url, headers=hdrs)
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return ("ok", int(resp.status), "", "", False, attempt,
                            resp.read())
            except urllib.error.HTTPError as e:
                rec = classify("http", e.code)
                last = (f"http_{e.code}", int(e.code), rec.error_type,
                        rec.error_code, rec.retry_possible, attempt, None)
                if not rec.retry_possible:
                    return last                # 4xx: no retry (fetcher.py)
            except (TimeoutError, socket.timeout):
                rec = classify("timeout")
                last = ("timeout", 0, rec.error_type, rec.error_code,
                        rec.retry_possible, attempt, None)
            except urllib.error.URLError as e:
                kind = ("timeout" if isinstance(
                    getattr(e, "reason", None), (TimeoutError, socket.timeout))
                    else "connection")
                rec = classify(kind)
                last = (kind if kind == "timeout" else "connection_error", 0,
                        rec.error_type, rec.error_code, rec.retry_possible,
                        attempt, None)
            except (ConnectionError, OSError):
                rec = classify("connection")
                last = ("connection_error", 0, rec.error_type, rec.error_code,
                        rec.retry_possible, attempt, None)
        return last

    def _fetch_row(self, url: str, host: str, auth) -> tuple:
        """Robots gate + politeness + fetch for one row — the unit the
        worker threads run. Returns the 7 contract values."""
        from ..errors import classify

        cookies, headers, basic = auth
        if not self._robots_allowed(url, host):
            rec = classify("robots")
            return ("robots_denied", 0, rec.error_type, rec.error_code,
                    False, 0, None)
        self.politeness.acquire(host)
        return self._fetch_one(url, cookies, headers, basic)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        auths = resolve_batch_auth(batch, self.global_auth)
        pool = self._ensure_pool()
        if pool is None:
            rows = [self._fetch_row(u, h, a)
                    for u, h, a in zip(urls, hosts, auths)]
        else:
            # executor.map preserves INPUT order over out-of-order completion
            rows = list(pool.map(self._fetch_row, urls, hosts, auths))
        cols = list(zip(*rows)) if rows else [[]] * 7
        out = batch
        for (name, typ), vals in zip(FETCH_OUTPUT_COLUMNS.items(), cols):
            out = out.append_column(name, pa.array(list(vals), typ))
        return out
