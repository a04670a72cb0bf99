"""Deterministic synthetic web world.

The sandbox has no network, so the fetch stage is replaced by a seeded page
generator (SURVEY.md §2.1 S1): every page is a pure function of
``(world_config, url)``, making crawls exactly reproducible and giving the
fetch+parse stages genuinely CPU-proportional work for scaling runs
(SURVEY.md §4.3).

World shape (FIXTURES.md "Synthetic world parameters"):
- power-law host sizes with one deliberately hot host holding ``hot_share``
  (~30%) of all URLs — exercises frontier salting;
- outlink fanout U(fanout_min, fanout_max) with ~10% on-page duplicate links,
  ~5% junk hrefs (#/mailto:/tel:), ~20% same-host relative URLs and mixed-case
  absolute URLs with fragments — exercises dedup + canonicalization;
- deterministic fetch outcomes: ~2% permanent 404, ~1% HTTP 500 and ~0.5%
  timeouts that succeed on retry (mirroring the reference's <=3 in-session
  retries, ``backend/crawler/fetcher.py:73-95``);
- per-host robots rules: every 7th host disallows the ``/p/1`` path prefix.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from hashlib import blake2b

import numpy as np
import pyarrow as pa

_VOCAB = (
    "data query table scan join merge sort hash group filter row column key "
    "value batch stream window agg part order line item fast slow small large "
    "vector index shard spill cache block page crawl fetch parse link span"
).split()

_CLASSES = ("content", "main-body", "article", "sidebar", "footer-info")


def h64(*parts: object) -> int:
    """Stable 64-bit hash (process-independent, unlike builtin ``hash``)."""
    b = blake2b(digest_size=8)
    for p in parts:
        b.update(str(p).encode())
        b.update(b"\x1f")
    return int.from_bytes(b.digest(), "little")


@dataclass(frozen=True)
class WorldConfig:
    n_urls: int = 10_000          # approximate URL-universe size
    n_hosts: int = 50
    hot_share: float = 0.30       # fraction of the universe on the hot host
    seed: int = 42
    fanout_min: int = 5
    fanout_max: int = 30
    politeness_budget: int = 64   # max fetches per host per round
    page_scale: int = 1           # multiplies page body size (bench realism)
    auth_every: int = 0           # >0: host idx % auth_every == 1 needs auth


class World:
    """Deterministic URL universe + page generator + fetch simulator."""

    def __init__(self, cfg: WorldConfig):
        self.cfg = cfg
        n, h = cfg.n_urls, cfg.n_hosts
        hot_pages = max(1, int(n * cfg.hot_share))
        rest = n - hot_pages
        # zipf-ish weights for the non-hot hosts
        w = np.array([1.0 / (i + 1) for i in range(h - 1)])
        counts = np.maximum(1, (rest * w / w.sum()).astype(np.int64))
        self.pages = np.concatenate([[hot_pages], counts])      # pages per host
        self.hosts = ["hot.example.org"] + [
            f"h{i:03d}.example.org" for i in range(1, h)
        ]
        self.host_index = {name: i for i, name in enumerate(self.hosts)}
        # cumulative page-count weights for outlink target sampling
        self.cum = np.cumsum(self.pages / self.pages.sum())

    # -- universe --------------------------------------------------------
    def url(self, host_idx: int, page_idx: int) -> str:
        return f"https://{self.hosts[host_idx]}/p/{page_idx}"

    def robots_disallowed(self, host: str, path: str) -> bool:
        """Synthetic robots.txt: every 7th host (index % 7 == 3) disallows
        the '/p/1' path prefix (ST3 analog; the reference only lists robots
        as a requirement, docs/dev-spec.md:1708-1711)."""
        i = self.host_index.get(host)
        if i is None or i % 7 != 3:
            return False
        return path.startswith("/p/1")

    def priority(self, url: str) -> int:
        """Synthetic Mercator front-queue priority, 0 (high) .. 3 (low)."""
        return h64(self.cfg.seed, "prio", url) % 4

    # -- auth gating (M18 exercise; opt-in via cfg.auth_every) ------------
    def auth_token(self, host: str, kind: str) -> str:
        """Deterministic per-host credential of a given kind ('pw' for
        basic auth, 'stok' session cookie, 'htok' auth header)."""
        return f"{kind}{h64(self.cfg.seed, 'auth', kind, host) % (1 << 32)}"

    def auth_required(self, host: str) -> bool:
        i = self.host_index.get(host)
        return bool(self.cfg.auth_every) and i is not None \
            and i % self.cfg.auth_every == 1

    def auth_ok(self, host: str, basic: tuple | None, cookies: dict,
                headers: dict) -> bool:
        """True when the host is open, or any one of the three credential
        kinds matches (reference auth types: basic / cookies / headers,
        ``backend/api/tasks.py:506-547``)."""
        i = self.host_index.get(host)
        if not self.auth_required(host):
            return True
        if basic is not None and basic == (f"user{i}", self.auth_token(host, "pw")):
            return True
        if cookies.get("session") == self.auth_token(host, "stok"):
            return True
        if headers.get("X-Auth-Token") == self.auth_token(host, "htok"):
            return True
        return False

    # -- fetch simulation ------------------------------------------------
    def fetch_plan(self, url: str) -> tuple[int, int]:
        """(final_status, attempts_needed): deterministic outcome table.

        ~2%% hard 404; ~1%% 500-then-ok on attempt 2; ~0.5%% timeout-then-ok
        on attempt 3; else 200 first try. Mirrors the retry classification of
        ``backend/utils/error_handler.py:110-146`` (5xx/timeout retryable).
        """
        r = h64(self.cfg.seed, "fetch", url) % 1000
        if r < 20:
            return 404, 1
        if r < 30:
            return 500, 2     # 500 on attempt 1, 200 on attempt 2
        if r < 35:
            return -1, 3      # timeout sentinel on attempts 1-2, 200 on 3
        return 200, 1

    # -- page generation --------------------------------------------------
    def gen_page(self, url: str) -> str:
        """Deterministic HTML for ``url`` (pure function of config+url)."""
        cfg = self.cfg
        rng = random.Random(h64(cfg.seed, "page", url))
        scheme_host, _, path = url.partition("/p/")
        host = scheme_host[len("https://"):]
        words = lambda a, b: " ".join(rng.choices(_VOCAB, k=rng.randint(a, b)))
        out: list[str] = []
        title = words(2, 5).title()
        out.append(
            f"<html><head><title>{title}</title>"
            f'<meta name="description" content="{words(4, 8)}">'
            "</head><body>"
        )
        out.append(f"<h1>{words(2, 6)}</h1>")
        cls = _CLASSES[rng.randrange(len(_CLASSES))]
        out.append(f'<div class="{cls}" id="pg-{path}">')
        n_paras = rng.randint(3, 14) * cfg.page_scale
        for _ in range(n_paras):
            if rng.random() < 0.15:
                out.append(f"<span>{words(2, 6)}</span>")
            elif rng.random() < 0.1:
                out.append(f"<h2>{words(2, 4)}</h2>")
            else:
                out.append(f"<p>{words(6, 16)}</p>")
            if rng.random() < 0.12:
                if rng.random() < 0.2:
                    out.append(f'<img src="/img/{rng.randrange(1 << 20)}.jpg" alt="{words(1, 3)}">')
                else:
                    out.append(
                        f'<img src="https://cdn.example.org/i/{rng.randrange(1 << 20)}.png" '
                        f'alt="{words(1, 3)}">'
                    )
        # outlinks
        fanout = rng.randint(cfg.fanout_min, cfg.fanout_max)
        hrefs: list[str] = []
        for _ in range(fanout):
            roll = rng.random()
            if roll < 0.05:
                junk = rng.choice(("#frag", "mailto:a@example.org", "tel:+1555", "javascript:void(0)"))
                hrefs.append(junk)
                continue
            if roll < 0.15 and hrefs:
                hrefs.append(rng.choice(hrefs))      # on-page duplicate
                continue
            t_host = int(np.searchsorted(self.cum, rng.random(), side="right"))
            t_host = min(t_host, len(self.hosts) - 1)
            t_page = rng.randrange(int(self.pages[t_host]))
            if roll < 0.35 and t_host == self.host_index[host]:
                hrefs.append(f"/p/{t_page}")          # same-host relative
            elif roll < 0.45:
                # mixed case + fragment: canonicalization exercise
                hrefs.append(
                    f"HTTPS://{self.hosts[t_host].upper()}/p/{t_page}#sec{rng.randrange(9)}"
                )
            else:
                hrefs.append(self.url(t_host, t_page))
        for i, href in enumerate(hrefs):
            out.append(f'<a href="{href}">{words(1, 3)}</a>')
            if i % 5 == 4:
                out.append(f"<p>{words(4, 10)}</p>")
        out.append("</div>")
        out.append(f"<footer><p>{words(3, 8)}</p></footer>")
        out.append("</body></html>")
        return "\n".join(out)

    # -- seeds ------------------------------------------------------------
    def seed_urls(self, n_seeds: int) -> list[str]:
        """Deterministic seed list: page 0 of each host round-robin, then
        further pages of the hot host."""
        seeds: list[str] = []
        for i in range(min(n_seeds, len(self.hosts))):
            seeds.append(self.url(i, 0))
        j = 1
        while len(seeds) < n_seeds and j < int(self.pages[0]):
            seeds.append(self.url(0, j))
            j += 1
        return seeds[:n_seeds]

    def seed_table(self, n_seeds: int) -> pa.Table:
        """Round-0 frontier (FIXTURES.md §2 shape, engine columns).
        ``url_hash`` rides the frontier from birth: it is a pure function
        of the canonical URL, computed once here / in the extract workers
        and reused by every membership, partitioning and dedup step."""
        from .canon import canonicalize, host_of
        from .util import hash64

        urls = [canonicalize(u) for u in self.seed_urls(n_seeds)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array([host_of(u) for u in urls], pa.string()),
                "priority": pa.array([self.priority(u) for u in urls], pa.int32()),
                "depth": pa.array([0] * len(urls), pa.int32()),
                "seq": pa.array(list(range(len(urls))), pa.int64()),
                "url_hash": pa.array(
                    hash64(urls).view(np.int64) if urls else np.array([], np.int64)
                ),
            }
        )
