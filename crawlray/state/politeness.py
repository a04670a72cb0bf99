"""Per-host politeness + robots gating (ST3 in SURVEY.md §2.3).

Two cooperating mechanisms, both keyed by host:

- **Round budget** (the logical contract the oracle shares): at most
  ``budget`` URLs per host are *selected* from each round's frontier, in
  ``(priority, seq)`` order; the overflow defers to the next round. That
  selection lives in the engine (two-phase per-host top-k,
  ``crawlray.stages.frontier``), not here.
- **Token bucket** (wall-clock rate limiting inside fetcher actors): a
  classic refill bucket per host for *real-time* deployments. In sandbox
  benches ``rate=None`` disables sleeping so throughput measures compute,
  but the accounting still runs (tokens consumed/refilled) so the code
  path is exercised.

The reference lists rate limiting/robots only as requirements
(docs/dev-spec.md:1708-1711); Mercator-style back-queue-per-host semantics
come from the north rule.
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Thread-safe refill bucket. The pooled fetcher's worker threads
    share one bucket per host; sleeping INSIDE the lock is deliberate —
    it serializes same-host requests (the politeness contract) while
    threads on other hosts proceed on their own buckets."""

    __slots__ = ("rate", "burst", "tokens", "last", "_lock")

    def __init__(self, rate: float | None, burst: float = 8.0):
        self.rate = rate          # tokens/sec; None = unlimited (no sleeping)
        self.burst = burst
        self.tokens = burst
        self.last = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self) -> float:
        """Take one token; returns seconds slept (0 when rate is None)."""
        if self.rate is None:
            return 0.0
        with self._lock:
            now = time.monotonic()
            self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return 0.0
            wait = (1.0 - self.tokens) / self.rate
            time.sleep(wait)
            self.tokens = 0.0
            self.last = time.monotonic()
            return wait


class HostPoliteness:
    """Host -> token bucket map with a robots-rules cache, held once per
    fetcher actor (state in ``__init__``, SURVEY.md §2.3 ST1/ST3)."""

    def __init__(self, rate_per_host: float | None = None, burst: float = 8.0):
        self.rate = rate_per_host
        self.burst = burst
        self.buckets: dict[str, TokenBucket] = {}
        self.robots_cache: dict[str, bool] = {}   # host -> has rules (synthetic)
        self._lock = threading.Lock()              # bucket-map creation only

    def acquire(self, host: str) -> float:
        b = self.buckets.get(host)
        if b is None:
            with self._lock:
                b = self.buckets.setdefault(host, TokenBucket(self.rate, self.burst))
        return b.acquire()
