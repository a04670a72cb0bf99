"""The typed fetcher seam: Fetcher protocol conformance for both the
sandbox SynthFetcher and the real-network HttpFetcher skeleton; the
HttpFetcher error path is driven for real (connection refused needs no
network); the live-network drive skips unless the net is reachable."""

import pyarrow as pa
import pytest

from crawlray.canon import host_of
from crawlray.stages.fetch import (
    FETCH_OUTPUT_COLUMNS,
    Fetcher,
    HttpFetcher,
    SynthFetcher,
    validate_fetch_output,
)
from crawlray.synth import World, WorldConfig


def _batch(urls):
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array([host_of(u) for u in urls], pa.string()),
    })


def test_both_fetchers_satisfy_protocol():
    wcfg = WorldConfig(n_urls=50, n_hosts=5)
    assert isinstance(SynthFetcher(wcfg), Fetcher)
    assert isinstance(HttpFetcher(), Fetcher)


def test_synth_fetcher_honors_column_contract():
    wcfg = WorldConfig(n_urls=50, n_hosts=5)
    world = World(wcfg)
    inp = _batch([world.url(0, 0), world.url(1, 0)])
    out = SynthFetcher(wcfg)(inp)
    validate_fetch_output(inp, out)
    assert out["status"][0].as_py() in ("ok", "http_404", "robots_denied")


def test_http_fetcher_errors_as_data_offline():
    # 127.0.0.1:9 refuses instantly: the REAL retry loop + taxonomy runs
    # without a network — errors land as data rows, never exceptions
    inp = _batch(["http://127.0.0.1:9/page"])
    out = HttpFetcher(timeout=2.0, respect_robots=False)(inp)
    validate_fetch_output(inp, out)
    assert out["status"][0].as_py() in ("connection_error", "timeout")
    assert out["error_type"][0].as_py() == "network_error"
    assert out["retry_possible"][0].as_py() is True   # re-enqueueable
    assert out["attempts"][0].as_py() == 3            # full retry loop ran
    assert out["payload"][0].as_py() is None


def test_http_fetcher_pooled_preserves_order_and_contract():
    # 16 rows through an 8-thread pool, every one connection-refused: the
    # REAL concurrent path runs offline; output rows keep INPUT order
    urls = [f"http://127.0.0.1:9/p{i}" for i in range(16)]
    inp = _batch(urls)
    f = HttpFetcher(timeout=1.0, respect_robots=False, max_concurrency=8)
    out = f(inp)
    validate_fetch_output(inp, out)
    assert out["url"].to_pylist() == urls            # input order preserved
    assert set(out["status"].to_pylist()) <= {"connection_error", "timeout"}
    assert out["attempts"].to_pylist() == [3] * 16   # full retry loop per row
    assert f._pool is not None                       # pool actually built


def test_http_fetcher_pooled_is_concurrent():
    # a stub _fetch_one with a REAL 0.15s sleep per row: 8 rows through
    # an 8-thread pool must overlap (sequential would be ~1.2s). Local
    # connection-refused is instantaneous, so without the injected sleep
    # this assertion could never fail — the stub makes it a true
    # concurrency check rather than a hang detector.
    import time

    class SleepyFetcher(HttpFetcher):
        def _fetch_one(self, url, cookies, headers, basic):
            time.sleep(0.15)
            return ("ok", 200, "", "", False, 1, b"x")

    urls = [f"http://127.0.0.1:9/q{i}" for i in range(8)]
    pool = SleepyFetcher(timeout=1.0, respect_robots=False, max_concurrency=8)
    t0 = time.monotonic()
    out = pool(_batch(urls))
    t_all = time.monotonic() - t0
    assert out["status"].to_pylist() == ["ok"] * 8
    assert t_all < 0.7                 # 8 x 0.15s serialized would be 1.2s
    seq = SleepyFetcher(timeout=1.0, respect_robots=False, max_concurrency=1)
    t0 = time.monotonic()
    seq(_batch(urls))
    assert time.monotonic() - t0 >= 1.1   # and the sequential path is real


def test_token_bucket_thread_safe_under_pool():
    # N threads hammering one host's bucket: total tokens granted must
    # respect the refill arithmetic (no lost updates). rate high enough
    # that the test is fast, burst=1 so every grant hits the hot path.
    import threading

    from crawlray.state.politeness import HostPoliteness

    pol = HostPoliteness(rate_per_host=200.0, burst=1.0)
    start = __import__("time").monotonic()
    n_threads, per_thread = 8, 5
    errs = []

    def worker():
        try:
            for _ in range(per_thread):
                pol.acquire("h")
        except Exception as e:   # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(n_threads)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    elapsed = __import__("time").monotonic() - start
    assert not errs
    # 40 acquisitions at 200/s with burst 1: lower bound ~ (40-1)/200
    assert elapsed >= (n_threads * per_thread - 1) / 200.0 - 0.02
    assert len(pol.buckets) == 1                     # no duplicate buckets


class _LocalSite:
    """Tiny localhost HTTP server: a REAL end-to-end HTTP drive with no
    external network. /robots.txt behavior is configurable per test."""

    def __init__(self, robots: str):
        import http.server
        import threading

        mode = robots

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/robots.txt":
                    if mode == "500":
                        self.send_error(500)
                    elif mode == "404":
                        self.send_error(404)
                    else:
                        body = mode.encode()
                        self.send_response(200)
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                    return
                body = f"<html><body>page {self.path}</body></html>".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.srv.server_address[1]
        self.thread = threading.Thread(target=self.srv.serve_forever, daemon=True)
        self.thread.start()

    def url(self, path: str) -> str:
        return f"http://127.0.0.1:{self.port}{path}"

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_http_fetcher_real_localhost_e2e():
    # genuine HTTP through the pooled path: robots allows, pages fetch ok
    site = _LocalSite(robots="User-agent: *\nDisallow: /private/\n")
    try:
        urls = [site.url(f"/p{i}") for i in range(4)] + [site.url("/private/x")]
        out = HttpFetcher(timeout=5.0, max_concurrency=4)(_batch(urls))
        validate_fetch_output(_batch(urls), out)
        assert out["status"].to_pylist()[:4] == ["ok"] * 4
        assert b"page /p0" in out["payload"][0].as_py()
        # the Disallow rule is honored via the REAL robots.txt fetch
        assert out["status"].to_pylist()[4] == "robots_denied"
    finally:
        site.close()


def test_http_fetcher_robots_5xx_disallows_4xx_allows():
    # stdlib RobotFileParser.read() semantics, preserved by the
    # timeout-bounded robots fetch: 5xx -> disallow all, 4xx -> allow all
    site = _LocalSite(robots="500")
    try:
        out = HttpFetcher(timeout=5.0, max_concurrency=2)(_batch([site.url("/a")]))
        assert out["status"][0].as_py() == "robots_denied"
    finally:
        site.close()
    site = _LocalSite(robots="404")
    try:
        out = HttpFetcher(timeout=5.0, max_concurrency=2)(_batch([site.url("/a")]))
        assert out["status"][0].as_py() == "ok"
    finally:
        site.close()


def _net_reachable() -> bool:
    import socket

    try:
        socket.create_connection(("example.com", 80), timeout=1).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _net_reachable(), reason="no network in sandbox")
def test_http_fetcher_live():
    inp = _batch(["https://example.com/"])
    out = HttpFetcher(timeout=10.0)(inp)
    validate_fetch_output(inp, out)
    assert out["status"][0].as_py() == "ok"
    assert b"Example" in out["payload"][0].as_py()
