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
