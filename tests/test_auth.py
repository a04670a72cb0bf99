"""M18 per-row auth: cookie-string parsing, row-over-global precedence,
and credential-gated fetch (errors-as-data 401s, consistent across the
actor path, the fused path and the sequential oracle)."""

import pyarrow as pa

from crawlray.stages.sources import parse_auth_headers, parse_cookie_string, resolve_auth
from crawlray.stages.fetch import SynthFetcher
from crawlray.synth import World, WorldConfig


def test_parse_cookie_string_forms():
    assert parse_cookie_string("a=1; b=two ; c = 3") == {"a": "1", "b": "two", "c": "3"}
    assert parse_cookie_string('{"session": "x", "t": "y"}') == {"session": "x", "t": "y"}
    # malformed JSON falls through to k=v parsing (reference semantics)
    assert parse_cookie_string('{bad json, session=tok}') == {"{bad json, session": "tok}"}
    assert parse_cookie_string("") == {}
    assert parse_cookie_string(None) == {}
    assert parse_cookie_string("no-equals-here") == {}


def test_parse_auth_headers():
    assert parse_auth_headers('{"X-Auth-Token": "t"}') == {"X-Auth-Token": "t"}
    assert parse_auth_headers("not json") == {}
    assert parse_auth_headers('["not", "a", "dict"]') == {}
    assert parse_auth_headers(None) == {}


def test_resolve_auth_precedence():
    glob = {"auth_method": "basic", "basic_auth_username": "gu",
            "basic_auth_password": "gp"}
    # row auth wins when enabled
    row = {"auth_enabled": True, "auth_type": "cookies", "cookies": "s=1"}
    assert resolve_auth(row, glob) == ({"s": "1"}, {}, None)
    # disabled row falls back to global
    assert resolve_auth({"auth_enabled": False}, glob) == ({}, {}, ("gu", "gp"))
    # basic with missing password -> no credentials
    row = {"auth_enabled": True, "auth_type": "basic", "basic_auth_username": "u"}
    assert resolve_auth(row, None) == ({}, {}, None)
    # headers type
    row = {"auth_enabled": True, "auth_type": "headers",
           "auth_headers": '{"X-Auth-Token": "h"}'}
    assert resolve_auth(row, None) == ({}, {"X-Auth-Token": "h"}, None)


CFG = WorldConfig(n_urls=300, n_hosts=9, auth_every=3)  # hosts 1,4,7 gated


def _batch(world, rows):
    n = len(rows)
    cols = {
        "url": [r["url"] for r in rows],
        "host": [r["host"] for r in rows],
    }
    for c in ("auth_enabled", "auth_type", "cookies", "auth_headers",
              "basic_auth_username", "basic_auth_password"):
        if any(c in r for r in rows):
            cols[c] = [r.get(c) for r in rows]
    return pa.table(cols)


def test_fetch_auth_gate():
    world = World(CFG)
    gated = world.hosts[4]
    open_host = world.hosts[2]
    assert world.auth_required(gated) and not world.auth_required(open_host)
    f = SynthFetcher(CFG)
    rows = [
        # no credentials on a gated host -> 401 as data
        {"url": f"https://{gated}/p/0", "host": gated},
        # open host unaffected
        {"url": f"https://{open_host}/p/0", "host": open_host},
        # correct basic auth
        {"url": f"https://{gated}/p/2", "host": gated, "auth_enabled": True,
         "auth_type": "basic", "basic_auth_username": "user4",
         "basic_auth_password": world.auth_token(gated, "pw")},
        # wrong basic auth
        {"url": f"https://{gated}/p/3", "host": gated, "auth_enabled": True,
         "auth_type": "basic", "basic_auth_username": "user4",
         "basic_auth_password": "nope"},
        # session cookie (devtools string form)
        {"url": f"https://{gated}/p/4", "host": gated, "auth_enabled": True,
         "auth_type": "cookies",
         "cookies": f"other=x; session={world.auth_token(gated, 'stok')}"},
        # auth header (JSON form)
        {"url": f"https://{gated}/p/5", "host": gated, "auth_enabled": True,
         "auth_type": "headers",
         "auth_headers": '{"X-Auth-Token": "%s"}' % world.auth_token(gated, "htok")},
    ]
    out = f(_batch(world, rows))
    status = out["status"].to_pylist()
    codes = out["status_code"].to_pylist()
    assert status == ["http_401", "ok", "ok", "http_401", "ok", "ok"]
    assert codes == [401, 200, 200, 401, 200, 200]
    assert out["error_code"].to_pylist()[0] == "401"
    assert out["retry_possible"].to_pylist()[0] is False


def test_fetch_global_auth_fallback():
    world = World(CFG)
    gated = world.hosts[1]
    f = SynthFetcher(CFG, global_auth={
        "auth_method": "cookies",
        "cookies": f"session={world.auth_token(gated, 'stok')}",
    })
    out = f(pa.table({"url": [f"https://{gated}/p/0"], "host": [gated]}))
    assert out["status"].to_pylist() == ["ok"]


def test_engine_oracle_agree_with_auth_gating(tmp_path):
    """Auth-gated hosts 401 identically in the engine and the sequential
    oracle (no credentials in an engine crawl)."""
    import glob

    import pyarrow.parquet as pq

    from crawlray.engine import CrawlEngine, EngineConfig
    from crawlray.oracle import simulate_crawl

    cfg = EngineConfig(
        world=WorldConfig(n_urls=600, n_hosts=12, auth_every=3),
        n_seeds=12, max_rounds=2,
    )
    out = str(tmp_path / "authcrawl")
    eng = CrawlEngine(cfg, out)
    eng.run()
    orc = simulate_crawl(World(cfg.world), 12, max_rounds=2)
    docs = pq.read_table(sorted(glob.glob(f"{out}/corpus/round-*/*.parquet")))
    df = docs.to_pandas().sort_values(["round", "priority", "seq"])
    got = [(r, p, s, u, "ok" if st == "ok" else st) for r, p, s, u, st in
           zip(df["round"], df["priority"], df["seq"], df["url"], df["status"])]
    assert got == orc.fetch_log
    assert (df["status"] == "http_401").sum() > 0  # the gate actually fired
    eng.shutdown()
