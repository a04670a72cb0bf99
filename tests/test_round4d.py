"""Round-4d units: longest-prefix-match classification join.

The robots_lpm query is covered by the parameterized oracle gate in
test_queries.py; this file pins the operator-level contract.
"""

import pyarrow as pa
import ray.data as rd

from crawlray.pipelines.relational import longest_prefix_match


def _run(rows, rules):
    ds = rd.from_arrow(pa.table({"url": pa.array(rows, pa.string())}))
    df = longest_prefix_match(ds, "url", rules).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


class TestLongestPrefixMatch:
    def test_longest_wins(self, ray_session):
        rules = {
            "https://": "allow",
            "https://a.com/": "host",
            "https://a.com/private": "deny",
        }
        df = _run(
            ["https://a.com/x", "https://a.com/private/1", "https://b.com/"],
            rules,
        )
        got = dict(zip(df["url"], df["action"]))
        assert got == {
            "https://a.com/x": "host",
            "https://a.com/private/1": "deny",
            "https://b.com/": "allow",
        }
        # the winning rule itself is reported
        assert dict(zip(df["url"], df["rule"]))["https://a.com/private/1"] \
            == "https://a.com/private"

    def test_unmatched_rows_dropped_and_exact_match(self, ray_session):
        rules = {"ab": "x", "abcd": "y"}
        df = _run(["abcd", "abc", "zz"], rules)
        # "zz" matches nothing -> dropped; "abcd" takes the length-4 rule
        assert list(df["url"]) == ["abc", "abcd"]
        assert list(df["action"]) == ["x", "y"]

    def test_null_and_empty_keys(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"url": pa.array(["a1", None, ""], pa.string())}))
        df = longest_prefix_match(ds, "url", {"a": "hit"}).to_pandas()
        # null / empty never match a non-empty rule
        assert list(df["url"]) == ["a1"]

    def test_many_blocks_parity(self, ray_session):
        rules = {f"p{i}/": f"r{i}" for i in range(20)}
        rules["p"] = "fallback"
        rows = [f"p{i % 25}/doc" for i in range(500)]
        ds = rd.from_arrow(
            pa.table({"url": pa.array(rows, pa.string())})).repartition(7)
        df = longest_prefix_match(ds, "url", rules).to_pandas()
        assert len(df) == 500
        for u, a in zip(df["url"], df["action"]):
            i = u[1:].split("/")[0]
            assert a == (f"r{i}" if int(i) < 20 else "fallback")
