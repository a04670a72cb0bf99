"""Round-4e units: HITS hub/authority scores.

The hits query is covered by the parameterized oracle gate in
test_queries.py; this file pins the operator-level contract against a
dense numpy reference and the shard-count invariance.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _dense_hits(edges: pd.DataFrame, iters: int):
    """Sequential reference: L1-normalized HITS, same op order."""
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    si = np.array([idx[s] for s in edges["src"]])
    di = np.array([idx[d] for d in edges["dst"]])
    for _ in range(iters):
        raw = np.zeros(n)
        np.add.at(raw, di, h[si])
        a = raw / raw.sum()
        raw = np.zeros(n)
        np.add.at(raw, si, a[di])
        h = raw / raw.sum()
    return nodes, h, a


def _rand_edges(seed: int, n: int, m: int) -> pd.DataFrame:
    rs = np.random.RandomState(seed)
    return pd.DataFrame({"src": [f"u{s}" for s in rs.randint(0, n, m)],
                         "dst": [f"u{d}" for d in rs.randint(0, n, m)]})


class TestHits:
    def test_matches_dense_reference(self, ray_session):
        from crawlray.pipelines.graph import hits

        edges = _rand_edges(7, 60, 300)
        got = (hits(rd.from_pandas(edges, override_num_blocks=3),
                    n_shards=4, iters=5)
               .to_pandas().set_index("url"))
        nodes, h, a = _dense_hits(edges, 5)
        assert len(got) == len(nodes)
        for u, hv, av in zip(nodes, h, a):
            assert abs(got.loc[u, "hub"] - hv) < 1e-9, u
            assert abs(got.loc[u, "authority"] - av) < 1e-9, u
        # L1 normalization: both score vectors sum to 1
        assert abs(got["hub"].sum() - 1.0) < 1e-9
        assert abs(got["authority"].sum() - 1.0) < 1e-9

    def test_shard_count_invariance(self, ray_session):
        from crawlray.pipelines.graph import hits

        edges = _rand_edges(11, 40, 200)
        one = (hits(rd.from_pandas(edges, override_num_blocks=2),
                    n_shards=1, iters=4)
               .to_pandas().sort_values("url").reset_index(drop=True))
        many = (hits(rd.from_pandas(edges, override_num_blocks=5),
                     n_shards=6, iters=4)
                .to_pandas().sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            one, many, check_exact=False, atol=1e-12)

    def test_empty_edges(self, ray_session):
        import ray

        from crawlray.pipelines.graph import hits

        empty = pd.DataFrame({"src": pd.array([], dtype="string"),
                              "dst": pd.array([], dtype="string")})
        ds = hits(rd.from_pandas(empty), n_shards=2, iters=2)
        t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
        assert t.num_rows == 0
        assert t.column_names == ["url", "hub", "authority"]
