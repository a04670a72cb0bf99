"""Round-4k units: adversarial edges for the session-10 kernels.

The queries are covered by the parameterized oracle gate at sf0.01; this
file pins the edges the corpus may not exercise — the Allen classifier's
exhaustive 13-way partition (one crafted pair per relation, plus the
improper-interval guard), the isotonic minimax closed form against the
literal pool-adjacent-violators recursion, and the rendezvous-hashing
monotonicity contract (removing a node relocates ONLY that node's keys).
"""

import hashlib

import numpy as np
import pytest

from crawlray.queries import _ALLEN_RELATIONS, _allen_classify, _RDV_NODES


class TestAllenClassifier:
    # one (s1, e1, s2, e2) witness per relation, in _ALLEN_RELATIONS order
    WITNESSES = [
        (0, 2, 5, 8),    # before: e1 < s2
        (0, 5, 5, 8),    # meets: e1 == s2
        (0, 6, 5, 8),    # overlaps
        (0, 8, 5, 8),    # finished_by
        (0, 9, 5, 8),    # contains
        (5, 6, 5, 8),    # starts
        (5, 8, 5, 8),    # equals
        (5, 9, 5, 8),    # started_by
        (6, 7, 5, 8),    # during
        (6, 8, 5, 8),    # finishes
        (6, 9, 5, 8),    # overlapped_by
        (8, 9, 5, 8),    # met_by
        (9, 11, 5, 8),   # after
    ]

    def test_each_relation_hit_exactly(self):
        a = np.array(self.WITNESSES, dtype=np.int64)
        code = _allen_classify(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
        assert code.tolist() == list(range(13))

    def test_inverse_symmetry(self):
        """Swapping the operands of relation r yields its inverse."""
        inverse = {
            "before": "after", "meets": "met_by", "overlaps": "overlapped_by",
            "finished_by": "finishes", "contains": "during",
            "starts": "started_by", "equals": "equals",
        }
        inverse.update({v: k for k, v in inverse.items()})
        a = np.array(self.WITNESSES, dtype=np.int64)
        fwd = _allen_classify(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
        rev = _allen_classify(a[:, 2], a[:, 3], a[:, 0], a[:, 1])
        for f, r in zip(fwd, rev):
            assert inverse[_ALLEN_RELATIONS[f]] == _ALLEN_RELATIONS[r]

    def test_exhaustive_over_small_grid(self):
        """Every proper-interval pair on a 6-point grid classifies;
        each lands in exactly one relation (np.select found a branch)."""
        pairs = [(s1, e1, s2, e2)
                 for s1 in range(6) for e1 in range(s1 + 1, 6)
                 for s2 in range(6) for e2 in range(s2 + 1, 6)]
        a = np.array(pairs, dtype=np.int64)
        code = _allen_classify(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
        assert (code >= 0).all()
        # all 13 relations occur somewhere on the grid
        assert sorted(set(code.tolist())) == list(range(13))

    def test_total_over_all_quadruples(self):
        """First-match ordering makes the classifier TOTAL even over
        improper endpoint quadruples (the same ordering the SQL CASE
        evaluates) — brute force over a 5-point grid, no escapes."""
        import itertools
        a = np.array(list(itertools.product(range(5), repeat=4)),
                     dtype=np.int64)
        code = _allen_classify(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
        assert (code >= 0).all()


def _pava(y):
    """Literal pool-adjacent-violators (non-decreasing), exact rationals:
    blocks of (sum, count), merge while the last mean < previous mean."""
    from fractions import Fraction
    blocks = []  # (sum, count)
    for v in y:
        blocks.append((int(v), 1))
        while len(blocks) > 1 and (
                Fraction(*blocks[-1]) < Fraction(*blocks[-2])):
            s2, c2 = blocks.pop()
            s1, c1 = blocks.pop()
            blocks.append((s1 + s2, c1 + c2))
        # note Fraction(s, c) here is mean*... Fraction(sum, count) IS the mean
    out = []
    for s, c in blocks:
        out.extend([Fraction(s, c)] * c)
    return out


def _minimax(y):
    """The closed form the query uses: g(i) = max_{j<=i} min_{k>=i} mean."""
    from fractions import Fraction
    n = len(y)
    pre = [0]
    for v in y:
        pre.append(pre[-1] + int(v))
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            inner = min(Fraction(pre[k + 1] - pre[j], k - j + 1)
                        for k in range(i, n))
            if best is None or inner > best:
                best = inner
        out.append(best)
    return out


class TestIsotonicClosedForm:
    CASES = [
        [5, 3, 8, 2, 9, 1],          # interleaved violators
        [9, 7, 5, 3, 1],             # strictly decreasing -> one pooled mean
        [1, 2, 3, 4],                # already isotonic -> identity
        [4, 4, 4],                   # constant
        [2, 1, 1, 2, 1, 3, 0, 4],    # repeated merges across old blocks
        [7],                         # singleton
    ]

    @pytest.mark.parametrize("y", CASES)
    def test_minimax_equals_pava(self, y):
        assert _minimax(y) == _pava(y)

    @pytest.mark.parametrize("y", CASES)
    def test_fit_is_isotonic_and_mean_preserving(self, y):
        g = _minimax(y)
        assert all(a <= b for a, b in zip(g, g[1:]))
        assert sum(g) == sum(y)


class TestRendezvousMonotonicity:
    @staticmethod
    def _assign(keys, nodes):
        return {
            k: max(nodes,
                   key=lambda nd: hashlib.md5(
                       f"{k}:{nd}".encode()).hexdigest())
            for k in keys
        }

    def test_removing_a_node_relocates_only_its_keys(self):
        keys = list(range(500))
        full = self._assign(keys, list(_RDV_NODES))
        victim = "node07"
        reduced = self._assign(keys, [n for n in _RDV_NODES if n != victim])
        for k in keys:
            if full[k] != victim:
                assert reduced[k] == full[k]
            else:
                assert reduced[k] != victim

    def test_spread_is_reasonable(self):
        """No node is empty and no node takes more than 4x the fair share
        on 500 keys — the balance property that makes HRW a layout."""
        counts = {}
        for nd in self._assign(range(500), list(_RDV_NODES)).values():
            counts[nd] = counts.get(nd, 0) + 1
        assert len(counts) == 16
        assert max(counts.values()) <= 4 * (500 // 16)


class TestHilbertCurve:
    def test_bijection_on_small_grid(self):
        from crawlray.queries import _hilbert_d
        n = 32  # order 5
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = _hilbert_d(xs.ravel(), ys.ravel(), order=5)
        assert sorted(d.tolist()) == list(range(n * n))

    def test_consecutive_d_are_grid_neighbors(self):
        """The defining Hilbert property (and what Morton lacks): walking
        d = 0..n^2-1 moves exactly one grid step each time."""
        from crawlray.queries import _hilbert_d
        n = 32
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        xs, ys = xs.ravel(), ys.ravel()
        d = _hilbert_d(xs, ys, order=5)
        order = np.argsort(d)
        step = (np.abs(np.diff(xs[order].astype(int)))
                + np.abs(np.diff(ys[order].astype(int))))
        assert (step == 1).all()

    def test_known_first_quadrant_values(self):
        """Hand-checked d for the order-1 (2x2) curve embedded at
        order=1: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3."""
        from crawlray.queries import _hilbert_d
        x = np.array([0, 0, 1, 1])
        y = np.array([0, 1, 1, 0])
        assert _hilbert_d(x, y, order=1).tolist() == [0, 1, 2, 3]


class TestPrefixFilterPairs:
    """prefix_filter_pairs (AllPairs/PPJoin) parity vs literal brute
    force on a crafted corpus: exact dups, a pair just over tau, a pair
    just under, shingle-less short docs, and a hot shared token."""

    @staticmethod
    def _corpus():
        base = "the quick brown fox jumps over the lazy dog tonight"
        rows = [
            (0, base),                                  # exact dup of 1
            (1, base),
            (2, base + " again and again and again"),   # near-dup of 0/1
            (3, "completely different words entirely here now"),
            (4, "quick brown fox"),                     # one shingle only
            (5, "two words"),                           # shingle-less
            (6, "also short"),                          # shingle-less
            (7, "the quick brown cat naps under the lazy dog tonight"),
        ]
        return rows

    @staticmethod
    def _brute(rows, tau):
        from crawlray.pipelines.dedup import word_shingles
        sets = {i: set(word_shingles(t, 3)) for i, t in rows}
        out = []
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                sa, sb = sets[a], sets[b]
                ni = len(sa & sb)
                un = len(sa | sb)
                if un == 0 or ni == 0:
                    continue          # shingle-less pairs: excluded contract
                j = ni / un
                if j >= tau:
                    out.append((a, b, j))
        return sorted(out)

    @pytest.mark.parametrize("tau", [0.5, 0.3, 0.9])
    def test_parity_with_brute_force(self, ray_session, tmp_path, tau):
        import pyarrow as pa
        import ray.data as rd
        from crawlray.pipelines.dedup import prefix_filter_pairs

        rows = self._corpus()
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }))
        got = prefix_filter_pairs(docs, jaccard_threshold=tau,
                                  n_buckets=4).to_pandas()
        got = sorted(zip(got["a"], got["b"], got["jaccard"]))
        assert [(a, b) for a, b, _ in got] == \
            [(a, b) for a, b, _ in self._brute(rows, tau)]
        for (_, _, jg), (_, _, je) in zip(got, self._brute(rows, tau)):
            assert jg == je    # IEEE-exact quotient

    def test_prefix_formula_keeps_singletons(self):
        """p = size - ceil(tau*size) + 1 >= 1 for every size >= 1 — a
        one-shingle doc always exposes its only token."""
        for tau_c in (30, 50, 90, 100):
            for size in range(1, 40):
                p = size - (tau_c * size + 99) // 100 + 1
                assert 1 <= p <= size


class TestGreedySchedulingOptimality:
    @staticmethod
    def _greedy(iv):
        cnt, last_e = 0, None
        for s, e in sorted(iv, key=lambda p: (p[1], p[0])):
            if last_e is None or s >= last_e:
                cnt += 1
                last_e = e
        return cnt

    @staticmethod
    def _brute_max(iv):
        """Exhaustive max non-overlapping subset (half-open compat)."""
        import itertools
        best = 0
        for r in range(len(iv), 0, -1):
            for sub in itertools.combinations(sorted(iv), r):
                ok = all(sub[i][1] <= sub[i + 1][0]
                         for i in range(len(sub) - 1))
                if ok:
                    return r
        return best

    def test_greedy_equals_brute_force(self):
        rng = np.random.default_rng(3)
        for _ in range(60):
            n = rng.integers(1, 8)
            iv = []
            for _ in range(n):
                s = int(rng.integers(0, 20))
                e = s + int(rng.integers(1, 6))
                iv.append((s, e))
            assert self._greedy(iv) == self._brute_max(iv)

    def test_touching_intervals_compatible(self):
        # half-open [s, e): e == next s is compatible
        assert self._greedy([(0, 3), (3, 5), (5, 9)]) == 3


class TestPatienceLis:
    @staticmethod
    def _patience(v):
        import bisect
        tails = []
        for x in v:
            p = bisect.bisect_left(tails, x)
            if p == len(tails):
                tails.append(x)
            else:
                tails[p] = x
        return len(tails)

    @staticmethod
    def _dp(v):
        n = len(v)
        dp = [1] * n
        for j in range(n):
            for i in range(j):
                if v[i] < v[j]:
                    dp[j] = max(dp[j], dp[i] + 1)
        return max(dp) if dp else 0

    def test_patience_equals_quadratic_dp(self):
        rng = np.random.default_rng(11)
        for _ in range(80):
            n = int(rng.integers(1, 25))
            # small value domain forces many DUPLICATES — the strictness
            # edge (bisect_left replaces on ties, never extends)
            v = rng.integers(0, 6, size=n).tolist()
            assert self._patience(v) == self._dp(v)

    def test_all_equal_is_length_one(self):
        assert self._patience([7, 7, 7, 7]) == 1

    def test_strictly_decreasing_is_length_one(self):
        assert self._patience([9, 5, 3, 1]) == 1


class TestWaveletClosedFormReconstruction:
    def test_full_coefficient_set_reconstructs_exactly(self):
        """The closed form the synopsis audit evaluates — slot x32 =
        approx + sum_l sign_l(i) * d_l[i >> l] * 2^(5-l) — must be the
        TRUE Haar inverse: with ALL coefficients kept the error is
        identically zero (parity with the oracle alone cannot prove
        this, since both sides share the formula)."""
        rng = np.random.default_rng(23)
        for _ in range(20):
            y = rng.integers(0, 500, size=32).astype(np.int64)
            details = {}
            cur = y.copy()
            for lvl in range(1, 6):
                details[lvl] = cur[0::2] - cur[1::2]
                cur = cur[0::2] + cur[1::2]
            approx = int(cur[0])
            idx = np.arange(32)
            rec32 = np.full(32, approx, np.int64)
            for lvl in range(1, 6):
                d = details[lvl][idx >> lvl]
                sign = 1 - 2 * ((idx >> (lvl - 1)) & 1)
                rec32 += sign * d * (1 << (5 - lvl))
            assert (rec32 == 32 * y).all()


class TestCachePolicies:
    """LRU and Belady capacity-2 automata against literal references,
    plus the optimality ordering Belady >= LRU on random streams."""

    @staticmethod
    def _lru(seq):
        cache, hits = [], 0          # cache[0] = MRU
        for x in seq:
            if x in cache:
                hits += 1
                cache.remove(x)
            cache.insert(0, x)
            del cache[2:]
        return hits

    @staticmethod
    def _belady(seq):
        n = len(seq)
        nxt = [10**9] * n
        last = {}
        for j in range(n - 1, -1, -1):
            if seq[j] in last:
                nxt[j] = last[seq[j]]
            last[seq[j]] = j
        # the query kernel's exact automaton
        a = b = None
        na = nb = 0
        hits = 0
        for j, x in enumerate(seq):
            nx = nxt[j]
            if x == a:
                hits += 1
                na = nx
            elif x == b:
                hits += 1
                a, b, na, nb = x, a, nx, na
            elif b is None:
                a, b, na, nb = x, a, nx, na
            elif na > nb:
                a, na = x, nx
            else:
                a, b, na, nb = x, a, nx, na
        return hits

    @staticmethod
    def _optimal_brute(seq):
        """True offline optimum by exhaustive eviction search."""
        from functools import lru_cache

        @lru_cache(maxsize=None)
        def go(i, cache):
            if i == len(seq):
                return 0
            x = seq[i]
            cs = set(cache)
            if x in cs:
                return 1 + go(i + 1, cache)
            if len(cs) < 2:
                return go(i + 1, tuple(sorted(cs | {x})))
            best = 0
            for evict in cs:
                nc = tuple(sorted((cs - {evict}) | {x}))
                best = max(best, go(i + 1, nc))
            return best
        return go(0, ())

    def test_belady_equals_true_optimum(self):
        rng = np.random.default_rng(5)
        for _ in range(40):
            seq = [chr(97 + c) for c in
                   rng.integers(0, 4, size=int(rng.integers(1, 14)))]
            assert self._belady(seq) == self._optimal_brute(tuple(seq))

    def test_belady_dominates_lru(self):
        rng = np.random.default_rng(9)
        for _ in range(60):
            seq = [chr(97 + c) for c in
                   rng.integers(0, 5, size=int(rng.integers(1, 40)))]
            assert self._belady(seq) >= self._lru(seq)

    def test_lru_classic_thrash(self):
        # the canonical LRU-pathological loop a,b,c,a,b,c,... cap 2
        assert self._lru(list("abcabcabc")) == 0
        assert self._belady(list("abcabcabc")) >= 3


class TestSkyline3d:
    def test_local_union_identity(self):
        """Global 3-D skyline == skyline of the union of block-local
        skylines, for random splits — the partitioning identity the
        query relies on."""
        rng = np.random.default_rng(13)

        def brute(rows):
            out = []
            for i, (c, s, l_) in enumerate(rows):
                dom = any((c2 <= c and s2 >= s and l2 >= l_)
                          and (c2 < c or s2 > s or l2 > l_)
                          for j, (c2, s2, l2) in enumerate(rows) if j != i)
                # a duplicate row never dominates its twin (no strict)
                if not dom:
                    out.append((c, s, l_))
            return sorted(out)

        for _ in range(20):
            n = int(rng.integers(4, 40))
            rows = [tuple(int(v) for v in rng.integers(0, 6, size=3))
                    for _ in range(n)]
            cut = n // 2
            local = brute(rows[:cut]) + brute(rows[cut:])
            assert brute(local) == brute(rows)


class TestEmd1d:
    """The |CDF diff| closed form the t-closeness audit uses IS the 1-D
    EMD: hand-checked mass moves on tiny histograms."""

    @staticmethod
    def _emd(cls, glob):
        from fractions import Fraction
        n_c, n_g = sum(cls), sum(glob)
        cc = gc = 0
        num = 0
        for c, g in zip(cls, glob):
            cc += c
            gc += g
            num += abs(cc * n_g - gc * n_c)
        return Fraction(num, n_c * n_g)

    def test_identical_distribution_is_zero(self):
        assert self._emd([3, 1, 4], [6, 2, 8]) == 0   # same shape, 2x mass

    def test_one_bracket_shift_costs_its_mass(self):
        # all mass one bracket apart: EMD = 1 bracket (normalized mass 1)
        assert self._emd([1, 0], [0, 1]) == 1

    def test_hand_example(self):
        # cls = [1,1]/2 vs glob = [3,1]/4: |1/2-3/4| + |1-1| = 1/4
        from fractions import Fraction
        assert self._emd([1, 1], [3, 1]) == Fraction(1, 4)


class TestCdcShiftInvariance:
    def test_insertion_preserves_later_chunks(self):
        """The property that justifies CDC over fixed-size blocks: an
        edit near the start shifts every fixed block, but all chunks
        after the first post-edit boundary are IDENTICAL strings."""
        from crawlray.queries import _cdc_cuts
        rng = np.random.default_rng(31)
        base = "".join(chr(97 + c) for c in rng.integers(0, 26, size=4000))
        edited = "XYZQW" + base

        def chunks(txt):
            cuts = _cdc_cuts(txt)
            prev, out = 0, []
            for c in cuts:
                out.append(txt[prev:c])
                prev = int(c)
            return out

        a, b = chunks(base), chunks(edited)
        # every chunk of the original except possibly the first few
        # reappears verbatim in the edited doc's chunk set
        shared = set(a) & set(b)
        assert len(shared) >= len(a) - 2
        # and the TAIL chunk sequences coincide exactly
        k = min(len(a), len(b)) - 1
        assert k >= 2
        assert a[-k:] == b[-k:]

    def test_short_doc_single_chunk(self):
        from crawlray.queries import _cdc_cuts
        assert _cdc_cuts("tiny").tolist() == [4]
        assert _cdc_cuts("").tolist() == []

    def test_cuts_partition_the_text(self):
        from crawlray.queries import _cdc_cuts
        rng = np.random.default_rng(37)
        for _ in range(10):
            txt = "".join(chr(97 + c) for c in
                          rng.integers(0, 26, size=int(rng.integers(1, 600))))
            cuts = _cdc_cuts(txt)
            assert cuts[-1] == len(txt)
            assert (np.diff(cuts) > 0).all()


class TestVoptimalEnumeration:
    @staticmethod
    def _best(y, n_buckets=4):
        from fractions import Fraction
        n = len(y)
        pre = np.concatenate([[0], np.cumsum(y)])
        pre2 = np.concatenate([[0], np.cumsum(np.array(y) ** 2)])

        def sse(i, j):
            s = int(pre[j] - pre[i - 1])
            q = int(pre2[j] - pre2[i - 1])
            return Fraction(q) - Fraction(s * s, j - i + 1)

        best, best_b = None, None
        for b1 in range(1, n - 2):
            for b2 in range(b1 + 1, n - 1):
                for b3 in range(b2 + 1, n):
                    tot = (sse(1, b1) + sse(b1 + 1, b2)
                           + sse(b2 + 1, b3) + sse(b3 + 1, n))
                    if best is None or tot < best:
                        best, best_b = tot, (b1, b2, b3)
        return best, best_b

    def test_step_function_has_zero_sse(self):
        y = [5] * 3 + [9] * 4 + [2] * 2 + [7] * 3
        best, b = self._best(y)
        assert best == 0
        assert b == (3, 7, 9)

    def test_beats_equal_width(self):
        from fractions import Fraction
        rng = np.random.default_rng(41)
        y = rng.integers(0, 100, size=16).tolist()
        pre = np.concatenate([[0], np.cumsum(y)])
        pre2 = np.concatenate([[0], np.cumsum(np.array(y) ** 2)])

        def sse(i, j):
            s = int(pre[j] - pre[i - 1])
            q = int(pre2[j] - pre2[i - 1])
            return Fraction(q) - Fraction(s * s, j - i + 1)

        eq = sse(1, 4) + sse(5, 8) + sse(9, 12) + sse(13, 16)
        best, _ = self._best(y)
        assert best <= eq


class TestLatenessProfile:
    """The sf corpus arrives in order (all lateness 0), so the
    non-trivial watermark path needs a crafted out-of-order stream —
    engine vs oracle on a tiny table, plus a hand-checked value."""

    def test_out_of_order_stream(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq
        from crawlray.queries import SQL_LATENESS_PROFILE, \
            q_lateness_profile

        base = 1_700_000_000_000_000      # us
        # user 1 arrival (event_id) vs event time: two late elements
        rows = [
            (1, 1, base + 100_000_000),   # wm = 100s
            (2, 1, base + 10_000_000),    # 90s late -> late (> 60)
            (3, 1, base + 200_000_000),   # wm = 200s
            (4, 1, base + 170_000_000),   # 30s late -> NOT late
            (5, 2, base),                 # in-order user
            (6, 2, base + 1_000_000),
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows],
                           pa.timestamp("us")),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = (q_lateness_profile(str(tmp_path)).to_pandas()
               .set_index("user_id").sort_index())
        assert got.loc[1, "n_late"] == 1
        assert got.loc[1, "max_lateness_sec"] == 90
        assert got.loc[2, "n_late"] == 0
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/events.parquet')")
        exp = (con.execute(SQL_LATENESS_PROFILE).fetchdf()
               .set_index("user_id").sort_index())
        assert got.equals(exp.astype(got.dtypes.to_dict()))


class TestHaarReconstruction:
    def test_inverse_reproduces_series(self):
        """Unnormalized Haar: y[2i] = (s+d)/2, y[2i+1] = (s-d)/2 — the
        detail+approx set published by the query determines the padded
        series exactly (integer-exact, no division in the forward
        pass)."""
        rng = np.random.default_rng(7)
        y = rng.integers(0, 1000, size=32).astype(np.int64)
        # forward (the query's kernel shape)
        levels = {}
        cur = y.copy()
        for lvl in range(1, 6):
            levels[lvl] = cur[0::2] - cur[1::2]
            cur = cur[0::2] + cur[1::2]
        approx = cur  # length 1
        # inverse
        rec = approx
        for lvl in range(5, 0, -1):
            d = levels[lvl]
            s = rec
            out = np.empty(2 * len(s), np.int64)
            out[0::2] = (s + d) // 2
            out[1::2] = (s - d) // 2
            assert ((s + d) % 2 == 0).all()
            rec = out
        assert (rec == y).all()
