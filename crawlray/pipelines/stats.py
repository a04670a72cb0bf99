"""Distributed order statistics.

``grouped_quantiles`` computes EXACT per-group discrete quantiles of an
integer-domain column (cents, counts, sizes — the engine's money/measure
convention, cf. the integer-cents domains of the pricing queries):

1. per-batch partial: ``groupby(group, value).size`` — one row per
   distinct (batch, group, value), the §2.5 pre-aggregation rule;
2. ONE Ray range-partitioned ``sort([group, value])`` of the partial
   rows. There is deliberately NO global histogram merge: a near-unique
   value domain (prices in cents) makes ``groupby(group, value)`` a
   shuffle with ~row-count groups — measured 437 s at sf0.1 vs ~7 s for
   this design. Duplicate (group, value) rows from different batches
   land adjacent after the sort and simply both count in the cumulative
   scan — merging them is pointless work;
3. per-group totals from the SAME materialized partials (per-block
   vectorized counts, driver-merged dict — group cardinality is
   dimension-small by contract, documented) broadcast via ``ray.put``;
4. the sorted blocks are scanned with the block-boundary-carry idiom
   (``util.keep_first_sorted`` family): a segmented cumulative sum picks
   the value whose cumulative count first reaches each target rank.

Quantiles are specified in PER-MILLE INTEGERS (``q_pm``: 500 = median)
and the target rank is the integer ``ceil(q_pm * n / 1000)`` — no float
``q * n`` boundary ambiguity, so a SQL oracle restates the rank exactly.
Scale: the sort moves one row per distinct (batch, group, value); the
totals broadcast assumes group cardinality is small relative to the data
(dimension-keyed stats) — for high-cardinality groups, route the totals
through a join instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def grouped_quantiles(
    ds: rd.Dataset,
    group: str,
    value: str,
    q_pms: list[int] = (500, 900, 990),
) -> rd.Dataset:
    """Exact per-group discrete quantiles: for each group g and per-mille
    q, the smallest ``value`` whose cumulative count >= ceil(q*n/1000).
    ``value`` must be integer-typed. Returns (group, q_pm, value)."""
    q_arr = np.asarray(sorted(q_pms), np.int64)

    from ..util import pa_type_of

    schema = ds.schema()
    gt = pa_type_of(schema.types[schema.names.index(group)])
    vt = pa_type_of(schema.types[schema.names.index(value)])

    def partial(df: pd.DataFrame) -> pa.Table:
        out = (
            df.groupby([group, value], sort=False).size().rename("cnt").reset_index()
        )
        # return Arrow so downstream block refs are Arrow tables
        return pa.table({
            group: pa.array(out[group], gt),
            value: pa.array(out[value], vt),
            "cnt": pa.array(out["cnt"].to_numpy(), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pandas")

    @ray.remote
    def gcounts(t: pa.Table) -> dict:
        if t.num_rows == 0:
            return {}
        g = t[group].to_pandas().to_numpy()
        c = t["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, c)
        return dict(zip(u.tolist(), s.tolist()))

    part_refs = parts.to_arrow_refs()   # materializes the partials ONCE
    tot_map: dict = {}
    for d in ray.get([gcounts.remote(r) for r in part_refs]):
        for k, v in d.items():
            tot_map[k] = tot_map.get(k, 0) + v
    tot_ref = ray.put(tot_map)

    ordered = rd.from_arrow_refs(part_refs).sort([group, value])
    refs = ordered.to_arrow_refs()
    if not refs:
        return ordered

    @ray.remote
    def edge(t: pa.Table):
        """(last group, count-sum of the trailing run of that group)."""
        if t.num_rows == 0:
            return None
        g = t[group].to_pandas().to_numpy()
        c = t["cnt"].to_numpy(zero_copy_only=False)
        trail = g == g[-1]
        return g[-1], int(c[trail].sum())

    edges = ray.get([edge.remote(r) for r in refs])
    carries: list[tuple | None] = []
    run_g, run_c = None, 0
    for e in edges:
        carries.append((run_g, run_c) if run_g is not None else None)
        if e is None:
            continue
        last_g, trail_c = e
        run_c = run_c + trail_c if last_g == run_g else trail_c
        run_g = last_g

    @ray.remote
    def pick(t: pa.Table, carry, totals_map) -> pa.Table:
        empty = pa.table({
            group: pa.nulls(0, gt), "q_pm": pa.nulls(0, pa.int64()),
            value: pa.nulls(0, vt),
        })
        if t.num_rows == 0:
            return empty
        g = t[group].to_pandas().to_numpy()
        v = t[value].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        # group segments within this (sorted) block; the segments per
        # block are few (one per group), each handled with ONE vectorized
        # searchsorted of the q targets into the segment's cumsum.
        # Duplicate (group, value) rows (unmerged partials) are fine: the
        # cumsum is still nondecreasing and the first crossing row holds
        # the right value.
        starts = np.r_[0, np.flatnonzero(g[1:] != g[:-1]) + 1]
        ends = np.r_[starts[1:], n]
        out_g, out_q, out_v = [], [], []
        for s, e2 in zip(starts, ends):
            gg = g[s]
            init = carry[1] if (s == 0 and carry is not None
                                and gg == carry[0]) else 0
            cums = np.cumsum(c[s:e2]) + init
            # ceil(q_pm * n_g / 1000) as pure integers — no float boundary
            tgt = -(-(q_arr * int(totals_map[gg])) // 1000)
            pos = np.searchsorted(cums, tgt, side="left")
            # rank reached in THIS block: not already covered by earlier
            # blocks (tgt > init) and reached before the segment ends
            sel = np.flatnonzero((tgt > init) & (pos < (e2 - s)))
            for qi in sel:
                out_g.append(gg)
                out_q.append(int(q_arr[qi]))
                out_v.append(v[s + pos[qi]])
        return pa.table({
            group: pa.array(out_g, gt),
            "q_pm": pa.array(out_q, pa.int64()),
            value: pa.array(out_v, vt),
        })

    return rd.from_arrow_refs(
        [pick.remote(r, cy, tot_ref) for r, cy in zip(refs, carries)]
    )
def exact_quantiles_hist(
    ds: rd.Dataset,
    value: str,
    q_pms: list[int] = (500, 900, 990),
    n_bins: int = 4096,
    max_passes: int = 8,
) -> pa.Table:
    """Exact GLOBAL discrete quantiles over an unbounded integer value
    domain via iterative histogram refinement — the regime where
    :func:`grouped_quantiles`' sort-the-distinct-values plan stops
    compressing because there is no group key to amortize it and the
    full value stream would have to shuffle.

    Each pass is ONE streaming scan: every block emits at most
    ``len(q_pms) x n_bins`` (quantile, bin, count) partial rows for the
    quantiles' current [lo, hi] segments; the driver folds
    O(blocks x q x bins) integers, walks each segment's cumulative
    histogram to the bin containing the target rank, and narrows that
    quantile's segment to the bin. A segment of width <= 1 is resolved.
    Convergence: width shrinks by n_bins per pass, so any 48-bit domain
    resolves in <= 4 passes at the default 4096 (cents domains: 2).
    No row, value list, or per-value histogram ever reaches the driver.

    Rank contract: per-mille integer ranks ``ceil(q_pm * n / 1000)``,
    matching :func:`grouped_quantiles` and the DuckDB restatement
    (smallest value whose cumulative count reaches the rank). Nulls are
    ignored, as SQL aggregates do. Returns (q_pm, value)."""
    q_arr = sorted(int(q) for q in q_pms)

    def count_minmax(t: pa.Table) -> pa.Table:
        col = t[value]
        n = len(col) - col.null_count
        if n == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([None], pa.int64()),
                             "hi": pa.array([None], pa.int64())})
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "lo": pa.array([pc.min(col).as_py()], pa.int64()),
            "hi": pa.array([pc.max(col).as_py()], pa.int64()),
        })

    head = ds.map_batches(count_minmax, batch_format="pyarrow").to_pandas()
    n_total = int(head["n"].sum())
    if n_total == 0:
        return pa.table({"q_pm": pa.array([], pa.int64()),
                         value: pa.array([], pa.int64())})
    glo, ghi = int(head["lo"].min()), int(head["hi"].max())

    # per-quantile state: segment [lo, hi] and the rank WITHIN it
    state = {
        q: [glo, ghi, (q * n_total + 999) // 1000] for q in q_arr
    }

    for _ in range(max_passes):
        active = {q: st for q, st in state.items() if st[0] < st[1]}
        if not active:
            break
        segs = [(qi, st[0], st[1],
                 max(1, (st[1] - st[0] + n_bins) // n_bins))
                for qi, st in sorted(active.items())]

        def hist_partial(t: pa.Table, segs=tuple(segs)) -> pa.Table:
            col = t[value]
            if col.null_count:
                col = col.drop_null()
            v = col.to_numpy(zero_copy_only=False)
            qs, bins, cnts = [], [], []
            for qi, lo, hi, width in segs:
                m = (v >= lo) & (v <= hi)
                if not m.any():
                    continue
                b = (v[m] - lo) // width
                ub, uc = np.unique(b, return_counts=True)
                qs.extend([qi] * len(ub))
                bins.extend(ub.tolist())
                cnts.extend(uc.tolist())
            return pa.table({"q": pa.array(qs, pa.int64()),
                             "b": pa.array(bins, pa.int64()),
                             "c": pa.array(cnts, pa.int64())})

        folded = (
            ds.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["q", "b"], as_index=False)["c"].sum()
        )
        for qi, lo, hi, width in segs:
            h = folded[folded["q"] == qi].sort_values("b")
            cum = h["c"].cumsum().to_numpy()
            rank = state[qi][2]
            j = int(np.searchsorted(cum, rank))
            chosen = int(h["b"].iloc[j])
            before = int(cum[j - 1]) if j else 0
            new_lo = lo + chosen * width
            new_hi = min(hi, new_lo + width - 1)
            state[qi] = [new_lo, new_hi, rank - before]

    unresolved = [q for q, st in state.items() if st[0] < st[1]]
    if unresolved:
        raise RuntimeError(f"quantiles unresolved after {max_passes} passes: "
                           f"{unresolved}")
    return pa.table({
        "q_pm": pa.array(q_arr, pa.int64()),
        value: pa.array([state[q][0] for q in q_arr], pa.int64()),
    })


def table_profile(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Single-pass data profiling: per column, row count / null count /
    min / max — the sanity sweep a pipeline runs over a new corpus drop
    before spending compute on it. One ``map_batches`` partial per block
    emits len(cols) scalar rows; the reduce is a groupby over len(cols)
    keys. Nothing but O(blocks x cols) scalars ever crosses the cluster.
    Columns must be integer-typed (the profile emits BIGINT min/max so
    the DuckDB oracle compares exactly — no float/varchar formatting
    divergence)."""

    def partial(t: pa.Table) -> pa.Table:
        names, n_rows, n_nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = t[c]
            names.append(c)
            n_rows.append(t.num_rows)
            n_nulls.append(col.null_count)
            valid = col.drop_null()
            if len(valid):
                mins.append(pc.min(valid).as_py())
                maxs.append(pc.max(valid).as_py())
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n_rows": pa.array(n_rows, pa.int64()),
            "n_nulls": pa.array(n_nulls, pa.int64()),
            "min_v": pa.array(mins, pa.int64()),
            "max_v": pa.array(maxs, pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby("col").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_nulls", alias_name="n_nulls"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )
