"""Stream-shaped processing over the ``events`` log (SURVEY.md §2.9).

Ray Data has no event-time watermarks; the engine's contract (ray_guide
"Streaming-shaped workloads") is: treat the input as an ordered,
key-partitioned log. Two implementations of the per-key running sum (the
``SUM(...) OVER (PARTITION BY key ORDER BY ts)`` analog):

- :func:`running_sum_per_key` — the BATCH/scale plan: the window needs
  only *within-key* order, so hash-partition by key (one shuffle), then
  per-partition vectorized sort + segmented cumsum inside ``map_groups``.
  Fully parallel; no global sort, no driver pass, result stays a lazy
  ``Dataset``.
- :func:`running_sum_incremental` — the STREAMING-ARRIVAL demo: batches
  arriving in event-time order stream through K keyed bucket actors that
  hold incremental state across batches (the shape a true unbounded
  stream forces). Driver routes block references; test-scale only — at
  100 TB use the batch plan.

The crawl engine's round-based frontier is the same pattern at a larger
granularity (rounds = windows, seen-shards = keyed state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .relational import _bucket_of


def running_sum_per_key(
    events: rd.Dataset,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    n_partitions: int = 32,
) -> rd.Dataset:
    """(id_col, running) — cumulative per-key sum in (ts, id) order.

    One shuffle: ``part = hash(key) % n_partitions`` so every key's rows
    land in exactly one partition, then a vectorized per-partition
    lexsort + segmented cumsum. Skewed keys cost at most one partition's
    worth of work; raise ``n_partitions`` to bound partition size.
    """
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(_bucket_of(t[key], n_partitions)))

    def seg_cumsum(t: pa.Table) -> pa.Table:
        # id type from the BATCH schema (always Arrow here; Dataset.schema()
        # yields non-Arrow types for pandas-backed blocks)
        id_type = t.schema.field(id_col).type
        if t.num_rows == 0:
            return pa.table({id_col: pa.nulls(0, id_type),
                             "running": pa.nulls(0, pa.int64())})
        keys = t[key].to_numpy(zero_copy_only=False)
        tss = t[ts].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, tss, keys))
        k, v = keys[order], vals[order]
        cs = np.cumsum(v)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        bases = np.r_[0, cs[starts[1:] - 1]]
        running = cs - np.repeat(bases, np.diff(np.r_[starts, len(k)]))
        return pa.table({id_col: pa.array(ids[order]).cast(id_type),
                         "running": pa.array(running, pa.int64())})

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("part").map_groups(seg_cumsum, batch_format="pyarrow")


def sessionize(
    events: rd.Dataset,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    gap_seconds: float = 1800.0,
    n_partitions: int = 32,
) -> rd.Dataset:
    """Gap-based session windows (the streaming sessionization analog):
    one row per (key, session_id) with session_start / session_end /
    n_events / cents_sum. A session breaks when the time since the
    previous event of the same key exceeds ``gap_seconds``.

    Same shape as :func:`running_sum_per_key`: hash-partition by key (one
    shuffle), then a vectorized per-partition lexsort + segment reduce —
    boundaries from a single gap comparison, per-key session numbering
    and min/max/count/sum via numpy segment ops. No driver pass.
    """
    from .relational import _bucket_of

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(_bucket_of(t[key], n_partitions)))

    gap_ns = np.int64(round(gap_seconds * 1e9))

    def sessions(t: pa.Table) -> pa.Table:
        # the key output column carries the INPUT key type (string/int32
        # keys must round-trip; a hardcoded int64 corrupted them), taken
        # from the batch schema — always Arrow here
        key_type = t.schema.field(key).type
        empty = pa.table({
            key: pa.nulls(0, key_type),
            "session_id": pa.nulls(0, pa.int64()),
            "session_start": pa.nulls(0, pa.timestamp("us")),
            "session_end": pa.nulls(0, pa.timestamp("us")),
            "n_events": pa.nulls(0, pa.int64()),
            "cents_sum": pa.nulls(0, pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        keys = t[key].to_numpy(zero_copy_only=False)
        tss = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, tss, keys))
        k, tv, v = keys[order], tss[order], vals[order]
        tns = tv.view(np.int64)
        new_key = np.r_[True, k[1:] != k[:-1]]
        boundary = new_key.copy()
        boundary[1:] |= (tns[1:] - tns[:-1]) > gap_ns
        seg = np.cumsum(boundary) - 1                     # global segment idx
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.r_[starts, len(k)])
        # per-key session numbering: global seg idx minus the key's first
        key_starts = np.flatnonzero(new_key)
        seg_at_key_start = seg[key_starts]                # per key block
        key_sizes = np.diff(np.r_[key_starts, len(k)])
        base = np.repeat(seg_at_key_start, key_sizes)
        session_id = (seg - base + 1)[starts]             # one per segment
        cs = np.cumsum(v)
        ends = starts + sizes - 1
        seg_sum = np.diff(np.r_[0, cs[ends]])
        return pa.table({
            key: pa.array(k[starts]).cast(key_type),
            "session_id": pa.array(session_id.astype(np.int64)),
            "session_start": pa.array(tv[starts]).cast(pa.timestamp("us")),
            "session_end": pa.array(tv[starts + sizes - 1]).cast(pa.timestamp("us")),
            "n_events": pa.array(sizes.astype(np.int64)),
            "cents_sum": pa.array(seg_sum.astype(np.int64)),
        })

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("part").map_groups(sessions, batch_format="pyarrow")


def lag_gap(
    events: rd.Dataset,
    key: str,
    ts: str,
    id_col: str,
    n_partitions: int = 32,
) -> rd.Dataset:
    """Per-key previous-event gap (the ``LAG() OVER (PARTITION BY key
    ORDER BY ts, id)`` window analog): one row per event with
    ``gap_us`` = microseconds since the same key's previous event, or
    ``-1`` for the key's first event.

    Same single-shuffle shape as :func:`running_sum_per_key`:
    hash-partition by key, then a vectorized per-partition lexsort +
    shifted diff. No global sort, no driver pass."""
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(_bucket_of(t[key], n_partitions)))

    def gaps(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        if t.num_rows == 0:
            return pa.table({id_col: pa.nulls(0, id_type),
                             "gap_us": pa.nulls(0, pa.int64())})
        keys = t[key].to_numpy(zero_copy_only=False)
        tus = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tus, keys))
        k, tv, i = keys[order], tus[order], ids[order]
        gap = np.empty(len(k), np.int64)
        gap[0] = -1
        gap[1:] = np.where(k[1:] == k[:-1], tv[1:] - tv[:-1], -1)
        return pa.table({id_col: pa.array(i).cast(id_type),
                         "gap_us": pa.array(gap, pa.int64())})

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("part").map_groups(gaps, batch_format="pyarrow")


def pack_chunks(
    docs: rd.Dataset,
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> rd.Dataset:
    """Training-sequence packing: concatenate every doc's tokens in
    ``order_col`` order into one global token stream and cut it every
    ``capacity`` tokens (the standard LLM-pretraining pack-and-split).
    One row per doc: its global ``token_offset`` plus the first/last
    chunk index it lands in (a doc may straddle chunks; a 0-token doc
    occupies its current chunk).

    This is a GLOBAL prefix scan — an operator Ray Data has no call for
    (SURVEY.md §2.4 custom-op case (c)). Two-pass plan: sort by
    ``order_col`` (blocks come back globally ordered — the same
    contract ``keep_first_k_sorted`` relies on), then (1) one parallel
    task per block computes its token sum, (2) the driver folds the
    per-block sums into exclusive base offsets — O(blocks) scalars,
    never rows — and (3) one parallel task per block emits its rows'
    offsets via a local cumsum + base. Wall-clock is two short parallel
    waves; only (order, tokens) columns move through the sort."""
    import ray

    from .relational import _as_table

    refs = docs.sort(order_col).to_arrow_refs()
    cap = int(capacity)

    @ray.remote
    def block_sum(t) -> int:
        t = _as_table(t)
        if t.num_rows == 0:
            return 0
        return int(np.sum(t[tokens_col].to_numpy(zero_copy_only=False)))

    @ray.remote
    def emit(t, base: int) -> pa.Table:
        t = _as_table(t)
        id_type = t.schema.field(order_col).type if t.num_rows else pa.int64()
        if t.num_rows == 0:
            return pa.table({
                order_col: pa.nulls(0, id_type),
                "n_tokens": pa.nulls(0, pa.int64()),
                "token_offset": pa.nulls(0, pa.int64()),
                "chunk_start": pa.nulls(0, pa.int64()),
                "chunk_end": pa.nulls(0, pa.int64()),
            })
        wc = t[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off = base + np.cumsum(wc) - wc
        end = (off + np.maximum(wc, 1) - 1) // cap
        return pa.table({
            order_col: t[order_col],
            "n_tokens": pa.array(wc),
            "token_offset": pa.array(off),
            "chunk_start": pa.array(off // cap),
            "chunk_end": pa.array(end),
        })

    if not refs:
        return rd.from_arrow(pa.table({
            order_col: pa.nulls(0, pa.int64()),
            "n_tokens": pa.nulls(0, pa.int64()),
            "token_offset": pa.nulls(0, pa.int64()),
            "chunk_start": pa.nulls(0, pa.int64()),
            "chunk_end": pa.nulls(0, pa.int64()),
        }))
    sums = ray.get([block_sum.remote(r) for r in refs])
    bases = np.concatenate([[0], np.cumsum(sums)[:-1].astype(np.int64)])
    return rd.from_arrow_refs(
        [emit.remote(r, int(b)) for r, b in zip(refs, bases)]
    )


def sliding_window_agg(
    events: rd.Dataset,
    ts: str,
    value: str,
    width_hours: int = 3,
    slide_hours: int = 1,
) -> rd.Dataset:
    """Sliding event-time windows (the hopping-window aggregate):
    one row per window start with n_events / cents_sum, windows of
    ``width_hours`` advancing every ``slide_hours`` (width % slide == 0).

    Plan: an event at slide-index ``b`` belongs to exactly
    ``width/slide`` windows — explode each batch into its (window,
    cents) pairs and PARTIALLY aggregate inside the batch (np.unique +
    bincount), so the shuffle carries one row per (batch, window), not
    per (event, window); a final small groupby sums the partials. The
    §2.5 pre-aggregation rule applied to overlapping windows.
    """
    if width_hours % slide_hours:
        raise ValueError("width_hours must be a multiple of slide_hours")
    k = width_hours // slide_hours
    slide_us = np.int64(slide_hours * 3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "window_start": pa.nulls(0, pa.timestamp("us")),
            "n_events": pa.nulls(0, pa.int64()),
            "cents_sum": pa.nulls(0, pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        tus = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        cents = np.rint(t[value].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        base = tus // slide_us
        ws = (base[:, None] - np.arange(k, dtype=np.int64)[None, :]).ravel()
        vals = np.repeat(cents, k)
        uws, inv = np.unique(ws, return_inverse=True)
        n = np.bincount(inv, minlength=len(uws)).astype(np.int64)
        s = np.zeros(len(uws), np.int64)
        np.add.at(s, inv, vals)
        return pa.table({
            "window_start": pa.array((uws * slide_us).view("datetime64[us]")),
            "n_events": pa.array(n),
            "cents_sum": pa.array(s),
        })

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("cents_sum", alias_name="cents_sum"))
    )


@ray.remote(num_cpus=0)
class _RunningAggBucket:
    """Keyed incremental state: key -> running sum. Batches MUST arrive in
    event-time order (the caller's responsibility — stated contract)."""

    def __init__(self):
        self.totals: dict[int, int] = {}

    def feed(self, keys: np.ndarray, ids: np.ndarray, values: np.ndarray):
        out = np.empty(len(keys), dtype=np.int64)
        totals = self.totals
        for i in range(len(keys)):
            k = int(keys[i])
            t = totals.get(k, 0) + int(values[i])
            totals[k] = t
            out[i] = t
        return ids, out


def running_sum_incremental(
    events: rd.Dataset,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    n_buckets: int = 8,
) -> pd.DataFrame:
    """Incremental-arrival variant of :func:`running_sum_per_key`: global
    sort by (ts, id) -> stream batches through K keyed bucket actors
    (state lives in the actor across batches). The driver routes every
    batch, so this is the unbounded-stream DEMO, not the batch plan —
    use :func:`running_sum_per_key` for data at rest."""
    buckets = [_RunningAggBucket.remote() for _ in range(n_buckets)]
    ordered = events.sort([ts, id_col])
    out_ids: list[np.ndarray] = []
    out_run: list[np.ndarray] = []
    pending: list = []
    for batch in ordered.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[value].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (keys % n_buckets).astype(np.int64)
        futs = []
        for b in np.unique(shard):
            m = shard == b
            futs.append(buckets[int(b)].feed.remote(keys[m], ids[m], vals[m]))
        # batches must be applied in order per bucket; actor mailboxes
        # preserve per-caller order, so submission order is enough
        pending.extend(futs)
    for ids, run in ray.get(pending):
        out_ids.append(ids)
        out_run.append(run)
    df = pd.DataFrame(
        {
            id_col: np.concatenate(out_ids) if out_ids else np.array([], np.int64),
            "running": np.concatenate(out_run) if out_run else np.array([], np.int64),
        }
    )
    return df.sort_values(id_col).reset_index(drop=True)

def rolling_sum_rows(
    events: rd.Dataset,
    key: str,
    ts: str,
    id_col: str,
    val: str,
    window: int = 4,
    n_partitions: int = 32,
) -> rd.Dataset:
    """Per-key rolling sum over the last ``window`` rows — the
    ``SUM(x) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` window analog. Values enter
    the sum as ``floor(value)`` int64, so summation order cannot produce
    IEEE divergence against the SQL oracle.

    Same single-shuffle shape as :func:`lag_gap`: hash-partition by key,
    then a per-partition vectorized lexsort + cumsum-difference with a
    per-key segment clamp (``lo = max(i-window+1, segment_start)``) —
    no per-row loop, no global sort."""
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(_bucket_of(t[key], n_partitions)))

    def roll(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        if t.num_rows == 0:
            return pa.table({id_col: pa.nulls(0, id_type),
                             "roll_sum": pa.nulls(0, pa.int64())})
        keys = t[key].to_numpy(zero_copy_only=False)
        tus = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vals = np.floor(t[val].to_numpy(zero_copy_only=False)).astype(np.int64)
        order = np.lexsort((ids, tus, keys))
        k, i, v = keys[order], ids[order], vals[order]
        n = len(k)
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, counts)
        lo = np.maximum(np.arange(n) - (window - 1), seg_start)
        cs = np.concatenate([[0], np.cumsum(v)])
        out = cs[np.arange(1, n + 1)] - cs[lo]
        return pa.table({id_col: pa.array(i).cast(id_type),
                         "roll_sum": pa.array(out, pa.int64())})

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("part").map_groups(roll, batch_format="pyarrow")

def ntile_per_key(
    events: rd.Dataset,
    key: str,
    ts: str,
    id_col: str,
    k: int,
    n_partitions: int = 32,
) -> rd.Dataset:
    """Per-key NTILE(k) — the quantile-bucketing window analog
    (``NTILE(k) OVER (PARTITION BY key ORDER BY ts, id)``), with SQL's
    exact distribution: the first ``n % k`` tiles hold ``ceil(n/k)``
    rows, the rest ``floor(n/k)``. Same single-shuffle shape as
    :func:`lag_gap`: hash-partition by key, per-partition lexsort, then
    the tile index as closed-form integer math on the within-key rank —
    no per-row loop."""
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(_bucket_of(t[key], n_partitions)))

    def tiles(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        if t.num_rows == 0:
            return pa.table({id_col: pa.nulls(0, id_type),
                             "tile": pa.nulls(0, pa.int64())})
        keys = t[key].to_numpy(zero_copy_only=False)
        tus = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tus, keys))
        kk, ii = keys[order], ids[order]
        n_rows = len(kk)
        starts = np.r_[0, np.flatnonzero(kk[1:] != kk[:-1]) + 1]
        counts = np.diff(np.r_[starts, n_rows])
        n = np.repeat(counts, counts)                  # segment size per row
        rank = np.arange(n_rows) - np.repeat(starts, counts)   # 0-based in-key
        big = -(-n // k)                               # ceil(n/k)
        small = n // k
        r = n % k                                      # tiles that get `big`
        cut = r * big
        in_big = rank < cut
        tile = np.where(
            in_big,
            rank // np.maximum(big, 1),
            r + (rank - cut) // np.maximum(small, 1),
        ) + 1
        return pa.table({id_col: pa.array(ii).cast(id_type),
                         "tile": pa.array(tile.astype(np.int64))})

    tagged = events.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("part").map_groups(tiles, batch_format="pyarrow")


def sliding_distinct_users(
    events: rd.Dataset,
    key_col: str,
    ts_col: str,
    window_hours: int = 24,
    n_buckets: int = 32,
):
    """Sliding-window DISTINCT count — ``n_users`` active in the
    ``window_hours``-hour window ENDING at each hour. Distinct is NOT
    subtractable, so the ring-buffer trick behind
    :func:`sliding_window_agg` cannot apply; the scale-honest lowering
    INVERTS the window: instead of each window asking "which users
    touched me?" (a per-window set union), each USER announces the
    windows it belongs to. Per-batch distinct (user, hour) partials
    exchange ONCE by user hash; inside a bucket every user's active
    hours become merged [h, h+W-1] intervals (one vectorized
    boundary pass — a user active in consecutive hours contributes
    one interval, not W rows), and only the intervals' +1/-1 boundary
    DELTAS leave the bucket: O(user activity bursts) rows, never
    O(users x windows). The driver folds deltas and runs one cumsum
    over the hour axis — hour cardinality grows with the calendar,
    not the data. Returns an arrow table (window_end, n_users),
    windows with zero users omitted."""
    HOUR = np.int64(3_600_000_000)
    w = np.int64(window_hours)

    def hour_partial(t: pa.Table) -> pa.Table:
        ts = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        h = ts // HOUR
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([u, h], axis=1), axis=0)
        return pa.table({"user": pa.array(uniq[:, 0], pa.int64()),
                         "h": pa.array(uniq[:, 1], pa.int64())})

    def deltas(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.nulls(0, pa.int64()),
                             "d": pa.nulls(0, pa.int64())})
        u = t["user"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, u))
        us, hs = u[order], h[order]
        # rows may repeat (same (user, hour) from different batches):
        # interval merge absorbs duplicates (gap 0 <= w-1)
        new_iv = np.r_[True, (us[1:] != us[:-1]) | (hs[1:] - hs[:-1] > w - 1)]
        starts = np.flatnonzero(new_iv)
        ends = np.r_[starts[1:], len(hs)] - 1
        lo = hs[starts]                   # first window containing the run
        hi = hs[ends] + w                 # one past the last window
        dh = np.concatenate([lo, hi])
        dd = np.concatenate([np.ones(len(lo), np.int64),
                             -np.ones(len(hi), np.int64)])
        agg = pa.table({"h": pa.array(dh, pa.int64()),
                        "d": pa.array(dd, pa.int64())})
        return agg.group_by(["h"]).aggregate([("d", "sum")]).rename_columns(
            ["h", "d"])

    from .relational import bucketed_reduce

    parts = events.map_batches(hour_partial, batch_format="pyarrow")
    if parts.schema() is None:
        return pa.table({"window_end": pa.nulls(0, pa.timestamp("us")),
                         "n_users": pa.nulls(0, pa.int64())})
    folded: dict[int, int] = {}
    for r in bucketed_reduce(parts, "user", deltas,
                             n_buckets=n_buckets).take_all():
        folded[r["h"]] = folded.get(r["h"], 0) + int(r["d"])
    hours = np.array(sorted(folded), np.int64)
    if not len(hours):
        return pa.table({"window_end": pa.nulls(0, pa.timestamp("us")),
                         "n_users": pa.nulls(0, pa.int64())})
    dv = np.array([folded[h] for h in hours], np.int64)
    counts = np.cumsum(dv)
    # expand boundary runs to per-hour rows (calendar-bounded)
    out_h, out_n = [], []
    for i in range(len(hours) - 1):
        if counts[i] > 0:
            span = np.arange(hours[i], hours[i + 1], dtype=np.int64)
            out_h.append(span)
            out_n.append(np.full(len(span), counts[i], np.int64))
    out_h = np.concatenate(out_h) if out_h else np.empty(0, np.int64)
    out_n = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
    return pa.table({
        "window_end": pa.array((out_h * HOUR).view("datetime64[us]")),
        "n_users": pa.array(out_n, pa.int64()),
    })
