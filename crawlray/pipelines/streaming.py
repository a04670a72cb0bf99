"""Stream-shaped processing over the ``events`` log (SURVEY.md §2.9).

Ray Data has no event-time watermarks; the engine's contract (ray_guide
"Streaming-shaped workloads") is: treat the input as an ordered,
key-partitioned log — sort by event time, hash keys into K bucket actors,
feed each bucket's batches IN TIME ORDER, keep incremental state inside
the actor. Here: per-key running aggregates (the incremental analog of
``SUM(...) OVER (PARTITION BY key ORDER BY ts)``).

The crawl engine's round-based frontier is the same pattern at a larger
granularity (rounds = windows, seen-shards = keyed state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


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


def running_sum_per_key(
    events: rd.Dataset,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    n_buckets: int = 8,
) -> pd.DataFrame:
    """(id_col, running) — cumulative per-key sum in (ts, id) order.

    Implementation: global sort by (ts, id) -> stream batches through K
    keyed bucket actors (state lives in the actor across batches). The
    driver only routes references; per-batch work is vectorized routing +
    one RPC per touched bucket.
    """
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
