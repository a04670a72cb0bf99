"""Frontier selection + rebuild stages (Mercator-style ordering, ST2/ST3).

Per-round politeness selection — at most ``budget`` URLs per host, in
``(priority, seq)`` order — is a per-host top-k. A naive
``groupby(host)`` would ship the *whole* frontier through one group per
host, and a hot host holding ~30% of the frontier becomes one giant
straggler group. Instead: two-phase top-k (the salting strategy of
SURVEY.md §4.2):

- **phase A** (``mark_candidates``, per-batch, vectorized): within each
  block, rank rows per host by (priority, seq); only rows with local rank
  < budget remain *candidates*. Each block acts as one salt shard — a
  host's survivors are <= budget x n_blocks, rows beyond that defer
  immediately without entering the shuffle.
- **phase B** (``select_per_host``, ``groupby(host).map_groups``): exact
  top-budget per host over the bounded survivor set.

Both phases are deterministic, so selection equals the sequential oracle's.
"""

from __future__ import annotations

import pandas as pd


def rank_within_host(df: pd.DataFrame, budget: int, col: str) -> pd.DataFrame:
    """The selection kernel both phases share: mark ``col`` True for rows
    whose per-host rank in stable (priority, seq) order is < ``budget``.
    ONE implementation so phase A (block-local, ``cand``) and phase B
    (bucket-exact, ``sel``) can never desynchronize on tie-breaking."""
    order = df.sort_values(["priority", "seq"], kind="stable")
    rank = order.groupby("host", sort=False).cumcount()
    mask = pd.Series(False, index=df.index)
    mask.loc[order.index] = rank.values < budget
    df = df.copy()
    df[col] = mask
    return df


def mark_candidates(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Phase A: add bool ``cand`` = block-local per-host rank < budget."""
    return rank_within_host(df, budget, "cand")


def select_per_host(group: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Phase B: exact per-host top-budget by (priority, seq)."""
    g = group.sort_values(["priority", "seq"], kind="stable")
    g = g.copy()
    g["sel"] = False
    g.iloc[: budget, g.columns.get_loc("sel")] = True
    return g
