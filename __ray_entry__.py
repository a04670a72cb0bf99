"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ``crawlray``) calls ``ray.init``/``ray.shutdown``.

``entry()`` runs the flagship crawl pipeline at sf0.001 scale;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
``fn(sf_dir) -> Dataset | DataFrame | Table``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the SQL-expressible subset (same column names).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from crawlray.queries import catalog


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic crawl at sf0.001 scale
    (read seeds -> politeness select -> fetch actor pool -> parse to
    interleaved spans -> checkpointed corpus), returning the doc summary."""
    from crawlray.queries import q_crawl

    return q_crawl("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in catalog().items() if sql}
