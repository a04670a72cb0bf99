"""Sequential pure-Python crawl simulator — the test oracle.

Implements the engine's crawl contract (round-based BFS with per-host
politeness budgets, deterministic seq assignment, robots gating, exact
URL-seen membership) as a single in-process loop with plain sets/lists.
``crawlray.engine.CrawlEngine`` must reproduce this oracle's fetch order
(logical order by ``(round, priority, seq)``) and URL-seen set exactly —
the sandbox restatement of the north rule's "matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness budget"
(the reference itself processes its seed list strictly sequentially,
``backend/api/tasks.py:488-567``; the frontier semantics are this engine's).

Crawl contract (shared with the engine, see engine.py):

- round r frontier is ordered by ``(priority, seq)``;
- per host, only the first ``politeness_budget`` frontier rows in that order
  are fetched this round; the rest are deferred to round r+1 unchanged;
- robots-disallowed URLs consume budget and produce error rows, no spans;
- fetch retries happen in-line (<=3 attempts); permanent failures (404)
  produce error rows, no spans;
- candidate outlinks from a fetched doc are its link spans in emission order
  (per-page deduped, canonical); a candidate's sort key is
  ``(src_seq, discovery_rank)``;
- a candidate is new iff its canonical URL was not seen in any earlier round
  (seeds are seen at round 0) and not already claimed this round by a
  smaller sort key;
- new URLs get dense seqs: sorted by ``(src_seq, discovery_rank)``,
  ``seq = next_seq + rank``; ``next_seq`` advances by the round's new count;
- depth = parent depth + 1; priority/host are pure functions of the URL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .canon import canonicalize, host_of, split_url
from .htmlx import parse_document
from .synth import World


@dataclass
class OracleResult:
    # one row per frontier row actually processed: (round, priority, seq, url, status)
    fetch_log: list[tuple[int, int, int, str, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    spans_by_url: dict[str, list[tuple[str, str, str]]] = field(default_factory=dict)
    rounds: int = 0


def simulate_crawl(
    world: World,
    n_seeds: int,
    max_rounds: int = 3,
    budget: int | None = None,
) -> OracleResult:
    budget = budget if budget is not None else world.cfg.politeness_budget
    res = OracleResult()
    seeds = [canonicalize(u) for u in world.seed_urls(n_seeds)]
    res.seen.update(seeds)
    # frontier rows: (priority, seq, url, depth)
    frontier = [
        (world.priority(u), i, u, 0) for i, u in enumerate(seeds)
    ]
    next_seq = len(seeds)

    for rnd in range(max_rounds):
        if not frontier:
            break
        res.rounds = rnd + 1
        frontier.sort(key=lambda t: (t[0], t[1]))
        taken: dict[str, int] = {}
        selected: list[tuple[int, int, str, int]] = []
        deferred: list[tuple[int, int, str, int]] = []
        for row in frontier:
            host = host_of(row[2])
            if taken.get(host, 0) < budget:
                taken[host] = taken.get(host, 0) + 1
                selected.append(row)
            else:
                deferred.append(row)

        new_candidates: dict[str, tuple[int, int, int, str]] = {}  # url -> (src_seq, rank, depth, url)
        for priority, seq, url, depth in selected:
            host = host_of(url)
            path = split_url(url)[2]
            if world.robots_disallowed(host, path):
                res.fetch_log.append((rnd, priority, seq, url, "robots_denied"))
                continue
            if world.auth_required(host):
                res.fetch_log.append((rnd, priority, seq, url, "http_401"))
                continue
            status, _attempts = world.fetch_plan(url)
            if status == 404:
                res.fetch_log.append((rnd, priority, seq, url, "http_404"))
                continue
            html = world.gen_page(url)
            parsed = parse_document(html, url)
            res.fetch_log.append((rnd, priority, seq, url, "ok"))
            res.spans_by_url[url] = parsed.spans
            for link in parsed.links:
                u = link.url
                if u in res.seen:
                    continue
                key = (seq, link.rank)
                prev = new_candidates.get(u)
                if prev is None or key < (prev[0], prev[1]):
                    new_candidates[u] = (seq, link.rank, depth + 1, u)

        ordered = sorted(new_candidates.values())
        new_rows = []
        for rank, (_s, _r, depth, u) in enumerate(ordered):
            res.seen.add(u)
            new_rows.append((world.priority(u), next_seq + rank, u, depth))
        next_seq += len(new_rows)
        frontier = deferred + new_rows

    return res
