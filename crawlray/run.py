"""CLI driver: run a crawl end-to-end (``ray job submit``-able entrypoint).

Owns the Ray session (the library never calls ray.init). Example:

    python -m crawlray.run --out /tmp/crawl --n-urls 20000 --seeds 200 \
        --rounds 3 --seen-mode cuckoo --num-cpus 32

Resume is the default: rerunning with the same --out continues from the
newest committed manifest (or no-ops if the crawl finished).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="crawlray synthetic crawl driver")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-urls", type=int, default=10_000)
    ap.add_argument("--n-hosts", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--seen-mode", choices=("exact", "cuckoo"), default="cuckoo")
    ap.add_argument("--seen-shards", type=int, default=8)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--rate-per-host", type=float, default=None,
                    help="wall-clock politeness tokens/sec (off by default)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--gc", choices=("plan", "apply"), default=None,
                    help="instead of crawling, print the checkpoint "
                         "garbage-collection plan for --out (apply "
                         "deletes the orphans)")
    args = ap.parse_args()

    if args.gc is not None:
        from .checkpoint import gc_plan

        plan = gc_plan(args.out, apply=args.gc == "apply")
        print(json.dumps(plan))
        return

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .engine import CrawlEngine, EngineConfig
    from .synth import WorldConfig

    cfg = EngineConfig(
        world=WorldConfig(n_urls=args.n_urls, n_hosts=args.n_hosts),
        n_seeds=args.seeds,
        max_rounds=args.rounds,
        budget=args.budget,
        n_parts=args.parts,
        n_seen_shards=args.seen_shards,
        seen_mode=args.seen_mode,
        rate_per_host=args.rate_per_host,
    )
    t0 = time.perf_counter()
    summary = CrawlEngine(cfg, args.out).run(resume=not args.no_resume)
    summary["sec"] = round(time.perf_counter() - t0, 3)
    summary["urls_per_sec"] = round(summary["fetched"] / max(summary["sec"], 1e-9), 1)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
