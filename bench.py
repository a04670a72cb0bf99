"""Benchmark harness (driver contract).

``python bench.py``            -> ONE JSON line: headline crawl seconds +
                                  per-query seconds at $GRAFT_SF_DIR.
``python bench.py --scaling``  -> runs the headline crawl at num_cpus=4 and
                                  num_cpus=16 (the N->4N pair inside this
                                  box's ~16 effective cores) in fresh
                                  interleaved processes on the SAME input;
                                  prints throughputs + scaling efficiency
                                  (sandbox evidence protocol for the north
                                  rule, SURVEY.md §4.3).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     CRAWL_BENCH_URLS / CRAWL_BENCH_SEEDS / CRAWL_BENCH_ROUNDS to override
     the synthetic-crawl size.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "doc_stats",
    "source_stats",
    "pricing_summary",
    "brand_revenue",
    "customer_orders",
    "hourly_windows",
    "exact_dedup",
    "token_totals",
    "quality",
    "ann_cosine",
    "order_priority_revenue",
    "daily_top_event",
    "running_sum",
    "embedding_near_dups",
    "minhash_dedup",
    "simhash",
    "lang_id",
    "sessions",
    "bpe_tokens",
    "embedding_lsh_dups",
    "asof_last_view",
    "sliding_windows",
    "repetition",
    "split",
    "range_active_events",
    "top_events_per_type",
    "price_quantiles",
    "tfidf_top_terms",
    "rebalance",
    "pagerank",
    "inactive_customers",
    "event_gaps",
    "pack_chunks",
    "decontaminate",
    "approx_distinct",
    "pii_scan",
    "normalize_text",
    "heavy_hitters",
    "rolling_sum",
    "urgent_customers",
    "shared_ngrams",
    "table_profile",
    "corpus_mix",
    "group_sample",
    "customer_urgent_counts",
    "event_ntiles",
    "price_histogram",
    "daily_activity",
    "event_pivot",
    "revenue_rollup",
    "repeat_buyers",
    "small_qty_revenue",
    "distinct_pairs",
    "unpivot_measures",
    "priority_statuses",
    "lapsed_buyers",
    "nation_share",
    "revenue_cube",
    "part_median_price",
    "big_spenders",
    "monthly_growth",
    "props_stats",
    "value_quantiles",
    "user_day_stats",
    "weighted_sample",
    "fuzzy_decontaminate",
    "triangle_counts",
    "grouped_distinct",
    "conversion_lag",
    "cm_user_counts",
    "rank_normalize",
    "event_transitions",
    "price_regression",
    "distinct_users",
    "trimmed_stats",
    "top_orders",
    "bm25_topk",
    "new_users_daily",
    "robots_lpm",
    "anchor_index",
    "regional_revenue",
    "top_terms_per_lang",
    "image_phash_dups",
    "top_bigrams",
    "weekly_retention",
    "co_citation",
    "inverted_index",
    "degree_histogram",
    "host_near_matches",
    "daily_ohlc",
    "matched_order_pairs",
    "unreturned_shipments",
    "funnel_stages",
    "priority_variance",
    "user_top_event",
    "host_pagerank",
    "dedup_spans",
    "price_correlation",
    "part_price_mad",
    "hits",
    "association_rules",
    "chi_square",
    "value_outliers",
    "part_skyline",
    "lm_score",
    "wealthy_idle",
    "error_bursts",
    "zorder_layout",
    "sliding_distinct",
    "trending_events",
    "collocations",
    "event_trigrams",
    "preferred_supplier",
    "embedding_top_dims",
    "benford_prices",
    "trailing_hour_sum",
    "iqr_outliers",
    "sole_suppliers",
    "nation_trade",
    "promo_share",
    "bracket_revenue",
    "kmv_distinct",
    "source_divergence",
    "purchase_attribution",
    "user_drawdown",
    "source_vocab_overlap",
    "source_simpson",
    "dow_hour_heatmap",
    "zone_map_prune",
    "median_cont",
    "host_reciprocity",
    "user_active_bitmap",
    "clustering_coeff",
    "degree_assortativity",
    "cohort_ltv",
    "ri_audit",
    "pareto_share",
    "charset_histogram",
    "table_diff",
    "range_partition_bounds",
    "latest_state",
    "bounce_rate",
    "longest_streak",
    "third_largest",
    "weighted_median",
    "quartile_label",
    "forward_fill",
    "week_mask_histogram",
    "customer_rfm",
    "hapax_ratio",
    "part_hhi",
    "join_size_estimate",
    "key_skew_profile",
    "order_day_share",
    "relational_division",
    "weekday_index",
    "biggest_jump",
    "error_pressure",
    "max_concurrency",
    "interval_coverage",
    "twap",
    "spend_drop",
    "returned_customers",
    "top_supplier",
    "supplier_variety",
    "nation_profit",
    "important_parts",
    "order_part_list",
    "scd2_intervals",
    "merge_upsert",
    "price_kurtosis",
    "session_patterns",
    "cheapest_path",
    "debounce_events",
    "first_touch",
    "kfold_assignment",
    "q6_revenue",
    "nearest_view",
    "linear_interp",
    "order_count_distribution",
    "big_qty_orders",
    "rolling_moments",
    "kcore",
    "snm_candidates",
    "word_length_histogram",
    "kmv_jaccard",
    "daily_autocov",
    "partition_checksums",
    "mutual_knn",
    "name_edit_pairs",
    "cumulative_users",
    "ks_statistic",
    "linkage_features",
    "acctbal_gini",
    "bloom_fp_audit",
    "rolling_median",
    "diversified_topk",
    "above_p90_counts",
    "ship_delay_histogram",
    "name_clusters",
    "ab_lift",
    "km_survival",
    "order_total_reconcile",
    "best_run",
    "dau_overlap",
    "linenumber_gap_audit",
    "nation_median_spend",
    "daily_concentration",
    "jsonl_roundtrip",
    "brand_topk_others",
    "leaderboard_churn",
    "multi_nation_orders",
    "event_type_phi",
    "record_highs",
    "frequent_triples",
    "priority_linestatus",
    "first_event_breakdown",
    "type_breadth_histogram",
    "weekday_residuals",
    "premium_parts_by_brand",
    "halflife_histogram",
    "order_upgrades",
    "repurchase_gap_quantiles",
    "autocomplete_table",
    "daily_p90_median",
    "tenure_spend_corr",
    "two_hop_reach",
    "k_anonymity_audit",
    "prefix_compress_estimate",
    "daily_cross_metrics",
    "cusum_drift",
    "hdr_quantiles",
    "cms_estimates",
    "bpe_first_merges",
    "stopgram_coverage",
    "behavior_signatures",
    "theilsen_trend",
    "compaction_plan",
    "delta_encoding_estimate",
    "simpson_reversal_audit",
    "skipgram_pairs",
    "part_band_pairs",
    "kendall_ingredients",
    "merkle_diff",
    "maxmin_fair_alloc",
    "countsketch_estimates",
    "id_range_runs",
    "weighted_jaccard_sources",
    "top_with_ties",
    "rank_displacement",
    "schema_evolution_union",
    "crawl_politeness_audit",
    "next_word_top",
    "vocab_coverage",
    "joint_decile_grid",
    "periodicity_profile",
    "selectivity_audit",
    "hdr_error_audit",
    "revenue_identity_audit",
    "widest_path",
    "graph_voronoi",
    "margin_of_victory",
    "fd_audit",
    "rolling_xcov",
    "zero_activity_cells",
    "dominance_counts",
    "allen_relations",
    "isotonic_trend",
    "rendezvous_shards",
    "hilbert_layout",
    "markov_stationary",
    "haar_wavelet",
    "changepoint_day",
    "ewma_halving",
    "allpairs_jaccard",
    "interval_scheduling",
    "l_diversity_audit",
    "lis_length",
    "wavelet_synopsis_audit",
    "markov_hitting_truncated",
    "skyline_3d",
    "lru_cache_audit",
    "belady_cache_audit",
    "t_closeness_audit",
    "sax_symbols",
    "cdc_chunks",
    "cdc_dedup_ratio",
    "mann_whitney_u",
    "gorilla_dod_bits",
    "voptimal_histogram",
    "cdc_shared_chunks",
    "layout_prune_compare",
    "lateness_profile",
    "dict_encoding_estimate",
    "dbscan_core_points",
    "cvar_tail",
    "seasonal_naive_error",
    "labeler_kappa",
    "fano_burstiness",
    "rle_encoding_estimate",
    "vbyte_postings_bytes",
    "bitmap_index_estimate",
    "huffman_bits",
    "apportionment",
    "closest_pair",
    "token_budget_select",
    "multi_pattern_counts",
    "text_border_period",
    "set_cover_sources",
    "heaps_vocab_growth",
    "csv_roundtrip",
    "harmonic_centrality",
    "skyband_parts",
    "watermark_trigger_counts",
    "encoding_advisor",
    "ann_recall_audit",
    "diameter_lower_bound",
    "minhash_error_audit",
    "simhash_error_audit",
    "session_timeout_sweep",
    "edge_support",
    "open_orders_daily",
    "dbscan_clusters",
    "lcs_user_pairs",
    "brand_modularity",
    "passage_chunks",
    "rrf_fusion",
    "chao1_estimate",
    "join_order_plan",
    "session_length_quantiles",
    "inclusion_deps",
    "join_sample_audit",
    "behavior_nn",
    "phash_clusters",
    "int8_recall_audit",
    "federated_counts",
    "personalized_pagerank",
    "late_orders_by_priority",
]


def crawl_bench_config():
    from crawlray.engine import EngineConfig
    from crawlray.synth import WorldConfig

    sf = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    defaults = {
        "sf0.001": (2_000, 50, 2),
        "sf0.01": (40_000, 400, 3),
        "sf0.1": (400_000, 3000, 3),
    }
    n_urls, n_seeds, rounds = defaults.get(sf, (20_000, 200, 3))
    n_urls = int(os.environ.get("CRAWL_BENCH_URLS", n_urls))
    n_seeds = int(os.environ.get("CRAWL_BENCH_SEEDS", n_seeds))
    rounds = int(os.environ.get("CRAWL_BENCH_ROUNDS", rounds))
    n_hosts = max(20, n_urls // 400)
    n_parts = int(os.environ.get("CRAWL_BENCH_PARTS", "64"))
    return EngineConfig(
        world=WorldConfig(n_urls=n_urls, n_hosts=n_hosts, politeness_budget=768,
                          page_scale=3),
        n_seeds=n_seeds,
        max_rounds=rounds,
        # identical physical plan at every parallelism level: the scaling
        # run must compare the SAME job, so partition/shard counts are fixed
        n_parts=n_parts,
        n_frontier_parts=16,
        n_seen_shards=16,
        seen_mode="cuckoo",
        seen_capacity=1 << 22,
        fetch_batch_size=512,
        fetch_concurrency=(4, max(8, NUM_CPUS)),
    )


def run_crawl() -> tuple[float, int]:
    """Returns (seconds, urls_fetched) for the timed crawl. A small
    untimed warmup crawl runs first so worker processes / imports / page
    cache are steady-state at every parallelism level (ray_guide: warm
    before measuring)."""
    import dataclasses

    from crawlray.engine import CrawlEngine, EngineConfig
    from crawlray.synth import WorldConfig

    warm_dir = tempfile.mkdtemp(prefix="crawlwarm_")
    try:
        warm_cfg = EngineConfig(
            world=WorldConfig(n_urls=2000, n_hosts=20),
            n_seeds=20, max_rounds=1, n_parts=32, n_frontier_parts=16,
            n_seen_shards=16, seen_mode="cuckoo",
        )
        warm_eng = CrawlEngine(warm_cfg, warm_dir)
        warm_eng.run()
        warm_eng.shutdown()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    out = tempfile.mkdtemp(prefix="crawlbench_")
    try:
        cfg = crawl_bench_config()
        eng = CrawlEngine(cfg, out)
        t0 = time.perf_counter()
        summary = eng.run()
        dt = time.perf_counter() - t0
        eng.shutdown()
        return dt, summary["fetched"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_queries() -> dict[str, float]:
    from crawlray.queries import catalog

    cat = catalog()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = cat[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        # force execution
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_media_bench() -> tuple[float, dict]:
    """Media-at-scale leg (round-4 VERDICT task 8): real-PNG corpus ->
    real dHash -> banded Hamming pairing, with the payload-isolation
    measurement (exchange bytes / payload bytes) recorded in the bench
    JSON so 'payloads never enter an exchange' is a measured claim.
    MEDIA_BENCH_REFS sizes the corpus (default 10k refs ~ 370 MB of
    PNG payloads)."""
    from crawlray.pipelines.media import phash_payload_isolation

    n_refs = int(os.environ.get("MEDIA_BENCH_REFS", "10000"))
    t0 = time.perf_counter()
    iso = phash_payload_isolation(n_refs, family_size=8,
                                  concurrency=min(NUM_CPUS, 16))
    sec = round(time.perf_counter() - t0, 3)
    assert iso["exchange_fraction"] < 0.01, iso   # payloads stayed put
    return sec, iso


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("lineitem", "documents", "embeddings", "events"):
        try:
            pq.read_table(f"{SF_DIR}/{t}.parquet")
        except FileNotFoundError:
            pass

    crawl_sec, crawl_urls = run_crawl()
    queries = run_queries()
    media_sec, media_iso = run_media_bench()
    result = {
        "metric": "crawl_sf_e2e",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": {"crawl": round(crawl_sec, 3),
                    "media_phash_real": media_sec, **queries},
        "sf": SF_DIR.rstrip("/").rsplit("/", 1)[-1],
        "num_cpus": NUM_CPUS,
        "crawl_urls": crawl_urls,
        "crawl_urls_per_sec": round(crawl_urls / crawl_sec, 1),
        "media_isolation": {k: media_iso[k] for k in
                            ("n_refs", "n_pairs", "payload_bytes",
                             "exchange_bytes", "exchange_fraction")},
    }
    print(json.dumps(result))
    ray.shutdown()


def _burn_task(iters: int) -> int:
    x = 0
    for i in range(iters):
        x += i * i
    return x


def burn_speedup(nproc: int, iters: int = 4_000_000) -> float:
    """Effective parallel speedup of a pure-CPU burn at ``nproc`` workers
    — the host-capacity probe. The sandbox advertises 32 vCPUs but
    sustains ~16 effective cores with heavy noisy-neighbor variance;
    probing right before each timed rep makes every scaling draw
    normalizable by the capacity the host ACTUALLY offered during it."""
    import concurrent.futures as cf

    t0 = time.perf_counter()
    _burn_task(iters)
    ser = time.perf_counter() - t0
    with cf.ProcessPoolExecutor(nproc) as ex:
        list(ex.map(_burn_task, [1000] * nproc))      # warm the pool
        t0 = time.perf_counter()
        list(ex.map(_burn_task, [iters] * nproc))
        par = time.perf_counter() - t0
    return nproc * ser / par


def _parse_trace(text: str) -> dict:
    """`[trace r{N}] {step}: {sec}s` lines -> {round: {step: sec}}."""
    out: dict = {}
    for line in text.splitlines():
        if not line.startswith("[trace r"):
            continue
        head, _, rest = line.partition("] ")
        step, _, sec = rest.partition(": ")
        out.setdefault(int(head[len("[trace r"):]), {})[step] = float(sec.rstrip("s"))
    return out


def _soak_round_stats(out_dir: str, n_rounds: int) -> list[dict]:
    """Per-round checkpoint-cost accounting straight off the artifact
    tree: frontier rows/bytes written for round r+1, the round's seen
    DELTA snapshot bytes, corpus/metrics bytes, manifest bytes, and the
    manifest totals. This is the evidence the checkpoint tax stays
    O(new URLs) per round, not O(seen)."""
    import glob as g

    import pyarrow.parquet as pqt

    def dbytes(pat: str) -> int:
        return sum(os.path.getsize(p) for p in g.glob(pat))

    rows = []
    for r in range(n_rounds):
        man_path = f"{out_dir}/manifests/manifest-{r + 1:04d}.json"
        man = json.loads(open(man_path).read())
        fglob = f"{out_dir}/frontier/round-{r + 1:04d}/*.parquet"
        frows = sum(pqt.ParquetFile(p).metadata.num_rows for p in g.glob(fglob))
        rows.append({
            "round": r,
            "urls_in": man["totals"]["urls_in"],
            "new_urls": man["totals"]["new_urls"],
            "next_frontier_rows": frows,
            "next_frontier_bytes": dbytes(fglob),
            "seen_delta_bytes": dbytes(f"{out_dir}/seen/round-{r + 1:04d}/*.bin"),
            "corpus_bytes": dbytes(f"{out_dir}/corpus/round-{r:04d}/part-*"),
            "metrics_bytes": dbytes(f"{out_dir}/metrics/round-{r:04d}/*.parquet"),
            "manifest_bytes": os.path.getsize(man_path),
        })
    return rows


def soak() -> None:
    """Scale-representative soak (round-3 VERDICT tasks 5+7): a world big
    enough that a round's frontier crosses ``driver_threshold`` (2M rows),
    so the fully distributed control plane is BENCHED on its natural
    trigger — run twice, hybrid (driver path below the threshold, dist
    above: the crossover) and driver_threshold=0 (dist everywhere), with
    manifest-byte parity asserted between them. Per-round checkpoint
    costs (seen delta bytes, frontier bytes, snapshot/manifest wall from
    the engine trace) land in the JSON for the BASELINE.md table.

    Env: SOAK_URLS (default 3.5M world), SOAK_SEEDS (default 150k),
    SOAK_ROUNDS (default 3), SOAK_CPUS (default 16)."""
    os.environ["CRAWLRAY_TRACE"] = "1"   # must precede the engine import
    import contextlib
    import dataclasses
    import glob as g
    import io

    import ray

    from crawlray.engine import CrawlEngine, EngineConfig
    from crawlray.synth import WorldConfig

    cpus = int(os.environ.get("SOAK_CPUS", "16"))
    n_urls = int(os.environ.get("SOAK_URLS", "3500000"))
    n_seeds = int(os.environ.get("SOAK_SEEDS", "150000"))
    rounds = int(os.environ.get("SOAK_ROUNDS", "3"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    base = EngineConfig(
        world=WorldConfig(n_urls=n_urls, n_hosts=max(20, n_urls // 400),
                          politeness_budget=768, page_scale=3),
        n_seeds=n_seeds, max_rounds=rounds, n_parts=64, n_frontier_parts=16,
        n_seen_shards=16, seen_mode="cuckoo", seen_capacity=1 << 22,
        fetch_batch_size=512, fetch_concurrency=(4, max(8, cpus)),
    )
    results: dict = {}
    manifests: dict = {}
    for label, cfg in (("hybrid", base),
                       ("dist", dataclasses.replace(base, driver_threshold=0))):
        out = tempfile.mkdtemp(prefix=f"crawlsoak_{label}_")
        try:
            eng = CrawlEngine(cfg, out)
            buf = io.StringIO()
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(buf):
                summary = eng.run()
            dt = time.perf_counter() - t0
            eng.shutdown()
            per_round = _soak_round_stats(out, summary["rounds"])
            trace = _parse_trace(buf.getvalue())
            for row in per_round:
                row["trace_sec"] = trace.get(row["round"], {})
            results[label] = {
                "sec": round(dt, 2),
                "fetched": summary["fetched"],
                "new_urls": summary["new_urls"],
                "seen_total": summary["seen_total"],
                "urls_per_sec": round(summary["fetched"] / dt, 1),
                "rounds": per_round,
            }
            manifests[label] = {
                os.path.basename(p): open(p, "rb").read()
                for p in g.glob(f"{out}/manifests/manifest-*.json")
            }
        finally:
            shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({
        "metric": "crawl_soak",
        "value": results["dist"]["sec"],
        "unit": "sec",
        "num_cpus": cpus,
        "world_urls": n_urls,
        "seeds": n_seeds,
        "driver_threshold": base.driver_threshold,
        "manifest_parity": manifests["hybrid"] == manifests["dist"],
        "hybrid": results["hybrid"],
        "dist": results["dist"],
    }))
    ray.shutdown()


def memsoak() -> None:
    """Memory-headroom soak (round-4 VERDICT task 5): one dist-plane run
    of a world sized to stress the 128 GiB sandbox, recording peak RSS
    (whole-box, /proc/meminfo sampled at 1 Hz), object-store spill
    totals from the Ray session logs, and per-round walls — evidence the
    checkpointed control plane survives memory pressure without OOM.

    Env: MEMSOAK_URLS (default 12M world), MEMSOAK_SEEDS (default 400k),
    MEMSOAK_ROUNDS (default 3), SOAK_CPUS (default 16)."""
    os.environ["CRAWLRAY_TRACE"] = "1"   # must precede the engine import
    import contextlib
    import glob as g
    import io
    import re
    import threading

    import ray

    from crawlray.engine import CrawlEngine, EngineConfig
    from crawlray.synth import WorldConfig

    cpus = int(os.environ.get("SOAK_CPUS", "16"))
    n_urls = int(os.environ.get("MEMSOAK_URLS", "12000000"))
    n_seeds = int(os.environ.get("MEMSOAK_SEEDS", "400000"))
    rounds = int(os.environ.get("MEMSOAK_ROUNDS", "3"))

    def box_used_gib() -> float:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                info[k] = int(v.strip().split()[0])   # kB
        return (info["MemTotal"] - info["MemAvailable"]) / (1024 * 1024)

    peak = {"gib": box_used_gib()}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak["gib"] = max(peak["gib"], box_used_gib())
            stop.wait(1.0)

    base_gib = box_used_gib()
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    cfg = EngineConfig(
        world=WorldConfig(n_urls=n_urls, n_hosts=max(20, n_urls // 400),
                          politeness_budget=768, page_scale=3),
        n_seeds=n_seeds, max_rounds=rounds, n_parts=64,
        n_frontier_parts=32, n_seen_shards=16, seen_mode="cuckoo",
        seen_capacity=1 << 25, fetch_batch_size=512,
        fetch_concurrency=(4, max(8, cpus)), driver_threshold=0,
    )
    out = tempfile.mkdtemp(prefix="crawlmemsoak_")
    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    try:
        eng = CrawlEngine(cfg, out)
        buf = io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            summary = eng.run()
        dt = time.perf_counter() - t0
        eng.shutdown()
        per_round = _soak_round_stats(out, summary["rounds"])
        trace = _parse_trace(buf.getvalue())
        for row in per_round:
            row["trace_sec"] = trace.get(row["round"], {})
    finally:
        stop.set()
        th.join(timeout=3)
        shutil.rmtree(out, ignore_errors=True)
    # object-store spill totals from the session's raylet log
    spilled_mb = 0
    spilled_objects = 0
    try:
        session = os.path.realpath("/tmp/ray/session_latest")
        for p in g.glob(f"{session}/logs/raylet*.out"):
            for m in re.finditer(
                    r"Spilled (\d+) MiB, (\d+) objects", open(p).read()):
                spilled_mb = max(spilled_mb, int(m.group(1)))
                spilled_objects = max(spilled_objects, int(m.group(2)))
    except OSError:
        pass
    print(json.dumps({
        "metric": "crawl_memsoak",
        "value": round(dt, 2),
        "unit": "sec",
        "num_cpus": cpus,
        "world_urls": n_urls,
        "seeds": n_seeds,
        "driver_threshold": 0,
        "fetched": summary["fetched"],
        "new_urls": summary["new_urls"],
        "seen_total": summary["seen_total"],
        "urls_per_sec": round(summary["fetched"] / dt, 1),
        "box_base_gib": round(base_gib, 2),
        "box_peak_gib": round(peak["gib"], 2),
        "peak_delta_gib": round(peak["gib"] - base_gib, 2),
        "spilled_mib": spilled_mb,
        "spilled_objects": spilled_objects,
        "rounds": per_round,
    }))
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            CRAWL_BENCH_ONLY="1",
            # the scale-representative job: rounds big enough that the
            # distributed data plane dominates the round barriers
            CRAWL_BENCH_URLS=os.environ.get("CRAWL_BENCH_URLS", "3000000"),
            CRAWL_BENCH_SEEDS=os.environ.get("CRAWL_BENCH_SEEDS", "8000"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N -> 4N pair sized to the sandbox's REAL parallel capacity: this box
    # exposes 32 vCPUs but sustains ~16 effective cores (measured with a
    # plain multiprocessing burn: 4->3.0x, 8->6.8x, 16->11.6x, 32->15.6x),
    # so 8->32 is hardware-capped at ~0.57 efficiency for perfectly
    # parallel work. 4 vs 16 keeps both levels inside real capacity.
    lo, hi = 4, 16
    # the sandbox shows heavy noisy-neighbor variance (identical 16-cpu
    # runs measured 54.4s and 118.8s on 2026-08-17); noise only ever ADDS
    # time, so min-of-N per level is the sound estimator of quiet-host
    # capability (median reported alongside for robustness). Runs
    # INTERLEAVE lo/hi so both levels sample the same host conditions,
    # and a burn-capacity probe runs before each rep so every draw is
    # normalizable by the parallel capacity the host actually offered.
    import statistics

    reps = int(os.environ.get("SCALING_REPS", "5"))
    runs_lo, runs_hi, probes = [], [], []
    for _ in range(reps):
        cap_lo = burn_speedup(lo)
        cap_hi = burn_speedup(hi)
        probes.append({
            "burn_speedup_lo": round(cap_lo, 2),
            "burn_speedup_hi": round(cap_hi, 2),
            "capacity_ratio": round((cap_hi / cap_lo) / (hi / lo), 3),
        })
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    i_lo = min(range(reps), key=lambda i: runs_lo[i]["value"])
    i_hi = min(range(reps), key=lambda i: runs_hi[i]["value"])
    r_lo, r_hi = runs_lo[i_lo], runs_hi[i_hi]
    thr_lo = r_lo["crawl_urls_per_sec"]
    thr_hi = r_hi["crawl_urls_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    med_lo = statistics.median(r["value"] for r in runs_lo)
    med_hi = statistics.median(r["value"] for r in runs_hi)
    eff_median = (med_lo / med_hi) / (hi / lo)
    # capacity measured at the reps the min draws came from: if the host
    # could only offer e.g. 0.8 of ideal burn scaling during those reps,
    # the job's efficiency is normalized by that observed ceiling
    cap = (probes[i_hi]["burn_speedup_hi"] / probes[i_lo]["burn_speedup_lo"]) / (hi / lo)
    # per-rep paired efficiency: each rep's lo and hi ran back-to-back in
    # the SAME host window, so the pair is noise-matched — the best rep
    # is direct evidence of the engine's own scaling (run 7 recorded a
    # 1.05 pair while the min-of-N raw ratio read 0.76)
    per_rep = [
        round((runs_lo[i]["value"] / runs_hi[i]["value"]) / (hi / lo), 3)
        for i in range(reps)
    ]
    print(
        json.dumps(
            {
                "metric": "crawl_scaling",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "sec_lo_median": med_lo,
                "sec_hi_median": med_hi,
                "urls": r_lo["crawl_urls"],
                "throughput_lo_urls_per_sec": thr_lo,
                "throughput_hi_urls_per_sec": thr_hi,
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_median": round(eff_median, 3),
                "capacity_ratio_min_draws": round(cap, 3),
                "scaling_efficiency_normalized": round(eff / cap, 3),
                "per_rep_efficiency": per_rep,
                "per_rep_efficiency_median": round(statistics.median(per_rep), 3),
                # max over noisy paired ratios is an OPTIMISTIC BOUND
                # (upward-biased); never quote it as the headline number
                "per_rep_efficiency_optimistic_bound": max(per_rep),
                "all_sec_lo": [r["value"] for r in runs_lo],
                "all_sec_hi": [r["value"] for r in runs_hi],
                "capacity_probes": probes,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--soak" in sys.argv:
        soak()
    elif "--memsoak" in sys.argv:
        memsoak()
    else:
        if os.environ.get("CRAWL_BENCH_ONLY"):
            import ray

            ray.init(
                address="local",
                num_cpus=NUM_CPUS,
                include_dashboard=False,
                logging_level="ERROR",
            )
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
            crawl_sec, crawl_urls = run_crawl()
            print(
                json.dumps(
                    {
                        "metric": "crawl_sf_e2e",
                        "value": round(crawl_sec, 3),
                        "unit": "sec",
                        "num_cpus": NUM_CPUS,
                        "crawl_urls": crawl_urls,
                        "crawl_urls_per_sec": round(crawl_urls / crawl_sec, 1),
                    }
                )
            )
            ray.shutdown()
        else:
            main()
