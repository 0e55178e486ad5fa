"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR at $RAY_GRAFT_CPUS.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "crawl_urls_per_sec": ...}

--scaling: runs the headline crawl at two parallelism levels (default
num_cpus=4 and 16 — N vs 4N; ~16 effective cores here) in fresh processes
on the same input, best-of-3 per level, and reports throughputs + scaling
efficiency (the sandbox stand-in for the N vs 4N cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench corpus scale: enough pages that the crawl does real distributed work
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "100000"))
BENCH_BUDGET = int(os.environ.get("GRAFT_BENCH_BUDGET", "40000"))
BENCH_HOSTS = int(os.environ.get("GRAFT_BENCH_HOSTS", str(BENCH_PAGES // 20)))
SCALE_LEVELS = [int(x) for x in os.environ.get(
    "GRAFT_SCALE_LEVELS", "4,16").split(",")]
# --scaling uses a larger budget so BOTH levels are compute-dominated, not
# floored by the ~0.5 s/wave fixed cost (job launch + seen-actor round) —
# re-sized upward after the fast extractor halved per-page parse
# (see PERF.md; the 200k/400k/800k ladder is reported in BASELINE.md)
SCALE_PAGES = os.environ.get("GRAFT_SCALE_PAGES", "800000")
SCALE_BUDGET = os.environ.get("GRAFT_SCALE_BUDGET", "640000")
# bucket-owning frontier actors (the multi-node design: link feedback,
# frontier state and selection never pass through the driver); 0 = the
# driver-resident BucketedFrontier
BENCH_ACTORS = int(os.environ.get("GRAFT_BENCH_ACTORS", "0")) or None


def _init_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _bench_pages_store() -> str:
    """Build (once) the bucketed page store used by the crawl bench."""
    from vyntr_ray.pipelines.flagship import CACHE_DIR
    from vyntr_ray.sources.pages import write_pages_store
    os.makedirs(CACHE_DIR, exist_ok=True)
    store = os.path.join(
        CACHE_DIR, f"pages_store_rich_n{BENCH_PAGES}_h{BENCH_HOSTS}")
    marker = os.path.join(store, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(store, ignore_errors=True)
        write_pages_store(BENCH_PAGES, store, n_hosts=BENCH_HOSTS, rich=True)
        open(marker, "w").close()
    return store


def bench_crawl(preload: bool = True) -> dict:
    """One crawl run.  ``preload=True`` = corpus resident in the object
    store (the stand-in for network fetch — a live crawler pays the
    network, not a per-wave parquet scan); ``preload=False`` = the
    disk-resident pruned-parquet lookup path (what a 100 TB corpus that
    can't be object-store-resident would pay).  Both are reported."""
    import shutil
    import tempfile

    from vyntr_ray.pipelines.crawl import run_crawl
    from vyntr_ray.sources.pages import make_seed_list

    store = _bench_pages_store()
    seeds = make_seed_list(BENCH_PAGES, n_hosts=BENCH_HOSTS,
                           n_seeds=50)
    workdir = tempfile.mkdtemp(prefix="bench_crawl_")
    # warm the worker pool (process startup otherwise lands in wave 0)
    import ray.data as rd
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow").count()
    t0 = time.perf_counter()
    stats = run_crawl(store, seeds, workdir, max_pages=BENCH_BUDGET,
                      seed=42, n_shards=8, checkpoint=False,
                      keep_schedule=False, preload_pages=preload,
                      frontier_actors=BENCH_ACTORS)
    dt = time.perf_counter() - t0
    shutil.rmtree(workdir, ignore_errors=True)
    return {"sec": dt, "scheduled": stats.scheduled,
            "fetched": stats.fetched, "waves": stats.waves,
            "urls_per_sec": stats.scheduled / dt}


def bench_queries(repeats: int = 2) -> dict:
    """Headline downstream pipelines over the sf dir — best-of-``repeats``
    per pipeline (the r2 driver snapshot regressed 2-4x purely on ambient
    load; min-of-N damps that without hiding real regressions)."""
    import __ray_entry__ as em

    names = ["clean_content", "topk_largest", "dedup_exact", "token_totals",
             "index_prep", "mean_pool_embeddings", "chunk_documents",
             "ann_topk", "tpch_q1ish", "events_window", "quality_scores",
             "minhash_dups", "bm25_topk", "bm25_fielded", "ivf_ann",
             "knn_join",
             "decontaminate", "repetition_scores", "asof_join",
             "range_join", "components", "scrub_pii", "pagerank",
             "stratified_sample", "value_quantiles_tdigest",
             "pack_sequences", "unigram_logprob", "dup_substrings",
             "dup_clusters", "dsir_weights", "chunk_upsert",
             "curate", "ngram_counts", "group_zscores", "tfidf_keywords",
             "tpch_q5ish", "qty_discount_corr", "frequent_tokens",
             "funnel", "retention", "tpch_q18ish", "tpch_q4ish",
             "bigram_pmi", "tpch_q13ish", "tpch_q16ish", "running_total",
             "value_quantiles_cont", "regex_extract", "tpch_q7ish",
             "rollup_counts", "group_ranks", "tpch_q2ish", "user_set_ops",
             "bm25_phrase", "search_boolean", "paragraph_dedup",
             "tpch_q6ish", "tpch_q10ish", "tpch_q14ish", "tpch_q17ish",
             "tpch_q19ish", "tpch_q22ish", "shuffle_export",
             "tpch_q8ish", "tpch_q9ish", "tpch_q11ish", "tpch_q12ish",
             "tpch_q15ish", "tpch_q20ish", "tpch_q21ish",
             "anti_join_bloom",
             "merge_intervals", "cumulative_distinct", "skyline_orders",
             "group_regression", "unpivot_measures", "percentile_ranks",
             "cube_counts", "table_profile", "fuzzy_dup_pairs",
             "zonemap_export", "hits", "weighted_sample", "grouping_sets",
             "left_join_returns", "active_customers", "daily_reconcile",
             "active_customers_bloom", "value_pivot", "first_last",
             "time_weighted_avg",
             "ab_ttest", "gaps_islands", "event_throttle",
             "scd2_intervals", "group_median", "weekday_bitmap",
             "embedding_norms", "readability", "group_mad", "last_touch",
             "watermark_filter", "next_event_gap", "session_paths",
             "gap_fill_months", "monthly_growth",
             "rfm_segments", "bfs_hops", "triangle_count",
             "rolling_sum_time", "basket_pairs", "search_snippets",
             "suggest_terms",
             "token_entropy", "ohlc_bars", "iqr_outliers",
             "degree_histogram", "jaccard_rerank",
             "rolling_outliers", "kcore", "cdc_apply",
             "dedup_incremental", "key_skew", "zorder_export",
             "assoc_rules", "range_export", "group_topk_ties",
             "srp_partition", "window_join",
             "dataset_split", "chi2_independence", "copartition_join",
             "novelty_scores", "winsorized_stats", "nearest_join",
             "rolling_median",
             "event_markov", "interval_coverage", "window_distinct",
             "cms_freq", "sssp", "systematic_sample", "lift_table",
             "locf_fill", "itemsets3", "hll_intersect",
             "degree_assortativity", "trending_items", "distinctive_terms",
             "conversion_lag", "monthly_share", "lsh_lookup",
             "ks_drift", "gini_index", "heatmap_bins", "mwu_drift",
             "bloom_probe", "tfidf_topk", "fk_orphans",
             "json_field_stats", "embedding_covariance", "rrf_fusion",
             "minhash_accuracy", "bigram_logprob", "clustering_coeff",
             "path_topk", "pmi_pairs", "benford_deviation",
             "group_moments", "autocorr_daily", "mahalanobis2",
             "lerp_fill", "schema_evolution_read", "diversified_topk",
             "source_vocab_overlap", "markov_stationary",
             "pretrain_pipeline", "lateness_quantiles",
             "forecast_naive_error", "bitmap_lookup",
             "day_churn_jaccard", "wilson_ranking",
             "poisson_bootstrap", "chunk_digests",
             "bm25_tantivy", "butterfly_count", "kmv_distinct",
             "dup_rate_by_source", "containment_dups", "join_size_est",
             "mutual_nn", "bow_dedup", "token_diversity"]
    qs = em.queries()
    out = {}
    for _ in range(max(1, repeats)):
        for name in names:
            t0 = time.perf_counter()
            res = qs[name](SF_DIR)
            # consume: Datasets are lazy — count() forces full execution
            if hasattr(res, "count"):
                res.count()
            dt = round(time.perf_counter() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
    return out


def main() -> dict:
    _init_ray()
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    # best-of-N crawls (fastest run = least ambient-noise-contaminated;
    # every run crawls the identical schedule, parity-tested)
    crawl = min((bench_crawl(preload=True) for _ in range(repeats)),
                key=lambda r: r["sec"])
    crawl_disk = min((bench_crawl(preload=False) for _ in range(repeats)),
                     key=lambda r: r["sec"])
    queries = bench_queries(
        repeats=int(os.environ.get("GRAFT_BENCH_QUERY_REPEATS", "2")))
    total = round(crawl["sec"] + crawl_disk["sec"] + sum(queries.values()), 3)
    result = {
        "metric": "vyntr_ray headline: crawl + downstream pipelines",
        "value": total,
        "unit": "sec",
        "queries": {"crawl": round(crawl["sec"], 3),
                    "crawl_disk": round(crawl_disk["sec"], 3), **queries},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": round(crawl["urls_per_sec"], 1),
        "crawl_disk_urls_per_sec": round(crawl_disk["urls_per_sec"], 1),
        "crawl_scheduled": crawl["scheduled"],
        "crawl_fetched": crawl["fetched"],
        "crawl_waves": crawl["waves"],
    }
    print(json.dumps(result))
    return result


def scaling() -> None:
    """Same crawl job at two parallelism levels in fresh processes.

    Levels default to 4 and 16 (N vs 4N): this sandbox exposes ~16
    effective cores, so 8-vs-32 would be capped by physical contention,
    not by the engine.
    """
    levels = SCALE_LEVELS
    runs = {}
    global BENCH_PAGES, BENCH_BUDGET, BENCH_HOSTS
    BENCH_PAGES, BENCH_BUDGET = int(SCALE_PAGES), int(SCALE_BUDGET)
    BENCH_HOSTS = BENCH_PAGES // 20
    _init_ray()
    _bench_pages_store()  # build once, warm page cache
    import ray
    ray.shutdown()
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
    for n in levels:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   GRAFT_BENCH_ONLY_CRAWL="1",
                   GRAFT_BENCH_PAGES=SCALE_PAGES,
                   GRAFT_BENCH_BUDGET=SCALE_BUDGET)
        runs[n] = []
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__))).stdout
            runs[n].append(
                json.loads(out.strip().splitlines()[-1])["crawl_urls_per_sec"])
    # best-of-N per level: damps scheduler/page-cache noise (~±10% here);
    # every raw measurement is reported alongside
    thr = {n: max(runs[n]) for n in levels}
    eff = (thr[levels[1]] / thr[levels[0]]) / (levels[1] / levels[0])
    print(json.dumps({
        "metric": "crawl frontier throughput scaling",
        "urls_per_sec": thr,
        "all_runs": runs,
        "cpus": levels,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif os.environ.get("GRAFT_BENCH_ONLY_CRAWL"):
        _init_ray()
        crawl = bench_crawl()
        print(json.dumps({
            "metric": "crawl only", "value": round(crawl["sec"], 3),
            "unit": "sec", "num_cpus": NUM_CPUS,
            "crawl_urls_per_sec": round(crawl["urls_per_sec"], 1),
            "queries": {"crawl": round(crawl["sec"], 3)},
        }))
    else:
        main()
    import ray
    ray.shutdown()
