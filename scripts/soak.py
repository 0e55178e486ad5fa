#!/usr/bin/env python
"""Large-scale crawl soak: N-page corpus, all features on, forced spill.

    python scripts/soak.py --pages 1000000 --budget 600000 \
        [--num-cpus 16] [--mem-rows 200000] [--hot-rows 50000] \
        [--all-features]

Builds (once, cached) a rich bucketed page store, then crawls it with the
scale-path features enabled: frontier spilling (mem_rows forced low),
hot-host split, distributed per-bucket politeness selection, distributed
link dedup, per-wave checkpoints.  Prints one JSON line with throughput.
Owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--budget", type=int, default=600_000)
    ap.add_argument("--hosts", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--mem-rows", type=int, default=200_000)
    ap.add_argument("--hot-rows", type=int, default=50_000)
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--frontier-actors", type=int, default=None,
                    help="bucket-owning frontier worker actors (r3): link "
                         "feedback, frontier state and checkpoints never "
                         "pass through the driver")
    ap.add_argument("--all-features", action="store_true",
                    help="distributed select + checkpoints + low link "
                         "threshold (distributed link dedup)")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="compact each seen-log shard every N waves "
                         "(run_crawl compact_seen_every)")
    ap.add_argument("--disk", action="store_true",
                    help="disk-resident fetch (pruned parquet lookup "
                         "join) instead of object-store preload — the "
                         "path a corpus bigger than the object store "
                         "pays; preload at 4M+ rich pages (~24 GB html) "
                         "overflows a 37 GiB store and measures spill "
                         "I/O, not the engine")
    args = ap.parse_args()
    hosts = args.hosts or args.pages // 20

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from vyntr_ray.pipelines.crawl import run_crawl
    from vyntr_ray.pipelines.flagship import CACHE_DIR
    from vyntr_ray.sources.pages import make_seed_list, write_pages_store

    store = os.path.join(CACHE_DIR,
                         f"pages_store_rich_n{args.pages}_h{hosts}")
    marker = os.path.join(store, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(store, ignore_errors=True)
        t0 = time.perf_counter()
        write_pages_store(args.pages, store, n_hosts=hosts, rich=True)
        open(marker, "w").close()
        print(f"store built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    seeds = make_seed_list(args.pages, n_hosts=hosts, n_seeds=args.seeds)
    workdir = tempfile.mkdtemp(prefix="soak_")
    feat = {}
    if args.all_features:
        feat = dict(distributed_select=True, checkpoint=True,
                    distributed_links_threshold=50_000)
    else:
        feat = dict(checkpoint=False)
    import resource
    rss_before_mb = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                     / 1024)
    t0 = time.perf_counter()
    stats = run_crawl(store, seeds, workdir, max_pages=args.budget,
                      seed=42, n_shards=args.n_shards,
                      keep_schedule=False, preload_pages=not args.disk,
                      frontier_buckets=args.buckets,
                      frontier_mem_rows=args.mem_rows,
                      frontier_hot_rows=args.hot_rows,
                      frontier_actors=args.frontier_actors,
                      compact_seen_every=args.compact_every, **feat)
    dt = time.perf_counter() - t0
    # driver-process PEAK RSS over the whole crawl — the flat-driver-RSS
    # evidence for the actor-frontier tier (link feedback + frontier state
    # off the driver); compare with/without --frontier-actors
    rss_peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    import glob
    spill_dirs = glob.glob(os.path.join(workdir, "frontier_spill",
                                        "bucket=*"))
    host_splits = glob.glob(os.path.join(workdir, "frontier_spill",
                                         "bucket=*", "host-*"))
    print(json.dumps({
        "pages": args.pages, "budget": args.budget, "hosts": hosts,
        "num_cpus": args.num_cpus, "mem_rows": args.mem_rows,
        "all_features": bool(args.all_features),
        "waves": stats.waves, "scheduled": stats.scheduled,
        "fetched": stats.fetched, "discovered": stats.discovered,
        "sec": round(dt, 1),
        "urls_per_sec": round(stats.scheduled / dt, 1),
        "spill_buckets": len(spill_dirs),
        "hot_host_splits": len(host_splits),
        "frontier_actors": args.frontier_actors,
        "compact_every": args.compact_every,
        "driver_rss_before_mb": round(rss_before_mb, 1),
        "driver_rss_peak_mb": round(rss_peak_mb, 1),
    }))
    import shutil
    shutil.rmtree(workdir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
