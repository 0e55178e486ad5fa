#!/usr/bin/env python
"""Crawl job entrypoint — submit with ``ray job submit``.

    ray job submit --working-dir . -- \
        python scripts/crawl_job.py --pages /data/pages_store \
        --seeds data/sites.txt --workdir /data/crawl_run \
        --max-pages 50000 [--resume] [--load-robots]

Owns the Ray session (library code never calls ray.init); resumes from the
last complete wave checkpoint when ``--resume`` is passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="parquet file or bucketed page store directory")
    ap.add_argument("--seeds", required=True, help="seed list text file")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-pages", type=int, default=50_000)
    ap.add_argument("--max-per-domain", type=int, default=5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-checkpoint", action="store_true")
    ap.add_argument("--load-robots", action="store_true",
                    help="resolve robots.txt rules from the page store")
    ap.add_argument("--preload-pages", action="store_true")
    ap.add_argument("--flaky-tunnel-rate", type=float, default=0.0,
                    help="inject per-attempt tunnel failures (retry-ladder"
                         " exercise; 2 tunnel tries then proxy rotation)")
    ap.add_argument("--flaky-proxy-rate", type=float, default=0.0)
    ap.add_argument("--frontier-actors", type=int, default=None,
                    help="bucket-owning frontier worker actors (link "
                         "feedback, checkpoints and resume restore all "
                         "run as tasks — nothing O(frontier) on the "
                         "driver); omit for the driver-held frontier")
    ap.add_argument("--distributed-links-threshold", type=int,
                    default=100_000,
                    help="waves discovering more links than this run the "
                         "distributed link-feedback path")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; on a cluster omit and connect")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from vyntr_ray.functions.robots import load_robots
    from vyntr_ray.state.politeness import caps_from_delays
    from vyntr_ray.pipelines.crawl import run_crawl
    from vyntr_ray.sources.seeds import read_seed_file

    robots, caps = None, None
    if args.load_robots:
        robots, delays = load_robots(args.pages)
        # Crawl-delay directives become per-wave cap overrides
        caps = caps_from_delays(delays, args.max_per_domain) or None
    seeds = read_seed_file(args.seeds)
    ladder = None
    if args.flaky_tunnel_rate or args.flaky_proxy_rate:
        from vyntr_ray.functions.fetch import HashFlaky, RetryLadder
        ladder = RetryLadder(fail_fn=HashFlaky(
            tunnel_rate=args.flaky_tunnel_rate,
            proxy_rate=args.flaky_proxy_rate))
    stats = run_crawl(
        args.pages, seeds, args.workdir, max_pages=args.max_pages,
        max_per_domain=args.max_per_domain, seed=args.seed,
        robots=robots, domain_caps=caps,
        n_shards=args.n_shards, resume=args.resume,
        checkpoint=not args.no_checkpoint,
        preload_pages=args.preload_pages, fetch_ladder=ladder,
        frontier_actors=args.frontier_actors,
        distributed_links_threshold=args.distributed_links_threshold)
    print(json.dumps({
        "waves": stats.waves, "scheduled": stats.scheduled,
        "fetched": stats.fetched, "failed": stats.failed,
        "discovered": stats.discovered, "retried": stats.retried,
        "seen_total": stats.seen_total,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
