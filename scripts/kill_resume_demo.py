#!/usr/bin/env python
"""Crash-resume equivalence demo: SIGKILL a crawl mid-run, resume it,
and diff the full schedule log against an uninterrupted reference.

    python scripts/kill_resume_demo.py [--pages 500000] [--budget 300000]
        [--kill-after 40] [--num-cpus 16]

Unlike the pytest resume test (which interrupts gracefully at a budget
boundary), this sends SIGKILL to the whole process group mid-wave — the
checkpoint manifest's atomic rename is the commit point, and partial
wave output must be discarded and re-run identically.  Prints one JSON
line with match=true/false.  Owns its Ray sessions (subprocesses).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RUNNER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from vyntr_ray.pipelines.crawl import run_crawl
from vyntr_ray.pipelines.flagship import CACHE_DIR
from vyntr_ray.sources.pages import make_seed_list, write_pages_store
store = os.path.join(CACHE_DIR, "pages_store_rich_n{pages}_h{hosts}")
if not os.path.exists(os.path.join(store, "_COMPLETE")):
    import shutil
    shutil.rmtree(store, ignore_errors=True)
    write_pages_store({pages}, store, n_hosts={hosts}, rich=True)
    open(os.path.join(store, "_COMPLETE"), "w").close()
seeds = make_seed_list({pages}, n_hosts={hosts}, n_seeds=50)
stats = run_crawl(store, seeds, {wd!r}, max_pages={budget}, seed=42,
                  n_shards=8, keep_schedule=True, checkpoint=True,
                  preload_pages=True, resume={resume},
                  distributed_links_threshold={thr},
                  frontier_actors={actors})
print("DONE", stats.scheduled, stats.fetched, stats.waves)
ray.shutdown()
"""


def _spawn(args, wd: str, resume: bool) -> subprocess.Popen:
    code = _RUNNER.format(repo=REPO, cpus=args.num_cpus, pages=args.pages,
                          hosts=args.pages // 20, wd=wd,
                          budget=args.budget, resume=resume,
                          thr=0 if args.distributed else 100_000,
                          actors=2 if args.distributed else None)
    return subprocess.Popen([sys.executable, "-c", code],
                            start_new_session=True,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)


def _schedule(wd: str):
    import pandas as pd
    import pyarrow.dataset as pads
    t = pads.dataset(os.path.join(wd, "schedule")).to_table()
    df = t.to_pandas()[["wave", "position", "url", "status"]]
    return (df.astype({"wave": "int64", "position": "int64"})
            .sort_values(["wave", "position"]).reset_index(drop=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=500_000)
    ap.add_argument("--budget", type=int, default=300_000)
    ap.add_argument("--kill-after", type=float, default=40.0)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--distributed", action="store_true",
                    help="kill the SCALE tier: actor frontier + "
                         "distributed link dedup + task-side schedule "
                         "writes (threshold=0, frontier_actors=2) — "
                         "proves the tmp+rename schedule parts and "
                         "per-worker checkpoints survive SIGKILL")
    args = ap.parse_args()

    wd_ref = tempfile.mkdtemp(prefix="kr_ref_")
    wd_kill = tempfile.mkdtemp(prefix="kr_kill_")

    t0 = time.perf_counter()
    ref = _spawn(args, wd_ref, resume=False)
    out, _ = ref.communicate()
    assert ref.returncode == 0, out
    ref_s = time.perf_counter() - t0
    print(f"reference: {out.strip().splitlines()[-1]} in {ref_s:.1f}s",
          file=sys.stderr)

    victim = _spawn(args, wd_kill, resume=False)
    time.sleep(args.kill_after)
    os.killpg(os.getpgid(victim.pid), signal.SIGKILL)
    victim.wait()
    print(f"victim SIGKILLed after {args.kill_after}s "
          f"(rc={victim.returncode})", file=sys.stderr)

    resumer = _spawn(args, wd_kill, resume=True)
    out2, _ = resumer.communicate()
    assert resumer.returncode == 0, out2
    print(f"resumed: {out2.strip().splitlines()[-1]}", file=sys.stderr)

    a, b = _schedule(wd_ref), _schedule(wd_kill)
    match = a.equals(b)
    print(json.dumps({"pages": args.pages, "budget": args.budget,
                      "kill_after_s": args.kill_after,
                      "distributed": bool(args.distributed),
                      "rows_ref": len(a), "rows_resumed": len(b),
                      "match": bool(match)}))
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())
