"""Flagship pipeline + cached synthetic page stores for the driver harness.

``entry()`` (via __ray_entry__.py) runs the full crawl engine on a small
deterministic page table: frontier waves → politeness → seen-set actors →
fetch join → zero-copy parse → partitioned analyses, and returns the
analyses as a DataFrame ordered by (wave, pos).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from ..sources.pages import gen_pages_table, make_seed_list
from .crawl import run_crawl

CACHE_DIR = "/tmp/vyntr_ray_cache"


def cached_pages(n_pages: int, seed: int = 42) -> str:
    """Generate (once) and return the path of a synthetic page table."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"pages_n{n_pages}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_pages_table(range(n_pages), n_pages, seed=seed),
                       tmp)
        os.replace(tmp, path)
    return path


def run_flagship(n_pages: int = 600, budget: int = 200, seed: int = 42,
                 workdir: str | None = None, n_shards: int = 4,
                 checkpoint: bool = False) -> pd.DataFrame:
    """Crawl the synthetic web and return analyses ordered by (wave, pos)."""
    import tempfile

    pages_path = cached_pages(n_pages, seed)
    seeds = make_seed_list(n_pages, seed=seed)
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="vyntr_flagship_",
                                   dir=CACHE_DIR)
    run_crawl(pages_path, seeds, workdir, max_pages=budget, seed=seed,
              n_shards=n_shards, checkpoint=checkpoint)
    adir = os.path.join(workdir, "analyses")
    df = pq.read_table(adir).to_pandas()
    return df.sort_values(["wave", "pos"]).reset_index(drop=True)
