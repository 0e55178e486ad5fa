"""Key-range-bucketed parquet export with a zone-map manifest.

The scale-path sink for point/range lookups over an exported table:
rows land in ``key // width`` buckets, each bucket is ONE parquet file
written sorted by key (temp-file + atomic rename, so a killed export
leaves no partial file and finished buckets survive a rerun — the
shuffle_export resumability contract), and the manifest carries
(bucket, min_key, max_key, n) — the zone map.  A reader consults the
manifest and touches only the files whose [min, max] covers its probe,
the same pruning the fused crawl fetch does with parquet row-group
stats (pipelines/crawl.py) but made explicit and engine-independent.

At 100 TB the bucket count scales with the key range (thousands of
object-store-block-sized files); bucket IS the partition key, so each
file is written by exactly one groupby partition — the bounded-group
case where groupby + map_groups is the right shape.

No reference counterpart (the reference's sinks are JSONL batches and
SQL upserts); SURVEY §2.9 training-analytics additions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["zonemap_export", "zonemap_lookup"]


def zonemap_export(ds, out_dir: str, key_col: str, width: int):
    """Export ``ds`` bucketed by ``key_col // width``; return the
    manifest (bucket, min_key, max_key, n) sorted by bucket.  The
    manifest is also written to ``out_dir/_manifest.parquet``."""
    os.makedirs(out_dir, exist_ok=True)

    def bucketize(t: pa.Table) -> pa.Table:
        # integer floor division (float division loses exactness > 2^53)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_bucket", pa.array(k // width, pa.int64()))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = (g.drop(columns="_bucket")
             .sort_values(key_col, kind="mergesort"))
        path = os.path.join(out_dir, f"bucket={b:08d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        k = g[key_col].to_numpy()
        return pd.DataFrame({
            "bucket": np.array([b], dtype="int64"),
            "min_key": np.array([k.min()], dtype="int64"),
            "max_key": np.array([k.max()], dtype="int64"),
            "n": np.array([len(g)], dtype="int64")})

    man = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(write_bucket, batch_format="pandas")
           .to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    mpath = os.path.join(out_dir, "_manifest.parquet")
    tmp = mpath + f".tmp{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(man, preserve_index=False), tmp)
    os.replace(tmp, mpath)
    return man


def zonemap_lookup(out_dir: str, key_col: str, keys: list[int]):
    """Read ONLY the bucket files whose zone covers a probed key —
    O(matched buckets) I/O regardless of table size.  Returns the
    matching rows as one pandas frame (probe results are small by
    contract)."""
    man = pq.read_table(os.path.join(out_dir, "_manifest.parquet"))
    mm = man.to_pandas()
    out = []
    ks = sorted(set(int(k) for k in keys))
    hit = mm[(mm["min_key"] <= max(ks)) & (mm["max_key"] >= min(ks))]
    for _, r in hit.iterrows():
        want = [k for k in ks if r["min_key"] <= k <= r["max_key"]]
        if not want:
            continue
        path = os.path.join(out_dir, f"bucket={int(r['bucket']):08d}.parquet")
        t = pq.read_table(path)
        import pyarrow.compute as pc
        t = t.filter(pc.is_in(t[key_col], value_set=pa.array(want)))
        if t.num_rows:
            out.append(t.to_pandas())
    if not out:
        return pd.DataFrame()
    return (pd.concat(out, ignore_index=True)
            .sort_values(key_col, kind="mergesort").reset_index(drop=True))
