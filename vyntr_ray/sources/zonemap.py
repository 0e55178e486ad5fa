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

__all__ = ["zonemap_export", "zonemap_lookup",
           "zorder_export", "zorder_lookup", "zorder_sql_expr",
           "range_export", "export_splitters", "copartition_join"]


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


def _interleave_bits(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Morton/Z-order interleave of two ``bits``-wide non-negative int64
    arrays: x occupies even bit slots, y odd — vectorized, 2·bits ≤ 62."""
    z = np.zeros(len(x), np.int64)
    one = np.int64(1)
    for i in range(bits):
        z |= ((x >> np.int64(i)) & one) << np.int64(2 * i)
        z |= ((y >> np.int64(i)) & one) << np.int64(2 * i + 1)
    return z


def zorder_sql_expr(xcol: str, ycol: str, bits: int) -> str:
    """The identical interleave as a SQL expression (oracle parity)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xcol} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({ycol} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_export(ds, out_dir: str, x_col: str, y_col: str,
                  bits: int = 21, width: int = 1 << 26):
    """Two-dimensional sibling of :func:`zonemap_export`: rows sort on
    the Morton (Z-order) interleave of two int columns, bucket by
    ``z // width``, one atomically-renamed parquet per bucket, manifest
    = (bucket, min/max z, min/max of BOTH dims, n).  Z-order keeps
    2-D-close rows file-close, so the manifest prunes on EITHER
    dimension — the Delta/Iceberg ``ZORDER BY`` layout primitive,
    which a 100-TB multi-tenant table needs where 1-D zone maps only
    serve one predicate column.

    Same bounded-group write shape as zonemap_export (bucket IS the
    partition).  Inputs must fit ``bits`` (raises loudly — widen bits,
    2·bits ≤ 62, rather than silently wrapping)."""
    os.makedirs(out_dir, exist_ok=True)
    lim = np.int64(1) << np.int64(bits)

    def bucketize(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 0 or y.min() < 0 or x.max() >= lim
                       or y.max() >= lim):
            raise ValueError(f"zorder_export: values exceed {bits} bits")
        z = _interleave_bits(x, y, bits)
        return (t.append_column("_z", pa.array(z, pa.int64()))
                .append_column("_bucket", pa.array(z // width, pa.int64())))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = g.sort_values("_z", kind="mergesort")
        path = os.path.join(out_dir, f"zbucket={b:08d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(
            g.drop(columns="_bucket"), preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({
            "bucket": np.array([b], dtype="int64"),
            "min_z": [int(g["_z"].min())], "max_z": [int(g["_z"].max())],
            "min_x": [int(g[x_col].min())], "max_x": [int(g[x_col].max())],
            "min_y": [int(g[y_col].min())], "max_y": [int(g[y_col].max())],
            "n": np.array([len(g)], dtype="int64")})

    man = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(write_bucket, batch_format="pandas")
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    for c in man.columns:
        man[c] = man[c].astype("int64")
    mpath = os.path.join(out_dir, "_manifest.parquet")
    tmp = mpath + f".tmp{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(man, preserve_index=False), tmp)
    os.replace(tmp, mpath)
    return man


def zorder_lookup(out_dir: str, x_col: str, y_col: str,
                  x_range: tuple, y_range: tuple,
                  _stats: dict | None = None) -> pd.DataFrame:
    """Rectangle probe: read ONLY bucket files whose (min/max x, min/max
    y) box intersects the query rectangle — either dimension prunes.
    ``_stats`` (tests) receives files_total / files_read."""
    man = pq.read_table(
        os.path.join(out_dir, "_manifest.parquet")).to_pandas()
    hit = man[(man["max_x"] >= x_range[0]) & (man["min_x"] <= x_range[1])
              & (man["max_y"] >= y_range[0]) & (man["min_y"] <= y_range[1])]
    if _stats is not None:
        _stats["files_total"] = len(man)
        _stats["files_read"] = len(hit)
    out = []
    for b in hit["bucket"]:
        t = pq.read_table(
            os.path.join(out_dir, f"zbucket={int(b):08d}.parquet"))
        df = t.to_pandas()
        out.append(df[(df[x_col] >= x_range[0]) & (df[x_col] <= x_range[1])
                      & (df[y_col] >= y_range[0])
                      & (df[y_col] <= y_range[1])])
    if not out:
        return pd.DataFrame()
    return pd.concat(out, ignore_index=True)


def range_export(ds, out_dir: str, key_col: str, n_buckets: int = 8,
                 splits: "np.ndarray | None" = None):
    """Balanced range-partitioned sorted export — the sampled-splitter
    TeraSort layout made EXACT: splitters are the true NTILE boundary
    keys (``quantile_disc(i/B)``, selected distributedly by
    ``rank_select`` — the driver sees B-1 rows), so bucket sizes stay
    ~n/B regardless of key skew, where :func:`zonemap_export`'s fixed
    ``key // width`` buckets balloon under a hot key range.  Bucket
    membership is a pure function of the key (count of splitters < key,
    ties stay low) so a SQL oracle replays the manifest exactly.

    Same atomic per-bucket write + (bucket, min, max, n) manifest
    contract as zonemap_export."""
    from vyntr_ray.stages.dataset_tools import rank_select

    os.makedirs(out_dir, exist_ok=True)
    base = ds.materialize()               # count + sort + bucket passes
    if splits is None:
        n = base.count()
        # ceil(i*n/B) - 1 == the quantile_disc(i/B) selection rank
        ranks = [(i * n + n_buckets - 1) // n_buckets - 1
                 for i in range(1, n_buckets)]
        splits = np.array([r[key_col] for r in
                           rank_select(base, [key_col], ranks)], np.int64)
    else:
        # caller-shared splitters: two tables exported with the SAME
        # splits are bucket-aligned -> copartition_join needs no shuffle
        splits = np.asarray(splits, np.int64)

    def bucketize(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.searchsorted(splits, k, side="left")  # = #(splits < k)
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = (g.drop(columns="_bucket")
             .sort_values(key_col, kind="mergesort"))
        path = os.path.join(out_dir, f"rbucket={b:08d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        k = g[key_col].to_numpy()
        return pd.DataFrame({
            "bucket": np.array([b], dtype="int64"),
            "min_key": np.array([k.min()], dtype="int64"),
            "max_key": np.array([k.max()], dtype="int64"),
            "n": np.array([len(g)], dtype="int64")})

    man = (base.map_batches(bucketize, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(write_bucket, batch_format="pandas")
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    mpath = os.path.join(out_dir, "_manifest.parquet")
    tmp = mpath + f".tmp{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(man, preserve_index=False), tmp)
    os.replace(tmp, mpath)
    return man


def export_splitters(ds, key_col: str, n_buckets: int = 8) -> np.ndarray:
    """The exact NTILE splitter keys :func:`range_export` would derive —
    exposed so several tables can export BUCKET-ALIGNED on one shared
    key space (the co-partitioned-layout contract)."""
    from vyntr_ray.stages.dataset_tools import rank_select

    base = ds.materialize()
    n = base.count()
    ranks = [(i * n + n_buckets - 1) // n_buckets - 1
             for i in range(1, n_buckets)]
    return np.array([r[key_col] for r in
                     rank_select(base, [key_col], ranks)], np.int64)


def copartition_join(dir_a: str, dir_b: str, key_col: str,
                     _stats: dict | None = None):
    """SHUFFLE-FREE equi-join of two :func:`range_export` layouts built
    with the SAME splitters: bucket i of A can only match bucket i of
    B, so the join is one raw task per bucket pair reading exactly two
    files — the co-partitioned-table join every warehouse ships
    (bucketed tables / storage-partitioned joins), here explicit.  At
    100 TB this is the difference between re-shuffling both fact
    tables per join and paying the shuffle ONCE at layout time.

    Inner semantics; buckets present on one side only are skipped
    (nothing to match).  Returns a Dataset of the pandas-merged rows;
    ``_stats`` (tests) receives the bucket-pair count."""
    import ray
    import ray.data as rd

    ma = pq.read_table(os.path.join(dir_a, "_manifest.parquet")) \
        .to_pandas()
    mb = pq.read_table(os.path.join(dir_b, "_manifest.parquet")) \
        .to_pandas()
    common = sorted(set(ma["bucket"].astype(int))
                    & set(mb["bucket"].astype(int)))
    if _stats is not None:
        _stats["bucket_pairs"] = len(common)
    if not common:                       # disjoint layouts: empty join
        import ray.data as rd
        return rd.from_items([])

    @ray.remote(num_cpus=0.5)
    def join_bucket(fa: str, fb: str):
        a = pq.read_table(fa).to_pandas()
        b = pq.read_table(fb).to_pandas()
        return pa.Table.from_pandas(a.merge(b, on=key_col),
                                    preserve_index=False)

    refs = [join_bucket.remote(
        os.path.join(dir_a, f"rbucket={b:08d}.parquet"),
        os.path.join(dir_b, f"rbucket={b:08d}.parquet"))
        for b in common]
    return rd.from_arrow_refs(refs)
