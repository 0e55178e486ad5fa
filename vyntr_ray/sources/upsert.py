"""Keyed parquet upsert sink — the ON CONFLICT (key) DO UPDATE analog.

The reference upserts chunk embeddings into Postgres in batches
(`generate_embeddings.py:347-371,392-415`: ``INSERT ... ON CONFLICT
(url, chunk_id) DO UPDATE``, S9; `merge_embeddings.py:108-130` for the
merged ``(url, embedding)`` table, S10).  SURVEY §2.1 swaps the DB for
parquet; this module provides the actual MERGE semantics over a
hash-partitioned parquet store instead of a blind ``write_parquet``:

- the store is ``store_dir/part=K/data.parquet`` for ``K = md5(key
  tuple) % n_parts`` — the same stable md5 partitioning the page store
  and seen log use, so a row's home partition never depends on cluster
  size or batch order;
- an upsert routes incoming rows to their partitions with ONE
  ``groupby(part)`` shuffle, and each partition group merges
  independently: read the existing partition file, drop existing rows
  whose key collides with an incoming one (DO UPDATE = incoming wins;
  duplicate keys WITHIN the incoming batch keep the lexically-last row
  by sort order, deterministically), concat, sort by key, write to a
  temp file and atomically rename;
- only partitions that received rows are rewritten, so a re-run of the
  same upsert is idempotent and a killed run resumes by re-running the
  whole (deterministic) upsert — the rename is the commit point per
  partition.

Scale notes: ``n_parts`` bounds the per-task merge working set
(store_rows / n_parts); raise it with the store, the shuffle stays one
groupby.  On a multi-node cluster ``store_dir`` must be shared storage
(blob/NFS) — the same requirement every parquet sink has.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["upsert_parquet", "read_store"]


def _part_of(keys: list[tuple], n_parts: int) -> list[int]:
    return [int(hashlib.md5("|".join(str(k) for k in key)
                            .encode("utf-8")).hexdigest()[:8], 16) % n_parts
            for key in keys]


def upsert_parquet(ds, store_dir: str, key_cols: list[str],
                   n_parts: int = 32):
    """Merge ``ds`` into the keyed parquet store; returns per-partition
    stats ``(part, n_incoming, n_replaced, n_total)`` as a Dataset
    (consuming it executes the upsert)."""
    import pandas as pd

    os.makedirs(store_dir, exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        keys = list(zip(*(t[c].to_pylist() for c in key_cols)))
        return t.append_column(
            "__part", pa.array(_part_of(keys, n_parts), pa.int32()))

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        part = int(g["__part"].iloc[0])
        inc = (g.drop(columns="__part")
               .sort_values(key_cols, kind="mergesort")
               .drop_duplicates(key_cols, keep="last"))
        pdir = os.path.join(store_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, "data.parquet")
        replaced = 0
        if os.path.exists(path):
            cur = pq.read_table(path).to_pandas()
            mask = cur.set_index(key_cols).index.isin(
                inc.set_index(key_cols).index)
            replaced = int(mask.sum())
            merged = pd.concat([cur[~mask], inc], ignore_index=True)
        else:
            merged = inc
        merged = merged.sort_values(key_cols, kind="mergesort")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(merged.reset_index(drop=True),
                                            preserve_index=False), tmp)
        os.replace(tmp, path)  # atomic commit point for this partition
        return pd.DataFrame({"part": [part],
                             "n_incoming": [len(inc)],
                             "n_replaced": [replaced],
                             "n_total": [len(merged)]})

    return (ds.map_batches(route, batch_format="pyarrow")
            .groupby("__part").map_groups(merge, batch_format="pandas"))


def read_store(store_dir: str):
    """Read the whole store back as a Dataset (partition-pruned reads go
    straight to ``store_dir/part=K/data.parquet``)."""
    import ray.data as rd
    return rd.read_parquet(store_dir)
