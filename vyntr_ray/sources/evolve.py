"""Schema-evolution parquet source — UNION BY NAME over generations.

A long-lived lakehouse table accretes columns: generation 1 shards were
written before a column existed, generation 2 adds it.  A reader that
requires one fixed schema either fails on the old shards or silently
drops them; the lakehouse convention (Delta/Iceberg schema evolution,
DuckDB ``UNION BY NAME``) is to align columns BY NAME and fill the
missing ones with declared defaults.

``read_union_by_name`` does that Ray-Data-first: one ``read_parquet``
per generation directory (columns pruned to what that generation has),
a vectorized per-batch align stage adds the missing columns as
constant default arrays (zero data copied for present columns), and a
plain ``union`` streams the generations together — no shuffle, no
driver materialization, resumable per shard like any parquet read.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_union_by_name"]


def read_union_by_name(paths: list, schema: dict, defaults: dict):
    """Read several parquet generation dirs/files as one Dataset.

    - ``schema``: {column: pyarrow type} — the CURRENT (widest) table
      schema; output blocks all carry exactly these columns, in this
      order.
    - ``defaults``: {column: python value} for columns absent in older
      generations (columns not listed must be present everywhere).

    Column pruning still applies per generation: only the columns a
    generation actually has leave storage.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    cols = list(schema)
    out = None
    for path in paths:
        have = set(pq.read_schema(_first_file(path)).names) & set(cols)
        missing = [c for c in cols if c not in have]
        for c in missing:
            if c not in defaults:
                raise ValueError(
                    f"read_union_by_name: {path} lacks column {c!r} "
                    f"and no default was declared")
        ds = rd.read_parquet(path, columns=[c for c in cols
                                            if c in have])

        def align(t: pa.Table, _missing=tuple(missing)) -> pa.Table:
            arrays = []
            for c in cols:
                if c in _missing:
                    arrays.append(pa.nulls(t.num_rows, schema[c])
                                  if defaults[c] is None else
                                  pa.array([defaults[c]] * t.num_rows,
                                           schema[c]))
                else:
                    col = t[c]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    arrays.append(col.cast(schema[c]))
            return pa.table(dict(zip(cols, arrays)))

        ds = ds.map_batches(align, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out


def _first_file(path: str) -> str:
    import os

    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
        raise FileNotFoundError(f"no parquet files under {path}")
    return path
