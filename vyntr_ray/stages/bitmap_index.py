"""Chunked bitmap index — the low-cardinality-predicate structure.

A classic warehouse bitmap index (O'Neil 1987, public): one bitmap per
(column, value) with bit r set iff row r matches; conjunctive
predicates are bitmap ANDs + popcounts, never a scan.  The Ray-Data
shape keeps it scale-safe: bitmaps are sharded by ROW-ID CHUNK (fixed
``chunk_rows`` bits each), so no single bitmap — and no driver fold —
ever holds O(corpus) bits:

- build: every block condenses its rows to (value, chunk, bits) partial
  byte-strings; ONE hash partition on (value, chunk) ORs the partials
  (a vectorized ``np.bitwise_or`` fold per partition);
- probe: the two predicate columns' chunk rows meet in a chunk-keyed
  pandas merge per partition (co-partitioned by chunk), AND + popcount
  per chunk, and matching row-ids decode ONLY from matching chunks.

Assumes a dense 0-based integer row-id column (the ``doc_id``
convention here; a layout writer would use the row's ordinal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bitmap_build", "bitmap_and_count"]


def _pack(ids: np.ndarray, chunk_rows: int):
    """(chunk, packed-bits bytes) list for sorted in-chunk offsets."""
    out = []
    for c in np.unique(ids // chunk_rows):
        off = ids[ids // chunk_rows == c] - c * chunk_rows
        bits = np.zeros(chunk_rows, bool)
        bits[off] = True
        out.append((int(c), np.packbits(bits).tobytes()))
    return out


def bitmap_build(ds, col: str, id_col: str = "doc_id",
                 chunk_rows: int = 4096, n_parts: int = 16):
    """(value, chunk, bits) bitmap shards for one low-cardinality
    column.  Returns a Dataset; feed two of these (same ``chunk_rows``)
    to :func:`bitmap_and_count`."""
    from .windows import _by_part

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[col].to_pylist()
        rows_v, rows_c, rows_b = [], [], []
        for v in sorted(set(vals)):
            m = np.array([x == v for x in vals])
            for c, b in _pack(ids[m], chunk_rows):
                rows_v.append(v)
                rows_c.append(c)
                rows_b.append(b)
        return pa.table({"val": pa.array(rows_v, pa.string()),
                         "chunk": pa.array(rows_c, pa.int64()),
                         "bits": pa.array(rows_b, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def orfold(g: pd.DataFrame) -> pd.DataFrame:
        out_v, out_c, out_b = [], [], []
        for (v, c), sub in g.groupby(["val", "chunk"], sort=True):
            acc = np.zeros(chunk_rows // 8, np.uint8)
            for b in sub["bits"]:
                acc |= np.frombuffer(b, np.uint8)
            out_v.append(v)
            out_c.append(int(c))
            out_b.append(acc.tobytes())
        return pd.DataFrame({"val": out_v, "chunk": out_c,
                             "bits": out_b})

    # route by chunk so the probe's chunk-merge is co-partitioned
    return (_by_part(parts, "chunk", n_parts=n_parts)
            .groupby("_part")
            .map_groups(lambda g: orfold(g.drop(columns="_part")),
                        batch_format="pandas"))


def bitmap_and_count(idx_a, idx_b, val_a: str, val_b: str,
                     chunk_rows: int = 4096, k_ids: int = 20,
                     n_parts: int = 16):
    """AND-probe two bitmap indexes: rows where colA == ``val_a`` AND
    colB == ``val_b``.  Per co-partition: filter each side to its
    value, merge on chunk, AND + popcount; matching row-ids decode
    only from non-empty chunks.  Returns (n_match, ids = first
    ``k_ids`` row-ids ascending) as a one-row DataFrame."""
    from .windows import _by_part

    def tag(side: int, want: str):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.equal(t["val"], want))
            return pa.table({
                "chunk": t["chunk"],
                "bits": t["bits"],
                "side": pa.array([side] * t.num_rows, pa.int8())})
        return f

    both = (idx_a.map_batches(tag(0, val_a), batch_format="pyarrow")
            .union(idx_b.map_batches(tag(1, val_b),
                                     batch_format="pyarrow")))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["chunk", "bits"]]
        b = g[g["side"] == 1][["chunk", "bits"]]
        m = a.merge(b, on="chunk")
        ids = []
        n = 0
        # itertuples over the (bounded) matched-chunk rows — each row's
        # AND + popcount is the vectorized part
        for chunk, bx, by in m[["chunk", "bits_x", "bits_y"]].itertuples(
                index=False, name=None):
            x = np.frombuffer(bx, np.uint8) & np.frombuffer(by, np.uint8)
            hit = np.unpackbits(x)
            n += int(hit.sum())
            off = np.nonzero(hit)[0]
            ids.extend((int(chunk) * chunk_rows + off).tolist())
        return pd.DataFrame({"n": pd.array([n], dtype="int64"),
                             "ids": [sorted(ids)[:k_ids]]})

    parts = (_by_part(both, "chunk", n_parts=n_parts)
             .groupby("_part")
             .map_groups(lambda g: probe(g.drop(columns="_part")),
                         batch_format="pandas")
             .take_all())
    total = sum(int(r["n"]) for r in parts)
    ids = sorted(i for r in parts for i in r["ids"])[:k_ids]
    return pd.DataFrame({
        "doc_id": pd.array(ids, dtype="int64"),
        "n_match": pd.array([total] * len(ids), dtype="int64")})
