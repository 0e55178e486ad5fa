"""Mergeable sketches for distributed approximate aggregates.

HyperLogLog distinct counting (Flajolet et al. 2007, public algorithm),
built the way every distributed sketch should be on Ray Data: each batch
condenses to ONE (group, registers) partial row — the shuffle carries
sketches, never values — and a single ``groupby(group)`` merges by
element-wise register max (sketch union is associative + commutative,
so partial + merge is order-independent and deterministic given the
hash).  ``group_count_distinct`` is the exact companion (distinct pairs
via one dedup groupby, then a count), which doubles as the accuracy
oracle for the sketch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.filters import _hash64

__all__ = ["hll_sketch_batch", "hll_count_distinct", "group_count_distinct"]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch_batch(values: list, p: int = 12) -> np.ndarray:
    """One HLL register array (uint8[2^p]) for a batch of values."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if not values:
        return regs
    h = _hash64([str(v) for v in values])
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, + 1 (capped)
    probe = np.uint64(1) << np.uint64(63)
    pending = rest != 0          # still counting leading zeros
    lz = np.zeros(len(h), np.uint8)
    work = rest.copy()
    for _ in range(64 - p):
        top = (work & probe) != 0
        lz = np.where(pending & ~top, lz + 1, lz)
        pending = pending & ~top
        work = work << np.uint64(1)
    rank = np.where(rest == 0, np.uint8(64 - p + 1), lz + 1)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> int:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # small-range correction
    return int(round(est))


def hll_count_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """(group, approx_distinct) via mergeable per-batch HLL partials."""
    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "v": b[value_col].to_pylist()})
        rows = [(g, hll_sketch_batch(sub["v"].tolist(), p).tobytes())
                for g, sub in df.groupby(group_col, sort=False)]
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "sketch": pa.array([r[1] for r in rows], pa.binary()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.frombuffer(g["sketch"].iloc[0], np.uint8).copy()
        for blob in g["sketch"].iloc[1:]:
            np.maximum(regs, np.frombuffer(blob, np.uint8), out=regs)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "approx_distinct": [_estimate(regs)]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def group_count_distinct(ds, group_col: str, value_col: str):
    """Exact distinct count per group: dedup (group, value) pairs with
    one groupby, then count pairs per group — no value set is ever held
    in one place."""
    from ray.data.aggregate import Count

    def pair_partial(b: pa.Table) -> pa.Table:
        df = (pd.DataFrame({group_col: b[group_col].to_pylist(),
                            value_col: b[value_col].to_pylist()})
              .drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby([group_col, value_col]).count())
    return (pairs.groupby(group_col)
            .aggregate(Count(alias_name="n_distinct")))
