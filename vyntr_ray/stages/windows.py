"""Event-time windowing over a partitioned log (streaming-shaped operators).

Ray Data has no native event-time windows; per the standard pattern the
input is treated as a keyed, ts-sortable log and windows are computed with
``groupby(key).map_groups`` over each key's sorted events (ordering
assumption: per-key processing sorts by ``ts`` inside the group, so global
arrival order is irrelevant).  The reference has no windowing at all
(SURVEY §2.9) — these are the training-pipeline additions:

- ``tumbling``  — fixed-size buckets (also SQL: GROUP BY ts_div)
- ``sliding``   — overlapping buckets: each event explodes into the
  ``size/step`` windows that contain it, then one groupby
- ``sessionize``— gap-based sessions per key (gaps-and-islands)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["tumbling", "sliding", "sessionize", "rolling_sum"]

_US = 1_000_000


def tumbling(ds, size_s: int, key_col: str = "user_id", ts_col: str = "ts",
             value_col: str = "value"):
    """Fixed windows: (key, window_id, n, sum_value)."""
    from ray.data.aggregate import Count, Sum

    size_us = size_s * _US

    def win(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64())
        return pa.table({key_col: batch[key_col],
                         "window_id": pc.divide(us, size_us),
                         value_col: batch[value_col]})

    return (ds.map_batches(win, batch_format="pyarrow")
            .groupby([key_col, "window_id"])
            .aggregate(Count(alias_name="n"),
                       Sum(value_col, alias_name="sum_value")))


def sliding(ds, size_s: int, step_s: int, key_col: str = "user_id",
            ts_col: str = "ts", value_col: str = "value"):
    """Overlapping windows of ``size_s`` every ``step_s``.

    An event at t belongs to windows starting in
    (t - size, t] aligned to step — it is exploded into size/step rows
    (vectorized), then a single groupby aggregates.  Window id = start/step.
    """
    from ray.data.aggregate import Count, Sum

    assert size_s % step_s == 0, "size must be a multiple of step"
    k = size_s // step_s
    size_us, step_us = size_s * _US, step_s * _US

    def explode(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        # last window start ≤ t, then k-1 earlier starts
        last_start = (us // step_us) * step_us
        starts = last_start[:, None] - np.arange(k)[None, :] * step_us
        valid = starts > (us[:, None] - size_us)
        rep = valid.sum(axis=1)
        flat_starts = starts[valid]
        return pa.table({
            key_col: pa.array(np.repeat(keys, rep)),
            "window_start": pa.array(flat_starts // _US, pa.int64()),
            value_col: pa.array(np.repeat(vals, rep)),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby([key_col, "window_start"])
            .aggregate(Count(alias_name="n"),
                       Sum(value_col, alias_name="sum_value")))


def sessionize(ds, gap_s: int, key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", scale: int = 100):
    """Gap-based sessions: a new session starts when the pause > gap.

    Per-key pandas gaps-and-islands over the sorted group; returns
    (key, session_id, n, start_us, end_us, sum_value_centi).  The value sum
    is returned integer-scaled (×``scale``, nearest int) so the DuckDB
    oracle hash-compares exactly — a float sum's addend order differs
    between engines and pandas ``.round`` is half-to-even while DuckDB
    ``round()`` is half-away-from-zero; with 2-decimal inputs the scaled
    sum is integral up to ~1e-9, so nearest-int is mode-independent.
    """
    gap_us = gap_s * _US

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        us = g[ts_col].astype("int64")
        d = us.diff()
        new = d.isna() | (d > gap_us)
        sid = new.cumsum().astype("int64") - 1
        out = (pd.DataFrame({
            "session_id": sid, "us": us, "v": g[value_col].to_numpy()})
            .groupby("session_id")
            .agg(n=("us", "size"), start_us=("us", "min"),
                 end_us=("us", "max"), sum_value=("v", "sum"))
            .reset_index())
        out["sum_value_centi"] = (
            np.rint(out.pop("sum_value").to_numpy() * scale).astype("int64"))
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def rolling_sum(ds, k: int, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value"):
    """Per-key moving sum over the last ``k`` rows (current row included),
    rows ordered by (ts, id) — the ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW window frame.  Values are 2-decimal, so the per-row centi scaling
    makes every running sum exact int64 (the sessionize lesson); one
    ``groupby(key)`` co-locates each key and the sweep is a vectorized
    cumsum difference.
    """
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        v = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(v)])
        n = len(v)
        lo = np.maximum(0, np.arange(1, n + 1) - k)
        roll = c[1:] - c[lo]
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "roll_centi": roll})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
