"""Event-time windowing over a partitioned log (streaming-shaped operators).

Ray Data has no native event-time windows; per the standard pattern the
input is treated as a keyed, ts-sortable log.  Keyed sweeps
(sessionize/rolling) shuffle once on a HASH PARTITION of the key —
bounded group count, one vectorized pandas sweep per partition covering
all of its keys — never one Ray group per key (PERF.md many-groups
rule).  Ordering assumption: each partition sorts by (key, ts) inside
the group, so global arrival order is irrelevant.  The reference has no windowing at all
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

from ..rounding import round_half_away

__all__ = ["tumbling", "sliding", "sessionize", "rolling_sum",
           "rolling_sum_time", "lag_diff",
           "running_total", "group_ranks", "funnel", "retention",
           "merge_intervals", "cumulative_distinct", "percentile_ranks",
           "time_weighted_avg", "first_last", "gaps_islands",
           "event_throttle", "scd2_intervals", "group_median",
           "group_mad", "last_touch", "watermark_filter",
           "next_event_gap", "session_path_partials", "ohlc_bars",
           "rolling_outliers", "rolling_median", "interval_coverage",
           "window_distinct", "locf_fill", "path_topk", "lerp_fill", "lateness_quantiles"]

_US = 1_000_000


def _by_part(ds, key_col: str, n_parts: int = 64):
    """Attach a stable md5 hash-partition column — per-key operators
    group on this (bounded group count, vectorized per-partition pandas)
    instead of one Ray group per key (PERF.md many-groups rule).
    md5 runs once per DISTINCT key per batch (keys repeat heavily in
    event logs), fanned back out by a vectorized codes lookup.  Uniques
    come from Arrow ``dictionary_encode`` on the typed column (a pandas
    round-trip would float-cast null-bearing int batches and route the
    same key inconsistently across batches — see joins._part_col)."""
    from .joins import _part_col

    def add(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t[key_col], n_parts))

    return ds.map_batches(add, batch_format="pyarrow")


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
    (key, session_id, n, start_us, end_us, sum_value_centi).  Values are
    integer-scaled PER ROW (×``scale``, half-away-from-zero like DuckDB
    ``round``) and summed as int64 — rounding the float sum post-hoc is
    addend-order- and tie-mode-dependent across engines, per-row int
    scaling is exact at any input precision (the oracle mirrors with
    ``sum(round(value*100)::BIGINT)``).
    """
    gap_us = gap_s * _US

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # one partition = many keys (PERF.md many-groups rule): sort by
        # (key, ts), break sessions at key changes OR gaps, then ONE
        # vectorized pandas groupby over global session ids
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        key = g[key_col].to_numpy()
        us = g[ts_col].astype("int64").to_numpy()
        newkey = np.r_[True, key[1:] != key[:-1]]
        gap = np.r_[True, (us[1:] - us[:-1]) > gap_us]
        gsid = np.cumsum(newkey | gap) - 1
        sess = (pd.DataFrame({key_col: key, "_g": gsid, "us": us,
                              "v": round_half_away(
                                  g[value_col].to_numpy() * scale)
                              .astype(np.int64)})
                .groupby("_g", sort=True)
                .agg(**{key_col: (key_col, "first"), "n": ("us", "size"),
                        "start_us": ("us", "min"), "end_us": ("us", "max"),
                        "sum_value": ("v", "sum")})
                .reset_index(drop=True))
        # sessions are ts-ordered within a key, so the per-key rank is
        # the original per-key session_id
        sess.insert(1, "session_id",
                    sess.groupby(key_col, sort=False).cumcount()
                    .astype("int64"))
        sess["sum_value_centi"] = sess.pop("sum_value").astype("int64")
        return sess

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def rolling_sum(ds, k: int, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value"):
    """Per-key moving sum over the last ``k`` rows (current row included),
    rows ordered by (ts, id) — the ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW window frame.  Values are 2-decimal, so the per-row centi scaling
    makes every running sum exact int64 (the sessionize lesson); one
    ``groupby(key)`` co-locates each key and the sweep is a vectorized
    cumsum difference.
    """
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # partition-level sweep: the global cumsum difference stays
        # inside one key because lo is clamped to the key's start index
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        v = round_half_away(g[value_col].to_numpy() * 100).astype(np.int64)
        n = len(v)
        newkey = np.r_[True, key[1:] != key[:-1]]
        key_start = np.maximum.accumulate(
            np.where(newkey, np.arange(n), 0))
        c = np.concatenate([[0], np.cumsum(v)])
        lo = np.maximum(key_start, np.arange(1, n + 1) - k)
        roll = c[1:] - c[lo]
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: key,
                             "roll_centi": roll})

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def rolling_sum_time(ds, window_s: int, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value"):
    """Per-key moving sum over a TIME window — the ``RANGE BETWEEN
    <interval> PRECEDING AND CURRENT ROW`` frame (:func:`rolling_sum`
    is the ROWS-frame sibling).  SQL RANGE semantics: the frame holds
    every row of the key whose ts lies in ``[ts_i - W, ts_i]``
    INCLUSIVE — peers (equal ts) that sort after the current row by
    the id tie-break are still in frame, so the sweep uses
    ``searchsorted`` bounds on the key's ts slice, not a row cursor.
    Same hash-partition shape as :func:`rolling_sum`: one shuffle on
    the key hash, a vectorized cumsum-difference per partition; the
    inner loop is over the partition's KEY SLICES (two searchsorted
    calls each), not rows.  Centi scaling keeps every sum exact int64.
    """
    w_us = window_s * _US

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = round_half_away(g[value_col].to_numpy() * 100).astype(np.int64)
        n = len(v)
        c = np.concatenate([[0], np.cumsum(v)])
        out = np.empty(n, np.int64)
        starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1, n]
        for a, b in zip(starts[:-1], starts[1:]):
            seg = us[a:b]
            lo = a + np.searchsorted(seg, seg - w_us, side="left")
            hi = a + np.searchsorted(seg, seg, side="right")
            out[a:b] = c[hi] - c[lo]
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: key,
                             "win_sum_centi": out})

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def lag_diff(ds, key_col: str = "user_id", ts_col: str = "ts",
             id_col: str = "event_id", value_col: str = "value"):
    """Per-key LAG difference: ``value - lag(value) OVER (PARTITION BY key
    ORDER BY ts, id)``, first row of each key = 0 (sentinel, so no NULL
    ever enters the value hash).  Same hash-partition shape as
    :func:`rolling_sum` — one vectorized pandas pass per partition, the
    key boundary detected by a shifted comparison; values are 2-decimal
    so the per-row centi scaling makes every diff exact int64.
    """
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        v = round_half_away(g[value_col].to_numpy() * 100).astype(np.int64)
        diff = np.r_[np.int64(0), v[1:] - v[:-1]]
        newkey = np.r_[True, key[1:] != key[:-1]]
        diff[newkey] = 0
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: key,
                             "diff_centi": diff})

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def running_total(ds, key_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value"):
    """Per-key running total: ``SUM(value) OVER (PARTITION BY key ORDER BY
    ts, id ROWS UNBOUNDED PRECEDING)`` — the unbounded-preceding frame
    :func:`rolling_sum` is the bounded sibling of.  Same hash-partition
    shape (one vectorized pandas sweep per partition, never one Ray group
    per key); the cumsum is reset at each key boundary by subtracting the
    prefix at the key's start.  Values are 2-decimal, so per-row centi
    scaling keeps every running sum exact int64.
    """
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        v = round_half_away(g[value_col].to_numpy() * 100).astype(np.int64)
        n = len(v)
        newkey = np.r_[True, key[1:] != key[:-1]]
        key_start = np.maximum.accumulate(
            np.where(newkey, np.arange(n), 0))
        c = np.concatenate([[0], np.cumsum(v)])
        run = c[1:] - c[key_start]
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: key,
                             "run_centi": run})

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def group_ranks(ds, key_col: str = "user_id", value_col: str = "value",
                id_col: str = "event_id"):
    """Per-key RANK and DENSE_RANK by value descending — deterministic
    even under value ties (both functions assign tied rows the same
    rank, unlike row_number).  Same hash-partition shape as the other
    per-key windows: one vectorized pandas pass per partition, pandas
    ``rank(method='min'/'dense')`` within each key.
    """
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, value_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        grp = g.groupby(key_col, sort=False)[value_col]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "rnk": grp.rank(method="min", ascending=False)
            .astype("int64").to_numpy(),
            "drnk": grp.rank(method="dense", ascending=False)
            .astype("int64").to_numpy()})

    return _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")


def funnel(ds, steps: list[str], key_col: str = "user_id",
           ts_col: str = "ts", ev_col: str = "event_type",
           max_gap_us: int | None = None):
    """Ordered-sequence conversion funnel: how many keys reached step i.

    A key reaches step 1 at ``t1 = min(ts | ev == steps[0])`` and step
    ``i`` at ``t_i = min(ts | ev == steps[i] and ts > t_{i-1})`` —
    i.e. each step must occur STRICTLY AFTER the earliest completion of
    the previous one (the standard product-analytics funnel).  With
    ``max_gap_us`` set, step ``i`` must ALSO land within the window
    ``t_{i-1} < ts <= t_{i-1} + max_gap_us`` (the windowed/"within N
    hours" funnel).  Both sides anchor GREEDILY on the earliest
    completion of the previous step — a key whose earliest step-1 event
    times out is NOT rescued by a later step-1 event; this is the
    deliberate (and SQL-mirrorable) product-analytics convention.
    Returns ``(step, event_type, users)`` ordered by step.

    Shape: all events of a key live in one hash partition, so each
    partition resolves its keys' full funnels with vectorized pandas
    joins (never a Ray group per key), emits one ``len(steps)``-row
    partial, and a tiny final groupby sums partials.  Driver holds
    O(len(steps)) rows; no reference counterpart (SURVEY §2.9 family).
    """
    from ray.data.aggregate import Sum

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # Ray's map_groups can hand the group frame over with a named
        # index; drop it so key_col is unambiguous in groupby/merge
        g = g.reset_index(drop=True)
        users = np.zeros(len(steps), dtype=np.int64)
        cur = None  # frame: key -> earliest completion time of prev step
        for i, s in enumerate(steps):
            m = g[g[ev_col] == s]
            if i > 0:
                m = m.merge(cur, on=key_col, how="inner")
                m = m[m[ts_col] > m["_prev"]]
                if max_gap_us is not None:
                    m = m[m[ts_col] <= m["_prev"]
                          + pd.Timedelta(max_gap_us, unit="us")]
            cur = (m.groupby(key_col)[ts_col].min()
                   .rename("_prev").reset_index())
            users[i] = len(cur)
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype=np.int64),
                             "users": users})

    part = _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")
    agg = part.groupby("step").aggregate(Sum("users", alias_name="users"))

    def finalize(t: pa.Table) -> pa.Table:
        step = t["step"].to_numpy()
        return pa.table({
            "step": t["step"],
            "event_type": pa.array([steps[i - 1] for i in step]),
            "users": pc.cast(t["users"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("step")


def retention(ds, period_s: int = 86_400, key_col: str = "user_id",
              ts_col: str = "ts"):
    """Cohort retention matrix: ``(cohort, age, users)``.

    A key's cohort is the period of its FIRST event
    (``floor(ts_us / period_us)`` on the int64 microsecond timestamp);
    it is retained at age ``a`` if it has any event in period
    ``cohort + a``.  ``users`` counts distinct keys per (cohort, age) —
    the standard product-analytics retention triangle; age 0 row equals
    cohort size by construction.

    Shape: all events of a key live in one hash partition; each
    partition dedups to distinct (key, period) pairs, derives each
    key's cohort with a vectorized groupby-min transform, and emits a
    value-counted (cohort, age) partial — distinct keys never collide
    across partitions, so partial counts sum exactly.  Driver holds
    O(cohorts × ages) rows.  No reference counterpart (SURVEY §2.9
    family of training-analytics additions).
    """
    from ray.data.aggregate import Sum

    period_us = period_s * _US

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        p = us // period_us
        up = pd.DataFrame({key_col: g[key_col], "_p": p}).drop_duplicates()
        cohort = up.groupby(key_col)["_p"].transform("min")
        partial = (pd.DataFrame({"cohort": cohort,
                                 "age": up["_p"] - cohort})
                   .value_counts().rename("users").reset_index())
        return partial.astype({"cohort": "int64", "age": "int64",
                               "users": "int64"})

    part = _by_part(ds, key_col).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")),
        batch_format="pandas")
    return (part.groupby(["cohort", "age"])
            .aggregate(Sum("users", alias_name="users"))
            .map_batches(lambda t: t.set_column(
                t.column_names.index("users"), "users",
                pc.cast(t["users"], pa.int64())), batch_format="pyarrow")
            .sort(["cohort", "age"]))


def merge_intervals(ds, key_col: str = "user_id",
                    start_col: str = "s_us", end_col: str = "e_us",
                    n_parts: int = 64):
    """Coalesce overlapping-or-touching ``[s, e]`` intervals per key —
    the interval-union operator (gaps-and-islands over arbitrary spans,
    unlike :func:`sessionize` whose spans are gap-derived points).

    One hash-partition shuffle on the key, then one vectorized sweep per
    partition: sort by (key, s, e), running max of ``e`` within each key
    (pandas C ``cummax``), and a new island wherever ``s`` exceeds the
    previous running max.  All comparisons stay int64 — a NaN-bearing
    float ``shift`` would lose precision above 2^53, which epoch-us
    timestamps exceed.  Returns (key, start_us, end_us, n_iv).  No
    reference counterpart (SURVEY §2.9 training-analytics additions).
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, end_col], kind="mergesort")
        key = g[key_col].to_numpy()
        s = g[start_col].to_numpy().astype("int64")
        e = g[end_col].to_numpy().astype("int64")
        kid = np.cumsum(np.r_[True, key[1:] != key[:-1]]) - 1
        cm = pd.Series(e).groupby(kid).cummax().to_numpy()
        prev = np.empty_like(cm)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = cm[:-1]
        first_of_key = np.r_[True, kid[1:] != kid[:-1]]
        new = first_of_key | (s > prev)
        isl = np.cumsum(new) - 1
        out = (pd.DataFrame({key_col: key, "_i": isl, "s": s, "e": e})
               .groupby("_i", sort=True)
               .agg(**{key_col: (key_col, "first"),
                       "start_us": ("s", "min"),
                       "end_us": ("e", "max"),
                       "n_iv": ("s", "size")})
               .reset_index(drop=True))
        out["n_iv"] = out["n_iv"].astype("int64")
        return out

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def interval_coverage(ds, key_col: str = "user_id",
                      start_col: str = "s_us", end_col: str = "e_us",
                      n_parts: int = 64):
    """Per-key coverage stats after interval union: total covered
    duration, island count, and longest island — "how much wall time
    was this host actually busy" over overlapping fetch spans.

    Same single hash-partition shuffle + int64 sweep as
    :func:`merge_intervals` (a key's intervals are co-resident in one
    partition, so the per-key aggregate is exact inside the sweep —
    no second shuffle).  Returns (key, n_iv, covered_us, max_iv_us)
    with one row per key.  No reference counterpart (SURVEY §2.9).
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, end_col], kind="mergesort")
        key = g[key_col].to_numpy()
        s = g[start_col].to_numpy().astype("int64")
        e = g[end_col].to_numpy().astype("int64")
        kid = np.cumsum(np.r_[True, key[1:] != key[:-1]]) - 1
        cm = pd.Series(e).groupby(kid).cummax().to_numpy()
        prev = np.empty_like(cm)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = cm[:-1]
        first_of_key = np.r_[True, kid[1:] != kid[:-1]]
        new = first_of_key | (s > prev)
        isl = np.cumsum(new) - 1
        iv = (pd.DataFrame({key_col: key, "_i": isl, "s": s, "e": e})
              .groupby("_i", sort=True)
              .agg(**{key_col: (key_col, "first"),
                      "s": ("s", "min"), "e": ("e", "max")})
              .reset_index(drop=True))
        iv["len"] = iv["e"] - iv["s"]
        out = (iv.groupby(key_col, as_index=False, sort=True)
               .agg(n_iv=("len", "size"), covered_us=("len", "sum"),
                    max_iv_us=("len", "max")))
        for c in ("n_iv", "covered_us", "max_iv_us"):
            out[c] = out[c].astype("int64")
        return out

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def window_distinct(ds, key_col: str = "user_id", ts_col: str = "ts",
                    n_periods: int = 7,
                    period_us: int = 86_400_000_000):
    """Trailing-window distinct-key count per period: for each day D,
    how many distinct keys appeared in [D-(n-1), D] — the rolling-MAU
    curve.  COUNT(DISTINCT) OVER a RANGE frame is inexpressible as a
    plain window; the distributed shape is contribution expansion:

    1. per block, dedupe to (key, period) pairs and fan each out to the
       ``n_periods`` windows it contributes to (bounded ×n blowup of an
       already-deduped pair set);
    2. one hash-partition global dedup of (key, window) pairs
       (:func:`..dataset_tools.distinct_rows` — keys are data-scaled);
    3. per-window counts fold on the driver (O(#periods) rows).

    Every expanded window emits a row (including the ``n-1`` tail past
    the last data day) — the oracle mirrors the same expansion.
    Returns (day_us, n_keys) sorted by day.
    """
    from .dataset_tools import distinct_rows

    def pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        d = pc.divide(us, pa.scalar(period_us, pa.int64()))
        up = pa.table({key_col: t[key_col], "_d": d}) \
            .group_by([key_col, "_d"]).aggregate([])
        k = up[key_col].to_numpy(zero_copy_only=False)
        dv = up["_d"].to_numpy(zero_copy_only=False).astype("int64")
        keys = np.repeat(k, n_periods)
        days = (np.repeat(dv, n_periods)
                + np.tile(np.arange(n_periods, dtype="int64"), len(dv)))
        return pa.table({key_col: pa.array(keys),
                         "day": pa.array(days, pa.int64())})

    uniq = distinct_rows(ds.map_batches(pairs, batch_format="pyarrow"),
                         [key_col, "day"], part_key=key_col)

    def partial(t: pa.Table) -> pa.Table:
        c = pa.table({"day": t["day"]}).group_by("day") \
            .aggregate([("day", "count")])
        return pa.table({"day": c["day"],
                         "n": pc.cast(c["day_count"], pa.int64())})

    rows = pd.DataFrame(
        uniq.map_batches(partial, batch_format="pyarrow").take_all())
    if rows.empty:
        return pd.DataFrame({"day_us": pd.array([], dtype="int64"),
                             "n_keys": pd.array([], dtype="int64")})
    g = (rows.groupby("day", as_index=False)["n"].sum()
         .sort_values("day").reset_index(drop=True))
    return pd.DataFrame({
        "day_us": (g["day"] * period_us).astype("int64"),
        "n_keys": g["n"].astype("int64")})


def cumulative_distinct(ds, key_col: str = "user_id", ts_col: str = "ts",
                        period_us: int = 86_400_000_000,
                        n_parts: int = 64):
    """Running distinct-key curve: for each period (day by default), how
    many distinct keys have EVER appeared up to and including it.

    COUNT(DISTINCT) OVER a cumulative frame is inexpressible as a plain
    window; the distributed shape is first-seen-period per key (keys are
    data-scaled, so a hash-partition min-fold — never a per-key group),
    then bounded per-period new-key counts fold on the driver into one
    prefix sum (O(#periods) rows).  Only periods that are some key's
    first appearance emit a row — the oracle mirrors that.  Returns
    (day_us, new_keys, cum_keys) sorted by day.
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        d = (us // period_us) * period_us
        f = (pd.DataFrame({key_col: g[key_col].to_numpy(), "_d": d})
             .groupby(key_col, as_index=False)["_d"].min())
        c = f.groupby("_d", as_index=False).size()
        c.columns = ["day_us", "new_keys"]
        return c

    parts = pd.DataFrame(
        _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
            lambda g: per_part(g.drop(columns="_part")),
            batch_format="pandas").take_all())
    g = (parts.groupby("day_us", as_index=False)["new_keys"].sum()
         .sort_values("day_us").reset_index(drop=True))
    g["day_us"] = g["day_us"].astype("int64")
    g["new_keys"] = g["new_keys"].astype("int64")
    g["cum_keys"] = g["new_keys"].cumsum().astype("int64")
    return g


def percentile_ranks(ds, key_col: str = "user_id",
                     value_col: str = "value", id_col: str = "event_id",
                     n_parts: int = 64):
    """PERCENT_RANK and CUME_DIST per key, ordered by value DESC —
    the relative-rank windows (quality-percentile gates in a curation
    pipeline rank docs within a language exactly this way).

    Same one-shuffle shape as :func:`group_ranks`.  Both outputs follow
    the SQL definitions from integer ranks: percent_rank =
    (rank_min - 1) / (n - 1) (0.0 for single-row partitions, the SQL
    convention) and cume_dist = rank_max / n, each an IEEE-double
    division of exact int64 operands — DuckDB evaluates the identical
    expression, so round(..., 6) matches bit-for-bit (the
    qty_discount_corr contract).  Returns (id, key, pr_6, cd_6).
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, value_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        grp = g.groupby(key_col, sort=False)[value_col]
        rmin = grp.rank(method="min", ascending=False).to_numpy(np.float64)
        rmax = grp.rank(method="max", ascending=False).to_numpy(np.float64)
        n = grp.transform("size").to_numpy(np.float64)
        pr = np.where(n > 1.0, (rmin - 1.0) / (n - 1.0), 0.0)
        cd = rmax / n
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key_col: g[key_col].to_numpy(),
            "pr_6": round_half_away(pr, 6),
            "cd_6": round_half_away(cd, 6)})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def time_weighted_avg(ds, key_col: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value", id_col: str = "event_id",
                      n_parts: int = 64):
    """Time-weighted average value per key (TWAP): each observation
    holds until the next one, weight = holding duration.

    One hash-partition shuffle; per partition a vectorized sweep pairs
    each event with its successor in (ts, id) order — the (ts, id)
    tie-break makes LEAD deterministic on both sides.  All sufficient
    statistics are EXACT int64 (value centi-scaled half-away, durations
    in ms: centi x ms products stay well under 2^63 for year-scale
    logs), and the final ratio is one IEEE division of identical
    operands — round(..., 6) matches DuckDB bit-for-bit (the
    qty_discount_corr contract).  Keys with a single event (no
    duration) are dropped, as are zero-total-duration keys.  Returns
    (key, num_centi_ms, den_ms, twa_6).
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        vc = round_half_away(
            g[value_col].to_numpy(np.float64) * 100.0).astype("int64")
        nxt_us = np.empty_like(us)
        nxt_us[:-1] = us[1:]
        nxt_us[-1] = 0
        same = np.empty(len(key), dtype=bool)
        same[:-1] = key[:-1] == key[1:]
        same[-1] = False
        dt_ms = np.where(same, (nxt_us - us) // 1000, 0)
        agg = (pd.DataFrame({key_col: key,
                             "num": vc * dt_ms, "den": dt_ms})
               .groupby(key_col, as_index=False)[["num", "den"]].sum())
        agg = agg[agg["den"] > 0]
        num = agg["num"].to_numpy(np.float64)
        den = agg["den"].to_numpy(np.float64)
        return pd.DataFrame({
            key_col: agg[key_col].to_numpy(),
            "num_centi_ms": agg["num"].astype("int64").to_numpy(),
            "den_ms": agg["den"].astype("int64").to_numpy(),
            "twa_6": round_half_away(num / den, 6)})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def first_last(ds, key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", id_col: str = "event_id",
               n_parts: int = 64):
    """FIRST_VALUE / LAST_VALUE per key over (ts, id) order — the
    entry/exit observation per entity (session entry page, latest
    account state), deterministic under ts ties via the id tie-break.

    Same one-shuffle hash-partition shape as the other per-key windows;
    values centi-scaled half-away so the outputs are exact int64.
    Returns (key, first_vc, last_vc, first_us, last_us, n)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        vc = round_half_away(
            g[value_col].to_numpy(np.float64) * 100.0).astype("int64")
        f = pd.DataFrame({key_col: g[key_col].to_numpy(),
                          "vc": vc, "us": us})
        agg = (f.groupby(key_col, sort=True)
               .agg(first_vc=("vc", "first"), last_vc=("vc", "last"),
                    first_us=("us", "first"), last_us=("us", "last"),
                    n=("us", "size"))
               .reset_index())
        for c in ["first_vc", "last_vc", "first_us", "last_us", "n"]:
            agg[c] = agg[c].astype("int64")
        return agg

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def gaps_islands(ds, key_col: str = "user_id", ts_col: str = "ts",
                 n_parts: int = 64):
    """Consecutive-day activity islands per key — the classic
    gaps-and-islands over the DISTINCT (key, day) activity set (the
    date-grain sibling of :func:`sessionize`, which islands on event-time
    gaps).  Returns (key, start_day, end_day, n_days) with days as int64
    day-numbers since epoch, one row per maximal run of consecutive
    active days.

    One shuffle: hash-partition on the key, then per partition a
    vectorized drop_duplicates + sorted run-break sweep (day not equal to
    prev day + 1, or key change) + ONE pandas groupby over island ids —
    never a Ray group per key or per island.  The reference has no
    calendar analytics (SURVEY §2.9); training-pipeline addition."""

    def days(t: pa.Table) -> pa.Table:
        # normalize to us first: a ns-resolution source (pandas default)
        # would otherwise shift the day arithmetic by 1000x
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({key_col: t[key_col],
                         "day": pc.divide(us, pa.scalar(
                             86_400_000_000, pa.int64()))})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(subset=[key_col, "day"])
             .sort_values([key_col, "day"], kind="mergesort"))
        key = g[key_col].to_numpy()
        day = g["day"].to_numpy()
        newkey = np.r_[True, key[1:] != key[:-1]]
        brk = np.r_[True, (day[1:] - day[:-1]) != 1] | newkey
        isl = np.cumsum(brk) - 1
        out = (pd.DataFrame({key_col: key, "_i": isl, "day": day})
               .groupby("_i", sort=True)
               .agg(**{key_col: (key_col, "first"),
                       "start_day": ("day", "min"),
                       "end_day": ("day", "max"),
                       "n_days": ("day", "size")})
               .reset_index(drop=True))
        for c in ["start_day", "end_day", "n_days"]:
            out[c] = out[c].astype("int64")
        return out

    d = ds.map_batches(days, batch_format="pyarrow")
    return _by_part(d, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def event_throttle(ds, gap_s: int, key_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   id_col: str = "event_id", n_parts: int = 64):
    """LAG-based duplicate suppression: keep an event iff the previous
    event of the same (key, type) — in (ts, id) order — is more than
    ``gap_s`` older (or absent).  The streaming-dedup shape: alert
    throttling, client-retry collapse.  NOT the chained variant (gap
    measured from the previous KEPT row); LAG semantics keep it
    SQL-expressible and vectorized.

    One shuffle on the key hash; the composite (key, type) grouping
    nests inside the partition sort, so one sweep covers all pairs.
    Returns the kept (id, key, type) rows."""
    gap_us = gap_s * _US

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, type_col, ts_col, id_col],
                          kind="mergesort")
        key = g[key_col].to_numpy()
        typ = g[type_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        newgrp = np.r_[True, (key[1:] != key[:-1]) | (typ[1:] != typ[:-1])]
        far = np.r_[True, (us[1:] - us[:-1]) > gap_us]
        keep = newgrp | far
        return pd.DataFrame({id_col: g[id_col].to_numpy()[keep],
                             key_col: key[keep],
                             type_col: typ[keep]})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def scd2_intervals(ds, key_col: str = "user_id", type_col: str = "event_type",
                   ts_col: str = "ts", id_col: str = "event_id",
                   n_parts: int = 64, sentinel_us: int = 253_402_300_799_000_000):
    """Slowly-changing-dimension (type 2) interval builder: collapse a
    keyed event log into validity intervals — one row per run of equal
    ``type_col`` values per key, valid from the run's first event to the
    start of the next run (sentinel 9999-12-31T23:59:59 on the last run,
    so no NULL enters the value hash; the asof-left convention).

    Change points are detected on the (ts, id)-sorted stream (LAG(type)
    is distinct from type), then the next change's ts arrives by a
    shifted-array LEAD inside the same vectorized sweep — one shuffle,
    no second window pass.  Returns (key, type, valid_from_us,
    valid_to_us)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        typ = g[type_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        newkey = np.r_[True, key[1:] != key[:-1]]
        chg = newkey | np.r_[True, typ[1:] != typ[:-1]]
        k, t, v = key[chg], typ[chg], us[chg]
        nk = np.r_[k[1:] != k[:-1], True]
        valid_to = np.r_[v[1:], np.int64(sentinel_us)]
        valid_to[nk] = sentinel_us
        return pd.DataFrame({key_col: k, type_col: t,
                             "valid_from_us": v, "valid_to_us": valid_to})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def group_median(ds, key_col: str = "user_id", value_col: str = "value",
                 n_parts: int = 64, scale: int = 100):
    """Exact per-key discrete median for DATA-SCALED key domains — the
    keyed sibling of the global ``value_quantiles`` (same selection rule:
    quantile_disc picks sorted index ceil(q*n)-1).  Values are
    integer-scaled per row (half-away like DuckDB ``round``) so the
    output is exact int64; groups co-locate under one key-hash shuffle
    and each partition answers all of its keys with one sort + one
    vectorized groupby — never a Ray group per key.

    Returns (key, n, median_centi)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        v = round_half_away(
            g[value_col].to_numpy(np.float64) * scale).astype("int64")
        f = pd.DataFrame({key_col: g[key_col].to_numpy(), "v": v})
        f = f.sort_values([key_col, "v"], kind="mergesort")
        key = f[key_col].to_numpy()
        vv = f["v"].to_numpy()
        n = len(vv)
        newkey = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(newkey)
        counts = np.diff(np.r_[starts, n])
        # quantile_disc(0.5): index ceil(0.5*n)-1 within each key slice
        idx = starts + np.ceil(0.5 * counts).astype("int64") - 1
        return pd.DataFrame({key_col: key[starts],
                             "n": counts.astype("int64"),
                             "median_centi": vv[idx]})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def group_mad(ds, key_col: str = "user_id", value_col: str = "value",
              n_parts: int = 64, scale: int = 100):
    """Per-key median absolute deviation (the robust dispersion
    statistic), exact in centi-ints: med = discrete median
    (:func:`group_median` selection rule ceil(q*n)-1), mad = discrete
    median of |v - med|.  Both passes run inside ONE key-hash
    partition — the second sort sees only the partition's rows, so no
    extra shuffle.  Returns (key, n, median_centi, mad_centi)."""

    def _disc_median(key: np.ndarray, v: np.ndarray):
        order = np.lexsort((v, key))
        key, v = key[order], v[order]
        newkey = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(newkey)
        counts = np.diff(np.r_[starts, len(v)])
        idx = starts + np.ceil(0.5 * counts).astype("int64") - 1
        return key[starts], counts.astype("int64"), v[idx]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        v = round_half_away(
            g[value_col].to_numpy(np.float64) * scale).astype("int64")
        key = g[key_col].to_numpy()
        uk, n, med = _disc_median(key, v)
        # scatter med back per row via searchsorted on the sorted uniques
        pos = np.searchsorted(uk, key)
        dev = np.abs(v - med[pos])
        _, _, mad = _disc_median(key, dev)
        return pd.DataFrame({key_col: uk, "n": n,
                             "median_centi": med, "mad_centi": mad})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def last_touch(ds, key_col: str = "user_id", type_col: str = "event_type",
               ts_col: str = "ts", id_col: str = "event_id",
               touch: str = "click", target: str = "purchase",
               n_parts: int = 64):
    """Last-touch attribution: for every ``target`` event, the id of the
    latest STRICTLY-PRECEDING ``touch`` event of the same key in
    (ts, id) order (sentinel -1 when none — the asof-left convention).

    One key-hash shuffle; the per-partition sweep is a shifted running
    maximum over touch positions (reset at key boundaries), so ties and
    interleavings resolve exactly like the SQL
    ``last_value(... IGNORE NULLS) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` frame.  Returns
    (target_id, key, touch_id)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        typ = g[type_col].to_numpy()
        ids = g[id_col].to_numpy()
        n = len(ids)
        pos = np.arange(n)
        newkey = np.r_[True, key[1:] != key[:-1]]
        key_start = np.maximum.accumulate(np.where(newkey, pos, 0))
        touch_pos = np.where(typ == touch, pos, -1)
        run = np.maximum.accumulate(touch_pos)
        prev = np.r_[np.int64(-1), run[:-1]]          # strictly preceding
        prev = np.where(prev >= key_start, prev, -1)  # same-key only
        tgt = typ == target
        touch_ids = np.where(prev[tgt] >= 0, ids[prev[tgt]],
                             np.int64(-1))
        return pd.DataFrame({"target_id": ids[tgt],
                             key_col: key[tgt],
                             "touch_id": touch_ids})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def watermark_filter(ds, allowed_s: int, order_col: str = "event_id",
                     ts_col: str = "ts", n_buckets: int = 64):
    """Streaming late-data gate: processing order is ``order_col``
    (arrival sequence), the watermark before arrival i is the running
    MAX event-time over all strictly earlier arrivals, and a row is late
    iff ``ts < watermark - allowed_s`` (flink-style bounded lateness).

    Distributed prefix-max, never a driver scan: arrivals bucket by
    order-id range (pass 0 finds the id bounds), pass 1 folds per-bucket
    max event-times into an O(n_buckets) driver array whose EXCLUSIVE
    prefix-max is broadcast, pass 2 co-locates each bucket (bounded
    group count) and resolves the in-bucket running max vectorized.
    Returns the input rows + a ``kept`` bool column."""
    import ray

    allowed_us = allowed_s * _US

    lo = ds.min(order_col)
    hi = ds.max(order_col)
    span = max(int(hi) - int(lo) + 1, 1)

    def bucket_of(t: pa.Table) -> pa.Table:
        oid = pc.cast(t[order_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        b = (oid - lo) * n_buckets // span
        return t.append_column("_bkt", pa.array(b, pa.int32()))

    bds = ds.map_batches(bucket_of, batch_format="pyarrow")

    def bmax(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64())
        g = pa.table({"_bkt": t["_bkt"], "us": us}).group_by(
            "_bkt").aggregate([("us", "max")])
        return g.rename_columns(["_bkt", "mx"])

    # -inf stand-in far below any real event-time but safe to subtract
    # allowed_us from without int64 wraparound
    NEG = np.int64(-(2**62))

    parts = bds.map_batches(bmax, batch_format="pyarrow").to_pandas()
    mx = np.full(n_buckets, NEG, np.int64)
    for b, m in zip(parts["_bkt"], parts["mx"]):
        mx[int(b)] = max(mx[int(b)], int(m))
    excl = np.empty(n_buckets, np.int64)
    excl[0] = NEG
    np.maximum.accumulate(mx[:-1], out=mx[:-1])
    excl[1:] = mx[:-1]
    pre_ref = ray.put(excl)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(pre_ref)
        g = g.sort_values(order_col, kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        run = np.r_[NEG, np.maximum.accumulate(us)[:-1]]
        wm = np.maximum(run, pre[int(g["_bkt"].iloc[0])])
        # the first arrival's watermark is the -inf stand-in -> never late
        kept = us >= wm - allowed_us
        out = g.drop(columns="_bkt").copy()
        out["kept"] = kept
        return out

    return bds.groupby("_bkt").map_groups(per_bucket,
                                          batch_format="pandas")


def next_event_gap(ds, key_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", n_parts: int = 64):
    """Time-to-next-event per key (the LEAD sibling of :func:`lag_diff`;
    a churn / inter-arrival feature): gap_us to the key's next event in
    (ts, id) order, sentinel -1 on each key's last event so no NULL
    enters the value hash.  Same one-shuffle hash-partition sweep."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        gap = np.r_[us[1:] - us[:-1], np.int64(-1)]
        lastkey = np.r_[key[1:] != key[:-1], True]
        gap[lastkey] = -1
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: key,
                             "next_gap_us": gap})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def session_path_partials(ds, gap_s: int, k_steps: int = 3,
                          key_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id",
                          type_col: str = "event_type",
                          n_parts: int = 64):
    """Per-partition partial counts of session journey paths: sessions
    split at >``gap_s`` pauses (the :func:`sessionize` rule with the
    (ts, id) tie-break), a session's path is its first ``k_steps`` event
    types joined by ``>``.  Emits one (path, n) partial row per distinct
    path per partition — the path domain is bounded by
    |event types|^k_steps, so the caller folds partials driver-side
    (the `_sum_keyed_partials` contract) and the shuffle never carries
    event rows."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        newkey = np.r_[True, key[1:] != key[:-1]]
        brk = newkey | np.r_[True, (us[1:] - us[:-1]) > gap_s * _US]
        sid = np.cumsum(brk) - 1
        # rank within session, vectorized: position minus session start
        pos = np.arange(len(sid))
        sstart = np.maximum.accumulate(np.where(brk, pos, 0))
        rn = pos - sstart
        f = pd.DataFrame({"sid": sid[rn < k_steps],
                          "et": g[type_col].to_numpy()[rn < k_steps]})
        paths = f.groupby("sid", sort=True)["et"].agg(">".join)
        out = paths.value_counts().rename_axis("path").rename("n")
        return out.reset_index().astype({"n": "int64"})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def ohlc_bars(ds, key_col: str = "event_type", ts_col: str = "ts",
              id_col: str = "event_id", val_col: str = "value",
              bucket_s: int = 86_400):
    """OHLC candles per (key, time bucket): open/close = value at the
    min/max (ts, id) of the bucket (deterministic under ts ties via the
    id tie-break, the :func:`first_last` convention), plus low/high/n/
    sum.  The time-series resampling primitive (metrics rollups, price
    bars).

    Shape: the key domain is CONSTANT-bounded (event types × the data's
    calendar span — independent of row count), so this is the
    ``_sum_keyed_partials`` driver-fold shape extended with argmin/
    argmax merges: each block emits one row per (key, bucket) it
    touches, the driver folds O(keys × blocks) partial rows, input rows
    never leave the cluster.  For data-scaled keys use the
    :func:`first_last` hash-partition shape instead.  Values
    centi-scaled half-away (exact int64); ts normalized to us before
    bucketing (the ns-resolution gotcha, see :func:`gaps_islands`)."""
    bucket_us = bucket_s * _US

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        vc = round_half_away(
            t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0).astype("int64")
        df = pd.DataFrame({
            "k": t[key_col].to_numpy(zero_copy_only=False),
            "bucket": us // bucket_us,
            "us": us,
            "id": t[id_col].to_numpy(zero_copy_only=False),
            "vc": vc,
        }).sort_values(["us", "id"], kind="mergesort")
        agg = (df.groupby(["k", "bucket"], sort=False)
               .agg(o_us=("us", "first"), o_id=("id", "first"),
                    open_vc=("vc", "first"),
                    c_us=("us", "last"), c_id=("id", "last"),
                    close_vc=("vc", "last"),
                    low_vc=("vc", "min"), high_vc=("vc", "max"),
                    n=("vc", "size"), sum_vc=("vc", "sum"))
               .reset_index())
        for c in agg.columns.drop("k"):
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    # driver fold over bounded partial rows (keys × blocks)
    acc: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        key = (r["k"], r["bucket"])
        cur = acc.get(key)
        if cur is None:
            acc[key] = dict(r)
            continue
        if (r["o_us"], r["o_id"]) < (cur["o_us"], cur["o_id"]):
            cur["o_us"], cur["o_id"] = r["o_us"], r["o_id"]
            cur["open_vc"] = r["open_vc"]
        if (r["c_us"], r["c_id"]) > (cur["c_us"], cur["c_id"]):
            cur["c_us"], cur["c_id"] = r["c_us"], r["c_id"]
            cur["close_vc"] = r["close_vc"]
        cur["low_vc"] = min(cur["low_vc"], r["low_vc"])
        cur["high_vc"] = max(cur["high_vc"], r["high_vc"])
        cur["n"] += r["n"]
        cur["sum_vc"] += r["sum_vc"]
    rows = [acc[k] for k in sorted(acc, key=lambda kb: (str(kb[0]), kb[1]))]
    return pa.table({
        key_col: pa.array([r["k"] for r in rows]),
        "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
        "open_centi": pa.array([r["open_vc"] for r in rows], pa.int64()),
        "high_centi": pa.array([r["high_vc"] for r in rows], pa.int64()),
        "low_centi": pa.array([r["low_vc"] for r in rows], pa.int64()),
        "close_centi": pa.array([r["close_vc"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "sum_centi": pa.array([r["sum_vc"] for r in rows], pa.int64()),
    })


def rolling_outliers(ds, k: int = 50, z: int = 3, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value", n_parts: int = 64):
    """Trailing-window anomaly flags: rows whose value sits more than
    ``z`` population standard deviations from the mean of their own
    ROWS-(k-1)-PRECEDING window — streaming sensor/metrics QA, the
    windowed sibling of :func:`~.dataset_tools.iqr_outliers`.

    The z-test needs a sqrt, which would break exact comparison; both
    sides instead test the CROSS-MULTIPLIED square ``(n·v - s)² >
    z²·(n·q - s²)`` (s/q = window sum / sum of squares, all centi-int64
    — the variance inequality scaled by n²; n=1 windows have both sides
    0, never outliers).  Same one-shuffle hash-partition shape and
    cumsum-difference sweep as :func:`rolling_sum`, with a second
    cumsum for q.  Emits ONLY the flagged rows."""
    z2 = z * z

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        key = g[key_col].to_numpy()
        v = round_half_away(g[value_col].to_numpy() * 100).astype(np.int64)
        n = len(v)
        newkey = np.r_[True, key[1:] != key[:-1]]
        key_start = np.maximum.accumulate(np.where(newkey, np.arange(n), 0))
        cs = np.concatenate([[0], np.cumsum(v)])
        cq = np.concatenate([[0], np.cumsum(v * v)])
        lo = np.maximum(key_start, np.arange(1, n + 1) - k)
        s = cs[1:] - cs[lo]
        q = cq[1:] - cq[lo]
        nw = np.arange(1, n + 1) - lo
        lhs = (nw * v - s) ** 2
        rhs = z2 * (nw * q - s * s)
        m = lhs > rhs
        return pd.DataFrame({id_col: g[id_col].to_numpy()[m],
                             key_col: key[m],
                             "v_centi": v[m],
                             "n_win": nw[m].astype("int64")})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def rolling_median(ds, k: int = 5, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value", n_parts: int = 64):
    """Per-key moving MEDIAN over the last ``k`` rows ((ts, id) order) —
    the robust-baseline window (spike-insensitive where
    :func:`rolling_sum`'s mean is not).

    Exactness: pandas ``rolling(...).quantile(0.5, 'lower')`` selects
    index ``floor((n−1)/2)`` of the window's sorted values, which
    equals DuckDB's windowed ``quantile_disc(0.5)`` selection
    ``ceil(n/2)−1`` for every n — a pure selection over centi-ints, so
    the oracle compares exactly.  Same one-shuffle hash-partition
    shape as the other per-key windows; the sweep is pandas' C
    rolling kernel per partition."""
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        vc = round_half_away(
            g[value_col].to_numpy(np.float64) * 100.0).astype("int64")
        f = pd.DataFrame({key_col: g[key_col].to_numpy(),
                          id_col: g[id_col].to_numpy(), "vc": vc})
        med = (f.groupby(key_col, sort=False)["vc"]
               .rolling(k, min_periods=1)
               .quantile(0.5, interpolation="lower")
               .reset_index(drop=True))
        return pd.DataFrame({id_col: f[id_col].to_numpy(),
                             key_col: f[key_col].to_numpy(),
                             "med_centi": med.to_numpy().astype("int64")})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def locf_fill(ds, key_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", val_col: str = "value",
              period_us: int = 86_400_000_000, n_parts: int = 64):
    """Last-observation-carried-forward resample: one row per (key,
    period) from the key's first to last observed period, valued at the
    latest event on-or-before it ((ts, id)-ordered — deterministic
    under ts ties) — the gap-fill semantics a feature store / sensor
    rollup needs where :func:`gap_fill_months` zero-fill is wrong.

    One hash-partition shuffle, then a fully vectorized sweep per
    partition: last event per (key, period) via one sorted groupby,
    per-key spines materialized with the arange-offset trick, and the
    carry-forward lookup as ONE ``np.searchsorted`` over a dense
    (key_code · span + period) composite (spines start at each key's
    first period, so every probe lands inside its own key's range).
    Output rows are O(keys × calendar span) — the spine's inherent
    size, never more.  Values centi-scaled half-away (exact int64).
    Returns (key, day_us, centi).
    """
    from ..rounding import round_half_away

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        df = pd.DataFrame({
            "k": g[key_col].to_numpy(),
            "d": us // period_us,
            "us": us,
            "id": g[id_col].to_numpy(),
            "vc": round_half_away(
                g[val_col].to_numpy().astype(np.float64) * 100.0)
            .astype("int64"),
        }).sort_values(["k", "d", "us", "id"], kind="mergesort")
        led = df.groupby(["k", "d"], sort=True)["vc"].last().reset_index()
        if led.empty:
            return pd.DataFrame({key_col: pd.Series(dtype="object"),
                                 "day_us": pd.array([], dtype="int64"),
                                 "centi": pd.array([], dtype="int64")})
        codes, uniq = pd.factorize(led["k"], sort=True)
        ld = led["d"].to_numpy()
        lv = led["vc"].to_numpy()
        span = pd.DataFrame({"c": codes, "d": ld}).groupby("c")["d"] \
            .agg(["min", "max"])
        lo = span["min"].to_numpy()
        n_days = (span["max"] - span["min"] + 1).to_numpy()
        total = int(n_days.sum())
        starts = np.concatenate([[0], np.cumsum(n_days)[:-1]])
        krep = np.repeat(np.arange(len(lo)), n_days)
        drep = (np.arange(total) - np.repeat(starts, n_days)
                + np.repeat(lo, n_days))
        # composite keys are monotone in (code, day); side='right'-1 =
        # the key's latest led row on-or-before the spine day
        width = int(max(ld.max(), drep.max()) - min(ld.min(),
                                                    drep.min()) + 1)
        base = int(min(ld.min(), drep.min()))
        led_key = codes.astype(np.int64) * width + (ld - base)
        spine_key = krep.astype(np.int64) * width + (drep - base)
        pos = np.searchsorted(led_key, spine_key, side="right") - 1
        return pd.DataFrame({
            key_col: uniq[krep],
            "day_us": (drep * period_us).astype("int64"),
            "centi": lv[pos].astype("int64")})

    return _by_part(ds, key_col, n_parts=n_parts).groupby("_part").map_groups(
        lambda g: per_part(g.drop(columns="_part")), batch_format="pandas")


def path_topk(ds, k: int = 20, user_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              type_col: str = "event_type", n_parts: int = 16):
    """Top-``k`` daily event paths — the product-analytics "user
    journey" table: per (user, day) the ``>``-joined event-type
    sequence in (ts, id) order, counted across all users, top-k by
    (count desc, path asc).

    ONE user-hash partition co-locates each user's events (the
    sessionize shape); a vectorized per-partition pandas groupby-agg
    builds the path strings (the shuffle's OUTPUT is one row per
    (user, day), never re-shuffled at event granularity), then path
    counts ride :func:`~.dataset_tools.group_sum` (data-scaled string
    key) and the distributed sort takes the head.
    """
    from .dataset_tools import group_sum

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        g["_day"] = g[ts_col].dt.floor("D")
        out = (g.groupby([user_col, "_day"], sort=False)[type_col]
               .agg(">".join).reset_index(name="path"))
        out["one"] = np.ones(len(out), np.int64)
        return out[["path", "one"]]

    sess = (_by_part(ds, user_col, n_parts=n_parts)
            .groupby("_part")
            .map_groups(lambda g: paths(g.drop(columns="_part")),
                        batch_format="pandas"))
    counts = group_sum(sess, "path", ["one"], rename={"one": "n"})
    return (counts.sort(["n", "path"], descending=[True, False])
            .limit(k))


def lerp_fill(ds, key_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id", val_col: str = "value",
              period_us: int = 86_400_000_000, n_parts: int = 64):
    """Linear-interpolation resample — the interpolating sibling of
    :func:`locf_fill`: one row per (key, period) from the key's first
    to last observed period; anchor periods keep their (ts, id)-latest
    value, gaps take the exact integer lerp between the surrounding
    anchors: ``centi = (v0·(d1−d) + v1·(d−d0)) // (d1−d0)`` — the
    sensor/feature-store fill where carry-forward staircases are wrong.

    Integer division matches the oracle's ``//`` on the NON-NEGATIVE
    value domain (DuckDB ``//`` truncates, numpy floors — equal for
    non-negative numerators; documented precondition, same class as
    event_markov).  One hash-partition shuffle; per key the spine and
    both anchor lookups are vectorized ``np.searchsorted`` probes.
    Returns (key, day_us, centi) — anchor rows byte-equal to locf's.
    """
    from ..rounding import round_half_away

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        df = pd.DataFrame({
            "k": g[key_col].to_numpy(),
            "d": us // period_us,
            "us": us,
            "id": g[id_col].to_numpy(),
            "vc": round_half_away(
                g[val_col].to_numpy().astype(np.float64) * 100.0)
            .astype("int64"),
        }).sort_values(["k", "d", "us", "id"], kind="mergesort")
        led = df.groupby(["k", "d"], sort=True)["vc"].last().reset_index()
        ks, ds_, vs = [], [], []
        for k, sub in led.groupby("k", sort=True):
            days = sub["d"].to_numpy(np.int64)
            vals = sub["vc"].to_numpy(np.int64)
            spine = np.arange(days[0], days[-1] + 1, dtype=np.int64)
            i_next = np.searchsorted(days, spine, side="left")
            i_prev = np.searchsorted(days, spine, side="right") - 1
            d0, v0 = days[i_prev], vals[i_prev]
            d1, v1 = days[i_next], vals[i_next]
            anchor = d0 == d1
            gap = np.maximum(d1 - d0, 1)
            lerp = (v0 * (d1 - spine) + v1 * (spine - d0)) // gap
            ks.append(np.full(len(spine), k))
            ds_.append(spine)
            vs.append(np.where(anchor, v0, lerp))
        if not ks:
            return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                                 "day_us": pd.array([], dtype="int64"),
                                 "centi": pd.array([], dtype="int64")})
        return pd.DataFrame({
            key_col: np.concatenate(ks),
            "day_us": np.concatenate(ds_) * period_us,
            "centi": np.concatenate(vs).astype("int64")})

    return (_by_part(ds, key_col, n_parts=n_parts)
            .groupby("_part")
            .map_groups(lambda g: per_part(g.drop(columns="_part")),
                        batch_format="pandas"))


def lateness_quantiles(ds, order_col: str = "event_id",
                       ts_col: str = "ts", n_buckets: int = 64,
                       qs: tuple = (0.5, 0.9, 0.99)):
    """Out-of-orderness profile of an event stream — the diagnostic
    that SIZES a :func:`watermark_filter` allowance: per arrival,
    ``late = (inclusive running max event-time over arrival order) −
    event-time`` (0 for watermark-advancing arrivals), reported as
    exact ``quantile_disc`` selections + the max, in microseconds.

    Same distributed prefix-max as the watermark gate (bucket by
    order-id range, O(n_buckets) driver fold, broadcast exclusive
    prefix, vectorized in-bucket running max — inclusive here, so no
    sentinel leaves the driver), then the quantiles are exact global
    order statistics via :func:`~.dataset_tools.rank_select` — no
    value ever materializes on the driver.  Returns one row
    (n, p50_us, p90_us, p99_us, max_us).
    """
    import math

    import ray

    from .dataset_tools import rank_select

    lo = ds.min(order_col)
    hi = ds.max(order_col)
    span = max(int(hi) - int(lo) + 1, 1)

    def bucket_of(t: pa.Table) -> pa.Table:
        oid = pc.cast(t[order_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        b = (oid - lo) * n_buckets // span
        return t.append_column("_bkt", pa.array(b, pa.int32()))

    bds = ds.map_batches(bucket_of, batch_format="pyarrow").materialize()

    def bmax(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        g = pa.table({"_bkt": t["_bkt"], "us": us}).group_by(
            "_bkt").aggregate([("us", "max")])
        return g.rename_columns(["_bkt", "mx"])

    NEG = np.int64(-(2 ** 62))
    parts = bds.map_batches(bmax, batch_format="pyarrow").to_pandas()
    mx = np.full(n_buckets, NEG, np.int64)
    for b, m in zip(parts["_bkt"], parts["mx"]):
        mx[int(b)] = max(mx[int(b)], int(m))
    excl = np.empty(n_buckets, np.int64)
    excl[0] = NEG
    np.maximum.accumulate(mx[:-1], out=mx[:-1])
    excl[1:] = mx[:-1]
    pre_ref = ray.put(excl)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(pre_ref)
        g = g.sort_values(order_col, kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        run = np.maximum.accumulate(us)          # INCLUSIVE running max
        wm = np.maximum(run, pre[int(g["_bkt"].iloc[0])])
        return pd.DataFrame({"late": (wm - us).astype("int64")})

    lates = (bds.groupby("_bkt")
             .map_groups(per_bucket, batch_format="pandas"))
    n = ds.count()
    ranks = [max(math.ceil(q * n) - 1, 0) for q in qs] + [n - 1]
    rows = rank_select(lates, ["late"], ranks)
    vals = [int(r["late"]) for r in rows]
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "p50_us": pd.array([vals[0]], dtype="int64"),
        "p90_us": pd.array([vals[1]], dtype="int64"),
        "p99_us": pd.array([vals[2]], dtype="int64"),
        "max_us": pd.array([vals[3]], dtype="int64")})
