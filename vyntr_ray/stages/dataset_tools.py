"""Dataset hygiene operators: top-K largest + broadcast anti-join removal.

- ``topk_largest``  — K1: keep the K records with the longest text
  (`genesis/tools/dataset/find_largest.js:16-56,129-156`; the per-file
  tracker → merge → final sort is exactly what Ray's distributed
  ``sort().limit()`` does internally).  Deterministic tiebreak on ``doc_id``
  (the reference's insertion order is file-order-dependent).
- ``remove_largest`` — J1/D3: anti-join of the corpus against the removal
  set (`genesis/tools/dataset/remove_largest.js:9-93`), implemented as a
  broadcast of the small side (``ray.put`` once) filtered inside
  ``map_batches`` — no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["topk_largest", "remove_largest", "group_quantiles",
           "group_quantiles_cont", "group_topk", "group_quantiles_approx",
           "pivot_counts", "rollup_counts", "distinct_rows", "group_mode",
           "histogram_fixed", "skyline", "cube_counts", "table_profile",
           "group_sum", "group_fold", "grouping_sets", "pivot_sum",
           "iqr_outliers", "key_skew", "group_topk_ties",
           "chi2_independence", "winsorized_stats", "lift_table",
           "ks_statistic", "gini_index", "mwu_statistic",
           "psi_statistic", "snapshot_diff", "fk_orphans", "json_field_stats",
           "benford_deviation", "group_moments",
           "mahalanobis_outliers"]


def topk_largest(ds, k: int = 100, length_col: str = "n_chars",
                 id_col: str = "doc_id"):
    """sort(length desc, id asc).limit(k) — distributed top-K."""
    return ds.sort([length_col, id_col], descending=[True, False]).limit(k)


def remove_largest(ds, k: int = 100, length_col: str = "n_chars",
                   id_col: str = "doc_id"):
    """Corpus MINUS its top-K largest records (broadcast anti-join)."""
    import ray

    removal_ids = sorted(r[id_col] for r in topk_largest(
        ds, k, length_col, id_col).select_columns([id_col]).take_all())
    # broadcast the Arrow value-set ONCE (built here, not per batch)
    removal_ref = ray.put(pa.array(removal_ids, pa.int64()))

    def anti(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(
            batch[id_col], value_set=ray.get(removal_ref)))
        return batch.filter(mask)

    return ds.map_batches(anti, batch_format="pyarrow")


def group_quantiles(ds, group_col: str, value_col: str,
                    qs: tuple = (0.25, 0.5, 0.95)):
    """Exact per-group discrete quantiles.

    Matches DuckDB's ``quantile_disc`` convention (verified empirically):
    the sorted element at index ``ceil(q*n) - 1``.  Pure SELECTION, no
    interpolation arithmetic — the result is an element of the input set,
    so even float columns compare exactly against the oracle.  Scale
    note: ``map_groups`` holds one group's values in a worker; for a
    group too big for one heap, swap in per-batch partial histograms
    (the groupby shuffle and output schema stay the same).
    """
    import math

    import numpy as np
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy())
        n = len(v)
        row = {group_col: [g[group_col].iloc[0]]}
        for q in qs:
            row[f"q{int(round(q * 100))}"] = [
                v[min(n - 1, max(0, math.ceil(q * n) - 1))]]
        return pd.DataFrame(row)

    return ds.groupby(group_col).map_groups(agg, batch_format="pandas")


def group_quantiles_cont(ds, group_col: str, value_col: str,
                         qs_pct: tuple = (25, 50, 95)):
    """Exact per-group INTERPOLATED quantiles (the ``quantile_cont``
    convention: index ``h = q*(n-1)``, linear blend of the two straddling
    order statistics) — the continuous sibling of :func:`group_quantiles`.

    Interpolation normally forces float arithmetic; here it stays exact
    int64: values are 2-decimal so ``v_centi = round(v*100)`` is exact,
    and with ``q = p/100`` the index splits as ``idx, rem = divmod(
    p*(n-1), 100)`` so ``result * 10^4 = v_centi[idx]*100 + rem *
    (v_centi[idx+1] - v_centi[idx])`` — the output columns are in 1e-4
    units (``q{p}_e4``), comparable bit-for-bit against a SQL oracle
    that mirrors the same integer formula.  Group count is bounded
    (one row per group), same scale note as :func:`group_quantiles`.
    """
    import numpy as np
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        from ..rounding import round_half_away
        v = np.sort(round_half_away(g[value_col].to_numpy() * 100)
                    .astype(np.int64))
        n = len(v)
        row = {group_col: [g[group_col].iloc[0]]}
        for p in qs_pct:
            idx, rem = divmod(int(p) * (n - 1), 100)
            lo = int(v[idx])
            hi = int(v[min(idx + 1, n - 1)])
            row[f"q{int(p)}_e4"] = [lo * 100 + rem * (hi - lo)]
        return pd.DataFrame(row)

    return ds.groupby(group_col).map_groups(agg, batch_format="pandas")


def distinct_rows(ds, cols: list, part_key: str | None = None,
                  n_parts: int = 64):
    """Exact DISTINCT over ``cols`` — the many-groups rule applied to
    dedup: hash-partition on ``part_key`` (default ``cols[0]``; any
    column whose co-location implies row co-location works) and run ONE
    vectorized ``drop_duplicates`` per partition, instead of a
    groupby-count Aggregate that tracks every distinct row as its own
    group (measured 8.7 s vs ~1 s for a 600k-row / 240k-distinct
    two-key dedup at sf0.1, PERF.md)."""
    from vyntr_ray.stages.windows import _by_part

    def dd(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(subset=cols)[cols]

    return (_by_part(ds, part_key or cols[0], n_parts=n_parts)
            .groupby("_part")
            .map_groups(lambda g: dd(g.drop(columns="_part")),
                        batch_format="pandas"))


def rollup_counts(ds, col1: str, col2: str, value_col: str,
                  all_label: str = "ALL"):
    """GROUP BY ROLLUP(col1, col2): count + sum(value) at three
    granularities — (col1, col2), (col1), and the grand total — with
    ``all_label`` standing in for the rolled-up column (a sentinel, so
    NULLs never enter the driver's value hash).

    One distributed pass: per-batch pandas partials pre-aggregate to the
    fine level (combiner pattern), one groupby sums them; the coarser
    levels derive from the FINE-LEVEL result, which is bounded by the
    category-cardinality product — O(|col1| x |col2|) driver rows, the
    same bounded-driver shape as the sampling/sketch operators.

    Null categories are kept as their own groups through every level
    (``dropna=False`` — SQL ROLLUP groups NULLs too) and mapped to
    ``all_label`` only at emit time, mirroring the oracle's
    ``coalesce(col, 'ALL')`` exactly (including the label collision when
    a real category is literally named 'ALL' — both sides collide the
    same way).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([col1, col2], as_index=False, dropna=False)
                .agg(n=(value_col, "size"), total=(value_col, "sum")))

    fine = (ds.map_batches(partial, batch_format="pandas")
            .groupby([col1, col2])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total"))
            .to_pandas())
    lvl1 = (fine.groupby(col1, as_index=False, dropna=False)[
        ["n", "total"]].sum().assign(**{col2: all_label}))
    lvl0 = pd.DataFrame({col1: [all_label], col2: [all_label],
                         "n": [fine["n"].sum()],
                         "total": [fine["total"].sum()]})
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out[col1] = out[col1].fillna(all_label)
    out[col2] = out[col2].fillna(all_label)
    out["n"] = out["n"].astype("int64")
    out["total"] = out["total"].astype("int64")
    return out[[col1, col2, "n", "total"]]


def group_topk(ds, group_col: str, value_col: str, id_col: str, k: int = 3):
    """Top-k rows per group by (value desc, id asc).

    Distributed in the knn_join shape: each batch emits only ITS top-k
    per group (shuffle bounded by groups-per-batch x k rows, never the
    corpus), then one ``groupby(group)`` merge re-selects by the same
    order — partial + merge = exact because the selection order is total.
    """
    import pandas as pd

    def partial(b) -> "pd.DataFrame":
        df = b.sort_values([group_col, value_col, id_col],
                           ascending=[True, False, True], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([value_col, id_col], ascending=[False, True],
                          kind="mergesort")
        return g.head(k)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def group_quantiles_approx(ds, group_col: str, value_col: str,
                           qs: tuple = (0.25, 0.5, 0.95),
                           n_bins: int = 2048,
                           lo: float | None = None,
                           hi: float | None = None):
    """Scale path for :func:`group_quantiles`: fixed-bin partial
    histograms.

    Each batch emits one (group, bin, count) partial table (bounded:
    groups-per-batch x occupied bins, never the rows), a single
    ``groupby([group, bin]).sum`` merges them, and tiny per-group
    ``map_groups`` inverts the cumulative histogram.  Error is bounded
    by the bin width ``(hi - lo) / n_bins``; pass the value range when
    known, else a driver-side min/max aggregate (two tiny scalars) sizes
    the bins.  Unlike the exact operator, no group's raw values are ever
    co-located.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if lo is None or hi is None:
        from ray.data.aggregate import Max, Min
        stats = ds.aggregate(Min(value_col), Max(value_col))
        lo = float(stats[f"min({value_col})"]) if lo is None else lo
        hi = float(stats[f"max({value_col})"]) if hi is None else hi
    width = (hi - lo) / n_bins or 1.0

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "v": b[value_col].to_pylist()})
        bins = np.clip(((df["v"] - lo) / width).astype(np.int64),
                       0, n_bins - 1)
        agg = (pd.DataFrame({group_col: df[group_col], "bin": bins})
               .groupby([group_col, "bin"], sort=False)
               .size().rename("n").reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum
    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "bin"])
            .aggregate(Sum("n", alias_name="n")))

    def invert(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        row = {group_col: [g[group_col].iloc[0]]}
        for q in qs:
            target = max(1, math.ceil(q * total))
            i = int(np.searchsorted(cum, target, side="left"))
            b = int(g["bin"].iloc[i])
            # bin upper edge = conservative estimate of the q-quantile
            row[f"q{int(round(q * 100))}"] = [lo + (b + 1) * width]
        return pd.DataFrame(row)

    return hist.groupby(group_col).map_groups(invert, batch_format="pandas")


def pivot_counts(ds, key_col: str, cat_col: str,
                 categories: list[str] | None = None):
    """Wide table of per-key category counts (classic pivot).

    Two stages, both bounded: each batch pre-aggregates into one
    (key, <cat> columns) partial frame — the combiner pattern, so the
    shuffle carries at most keys-per-batch rows — then one
    ``groupby(key).sum`` merges partials.  ``categories`` fixes the
    output schema; when omitted, a tiny distinct-values pass discovers
    it (driver holds one row per category, never per key).
    """
    import pandas as pd
    import pyarrow as pa

    if categories is None:
        categories = sorted(ds.select_columns([cat_col]).unique(cat_col))
    cols = [f"n_{c}" for c in categories]

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: b[key_col].to_pylist(),
                           cat_col: b[cat_col].to_pylist()})
        ct = pd.crosstab(df[key_col], df[cat_col])
        out = pd.DataFrame({key_col: ct.index})
        for c, name in zip(categories, cols):
            out[name] = (ct[c].to_numpy() if c in ct.columns
                         else 0)
            out[name] = out[name].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    # key_col is data-scaled (one row per key): many-groups rule —
    # fold the partials with group_sum, never a generic Aggregate
    return group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     key_col, cols, n_parts=16)


def group_mode(ds, group_col: str, value_col: str,
               fold_cap: int = 2_000_000):
    """Most frequent value per group, ties broken by the SMALLEST value
    (a total order, so partial + fold = exact).

    Per-block partial (group, value) counts — bounded by the CATEGORY
    cardinality product, the rollup_counts precondition; never use this
    for data-scaled value columns — folded on the driver
    (O(#blocks x |groups| x |values|) rows), then one argmax per group.
    Returns (group, mode, n).  No reference counterpart (SURVEY §2.9
    training-analytics additions).
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([group_col, value_col], as_index=False).size()
        out.columns = [group_col, value_col, "n"]
        return out

    parts = pd.DataFrame(
        ds.map_batches(partial, batch_format="pandas").take_all())
    if len(parts) > fold_cap:
        raise ValueError(
            f"group_mode: {len(parts)} partial rows (> fold_cap="
            f"{fold_cap}) — value column is data-scaled; this operator "
            "requires bounded category cardinality (see docstring)")
    tot = parts.groupby([group_col, value_col], as_index=False)["n"].sum()
    tot = tot.sort_values([group_col, "n", value_col],
                          ascending=[True, False, True], kind="mergesort")
    top = (tot.groupby(group_col, as_index=False).head(1)
           .reset_index(drop=True)
           .rename(columns={value_col: "mode"}))
    top["n"] = top["n"].astype("int64")
    return top[[group_col, "mode", "n"]]


def histogram_fixed(ds, value_col: str, width_centi: int,
                    scale: int = 100, fold_cap: int = 2_000_000):
    """Fixed-width histogram over integer-scaled values — zero shuffle,
    the q6ish litmus shape: each block emits one partial row per
    OCCUPIED bin (bounded by value-range/width, never by rows), the
    driver folds O(#blocks x #bins) rows.  Bin = floor division of the
    per-row half-away-rounded centi value (exact at any float input
    precision); returns (bin, bin_lo_centi, n, sum_centi).
    """
    import numpy as np
    import pandas as pd

    from ..rounding import round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = round_half_away(df[value_col].to_numpy() * scale).astype(
            np.int64)
        out = (pd.DataFrame({"bin": v // width_centi, "v": v})
               .groupby("bin", as_index=False)
               .agg(n=("v", "size"), sum_centi=("v", "sum")))
        return out

    parts = pd.DataFrame(
        ds.map_batches(partial, batch_format="pandas").take_all())
    if len(parts) > fold_cap:
        raise ValueError(
            f"histogram_fixed: {len(parts)} partial rows (> fold_cap="
            f"{fold_cap}) — widen width_centi (bins must be bounded by "
            "range/width, not rows)")
    g = (parts.groupby("bin", as_index=False)[["n", "sum_centi"]].sum()
         .sort_values("bin").reset_index(drop=True))
    g["bin"] = g["bin"].astype("int64")
    g["n"] = g["n"].astype("int64")
    g["sum_centi"] = g["sum_centi"].astype("int64")
    g.insert(1, "bin_lo_centi", (g["bin"] * width_centi).astype("int64"))
    return g


def _sky_local(df, x_col: str, y_col: str):
    """All rows not STRICTLY dominated within ``df`` (maximize x,
    minimize y; b dominates a iff x_b >= x_a, y_b <= y_a, one strict).
    Vectorized: sort x desc / y asc; a row survives iff its y equals the
    min y of its own x-group AND is strictly below the min y of every
    higher x-group (prefix min over group minima)."""
    import numpy as np

    df = df.sort_values([x_col, y_col], ascending=[False, True],
                        kind="mergesort")
    x = df[x_col].to_numpy()
    y = df[y_col].to_numpy()
    if len(x) == 0:
        return df
    newx = np.r_[True, x[1:] != x[:-1]]
    gid = np.cumsum(newx) - 1
    first_idx = np.flatnonzero(newx)
    e = y[first_idx][gid]                      # min y within own x-group
    ge = y[first_idx]                          # per-group min y, x desc
    pm = np.minimum.accumulate(ge)
    m_prev = np.empty_like(pm)
    m_prev[0] = np.iinfo(np.int64).max
    m_prev[1:] = pm[:-1]
    keep = (y == e) & (y < m_prev[gid])
    return df[keep]


def skyline(ds, x_col: str, y_col: str, front_cap: int = 2_000_000):
    """2-D Pareto front (skyline): rows with no strict dominator when
    maximizing ``x_col`` and minimizing ``y_col`` (both int64).

    Distributed as local-skyline-per-block -> skyline of the union:
    dominance is transitive, so any dominated point's dominator chain
    ends at a global skyline point that survives its own block's local
    pass — the union pass then removes the dominated point.  The driver
    holds only concatenated local skylines (small on real data; the
    worst case — fully anticorrelated x/y — is the whole input, a
    documented precondition like the rollup bound).  Duplicate skyline
    points are aggregated to (x, y, n) so output hashing is stable.
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _sky_local(df[[x_col, y_col]], x_col, y_col)

    locs = pd.DataFrame(
        ds.map_batches(partial, batch_format="pandas").take_all())
    if len(locs) > front_cap:
        # fully anticorrelated data: the front IS the input; raise
        # loudly instead of silently OOMing the driver (the q18ish
        # size-guard discipline)
        raise ValueError(
            f"skyline: union of local fronts has {len(locs)} rows "
            f"(> front_cap={front_cap}); the Pareto front itself is "
            "input-sized — this operator's driver fold does not apply")
    if locs.empty:
        return pd.DataFrame({x_col: pd.array([], dtype="int64"),
                             y_col: pd.array([], dtype="int64"),
                             "n": pd.array([], dtype="int64")})
    front = _sky_local(locs, x_col, y_col)
    out = front.groupby([x_col, y_col], as_index=False).size()
    out.columns = [x_col, y_col, "n"]
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def cube_counts(ds, col1: str, col2: str, value_col: str,
                all_label: str = "ALL"):
    """GROUP BY CUBE(col1, col2): the :func:`rollup_counts` lattice plus
    the (ALL, col2) margin — all four granularities from ONE distributed
    pass.  Same bounded-fine-level contract (category-cardinality
    product), same NULL-as-group and sentinel-collision semantics as
    rollup; every coarser level derives from the fine result on the
    driver (O(|col1| x |col2|) rows)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([col1, col2], as_index=False, dropna=False)
                .agg(n=(value_col, "size"), total=(value_col, "sum")))

    fine = (ds.map_batches(partial, batch_format="pandas")
            .groupby([col1, col2])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total"))
            .to_pandas())
    lvl1 = (fine.groupby(col1, as_index=False, dropna=False)[
        ["n", "total"]].sum().assign(**{col2: all_label}))
    lvl2 = (fine.groupby(col2, as_index=False, dropna=False)[
        ["n", "total"]].sum().assign(**{col1: all_label}))
    lvl0 = pd.DataFrame({col1: [all_label], col2: [all_label],
                         "n": [fine["n"].sum()],
                         "total": [fine["total"].sum()]})
    out = pd.concat([fine, lvl1, lvl2, lvl0], ignore_index=True)
    out[col1] = out[col1].fillna(all_label)
    out[col2] = out[col2].fillna(all_label)
    out["n"] = out["n"].astype("int64")
    out["total"] = out["total"].astype("int64")
    return out[[col1, col2, "n", "total"]]


def _canon_str(arr: "pa.ChunkedArray | pa.Array") -> list:
    """Equality-faithful string form per value (injective on distinct
    values, equal values -> equal strings): strings pass through, ints
    and timestamps via int64, floats via shortest-roundtrip repr.
    Nulls return None."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return arr.to_pylist()
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return [None if v is None else str(v)
                for v in pc.cast(arr, pa.int64()).to_pylist()]
    if pa.types.is_floating(t):
        return [None if v is None else repr(v) for v in arr.to_pylist()]
    return [None if v is None else str(v) for v in arr.to_pylist()]


def table_profile(ds, cols: list, n_parts: int = 64):
    """Per-column data profile: (column, n, n_null, n_distinct) — the
    scan a data engineer runs before trusting a new 100-TB drop.

    Two distributed passes, both bounded on the driver:

    * counts — each block emits one (col, n, n_null) row per column
      (O(#blocks x #cols) driver rows, the histogram_fixed fold);
    * n_distinct — each block emits its block-LOCAL distinct
      (col, canonical-value) pairs (``dictionary_encode``, so the
      shuffle carries per-block uniques, never rows), one hash-partition
      ``drop_duplicates`` on the value hash dedups globally, and
      per-partition counts fold on the driver.  Nulls are excluded,
      matching SQL ``count(DISTINCT col)``.

    The canonical string form only ever feeds EQUALITY (no formatting
    parity with SQL needed — outputs are counts)."""
    import pandas as pd

    from vyntr_ray.stages.windows import _by_part

    def counts(t: pa.Table) -> pa.Table:
        rows = [(c, t.num_rows, t[c].null_count) for c in cols]
        return pa.table({
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_null": pa.array([r[2] for r in rows], pa.int64())})

    cnt = pd.DataFrame(
        ds.map_batches(counts, batch_format="pyarrow").take_all())
    cnt = (cnt.groupby("column", as_index=False)[["n", "n_null"]].sum())

    def pairs(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = pc.unique(pc.cast(t[c], t[c].type))
            for s in _canon_str(u):
                if s is not None:
                    names.append(c)
                    vals.append(s)
        return pa.table({"column": pa.array(names, pa.string()),
                         "v": pa.array(vals, pa.string())})

    def dd_count(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(subset=["column", "v"])
        out = u.groupby("column", as_index=False).size()
        out.columns = ["column", "n_distinct"]
        return out

    nd = pd.DataFrame(
        _by_part(ds.map_batches(pairs, batch_format="pyarrow"),
                 "v", n_parts=n_parts)
        .groupby("_part")
        .map_groups(lambda g: dd_count(g.drop(columns="_part")),
                    batch_format="pandas").take_all())
    nd = nd.groupby("column", as_index=False)["n_distinct"].sum()

    out = cnt.merge(nd, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    for c in ["n", "n_null", "n_distinct"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("column").reset_index(drop=True)


def group_fold(ds, key_col: str, cols: list, how: str = "sum",
               n_parts: int = 16, rename: dict | None = None,
               int_cast: bool = True):
    """Generalized :func:`group_sum`: any associative-commutative
    pandas fold (``sum``/``min``/``max``) over data-scaled keys with
    the same combiner -> ONE hash partition -> vectorized fold shape.
    ``int_cast=False`` preserves the input dtypes (string mins, etc.)."""
    import pandas as pd

    from vyntr_ray.stages.windows import _by_part

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[cols].agg(how)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, as_index=False)[cols].agg(how)
        if int_cast:
            for c in cols:
                out[c] = out[c].astype("int64")
        if rename:
            out = out.rename(columns=rename)
        return out

    return (_by_part(ds.map_batches(partial, batch_format="pandas"),
                     key_col, n_parts=n_parts)
            .groupby("_part")
            .map_groups(lambda g: fold(g.drop(columns="_part")),
                        batch_format="pandas"))


def group_sum(ds, key_col: str, cols: list, n_parts: int = 16,
              rename: dict | None = None):
    """Keyed int64 sums for DATA-SCALED keys — the many-groups rule
    applied to SUM: Ray's generic Aggregate costs by GROUP COUNT (PERF
    r3: 1.7k string-key groups ~30 s; 8k int keys measured ~4 s where
    this shape takes ~1 s), so instead each block pre-aggregates its own
    (key, sums) partials (combiner: shuffle carries keys-per-block rows,
    never input rows), ONE md5 hash-partition shuffle co-locates keys,
    and a vectorized pandas groupby folds each partition.  For
    CONSTANT-bounded key domains prefer the zero-shuffle driver fold
    (__ray_entry__._sum_keyed_partials).  See :func:`group_fold` for
    min/max."""
    return group_fold(ds, key_col, cols, how="sum", n_parts=n_parts,
                      rename=rename)


def grouping_sets(ds, col1: str, col2: str, value_col: str,
                  sets: tuple = ((0, 1), (0,), (1,), ()),
                  all_label: str = "ALL"):
    """GROUP BY GROUPING SETS over (col1, col2): any subset lattice —
    :func:`rollup_counts` and :func:`cube_counts` are the two standard
    instances; this generalizes to an explicit set list (each set names
    the kept column positions).  Same single-distributed-pass contract:
    the fine level is computed once (bounded by the category-cardinality
    product) and every requested set derives from it on the driver."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([col1, col2], as_index=False, dropna=False)
                .agg(n=(value_col, "size"), total=(value_col, "sum")))

    fine = (ds.map_batches(partial, batch_format="pandas")
            .groupby([col1, col2])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total"))
            .to_pandas())
    out_parts = []
    for kept in sets:
        keep_cols = [c for i, c in enumerate((col1, col2)) if i in kept]
        if keep_cols:
            lvl = (fine.groupby(keep_cols, as_index=False, dropna=False)[
                ["n", "total"]].sum())
        else:
            lvl = pd.DataFrame({"n": [fine["n"].sum()],
                                "total": [fine["total"].sum()]})
        for c in (col1, col2):
            if c not in lvl.columns:
                lvl[c] = all_label
        out_parts.append(lvl[[col1, col2, "n", "total"]])
    out = pd.concat(out_parts, ignore_index=True)
    out[col1] = out[col1].fillna(all_label)
    out[col2] = out[col2].fillna(all_label)
    out["n"] = out["n"].astype("int64")
    out["total"] = out["total"].astype("int64")
    return out



def pivot_sum(ds, key_col: str, cat_col: str, value_col: str,
              categories: list[str] | None = None):
    """Wide per-key SUMS by category (pivot-aggregate): the value
    column must already be exact int64 (centi-scale upstream).  Same
    two bounded stages as :func:`pivot_counts` — per-batch crosstab
    partials, then the many-groups :func:`group_sum` fold."""
    import pandas as pd
    import pyarrow as pa

    if categories is None:
        categories = sorted(ds.select_columns([cat_col]).unique(cat_col))
    cols = [f"sum_{c}" for c in categories]

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: b[key_col].to_pylist(),
                           cat_col: b[cat_col].to_pylist(),
                           "_v": b[value_col].to_numpy(
                               zero_copy_only=False)})
        ct = df.pivot_table(index=key_col, columns=cat_col, values="_v",
                            aggfunc="sum", fill_value=0)
        out = pd.DataFrame({key_col: ct.index})
        for c, name in zip(categories, cols):
            out[name] = (ct[c].to_numpy() if c in ct.columns else 0)
            out[name] = out[name].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     key_col, cols, n_parts=16)

def rank_select(ds, cols: list, ranks: list):
    """Exact global order statistics: the rows sitting at the given
    0-based ``ranks`` in lexicographic ascending ``cols`` order.

    Distributed selection: ``Dataset.sort`` (Ray's range-partitioned
    sample sort — the scale path), then the driver sees only O(blocks)
    row COUNTS (one tiny len task per sorted block) to place each rank,
    and one ``take`` task per hit block returns just the selected rows.
    The data never materializes on the driver.  Output: list of row
    dicts, in ``ranks`` order (ranks must be < count; duplicates ok).
    """
    import numpy as np
    import ray

    s = ds.sort(cols).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def _nrows(t):
        return t.num_rows

    @ray.remote
    def _pick(t, idxs):
        return t.take(idxs).to_pylist()

    counts = ray.get([_nrows.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(counts)])
    per_block: dict = {}
    for pos, r in enumerate(ranks):
        b = int(np.searchsorted(offs, r, side="right") - 1)
        per_block.setdefault(b, []).append((pos, int(r - offs[b])))
    keys = sorted(per_block)
    got = ray.get([_pick.remote(refs[b],
                                [i for _, i in per_block[b]])
                   for b in keys])
    out = [None] * len(ranks)
    for b, rows in zip(keys, got):
        for (pos, _), row in zip(per_block[b], rows):
            out[pos] = row
    return out


def _ntile_cut_ranks(n: int, q: int) -> list:
    """SQL NTILE boundary ranks: 0-based rank of each tile's LAST row
    (first ``n % q`` tiles get the extra row)."""
    base, rem = divmod(n, q)
    sizes = [base + (1 if i < rem else 0) for i in range(q)]
    import numpy as np
    return [int(c) - 1 for c in np.cumsum(sizes)[:q - 1]]


def rfm_segments(ds, key_col: str = "o_custkey",
                 ts_col: str = "o_orderdate",
                 price_col: str = "o_totalprice", q: int = 4):
    """RFM customer segmentation: per-customer Recency (last order
    epoch-us), Frequency (order count), Monetary (centi-int spend),
    each labeled with its global NTILE(q) quartile over (metric ASC,
    custkey) order.

    Fully distributed at every step: per-batch partials -> ONE hash
    partition mixed fold (max/sum/sum) for the aggregates; then for
    each metric the NTILE boundary rows are found by
    :func:`rank_select` (sorted-block counting — the driver holds only
    3 boundary pairs per metric, never customer rows), broadcast, and
    every tile label is a vectorized two-key comparison.  Cost: one
    shuffle for the fold + one Dataset.sort per metric.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..rounding import round_half_away
    from .windows import _by_part

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            _m=round_half_away(
                g[price_col].to_numpy() * 100).astype("int64"),
            _r=g[ts_col].to_numpy().astype("datetime64[us]")
            .astype("int64"))
        return g.groupby(key_col, as_index=False).agg(
            r_us=("_r", "max"), f=("_r", "size"), m_centi=("_m", "sum"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, as_index=False).agg(
            r_us=("r_us", "max"), f=("f", "sum"),
            m_centi=("m_centi", "sum"))
        for c in ("r_us", "f", "m_centi"):
            out[c] = out[c].astype("int64")
        return out

    agg = (_by_part(ds.map_batches(partial, batch_format="pandas"),
                    key_col)
           .groupby("_part")
           .map_groups(lambda g: fold(g.drop(columns="_part")),
                       batch_format="pandas")
           .materialize())

    n = agg.count()
    cuts = _ntile_cut_ranks(n, q)
    metrics = ("r_us", "f", "m_centi")
    bounds = {}
    for col in metrics:
        rows = rank_select(agg, [col, key_col], cuts)
        bounds[col] = [(int(r[col]), int(r[key_col])) for r in rows]
    bref = ray.put(bounds)

    def tile(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = t[key_col].to_numpy()
        out = {key_col: t[key_col]}
        for col in metrics:
            x = t[col].to_numpy()
            tl = np.ones(len(x), np.int64)
            for bx, bk in b[col]:
                tl += ((x > bx) | ((x == bx) & (keys > bk))) \
                    .astype(np.int64)
            out[col] = t[col]
            out[col + "_tile"] = pa.array(tl, pa.int64())
        return pa.table(out)

    return agg.map_batches(tile, batch_format="pyarrow")


def iqr_outliers(ds, group_col: str, value_col: str):
    """Tukey-fence outlier audit per group: count values outside
    ``[q1 - 1.5·IQR, q3 + 1.5·IQR]`` with q1/q3 the ``quantile_disc``
    order statistics — the standard robust anomaly screen (column
    profiling, sensor QA).

    All-integer exactness: the 1.5 factor would force floats, so both
    sides compare the CROSS-MULTIPLIED fence — ``2·v < 5·q1 - 3·q3`` /
    ``2·v > 5·q3 - 3·q1`` (identical int64 algebra in the SQL oracle;
    values must be integral, as n_chars is).  Two passes over the
    input: one quantile selection (:func:`group_quantiles` — per-group
    sort bounded by the group-fits-a-worker contract), then fences
    broadcast once via ``ray.put`` and a zero-shuffle partial-count
    fold whose driver rows are O(groups × blocks), never input rows."""
    import numpy as np
    import pandas as pd
    import ray

    q = group_quantiles(ds, group_col, value_col, qs=(0.25, 0.75))
    fences = {}
    for r in q.take_all():  # bounded: one row per group
        q1, q3 = int(r["q25"]), int(r["q75"])
        fences[r[group_col]] = (5 * q1 - 3 * q3, 5 * q3 - 3 * q1)
    fref = ray.put(fences)

    def partial(t: pa.Table) -> pa.Table:
        f = ray.get(fref)
        g = t[group_col].to_numpy(zero_copy_only=False)
        v2 = 2 * t[value_col].to_numpy(zero_copy_only=False).astype("int64")
        codes, uniq = pd.factorize(g)  # fence lookup per DISTINCT group
        lo = np.array([f[k][0] for k in uniq], np.int64)[codes]
        hi = np.array([f[k][1] for k in uniq], np.int64)[codes]
        out = ((v2 < lo) | (v2 > hi)).astype("int64")
        agg = (pd.DataFrame({group_col: g, "n": 1, "n_outliers": out})
               .groupby(group_col, as_index=False).sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    acc: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        k = r[group_col]
        n, o = acc.get(k, (0, 0))
        acc[k] = (n + int(r["n"]), o + int(r["n_outliers"]))
    keys = sorted(acc)
    return pa.table({
        group_col: pa.array(keys),
        "lo2": pa.array([fences[k][0] for k in keys], pa.int64()),
        "hi2": pa.array([fences[k][1] for k in keys], pa.int64()),
        "n": pa.array([acc[k][0] for k in keys], pa.int64()),
        "n_outliers": pa.array([acc[k][1] for k in keys], pa.int64()),
    })


def key_skew(ds, key_col: str, topk: int = 10):
    """Shuffle-key skew audit: the top-``topk`` heaviest keys plus the
    global concentration stats every row repeats — n_rows, n_keys,
    max_cnt, and the collision mass ``sum_sq = Σ cnt²`` (the expected
    same-key pair count × 2, and the quantity that decides whether a
    groupby needs salting).  This is the diagnostic to run BEFORE
    keying a 100-TB shuffle on a column.

    Counts come from :func:`group_sum` (data-scaled keys — combiner +
    one hash partition); the summary folds per-block partials of the
    counts table (O(blocks) driver rows); the top-k is a distributed
    ``sort().limit()``.  All int64, exactly SQL-replicable."""
    import pyarrow as pa

    def ones(t):
        import numpy as np
        return pa.table({key_col: t[key_col],
                         "one": pa.array(np.ones(len(t), np.int64))})

    counts = group_sum(ds.map_batches(ones, batch_format="pyarrow"),
                       key_col, ["one"], rename={"one": "cnt"})
    counts = counts.materialize()      # consumed twice (summary + topk)

    def summary_partial(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False)
        return pa.table({"n_rows": pa.array([int(c.sum())], pa.int64()),
                         "n_keys": pa.array([len(c)], pa.int64()),
                         "max_cnt": pa.array(
                             [int(c.max()) if len(c) else 0], pa.int64()),
                         "sum_sq": pa.array([int((c * c).sum())],
                                            pa.int64())})

    n_rows = n_keys = max_cnt = sum_sq = 0
    for r in counts.map_batches(summary_partial,
                                batch_format="pyarrow").take_all():
        n_rows += r["n_rows"]
        n_keys += r["n_keys"]
        max_cnt = max(max_cnt, r["max_cnt"])
        sum_sq += r["sum_sq"]

    top = (counts.sort(["cnt", key_col], descending=[True, False])
           .limit(topk).to_pandas())
    return pa.table({
        key_col: pa.array(top[key_col].to_numpy()),
        "cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
        "n_rows": pa.array([n_rows] * len(top), pa.int64()),
        "n_keys": pa.array([n_keys] * len(top), pa.int64()),
        "max_cnt": pa.array([max_cnt] * len(top), pa.int64()),
        "sum_sq": pa.array([sum_sq] * len(top), pa.int64()),
    })


def group_topk_ties(ds, group_col: str, value_col: str, id_col: str,
                    k: int = 3):
    """Top-k per group WITH TIES — SQL ``QUALIFY rank() OVER
    (PARTITION BY g ORDER BY v DESC) <= k`` (every row tied with the
    k-th survives), vs :func:`group_topk`'s row_number cut.

    Partial safety without a ties bound: a block can't emit only k
    rows (a globally-tied row might sit behind k equal values), so
    each block keeps rows whose BLOCK-LOCAL rank ≤ k — a superset of
    the global survivors (fewer strictly-greater values exist in the
    block than globally) that still prunes the shuffle to
    O(groups-per-block × (k + tie mass)).  The merge recomputes the
    exact rank per group."""
    import pandas as pd

    def local_rank(df: pd.DataFrame) -> pd.Series:
        return (df.groupby(group_col, sort=False)[value_col]
                .rank(method="min", ascending=False))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[local_rank(b) <= k]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        r = g[value_col].rank(method="min", ascending=False)
        out = g[r <= k].copy()
        out["rank"] = r[r <= k].astype("int64")
        return out.sort_values([value_col, id_col],
                               ascending=[False, True], kind="mergesort")

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def chi2_independence(ds, col1: str, col2: str):
    """Chi-square-of-independence contributions over the FULL
    (col1 × col2) contingency grid (zero cells included) — the
    categorical sibling of ``ab_ttest``.

    Exactness: each cell's contribution is the floored micro-value of
    ``(O·N − R·C)² / (N·R·C)`` — the (O−E)²/E term cross-multiplied so
    the numerator stays integral; the per-cell floor makes any
    downstream sum order-free.  Arithmetic is Python ints here (no
    overflow at any N) and HUGEINT in the SQL oracle ((O·N)² passes
    int64 around N≈3·10⁵).  One distributed pass: per-block pandas
    crosstab partials, O(|col1|·|col2| × blocks) driver rows."""
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([col1, col2], as_index=False, dropna=False)
                .size().rename(columns={"size": "o"}))

    acc: dict = {}
    for r in ds.map_batches(partial, batch_format="pandas").take_all():
        k = (r[col1], r[col2])
        acc[k] = acc.get(k, 0) + int(r["o"])
    rows_tot: dict = {}
    cols_tot: dict = {}
    for (a, b), o in acc.items():
        rows_tot[a] = rows_tot.get(a, 0) + o
        cols_tot[b] = cols_tot.get(b, 0) + o
    n = sum(acc.values())
    out = []
    for a in sorted(rows_tot):
        for b in sorted(cols_tot):          # full grid, zeros included
            o = acc.get((a, b), 0)
            rr, cc = rows_tot[a], cols_tot[b]
            num = (o * n - rr * cc) ** 2 * 1_000_000
            out.append((a, b, o, rr, cc, num // (n * rr * cc)))
    return pa.table({
        col1: pa.array([r[0] for r in out]),
        col2: pa.array([r[1] for r in out]),
        "o": pa.array([r[2] for r in out], pa.int64()),
        "r": pa.array([r[3] for r in out], pa.int64()),
        "c": pa.array([r[4] for r in out], pa.int64()),
        "n": pa.array([n] * len(out), pa.int64()),
        "contrib_micro": pa.array([r[5] for r in out], pa.int64()),
    })


def winsorized_stats(ds, group_col: str, value_col: str,
                     lo_q: float = 0.05, hi_q: float = 0.95):
    """Per-group winsorized sum/count — the robust mean's exact-int
    core: values clip to the group's [q_lo, q_hi] ``quantile_disc``
    order statistics (selections, so clipping bounds are input values
    and the clipped sum stays exact int64), then a zero-shuffle
    partial-count fold (the :func:`iqr_outliers` shape).  Returns
    (group, lo, hi, n, n_clipped, wsum)."""
    import numpy as np
    import pandas as pd
    import ray

    q = group_quantiles(ds, group_col, value_col, qs=(lo_q, hi_q))
    c_lo = f"q{int(round(lo_q * 100))}"
    c_hi = f"q{int(round(hi_q * 100))}"
    bounds = {r[group_col]: (int(r[c_lo]), int(r[c_hi]))
              for r in q.take_all()}        # one row per group
    bref = ray.put(bounds)

    def partial(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype("int64")
        codes, uniq = pd.factorize(g)
        lo = np.array([b[k][0] for k in uniq], np.int64)[codes]
        hi = np.array([b[k][1] for k in uniq], np.int64)[codes]
        w = np.clip(v, lo, hi)
        agg = (pd.DataFrame({group_col: g, "n": 1,
                             "n_clipped": (w != v).astype("int64"),
                             "wsum": w})
               .groupby(group_col, as_index=False).sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    acc: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        k = r[group_col]
        n, c, s = acc.get(k, (0, 0, 0))
        acc[k] = (n + int(r["n"]), c + int(r["n_clipped"]),
                  s + int(r["wsum"]))
    keys = sorted(acc)
    return pa.table({
        group_col: pa.array(keys),
        "lo": pa.array([bounds[k][0] for k in keys], pa.int64()),
        "hi": pa.array([bounds[k][1] for k in keys], pa.int64()),
        "n": pa.array([acc[k][0] for k in keys], pa.int64()),
        "n_clipped": pa.array([acc[k][1] for k in keys], pa.int64()),
        "wsum": pa.array([acc[k][2] for k in keys], pa.int64()),
    })


def lift_table(ds, value_col: str, flag_col: str, key_col: str,
               q: int = 10):
    """Decile lift/gains table: global NTILE(q) by (value DESC, key
    ASC), then exact per-tile (n, sum_value, n_flag) — the model-eval
    table behind gains charts and campaign-targeting cuts ("the top
    decile holds X% of conversions").

    Fully distributed at every step (the :func:`rfm_segments` shape):
    NTILE boundary rows come from :func:`rank_select` over (−value,
    key) — the driver holds only q−1 boundary pairs, never data rows —
    then every tile label is a vectorized two-key comparison and the
    per-tile sums fold as O(q × blocks) bounded partials.  value/flag
    must already be exact int64 (centi-scaled money, 0/1 flags).
    Returns (tile, n, sum_value, n_flag) sorted by tile, one row per
    non-empty tile.
    """
    import numpy as np
    import pandas as pd
    import ray

    def neg(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col].cast(pa.int64()),
            "_neg": pc.multiply(t[value_col].cast(pa.int64()),
                                pa.scalar(-1, pa.int64())),
            "_flag": t[flag_col].cast(pa.int64())})

    prep = ds.map_batches(neg, batch_format="pyarrow").materialize()
    n = prep.count()
    if n == 0:
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in ("tile", "n", "sum_value",
                                       "n_flag")})
    cuts = _ntile_cut_ranks(n, q)
    rows = rank_select(prep, ["_neg", key_col], cuts)
    bounds = [(int(r["_neg"]), int(r[key_col])) for r in rows]
    bref = ray.put(bounds)

    def partial(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        x = t["_neg"].to_numpy()
        k = t[key_col].to_numpy()
        tl = np.ones(len(x), np.int64)
        for bx, bk in b:
            tl += ((x > bx) | ((x == bx) & (k > bk))).astype(np.int64)
        agg = (pd.DataFrame({"tile": tl, "n": 1, "sum_value": -x,
                             "n_flag": t["_flag"].to_numpy()})
               .groupby("tile", as_index=False).sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = pd.DataFrame(
        prep.map_batches(partial, batch_format="pyarrow").take_all())
    out = (parts.groupby("tile", as_index=False).sum()
           .sort_values("tile").reset_index(drop=True))
    for c in ("tile", "n", "sum_value", "n_flag"):
        out[c] = out[c].astype("int64")
    return out


def ks_statistic(ds, group_col: str, value_col: str, ga, gb,
                 n_parts: int = 32):
    """Two-sample Kolmogorov–Smirnov distance as an EXACT integer
    fraction — the distribution-drift gate between two populations
    (yesterday's shard vs today's, treatment vs control):

        ``D = d_num / d_den``,  ``d_num = max_v |F_A(v)·m − F_B(v)·n|``
        scaled by ``d_den = n·m``

    so no float ever enters the comparison (the iqr_outliers
    cross-multiplication idea applied to whole CDFs).

    Distributed: per-value (a, b) counts via the many-groups
    :func:`group_sum` rule, ONE ``Dataset.sort`` by value, then the
    rank_select counting trick — per-block (Σa, Σb) pairs give each
    block its CDF offsets (O(blocks) driver rows), one task per block
    computes its local cumulative max — the global max folds on the
    driver.  Values must be int64 (centi-scale on the way in).
    Returns one row (n, m, d_num, d_den).
    """
    import numpy as np
    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        x = t[value_col].to_numpy(zero_copy_only=False).astype("int64")
        ka = (g == ga)
        kb = (g == gb)
        agg = (pd.DataFrame({"x": x, "a": ka.astype("int64"),
                             "b": kb.astype("int64")})
               .loc[ka | kb]
               .groupby("x", as_index=False)[["a", "b"]].sum())
        return pa.Table.from_pandas(agg.astype("int64"),
                                    preserve_index=False)

    counts = group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       "x", ["a", "b"], n_parts=n_parts)
    s = counts.sort("x").materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def block_sums(t):
        if t.num_rows == 0:
            return 0, 0
        return int(np.sum(t["a"].to_numpy())), \
            int(np.sum(t["b"].to_numpy()))

    sums = ray.get([block_sums.remote(r) for r in refs])
    n = sum(x for x, _ in sums)
    m = sum(y for _, y in sums)
    offs = []
    ca = cb = 0
    for x, y in sums:
        offs.append((ca, cb))
        ca += x
        cb += y

    @ray.remote(num_cpus=0.5)
    def block_max(t, off_a, off_b, n_, m_):
        if t.num_rows == 0:
            return 0
        cum_a = off_a + np.cumsum(t["a"].to_numpy().astype("int64"))
        cum_b = off_b + np.cumsum(t["b"].to_numpy().astype("int64"))
        return int(np.max(np.abs(cum_a * m_ - cum_b * n_)))

    d_num = max(ray.get([block_max.remote(r, oa, ob, n, m)
                         for r, (oa, ob) in zip(refs, offs)]),
                default=0)
    return pd.DataFrame({"n": pd.array([n], dtype="int64"),
                         "m": pd.array([m], dtype="int64"),
                         "d_num": pd.array([d_num], dtype="int64"),
                         "d_den": pd.array([n * m], dtype="int64")})


def gini_index(ds, value_col: str):
    """Gini concentration index over positive int64 values as ONE
    shared division from exact integer sums — "how concentrated is
    revenue/traffic across orders/hosts", the inequality audit:

        ``G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)``   (i = 1-based rank)

    Ties need no tiebreak: permuting equal values leaves Σ i·x₍ᵢ₎
    unchanged.  Distributed: ONE ``Dataset.sort``, per-block counts
    give rank offsets (O(blocks) driver rows — the rank_select shape),
    each block task returns its Σ(i·x) / Σx / n partials, and the
    driver folds with arbitrary-precision Python ints (numerator
    ~n²·x̄ wraps int64 at scale — the SQL side uses HUGEINT).
    Returns one row (n, gini = round(num/den, 6) — both sides divide
    the identical doubles).
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..rounding import fround_half_away

    s = ds.sort(value_col).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def block_part(t, col):
        if t.num_rows == 0:
            return 0, 0, 0
        x = t[col].to_numpy().astype("int64")
        return len(x), int(x.sum()), \
            int(np.sum((np.arange(len(x), dtype="int64") + 1) * x))

    parts = ray.get([block_part.remote(r, value_col) for r in refs])
    n = sx = 0
    s1 = 0
    for cnt, bsx, bs1 in parts:
        # shift local 1-based ranks by the rows before this block
        s1 += bs1 + n * bsx
        n += cnt
        sx += bsx
    num = 2 * s1 - (n + 1) * sx                 # exact Python ints
    den = n * sx
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "gini": [fround_half_away(float(num) / float(den), 6)]})


def mwu_statistic(ds, group_col: str, value_col: str, ga, gb,
                  n_parts: int = 32):
    """Mann–Whitney U (two-sample rank test) as an EXACT integer —
    the nonparametric A/B companion to :func:`ks_statistic`:

        ``u2 = Σ_v a_v · (2·cumB(<v) + b_v)``  (= 2U, ties count ½ each)

    so tie handling needs no fractions.  Same distributed shape as the
    KS statistic: per-value (a, b) counts via :func:`group_sum`, one
    ``Dataset.sort``, per-block exclusive-prefix offsets (O(blocks)
    driver rows), per-block integer partials.  Returns one row
    (n, m, u2) with u2/(2·n·m) the common-language effect size.
    """
    import numpy as np
    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        x = t[value_col].to_numpy(zero_copy_only=False).astype("int64")
        ka = (g == ga)
        kb = (g == gb)
        agg = (pd.DataFrame({"x": x, "a": ka.astype("int64"),
                             "b": kb.astype("int64")})
               .loc[ka | kb]
               .groupby("x", as_index=False)[["a", "b"]].sum())
        return pa.Table.from_pandas(agg.astype("int64"),
                                    preserve_index=False)

    counts = group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       "x", ["a", "b"], n_parts=n_parts)
    s = counts.sort("x").materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def block_sums(t):
        if t.num_rows == 0:
            return 0, 0
        return int(np.sum(t["a"].to_numpy())), \
            int(np.sum(t["b"].to_numpy()))

    sums = ray.get([block_sums.remote(r) for r in refs])
    n = sum(x for x, _ in sums)
    m = sum(y for _, y in sums)
    offs, cb = [], 0
    for _, y in sums:
        offs.append(cb)
        cb += y

    @ray.remote(num_cpus=0.5)
    def block_u(t, off_b):
        if t.num_rows == 0:
            return 0
        a = t["a"].to_numpy().astype("int64")
        b = t["b"].to_numpy().astype("int64")
        cumb_before = off_b + np.cumsum(b) - b     # exclusive prefix
        return int(np.sum(a * (2 * cumb_before + b)))

    u2 = sum(ray.get([block_u.remote(r, ob)
                      for r, ob in zip(refs, offs)]))
    return pd.DataFrame({"n": pd.array([n], dtype="int64"),
                         "m": pd.array([m], dtype="int64"),
                         "u2": pd.array([u2], dtype="int64")})


def psi_statistic(ds, group_col: str, value_col: str, ga, gb,
                  width: int, fold_cap: int = 2_000_000):
    """Population Stability Index between two populations over
    fixed-width bins — the standard ML feature-drift monitor
    (complement of :func:`ks_statistic`'s sup-distance and
    :func:`mwu_statistic`'s rank shift):

        ``PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b)``

    computed EXACTLY as one shared division from an integer sum (the
    ``token_entropy`` micro-nat trick): with ``n = Σ c_a``,
    ``m = Σ c_b`` and ``L(x) = floor(ln(x)·1e6)``,

        ``psi_num = Σ (c_a·m − c_b·n) · (L(c_a·m) − L(c_b·n))``
        ``psi     = round(psi_num / (n·m·1e6), 6)``

    since ``p_a − p_b = (c_a·m − c_b·n)/(n·m)`` and ``p_a/p_b =
    c_a·m/(c_b·n)``.  Bins where either side is empty are EXCLUDED
    (the standard zero-bin clamp — ln is undefined there); ``n_bins``
    reports how many contributed.  Values must be NON-NEGATIVE int64
    (numpy floor-division == DuckDB truncating ``//`` only then — the
    ``histogram_fixed`` precondition).

    Zero shuffle: each block emits one partial row per occupied bin
    (bounded by range/width, never rows); the driver folds
    O(#blocks × #bins) rows with arbitrary-precision Python ints
    (``psi_num`` terms reach ~(n·m)·Δln·1e6 — the SQL side needs
    HUGEINT).  Returns one row ``(n, m, n_bins, psi)``.
    """
    import math

    import pandas as pd

    from ..rounding import fround_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].to_numpy()
        x = df[value_col].to_numpy().astype("int64")
        ka = g == ga
        kb = g == gb
        keep = ka | kb
        out = (pd.DataFrame({"bin": x[keep] // width,
                             "a": ka[keep].astype("int64"),
                             "b": kb[keep].astype("int64")})
               .groupby("bin", as_index=False)[["a", "b"]].sum())
        return out

    parts = pd.DataFrame(
        ds.map_batches(partial, batch_format="pandas").take_all())
    if len(parts) > fold_cap:
        raise ValueError(
            f"psi_statistic: {len(parts)} partial rows (> fold_cap="
            f"{fold_cap}) — widen the bin width (bins must be bounded "
            "by range/width, not rows)")
    if parts.empty:
        z = pd.array([0], dtype="int64")
        return pd.DataFrame({"n": z, "m": z, "n_bins": z, "psi": [0.0]})
    g = parts.groupby("bin", as_index=False)[["a", "b"]].sum()
    n = int(g["a"].sum())
    m = int(g["b"].sum())

    def lmicro(x: int) -> int:
        return math.floor(math.log(float(x)) * 1_000_000.0)

    psi_num = 0
    n_bins = 0
    for ca, cb in zip(g["a"].to_numpy(), g["b"].to_numpy()):
        ca = int(ca)
        cb = int(cb)
        if ca > 0 and cb > 0:
            n_bins += 1
            psi_num += (ca * m - cb * n) * (lmicro(ca * m) - lmicro(cb * n))
    psi = fround_half_away(float(psi_num) / float(n * m * 1_000_000), 6) \
        if n > 0 and m > 0 else 0.0
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "m": pd.array([m], dtype="int64"),
        "n_bins": pd.array([n_bins], dtype="int64"),
        "psi": [psi]})


def snapshot_diff(ds_a, ds_b, key_col: str, val_cols: list[str],
                  n_parts: int = 32):
    """Keyed diff of two table snapshots — the data-reconciliation /
    migration-audit operator (what changed between yesterday's export
    and today's): per key, sum ``val_cols`` on each side and classify

        ``added``   — key only in B,
        ``removed`` — key only in A,
        ``changed`` — in both with any differing count or sum;

    identical keys are dropped (the output is the CHANGE SET, bounded
    by churn, not table size).  Returns a Dataset with columns
    ``(key_col, status, a_n, b_n, a_<v>..., b_<v>...)`` — absent sides
    read as genuine zeros (``a_n = 0`` ⇔ absent, since presence means
    ≥1 row).

    Distributed: tag-expand each side into the shared wide schema
    (one stateless map), then ONE :func:`group_sum` hash-partition
    fold over the union — keys are data-scaled so this is the
    many-groups rule, never a generic Aggregate; classification is a
    stateless vectorized filter after the fold.  Values must be int64
    (centi-scale money on the way in).
    """
    import numpy as np

    acols = [f"a_{v}" for v in val_cols]
    bcols = [f"b_{v}" for v in val_cols]

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            nrow = t.num_rows
            one = pa.array(np.ones(nrow, dtype=np.int64))
            zero = pa.array(np.zeros(nrow, dtype=np.int64))
            cols = {key_col: t[key_col],
                    "a_n": one if side == "a" else zero,
                    "b_n": one if side == "b" else zero}
            for v, ac, bc in zip(val_cols, acols, bcols):
                vv = pc.cast(t[v], pa.int64())
                cols[ac] = vv if side == "a" else zero
                cols[bc] = vv if side == "b" else zero
            return pa.table(cols)
        return fn

    wide = ds_a.map_batches(tag("a"), batch_format="pyarrow").union(
        ds_b.map_batches(tag("b"), batch_format="pyarrow"))
    summed = group_sum(wide, key_col, ["a_n", "b_n"] + acols + bcols,
                       n_parts=n_parts)

    def classify(t: pa.Table) -> pa.Table:
        an = t["a_n"].to_numpy(zero_copy_only=False)
        bn = t["b_n"].to_numpy(zero_copy_only=False)
        same = (an == bn)
        for ac, bc in zip(acols, bcols):
            same &= (t[ac].to_numpy(zero_copy_only=False)
                     == t[bc].to_numpy(zero_copy_only=False))
        status = np.where(an == 0, "added",
                          np.where(bn == 0, "removed", "changed"))
        out = t.append_column("status", pa.array(status.astype(object),
                                                 pa.string()))
        return out.filter(pa.array(~same)).select(
            [key_col, "status", "a_n", "b_n"] + acols + bcols)

    return summed.map_batches(classify, batch_format="pyarrow")


def fk_orphans(constraints: list):
    """Referential-integrity audit — the data-quality gate a warehouse
    load runs before publishing: for each declared FK, count child rows
    whose (non-null) key has NO parent, plus null-key rows.

    ``constraints`` is a list of
    ``(name, child_ds, child_key, parent_ds, parent_key, mode)``:

    - ``mode="broadcast"`` (dimension parents — nation, part, region):
      the parent key set is collected once (bounded by the dimension)
      and shipped via ``ray.put``; each child block emits one
      (rows, orphans, nulls) partial — zero shuffle.
    - ``mode="shuffle"`` (fact-scaled parents — orders under lineitem):
      the distributed :func:`~.joins.anti_join` counts unmatched rows
      without either side ever landing on the driver.

    Driver state is O(constraints); returns one row per constraint
    (fk_name, n_rows, n_orphans, n_nulls) sorted by name.
    """
    import pandas as pd
    import ray

    from .joins import anti_join

    names, rows, orph, nulls = [], [], [], []
    for name, child, ckey, parent, pkey, mode in constraints:
        if mode == "broadcast":
            pk = parent.select_columns([pkey]).take_all()
            pref = ray.put(pa.array(sorted({r[pkey] for r in pk})))

            def partial(t: pa.Table, _ck=ckey, _ref=pref) -> pa.Table:
                keys = t[_ck]
                if isinstance(keys, pa.ChunkedArray):
                    keys = keys.combine_chunks()
                valid = pc.is_valid(keys)
                n_null = t.num_rows - pc.sum(valid).as_py()
                present = pc.is_in(
                    keys, value_set=pc.cast(ray.get(_ref), keys.type))
                n_orph = pc.sum(pc.and_(valid, pc.invert(
                    pc.fill_null(present, False)))).as_py() or 0
                return pa.table({
                    "n": pa.array([t.num_rows], pa.int64()),
                    "o": pa.array([int(n_orph)], pa.int64()),
                    "z": pa.array([int(n_null)], pa.int64())})

            parts = (child.select_columns([ckey])
                     .map_batches(partial, batch_format="pyarrow")
                     .take_all())
            n = sum(r["n"] for r in parts)
            o = sum(r["o"] for r in parts)
            z = sum(r["z"] for r in parts)
        else:
            n = child.count()
            # normalize to arrow blocks: pandas-extension dtypes
            # (nullable Int64) have no numpy mapping for .schema()
            ck = (child.select_columns([ckey])
                  .map_batches(lambda t: t, batch_format="pyarrow"))
            z = n - ck.map_batches(
                lambda t, _ck=ckey: pa.table({
                    "v": pa.array([pc.sum(pc.cast(pc.is_valid(t[_ck]),
                                                  pa.int64())).as_py() or 0],
                                  pa.int64())}),
                batch_format="pyarrow").sum("v")
            kt = ck.schema().types[0]
            o = anti_join(ck, parent.select_columns([pkey]), ckey,
                          left_payload=[], right_key_col=pkey,
                          types={ckey: kt}).count()
        names.append(name)
        rows.append(n)
        orph.append(o)
        nulls.append(z)
    out = pd.DataFrame({"fk_name": names,
                        "n_rows": pd.array(rows, dtype="int64"),
                        "n_orphans": pd.array(orph, dtype="int64"),
                        "n_nulls": pd.array(nulls, dtype="int64")})
    return out.sort_values("fk_name", ignore_index=True)


def json_field_stats(ds, group_col: str, json_col: str, field: str):
    """Per-group stats of one integer field inside a flat-JSON string
    column (the event-payload shape: ``props = '{"k": 87}'``) —
    extraction is ONE vectorized RE2 pass (``pc.extract_regex``; no
    per-row json.loads in the hot path — documented fast path for flat
    non-nested payloads, parity-tested against ``json.loads``), then
    the constant-bounded group key takes the zero-shuffle driver fold:
    each block emits one (group, n, n_null, sum, min, max) partial row.
    Returns (group, n, n_null, sum_v, min_v, max_v) sorted by group.
    """
    import re

    import pandas as pd

    pat = r'"' + re.escape(field) + r'":\s*(?P<v>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[json_col], pat)
        v = pc.cast(pc.struct_field(m, 0), pa.int64())
        tb = pa.table({"g": t[group_col], "v": v})
        df = tb.to_pandas()
        agg = df.groupby("g", dropna=False).agg(
            n=("v", "size"),
            n_null=("v", lambda s: int(s.isna().sum())),
            sum_v=("v", lambda s: int(s.dropna().sum())),
            min_v=("v", lambda s: int(s.min()) if s.notna().any() else 0),
            max_v=("v", lambda s: int(s.max()) if s.notna().any() else 0),
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    has = df[df["n"] > df["n_null"]]
    out = df.groupby("g", as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"), sum_v=("sum_v", "sum"))
    mm = has.groupby("g", as_index=False).agg(
        min_v=("min_v", "min"), max_v=("max_v", "max"))
    out = out.merge(mm, on="g", how="left")
    for c in ("min_v", "max_v"):
        out[c] = out[c].fillna(0)
    out = out.rename(columns={"g": group_col})
    for c in ("n", "n_null", "sum_v", "min_v", "max_v"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col, ignore_index=True)


def benford_deviation(ds, value_col: str):
    """First-digit (Benford 1938) distribution audit — the classic
    fraud / data-quality screen: observed leading-digit shares of a
    positive numeric column vs the Benford expectation
    ``log10(1 + 1/d)``, both in exact floored micro units (observed:
    ``n_d·1e6 // n``; expected: ``floor(log10(1+1/d)·1e6)`` —
    shared-libm log10 on both sides).

    Zero-shuffle: each block folds to 9 digit counts (leading digit by
    a vectorized integer-division loop — no float log10 edge cases at
    powers of ten), driver folds O(blocks·9).  Rows with |trunc| < 1
    are out of Benford's domain and drop (mirrored by the oracle).
    Returns (digit, n, obs_micro, exp_micro, dev_micro) for d=1..9.
    """
    import numpy as np
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]          # nulls arrive as NaN; out of domain
        iv = np.abs(np.trunc(v)).astype(np.int64)
        iv = iv[iv >= 1]
        while (iv >= 10).any():
            big = iv >= 10
            iv[big] //= 10
        cnt = np.bincount(iv, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    counts = np.zeros(9, np.int64)
    for r in parts:
        counts[r["digit"] - 1] += r["n"]
    total = int(counts.sum())
    digits = np.arange(1, 10)
    obs = counts * 1_000_000 // max(total, 1)
    exp = np.floor(np.log10(1.0 + 1.0 / digits.astype(np.float64))
                   * 1e6).astype(np.int64)
    return pd.DataFrame({
        "digit": pd.array(digits, dtype="int64"),
        "n": pd.array(counts, dtype="int64"),
        "obs_micro": pd.array(obs, dtype="int64"),
        "exp_micro": pd.array(exp, dtype="int64"),
        "dev_micro": pd.array(np.abs(obs - exp), dtype="int64")})


def group_moments(ds, group_col: str, value_col: str, scale: int = 100):
    """Per-group skewness and excess kurtosis from EXACT integer
    sufficient stats — the moments-family completion of ab_ttest /
    group_regression: each block folds its groups to (n, Σx, Σx², Σx³,
    Σx⁴) over half-away ``×scale`` ints; Σx³/Σx⁴ overflow int64 at
    fact scale, so they ride as decimal strings and the driver folds
    PYTHON ints (the chi2 HUGEINT class — constant-bounded group keys,
    zero shuffle).

    The float reduction mirrors the oracle term-for-term (divisions
    before subtractions, ``m2·sqrt(m2)`` not ``pow(m2,1.5)`` — sqrt is
    IEEE-exact where pow carries ulp risk), so ``round(…, 6)`` matches
    bit-for-bit.  Returns (group, n, skewness, kurtosis_excess).
    """
    import math

    import numpy as np
    import pandas as pd

    from ..rounding import fround_half_away, round_half_away

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        gs, ns, s1s, s2s, s3s, s4s = [], [], [], [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            x = round_half_away(
                sub[value_col].to_numpy(np.float64)
                * float(scale)).astype(np.int64)
            x2 = x * x
            gs.append(g)
            ns.append(len(x))
            s1s.append(str(int(x.sum())))
            s2s.append(str(int(x2.sum())))
            s3s.append(str(int((x2 * x).astype(object).sum())))
            s4s.append(str(int((x2 * x2).astype(object).sum())))
        return pa.table({group_col: pa.array(gs),
                         "n": pa.array(ns, pa.int64()),
                         "s1": pa.array(s1s, pa.string()),
                         "s2": pa.array(s2s, pa.string()),
                         "s3": pa.array(s3s, pa.string()),
                         "s4": pa.array(s4s, pa.string())})

    agg: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        cur = agg.setdefault(r[group_col], [0, 0, 0, 0, 0])
        cur[0] += r["n"]
        for i, c in enumerate(("s1", "s2", "s3", "s4")):
            cur[i + 1] += int(r[c])

    rows = []
    for g in sorted(agg):
        n, s1, s2, s3, s4 = agg[g]
        nd = float(n)
        mu = float(s1) / nd
        m2 = float(s2) / nd - mu * mu
        m3 = float(s3) / nd - 3.0 * mu * (float(s2) / nd) \
            + 2.0 * mu * mu * mu
        m4 = float(s4) / nd - 4.0 * mu * (float(s3) / nd) \
            + 6.0 * mu * mu * (float(s2) / nd) - 3.0 * mu * mu * mu * mu
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
        # DuckDB round(x, 6) is half-away; Python round is half-even
        rows.append((g, n, fround_half_away(skew, 6),
                     fround_half_away(kurt, 6)))
    return pd.DataFrame({
        group_col: [r[0] for r in rows],
        "n": pd.array([r[1] for r in rows], dtype="int64"),
        "skewness": [r[2] for r in rows],
        "kurtosis_excess": [r[3] for r in rows]})


def mahalanobis_outliers(ds, x_col: str, y_col: str, id_cols: list,
                         k: int = 10, x_scale: float = 100.0,
                         y_scale: float = 100.0):
    """Top-``k`` bivariate outliers by 2-D Mahalanobis distance — the
    multivariate completion of the univariate outlier family
    (iqr/rolling/winsorized): distance accounts for the (x, y)
    covariance, so a point can be normal on each margin yet wildly
    off the joint ellipse.

    Two passes, both mergeable: (1) exact integer sufficient stats
    (n, Σx, Σy, Σx², Σy², Σxy) over half-away ``×scale`` ints —
    per-block int64 partials, PYTHON-int driver fold (Σy² wraps int64
    at fact scale; the oracle uses HUGEINT); (2) the closed-form 2×2
    inverse rides the per-row distance
    ``(v_yy·dx² − 2·v_xy·dx·dy + v_xx·dy²)/det`` — every double
    computed in the same operation order as the SQL, so the top-k
    selection (unrounded md2, then id tie-breaks) and the reported
    ``round(md2, 6)`` match bit-for-bit.  Returns id_cols + md2_r6.
    """
    import numpy as np
    import pandas as pd

    from ..rounding import fround_half_away, round_half_away

    def svals(t: pa.Table):
        x = round_half_away(
            t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * float(x_scale)).astype(np.int64)
        y = round_half_away(
            t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * float(y_scale)).astype(np.int64)
        return x, y

    def partial(t: pa.Table) -> pa.Table:
        x, y = svals(t)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    n = sx = sy = sxx = syy = sxy = 0
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += r["n"]
        sx += int(r["sx"])
        sy += int(r["sy"])
        sxx += int(r["sxx"])
        syy += int(r["syy"])
        sxy += int(r["sxy"])
    nd = float(n)
    mx = float(sx) / nd
    my = float(sy) / nd
    vxx = float(sxx) / nd - mx * mx
    vyy = float(syy) / nd - my * my
    vxy = float(sxy) / nd - mx * my
    det = vxx * vyy - vxy * vxy

    def dist(t: pa.Table) -> pa.Table:
        x, y = svals(t)
        dx = x.astype(np.float64) - mx
        dy = y.astype(np.float64) - my
        md2 = (vyy * (dx * dx) - 2.0 * vxy * (dx * dy)
               + vxx * (dy * dy)) / det
        cols = {c: t[c] for c in id_cols}
        cols["md2"] = pa.array(md2, pa.float64())
        return pa.table(cols)

    top = (ds.map_batches(dist, batch_format="pyarrow")
           .sort(["md2"] + id_cols,
                 descending=[True] + [False] * len(id_cols))
           .limit(k).to_pandas())
    top["md2_r6"] = [fround_half_away(v, 6) for v in top["md2"]]
    return top.drop(columns="md2")
