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
           "pivot_counts", "rollup_counts", "distinct_rows"]


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

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(*[Sum(name, alias_name=name) for name in cols]))
