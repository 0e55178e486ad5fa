"""Market-basket co-occurrence analysis.

Classic association-mining shape over a (group, item) fact table —
"parts bought together" (lineitem), "tokens co-occurring in a doc",
etc.  The reference has no basket analysis (SURVEY §2 gap class:
training-pipeline analytics additions); the distributed shape is:

1. hash-partition by GROUP (each basket is wholly in one partition),
2. one vectorized pandas pass per partition: dedup items within each
   basket, self-merge per basket to emit ordered pairs (a < b), and
   pre-aggregate pair counts (the combiner — the shuffle carries
   pairs-per-partition rows, never pair INSTANCES),
3. one hash partition on the pair's FIRST item co-locates every
   occurrence of (a, b) (routing by ``a`` alone suffices), and a
   vectorized fold sums the partials.

Skew note: pair generation is O(basket_size^2) per basket — baskets
are small by domain contract (TPC-H orders average ~4 lineitems; a
pathological mega-basket needs an item-count cap upstream).  The
pair-count table is bounded by sum(deg^2), pruned early by
``min_count`` before any driver contact; the final top-k uses bounded
per-block partials.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .windows import _by_part

__all__ = ["basket_pairs", "pair_edges", "assoc_rules",
           "itemsets3"]


def pair_edges(ds, group_col: str, item_col: str, min_count: int = 1,
               n_parts: int = 32):
    """Distributed (item_a, item_b, n) pair counts with a < b ordering
    and an ``n >= min_count`` support filter — the edge-list form,
    returned as a Dataset for downstream graph ops (triangle_count)."""

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[group_col, item_col]].drop_duplicates()
        m = d.merge(d, on=group_col)
        a, b = item_col + "_x", item_col + "_y"
        m = m[m[a] < m[b]]
        out = (m.groupby([a, b], as_index=False).size()
               .rename(columns={a: "item_a", b: "item_b", "size": "n"}))
        return out

    partials = (_by_part(ds, group_col, n_parts=64).groupby("_part")
                .map_groups(lambda g: pairs_partial(g.drop(columns="_part")),
                            batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["item_a", "item_b"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out[out["n"] >= min_count]

    return (_by_part(partials, "item_a", n_parts=n_parts).groupby("_part")
            .map_groups(lambda g: fold(g.drop(columns="_part")),
                        batch_format="pandas"))


def basket_pairs(ds, group_col: str, item_col: str, min_count: int = 1,
                 k: int = 100) -> pd.DataFrame:
    """Top-k co-occurring item pairs by (n DESC, item_a, item_b).

    Driver sees only bounded per-block top-k partials (the
    topk_largest pattern), never the full pair table.
    """
    edges = pair_edges(ds, group_col, item_col, min_count=min_count)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "item_a", "item_b"],
            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = edges.map_batches(local_topk, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts).sort_values(
        ["n", "item_a", "item_b"],
        ascending=[False, True, True]).head(k).reset_index(drop=True)
    df["n"] = df["n"].astype("int64")
    return df


def assoc_rules(ds, group_col: str, item_col: str, k: int = 50,
                min_count: int = 1):
    """Association rules over the top-``k`` co-occurring pairs:
    support, both directed confidences, and lift — the Apriori
    output stage (Agrawal & Srikant 1994) downstream of
    :func:`pair_edges`.

    Integer exactness: confidence and lift are ratios, so both sides
    emit floored micro-ratios — ``conf(a→b) = n_ab·1e6 // n_a`` and
    ``lift = n_ab·N·1e6 // (n_a·n_b)`` (N = distinct baskets; the
    cross-multiplied form keeps everything int64 — overflow headroom:
    n_ab·N ≤ N², fine below ~3·10⁶ baskets per partition scope).

    Shape: pair counts and the top-k cut are the bounded
    :func:`basket_pairs` path; only the k winning pairs (driver rows =
    k) need item supports, fetched with ONE more pass over the distinct
    (basket, item) table filtered by the broadcast needed-item set —
    item supports are never computed for the full catalog."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from .dataset_tools import group_sum

    base = ds.materialize()      # consumed three times below
    top = basket_pairs(base, group_col, item_col,
                       min_count=min_count, k=k)
    need = np.unique(np.concatenate([top["item_a"].to_numpy(),
                                     top["item_b"].to_numpy()]))
    need_ref = ray.put(pa.array(need, pa.int64()))

    # distinct-basket count N: per-block distinct partials -> one dedup
    def gpart(t: pa.Table) -> pa.Table:
        import numpy as _np
        return pa.table({"g": pa.array(_np.unique(
            t[group_col].to_numpy(zero_copy_only=False)), pa.int64())})

    from .dataset_tools import distinct_rows
    n_baskets = distinct_rows(
        base.map_batches(gpart, batch_format="pyarrow"), ["g"]).count()

    # supports of the needed items only: distinct (basket, item) FIRST
    # (a basket split across blocks would double-count otherwise —
    # distinct_rows routes by basket), then a count fold per item
    def bi_rows(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[item_col], value_set=ray.get(need_ref))
        f = t.filter(m)
        return pa.table({"g": f[group_col], "i": f[item_col]})

    bi = distinct_rows(base.map_batches(bi_rows, batch_format="pyarrow"),
                       ["g", "i"], part_key="g")

    def ones(t: pa.Table) -> pa.Table:
        import numpy as _np
        return pa.table({"i": t["i"],
                         "one": pa.array(_np.ones(len(t), _np.int64))})

    supp = (group_sum(bi.map_batches(ones, batch_format="pyarrow"),
                      "i", ["one"], rename={"one": "n_item"})
            .to_pandas())                      # |needed items| ≤ 2k rows
    smap = dict(zip(supp["i"].astype("int64"), supp["n_item"].astype("int64")))

    a = top["item_a"].to_numpy().astype("int64")
    b = top["item_b"].to_numpy().astype("int64")
    nab = top["n"].to_numpy().astype("int64")
    na = np.array([smap[x] for x in a], np.int64)
    nb = np.array([smap[x] for x in b], np.int64)
    return pa.table({
        "item_a": pa.array(a, pa.int64()),
        "item_b": pa.array(b, pa.int64()),
        "n_ab": pa.array(nab, pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "conf_ab_micro": pa.array(nab * 1_000_000 // na, pa.int64()),
        "conf_ba_micro": pa.array(nab * 1_000_000 // nb, pa.int64()),
        "lift_micro": pa.array(
            nab * int(n_baskets) * 1_000_000 // (na * nb), pa.int64()),
    })


def itemsets3(ds, group_col: str, item_col: str, min_count: int = 1,
              k: int = 50) -> pd.DataFrame:
    """Top-k frequent 3-itemsets by (n DESC, a, b, c) — the Apriori
    level above :func:`basket_pairs`.

    Same two-shuffle shape: baskets co-located by one hash partition,
    triples generated per basket via a double self-merge with the
    ``a < b < c`` ordering (O(m³) per basket, bounded by the small-
    basket domain contract documented at module top), pre-aggregated
    per partition so the second shuffle (route by ``a``) carries
    triple-count PARTIALS, then bounded per-block top-k partials reach
    the driver (never the triple table).
    """
    import pyarrow as pa

    def triples_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[group_col, item_col]].drop_duplicates()
        m = d.merge(d, on=group_col).merge(d, on=group_col)
        a, b, c = (item_col + "_x", item_col + "_y", item_col)
        m = m[(m[a] < m[b]) & (m[b] < m[c])]
        out = (m.groupby([a, b, c], as_index=False).size()
               .rename(columns={a: "item_a", b: "item_b", c: "item_c",
                                "size": "n"}))
        return out

    partials = (_by_part(ds, group_col, n_parts=64).groupby("_part")
                .map_groups(lambda g: triples_partial(
                    g.drop(columns="_part")), batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["item_a", "item_b", "item_c"], as_index=False)
               ["n"].sum())
        out["n"] = out["n"].astype("int64")
        return out[out["n"] >= min_count]

    counts = (_by_part(partials, "item_a", n_parts=32).groupby("_part")
              .map_groups(lambda g: fold(g.drop(columns="_part")),
                          batch_format="pandas"))

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "item_a", "item_b", "item_c"],
            ascending=[False, True, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = counts.map_batches(local_topk,
                               batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts).sort_values(
        ["n", "item_a", "item_b", "item_c"],
        ascending=[False, True, True, True]).head(k).reset_index(drop=True)
    df["n"] = df["n"].astype("int64")
    return df
