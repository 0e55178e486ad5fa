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

__all__ = ["basket_pairs", "pair_edges"]


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
