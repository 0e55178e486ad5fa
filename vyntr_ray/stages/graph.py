"""Connected components over an edge Dataset — dedup-cluster resolution.

After near-dup pair generation (``stages/dedup.py``), turning pairs into
CLUSTERS (one canonical doc per component) needs transitive closure.

Naive min-label propagation needs diameter-many rounds, and every Ray
Data groupby carries a ~seconds fixed shuffle cost — measured 30 s/round
on a 500-node graph, a dead end.  This implementation contracts instead:

1. **Per-block contraction** (one ``map_batches``): a local union-find
   over each block's edges emits (node, root) with root = min node id of
   the block-local component.  Every edge lives in exactly one block, so
   all connectivity is preserved through the mappings.
2. **Cross-block stitching** (one ``groupby(node)``): a node seen in
   several blocks links its roots — emitting star edges (min root vs
   the rest).  These root edges ARE the contracted graph; its size is
   bounded by cross-block node multiplicity, not by the edge count.
3. Repeat 1-2 (with a reshuffle) while the contracted graph exceeds
   ``driver_edge_limit``; in practice one level collapses almost
   everything.  The final contracted graph resolves with a driver
   union-find (min-id representative), and components propagate back
   down through the level mappings with one ``groupby`` per level.

Cost: O(levels) shuffles total — levels is 1-2 in practice — versus
O(diameter) for label propagation.  Output: (node, component) for every
node appearing in an edge, component = min reachable node id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components", "pagerank", "hits_counts",
           "butterfly_count",
           "triangle_count", "degree_histogram", "kcore_nodes",
           "sssp_rounds", "degree_assortativity", "adamic_adar",
           "clustering_coefficients"]


def _hash_part(ds, key_col: str, n_parts: int = 64):
    """Attach a vectorized multiplicative-hash partition of an int64 key
    (bounded group count for per-key sweeps — the PERF.md rule)."""
    def add(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((k * np.uint64(2654435761)) >> np.uint64(16)) \
            % np.uint64(n_parts)
        return t.append_column("_part",
                               pa.array(part.astype(np.int32), pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def _local_union_find(us: np.ndarray, vs: np.ndarray) -> dict:
    """Min-id-rooted union-find over one block's edges → {node: root}."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:        # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(us.tolist(), vs.tolist()):
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(edges_ds, u_col: str = "u", v_col: str = "v",
                         driver_edge_limit: int = 500_000,
                         max_levels: int = 64, _stats: dict | None = None):
    """(node, component) for every node appearing in the edge table.

    The driver union-find only ever sees a contracted edge set of at most
    ``driver_edge_limit`` rows: contraction rounds repeat until the count
    is under the limit or a round stops making progress (each round's
    local union-find collapses every block's chains, so path lengths
    shrink geometrically — a stall means the graph is already star-shaped
    across partitions and the next stitch can't shrink it further).
    ``max_levels`` is a runaway backstop, not the operating bound.
    ``_stats`` (tests) receives {"levels", "driver_edges"}."""
    import ray.data as rd

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64())})

    edges = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()
    mappings = []                    # per-level (node, root) datasets
    prev_count = None

    for _level in range(max_levels):
        n_edges = edges.count()
        if n_edges <= driver_edge_limit:
            break
        if prev_count is not None and n_edges >= prev_count:
            break                    # no progress — stitch is a fixpoint
        prev_count = n_edges

        def contract(t: pa.Table) -> pa.Table:
            roots = _local_union_find(t["u"].to_numpy(), t["v"].to_numpy())
            items = sorted(roots.items())
            return pa.table({
                "node": pa.array([n for n, _ in items], pa.int64()),
                "root": pa.array([r for _, r in items], pa.int64()),
            })

        mapping = edges.map_batches(contract,
                                    batch_format="pyarrow").materialize()
        mappings.append(mapping)

        def stitch_part(g: pd.DataFrame) -> pd.DataFrame:
            # all of one node's rows land in its hash partition; star
            # edges (min root -> other roots) come out of one vectorized
            # groupby-transform, not a map_groups call per node
            g = g.drop_duplicates(["node", "root"])
            first = g.groupby("node")["root"].transform("min")
            rest = g[g["root"] != first]
            return pd.DataFrame({
                "u": first[g["root"] != first].to_numpy(np.int64),
                "v": rest["root"].to_numpy(np.int64)})

        edges = (_hash_part(mapping, "node")
                 .groupby("_part")
                 .map_groups(lambda g: stitch_part(g.drop(columns="_part")),
                             batch_format="pandas")
                 .map_batches(lambda t: t, batch_format="pyarrow")
                 .materialize())

    # driver union-find on the (small) contracted graph
    rows = edges.take_all()
    if _stats is not None:
        _stats["levels"] = len(mappings)
        _stats["driver_edges"] = len(rows)
    comp = _local_union_find(
        np.array([r["u"] for r in rows], np.int64),
        np.array([r["v"] for r in rows], np.int64))

    comp_ds = rd.from_items(
        [{"node": n, "component": c} for n, c in sorted(comp.items())])

    # resolve back down: a node's component = component of its root,
    # or the root itself when the root's component was settled locally
    for mapping in reversed(mappings):
        def tag_comp(t: pa.Table) -> pa.Table:
            return pa.table({"key": t["node"],
                             "node": pa.nulls(t.num_rows, pa.int64()),
                             "component": t["component"]})

        def tag_map(t: pa.Table) -> pa.Table:
            return pa.table({"key": t["root"], "node": t["node"],
                             "component": pa.nulls(t.num_rows, pa.int64())})

        def resolve_part(g: pd.DataFrame) -> pd.DataFrame:
            # per hash partition: min settled component per key, mapped
            # onto that key's mapping rows (key itself when unsettled)
            cmin = (g.loc[g["node"].isna()]
                    .groupby("key")["component"].min())
            maps = g[g["node"].notna()]
            comp = maps["key"].map(cmin).fillna(maps["key"])
            return pd.DataFrame({
                "node": maps["node"].to_numpy(np.int64),
                "component": comp.to_numpy(np.int64)})

        comp_ds = (_hash_part(
            comp_ds.map_batches(tag_comp, batch_format="pyarrow")
            .union(mapping.map_batches(tag_map, batch_format="pyarrow")),
            "key")
            .groupby("_part")
            .map_groups(lambda g: resolve_part(g.drop(columns="_part")),
                        batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize())

    if mappings:
        # a node seen in several blocks has one mapping row per block —
        # all resolving to the same component; keep one
        comp_ds = (comp_ds.groupby("node").min("component")
                   .map_batches(lambda t: t.rename_columns(
                       ["node", "component"]), batch_format="pyarrow"))
    return comp_ds


def _pr_contrib(block: pa.Table, nd: np.ndarray,
                sh: np.ndarray) -> tuple:
    """One block's per-destination partial sums of share[u] — the same
    kernel for every pagerank execution path."""
    if block.num_rows == 0 or "u" not in block.column_names:
        # materialized datasets can carry empty schema-less blocks
        return np.array([], np.int64), np.array([], np.float64)
    ui = np.searchsorted(nd, block["u"].to_numpy())
    vi = np.searchsorted(nd, block["v"].to_numpy())
    uniq_v, inv = np.unique(vi, return_inverse=True)
    return uniq_v, np.bincount(inv, weights=sh[ui])


def pagerank(edges_ds, u_col: str = "u", v_col: str = "v",
             damping: float = 0.85, n_iter: int = 10,
             shuffle_aggregate: bool = False, block_tasks: bool = True):
    """PageRank over a directed edge Dataset (Page et al. 1999, public
    algorithm) — the canonical link-importance score for a crawled web
    graph (the reference crawls BFS-with-priority; rank-weighted
    frontier priority is the standard extension).

    Execution shape: the edge table is scanned once per iteration with
    ``map_batches`` — each block emits per-destination PARTIAL sums of
    ``rank[u] / outdeg[u]`` (bounded by that block's distinct
    destinations, never the edge count).  The rank and out-degree
    vectors ride as one ``ray.put`` broadcast per iteration (read, not
    re-shipped, by every task); node ids map to vector slots via
    ``searchsorted`` against a broadcast sorted-node array.  Dangling
    mass (out-degree-0 nodes) is redistributed uniformly each iteration.

    Partial merging is tri-path, identical results (parity-tested):

    - default (``block_tasks=True``): the materialized edge blocks are
      pinned once via ``to_arrow_refs()`` and each iteration submits one
      raw ``@ray.remote`` task per block — the justified drop below the
      Dataset API for a FIXED-POINT ITERATION, where 10 sequential
      Dataset jobs would pay ~0.4 s launch overhead each (measured;
      PERF.md "rounds are the enemy").  Same kernel, same broadcast
      refs, ~10x less per-iteration overhead;
    - ``block_tasks=False``: per-iteration ``map_batches`` jobs — the
      pure-Dataset expression, kept parity-tested;
    - ``shuffle_aggregate=True``: partials merge with a distributed
      ``groupby(v).sum`` — the expression that survives when per-block
      partial sets are too large to collect.

    Scale note: one float64 per node means the broadcast vector stops
    fitting a worker heap around ~10^9 nodes; past that the rank state
    shards across actors keyed by node-hash (the ``state/seen.py``
    sharding pattern) and contributions route per shard — the
    per-block partial kernel below is unchanged by that swap.  Output:
    (node, rank) for every node appearing in an edge; ranks sum to 1.
    """
    import ray

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64())})

    edges = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()

    # node universe + out-degrees: one pass of tiny per-block partials
    def degree_partial(t: pa.Table) -> pa.Table:
        us, counts = np.unique(t["u"].to_numpy(), return_counts=True)
        vs = np.unique(t["v"].to_numpy())
        nodes = np.concatenate([us, vs])
        deg = np.concatenate([counts, np.zeros(len(vs), np.int64)])
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "deg": pa.array(deg, pa.int64())})

    deg_rows = (edges.map_batches(degree_partial, batch_format="pyarrow")
                .groupby("node").sum("deg").take_all())
    nodes = np.array(sorted(r["node"] for r in deg_rows), np.int64)
    outdeg = np.zeros(len(nodes), np.float64)
    for r in deg_rows:
        outdeg[np.searchsorted(nodes, r["node"])] = r["sum(deg)"]
    n = len(nodes)
    if n == 0:
        import ray.data as rd
        return rd.from_items([])
    nodes_ref = ray.put(nodes)

    rank = np.full(n, 1.0 / n)
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)

    block_refs = edges.to_arrow_refs() if (block_tasks
                                           and not shuffle_aggregate) else None
    contrib_task = ray.remote(num_returns=1)(_pr_contrib) \
        if block_refs is not None else None

    for _ in range(n_iter):
        share = np.where(outdeg > 0, rank / safe_deg, 0.0)
        share_ref = ray.put(share)
        contribs = np.zeros(n, np.float64)

        if block_refs is not None:
            # one raw task per pinned edge block; refs auto-dereference
            for uniq_v, sums in ray.get(
                    [contrib_task.remote(b, nodes_ref, share_ref)
                     for b in block_refs]):
                contribs[uniq_v] += sums
        else:
            def contrib_partial(t: pa.Table) -> pa.Table:
                nd, sh = ray.get(nodes_ref), ray.get(share_ref)
                uniq_v, sums = _pr_contrib(t, nd, sh)
                return pa.table({"vi": pa.array(uniq_v, pa.int64()),
                                 "c": pa.array(sums, pa.float64())})

            partials = edges.map_batches(contrib_partial,
                                         batch_format="pyarrow")
            if shuffle_aggregate:
                for r in partials.groupby("vi").sum("c").take_all():
                    contribs[r["vi"]] = r["sum(c)"]
            else:
                for r in partials.take_all():
                    contribs[r["vi"]] += r["c"]
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (contribs + dangling / n)

    import ray.data as rd
    return rd.from_items(
        [{"node": int(nd), "rank": float(rk)}
         for nd, rk in zip(nodes, rank)])


def _hits_contrib(block: pa.Table, nd: np.ndarray, w: np.ndarray,
                  src_col: str) -> tuple:
    """One edge block's integer contribution: sum of w[src] grouped by
    the OTHER endpoint (dst).  Returns (uniq_dst_slots, int64 sums)."""
    dst_col = "v" if src_col == "u" else "u"
    if block.num_rows == 0 or src_col not in block.column_names:
        # zero-row blocks can carry an empty schema
        return np.array([], np.int64), np.array([], np.int64)
    s = np.searchsorted(nd, block[src_col].to_numpy())
    d = np.searchsorted(nd, block[dst_col].to_numpy())
    uniq_d, inv = np.unique(d, return_inverse=True)
    sums = np.zeros(len(uniq_d), np.int64)
    np.add.at(sums, inv, w[s])
    return uniq_d, sums


def hits_counts(edges_ds, u_col: str = "u", v_col: str = "v",
                n_iter: int = 4):
    """HITS hubs/authorities (Kleinberg 1999) in EXACT integer
    arithmetic: with ``h0 = 1`` at every node and no intermediate
    normalization, ``a_k`` / ``h_k`` are alternating-direction PATH
    COUNTS — ``a = sum h[u] over in-edges``, ``h = sum a[v] over
    out-edges`` — the same score ordering as one-sided normalized HITS
    (normalization rescales uniformly) with none of the float-parity
    risk pagerank's micro-rounding absorbs.  int64-exact on both the
    engine and a SQL oracle of unrolled join+sum rounds; overflow
    bounds ``n_iter`` (counts grow with max-degree^k — guard upstream
    for dense graphs).

    Same execution shape as :func:`pagerank`: edges materialized once,
    blocks pinned via ``to_arrow_refs``, one raw task per block per
    half-round (a fixed-point iteration — PERF.md "rounds are the
    enemy"), per-block partials bounded by distinct endpoints, weight
    vectors broadcast via ``ray.put`` per half-round.  Output: (node,
    hub, auth) int64 for every node in an edge.
    """
    import ray

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64())})

    edges = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        nodes = np.unique(np.concatenate([t["u"].to_numpy(),
                                          t["v"].to_numpy()]))
        return pa.table({"node": pa.array(nodes, pa.int64())})

    from vyntr_ray.stages.dataset_tools import distinct_rows
    node_rows = distinct_rows(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        ["node"]).take_all()
    nodes = np.array(sorted(r["node"] for r in node_rows), np.int64)
    n = len(nodes)
    if n == 0:
        import ray.data as rd
        return rd.from_items([])
    nodes_ref = ray.put(nodes)

    block_refs = edges.to_arrow_refs()
    task = ray.remote(num_returns=1)(_hits_contrib)

    def half_round(w: np.ndarray, src_col: str) -> np.ndarray:
        w_ref = ray.put(w)
        out = np.zeros(n, np.int64)
        for uniq_d, sums in ray.get(
                [task.remote(b, nodes_ref, w_ref, src_col)
                 for b in block_refs]):
            out[uniq_d] += sums
        return out

    h = np.ones(n, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(n_iter):
        a = half_round(h, "u")      # auth[v] = sum h[u] over u->v
        h = half_round(a, "v")      # hub[u]  = sum a[v] over u->v
    import ray.data as rd
    return rd.from_items(
        [{"node": int(nd), "hub": int(hh), "auth": int(aa)}
         for nd, hh, aa in zip(nodes, h, a)])


def _degree_orient(edges_ds, u_col: str, v_col: str):
    """Degree-order every edge: one degree pass → broadcast (sorted
    nodes, deg) once; each edge re-orients to put the (deg, id)-smaller
    endpoint first (Chiba–Nishizeki / Latapy node-iterator order, bounding
    wedge volume toward O(E·α)).  O(V) driver vectors — the pagerank
    contract.  Returns (oriented materialized Dataset, vectorized
    ``rank_lt(ka, kb)`` comparator).  Shared by :func:`triangle_count`
    and :func:`clustering_coefficients` (r5)."""
    import ray

    def deg_partial(t: pa.Table) -> pa.Table:
        n, c = np.unique(np.concatenate(
            [t[u_col].to_numpy(), t[v_col].to_numpy()]),
            return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    dd = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
          .to_pandas().groupby("node", as_index=False)["deg"].sum())
    nodes_arr = dd["node"].to_numpy(np.int64)   # sorted (groupby)
    deg_ref = ray.put((nodes_arr, dd["deg"].to_numpy(np.int64)))

    def reorient(t: pa.Table) -> pa.Table:
        nodes_b, deg_b = ray.get(deg_ref)
        a = t[u_col].to_numpy(zero_copy_only=False)
        b = t[v_col].to_numpy(zero_copy_only=False)
        da = deg_b[np.searchsorted(nodes_b, a)]
        db = deg_b[np.searchsorted(nodes_b, b)]
        swap = (db < da) | ((db == da) & (b < a))
        return pa.table({
            u_col: pa.array(np.where(swap, b, a), pa.int64()),
            v_col: pa.array(np.where(swap, a, b), pa.int64())})

    oriented = edges_ds.map_batches(
        reorient, batch_format="pyarrow").materialize()

    def rank_lt(ka, kb):
        nodes_b, deg_b = ray.get(deg_ref)
        da = deg_b[np.searchsorted(nodes_b, ka)]
        db = deg_b[np.searchsorted(nodes_b, kb)]
        return (da < db) | ((da == db) & (ka < kb))

    return oriented, rank_lt, dd


def triangle_count(edges_ds, u_col: str = "u", v_col: str = "v",
                   n_parts: int = 32,
                   orient: str = "degree") -> "pd.DataFrame":
    """Exact triangle count over a distinct ``u < v`` edge set.

    Min-vertex wedge enumeration — the standard distributed shape
    (node-iterator with a total order): a triangle ``a < b < c`` is
    counted EXACTLY ONCE, as the wedge centered at its minimum vertex
    (edges (a,b) and (a,c) meet at a; the closing edge (b,c) is checked
    by a co-partitioned membership join).

    1. hash-partition edges by ``u`` — each center's full neighbor list
       lands in one partition; one vectorized pandas self-merge per
       partition emits wedge partials (wu, wv, cnt) pre-aggregated
       (the shuffle carries distinct wedges, not wedge instances),
    2. co-partition wedge partials and edges by their first element
       (routing by the leading item alone co-locates the pair),
    3. per-partition merge sums cnt over wedges whose closing edge
       exists; the driver folds O(n_parts) scalars.

    Skew note: wedge count is sum(deg^2) over centers — a hub vertex
    inflates its partition.  ``orient="degree"`` (default) re-orients
    every edge low-(degree, id) -> high before wedging, so each
    triangle counts at its LOWEST-DEGREE vertex — the standard
    degree-ordered node iterator (Chiba–Nishizeki / Latapy), bounding
    wedge volume toward O(E·α).  Measured on the sf0.1 co-purchase
    graph: 49.2M -> 41.1M wedge instances (modest — its degrees are
    near-uniform; skewed graphs gain far more), 14.7 -> 8.9 s total
    with the materialize fix above.  ``orient="id"`` keeps the raw
    u < v orientation
    (parity-tested — the count is invariant).  Upstream support
    thresholds (see baskets.pair_edges min_count) remain the
    complementary mitigation.
    """
    import pandas as pd
    import ray

    # consumed twice below (wedge input + closing-edge union); a lazy
    # upstream (pair_edges is itself a shuffle) would re-execute whole
    # (the PERF.md r3 re-execution gotcha — the larger half of the
    # 14.7 -> 8.9 s win at sf0.1)
    edges_ds = edges_ds.materialize()

    if orient == "degree":
        edges_ds, rank_lt, _dd = _degree_orient(edges_ds, u_col, v_col)
    else:
        def rank_lt(ka, kb):
            return ka < kb

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[u_col, v_col]]
        m = d.merge(d, on=u_col)
        a, b = v_col + "_x", v_col + "_y"
        m = m[rank_lt(m[a].to_numpy(np.int64), m[b].to_numpy(np.int64))]
        return (m.groupby([a, b], as_index=False).size()
                .rename(columns={a: "k", b: "k2", "size": "cnt"}))

    wed = (_hash_part(edges_ds, u_col, n_parts=n_parts).groupby("_part")
           .map_groups(lambda g: wedges(g.drop(columns="_part")),
                       batch_format="pandas"))

    def tag_w(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "k2": t["k2"],
                         "cnt": pc.cast(t["cnt"], pa.int64()),
                         "is_edge": pa.array([0] * len(t), pa.int8())})

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"k": t[u_col], "k2": t[v_col],
                         "cnt": pa.array([0] * len(t), pa.int64()),
                         "is_edge": pa.array([1] * len(t), pa.int8())})

    un = (wed.map_batches(tag_w, batch_format="pyarrow")
          .union(edges_ds.map_batches(tag_e, batch_format="pyarrow")))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["k", "k2"]]
        w = g[g["is_edge"] == 0][["k", "k2", "cnt"]]
        hit = w.merge(e, on=["k", "k2"], how="inner")
        return pd.DataFrame({"part_tris": [int(hit["cnt"].sum())]})

    parts = (_hash_part(un, "k", n_parts=n_parts).groupby("_part")
             .map_groups(lambda g: close(g.drop(columns="_part")),
                         batch_format="pandas").take_all())
    total = sum(r["part_tris"] for r in parts)
    return pd.DataFrame({"n_triangles": pd.array([total], dtype="int64")})


def bfs_hops(edges_ds, seeds_ds, k: int, u_col: str = "u",
             v_col: str = "v", block_tasks: bool = True):
    """Min-hop distance from a seed set, bounded at ``k`` hops — the
    unweighted BFS prefix (k-bounded SSSP) over DIRECTED edges.
    Output: (node, hop) for every node reachable within k hops, hop =
    shortest distance.

    Default path (``block_tasks=True``): the :func:`pagerank` /
    :func:`kcore_nodes` fixed-point shape — edge blocks pinned once via
    ``to_arrow_refs``, one raw task per block per round (each returns
    the distinct slots its frontier edges reach — bounded by block
    distinct nodes), the distance vector riding as one ``ray.put`` per
    round.  Driver state is the sorted node array + one int64 vector
    (the pagerank O(V) contract).  Converted from the Dataset loop
    below after measuring 12.4 s for 4 rounds at sf0.1 — two shuffles
    per round of launch cost for sub-second kernels.

    ``block_tasks=False`` keeps the pure-Dataset expression
    (parity-tested): per round a hash-partitioned equi-join of the
    distance table against the edges (joins.hash_join) + a min-fold
    (dataset_tools.group_fold), the distance table materialized and
    repartitioned per round (block growth + re-execution gotchas,
    PERF.md).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .dataset_tools import group_fold
    from .joins import hash_join

    if block_tasks:
        import ray

        def norm(t: pa.Table) -> pa.Table:
            return pa.table({"u": t[u_col].cast(pa.int64()),
                             "v": t[v_col].cast(pa.int64())})

        edges = edges_ds.map_batches(norm,
                                     batch_format="pyarrow").materialize()

        def ends(t: pa.Table) -> pa.Table:
            return pa.table({"node": pa.array(np.unique(np.concatenate(
                [t["u"].to_numpy(), t["v"].to_numpy()])), pa.int64())})

        seed_rows = seeds_ds.take_all()          # seed set: O(seeds)
        nodes = np.unique(np.concatenate([
            edges.map_batches(ends, batch_format="pyarrow")
            .to_pandas()["node"].to_numpy(),
            np.array([r["node"] for r in seed_rows], np.int64)]))
        V = len(nodes)
        INF = np.int64(1) << np.int64(62)
        dist = np.full(V, INF, np.int64)
        for r in seed_rows:
            i = int(np.searchsorted(nodes, r["node"]))
            dist[i] = min(dist[i], int(r["hop"]))

        nref = ray.put(nodes)
        refs = edges.to_arrow_refs()

        @ray.remote(num_cpus=0.5)
        def expand(block, nodes_b, dist_b, r):
            if block.num_rows == 0:     # empty blocks carry no schema
                return np.array([], np.int64)
            iu = np.searchsorted(nodes_b, block["u"].to_numpy())
            iv = np.searchsorted(nodes_b, block["v"].to_numpy())
            return np.unique(iv[dist_b[iu] == r])

        for r in range(k):
            if not (dist == r).any():
                continue                         # nothing at this hop
            dref = ray.put(dist)
            for idx in ray.get([expand.remote(b, nref, dref, r)
                                for b in refs]):
                dist[idx] = np.minimum(dist[idx], r + 1)

        m = dist <= k
        return pa.table({"node": pa.array(nodes[m], pa.int64()),
                         "hop": pa.array(dist[m], pa.int64())})

    types = {"node": pa.int64(), "hop": pa.int64(), v_col: pa.int64()}
    dist = seeds_ds.materialize()
    for _ in range(k):
        nxt = hash_join(dist, edges_ds, key_col="node",
                        left_payload=["hop"], right_payload=[v_col],
                        right_key_col=u_col, types=types, n_parts=16)

        def step(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t[v_col],
                "hop": pc.add(t["hop"], pa.scalar(1, pa.int64()))})

        cand = nxt.map_batches(step, batch_format="pyarrow")
        # repartition BEFORE materializing: without it the per-round
        # block count multiplies (union + per-partition map_groups emit
        # one block per upstream block — measured 66 -> 196 -> 456
        # blocks over 3 rounds, and per-block fixed cost turned round 3
        # into 67 s for 137 rows).  Iterative Dataset loops must bound
        # their state's block count every round.
        dist = (group_fold(dist.union(cand), "node", ["hop"], how="min")
                .repartition(16).materialize())
    return dist


def degree_histogram(edges_ds, u_col: str = "u", v_col: str = "v"):
    """Degree distribution of an undirected edge list: (degree,
    n_nodes) — the first thing anyone plots about a graph, and the
    skew audit that decides whether pagerank/triangle keys need
    salting.

    Two folds, both the many-groups :func:`~.dataset_tools.group_sum`
    shape: endpoints flatten to a node stream (each distinct edge
    contributes 1 to both ends), per-node degree sums through a
    combiner + ONE hash partition (node ids are data-scaled), then the
    degree VALUES — whose distinct count is bounded by the max degree,
    far below the node count on any real graph — fold the same way.
    No driver materialization at either level."""
    from .dataset_tools import group_sum

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([
                t[u_col].combine_chunks().cast(pa.int64()),
                t[v_col].combine_chunks().cast(pa.int64())]),
            "one": pa.array(np.ones(2 * len(t), np.int64)),
        })

    deg = group_sum(edges_ds.map_batches(ends, batch_format="pyarrow"),
                    "node", ["one"], rename={"one": "degree"})

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"degree": t["degree"],
                         "one": pa.array(np.ones(len(t), np.int64))})

    hist = group_sum(deg.map_batches(ones, batch_format="pyarrow"),
                     "degree", ["one"], rename={"one": "n_nodes"})
    return hist.sort("degree")


def kcore_nodes(edges_ds, k: int = 3, u_col: str = "u", v_col: str = "v",
                n_rounds: int = 6, _stats: dict | None = None):
    """k-core of an undirected graph by ``n_rounds`` of SYNCHRONIZED
    peeling: each round drops every node whose degree in the surviving
    induced subgraph is < k (Matula & Beck 1983, public algorithm) —
    the standard "dense part of the dup/link graph" extractor.

    Determinism contract: both this function and its SQL oracle compute
    exactly ``n_rounds`` synchronized peel rounds (the oracle as an
    unrolled materialized-CTE chain, the pagerank precedent).  A
    converged peel is a fixpoint — extra rounds are no-ops — so the
    bound only matters on pathological long-chain graphs; local strict
    checks verify convergence at the tested scales (the loop breaks
    early at the fixpoint, which equals running the remaining no-op
    rounds).

    Execution is the :func:`pagerank` fixed-point shape: edge blocks
    pinned ONCE via ``to_arrow_refs``, one raw task per block per round
    (a Dataset job per round would pay ~0.4 s launch each, PERF.md
    "rounds are the enemy"), the alive mask riding as one ``ray.put``
    per round.  Per-task returns are (distinct-slot, count) partials —
    bounded by the block's distinct nodes, never O(V).  Driver state:
    the sorted node array + two O(V) vectors (the pagerank contract;
    shard the mask across actors past ~10^9 nodes).  Output: (node,
    degree) over the surviving induced subgraph, degree = its edge
    count there."""
    import ray

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64())})

    edges = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()

    def nodes_partial(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.unique(np.concatenate(
            [t["u"].to_numpy(), t["v"].to_numpy()])), pa.int64())})

    nodes = np.unique(
        edges.map_batches(nodes_partial, batch_format="pyarrow")
        .to_pandas()["node"].to_numpy()).astype(np.int64)
    V = len(nodes)
    nref = ray.put(nodes)
    refs = edges.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def deg_task(block, nodes_b, alive_b):
        if block.num_rows == 0:         # empty blocks carry no schema
            return np.array([], np.int64), np.array([], np.int64)
        iu = np.searchsorted(nodes_b, block["u"].to_numpy())
        iv = np.searchsorted(nodes_b, block["v"].to_numpy())
        m = alive_b[iu] & alive_b[iv]
        idx, cnt = np.unique(np.concatenate([iu[m], iv[m]]),
                             return_counts=True)
        return idx, cnt

    def sweep(alive):
        aref = ray.put(alive)
        deg = np.zeros(V, np.int64)
        for idx, cnt in ray.get(
                [deg_task.remote(b, nref, aref) for b in refs]):
            np.add.at(deg, idx, cnt)
        return deg

    alive = np.ones(V, bool)
    for r in range(n_rounds):
        new_alive = sweep(alive) >= k
        if _stats is not None:
            _stats["rounds"] = r + 1
        if (new_alive == alive).all():
            break                       # fixpoint: remaining rounds no-op
        alive = new_alive

    deg = sweep(alive)                  # degree over the final subgraph
    return pa.table({"node": pa.array(nodes[alive], pa.int64()),
                     "degree": pa.array(deg[alive], pa.int64())})


def sssp_rounds(edges_ds, k: int = 6, u_col: str = "u", v_col: str = "v",
                w_col: str = "w", source: int | None = None):
    """Weighted single-source shortest paths, ``k`` synchronized
    Bellman-Ford rounds over UNDIRECTED integer-weighted edges — the
    weighted companion of :func:`bfs_hops` (after round r, dist[v] is
    the exact shortest distance among paths of ≤ r edges, so a fixed
    round count is a deterministic contract an unrolled SQL CTE can
    replay).

    Same fixed-point shape as :func:`pagerank` / :func:`kcore_nodes`:
    edge blocks pinned once via ``to_arrow_refs``, one raw task per
    block per round (each relaxes its edges in both directions against
    the broadcast distance vector and returns per-node candidate
    minima — bounded by the block's distinct nodes), driver state =
    the sorted node array + one int64 vector (the pagerank O(V)
    contract).  Min-fold is order-independent, so the result is
    deterministic at any parallelism.  Source defaults to the smallest
    node id.  Returns (node, dist) for nodes reached within k edges.
    """
    import ray

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64()),
                         "w": t[w_col].cast(pa.int64())})

    # coalesce before pinning: each ROUND pays one task launch per
    # block (~0.5 s/wave floor, PERF.md), so k rounds over many small
    # map_groups output blocks are pure overhead — 2×CPU blocks keep
    # every core busy while bounding the per-round launch count
    import ray as _ray

    n_blocks = max(1, 2 * int(_ray.cluster_resources().get("CPU", 8)))
    edges = (edges_ds.map_batches(norm, batch_format="pyarrow")
             .repartition(n_blocks).materialize())

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.unique(np.concatenate(
            [t["u"].to_numpy(), t["v"].to_numpy()])), pa.int64())})

    nodes = np.unique(
        edges.map_batches(ends, batch_format="pyarrow")
        .to_pandas()["node"].to_numpy()).astype(np.int64)
    if len(nodes) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    V = len(nodes)
    INF = np.int64(1) << np.int64(62)
    dist = np.full(V, INF, np.int64)
    src = int(nodes.min()) if source is None else int(source)
    dist[int(np.searchsorted(nodes, src))] = 0

    nref = ray.put(nodes)
    refs = edges.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def relax(block, nodes_b, dist_b):
        if block.num_rows == 0:         # empty blocks carry no schema
            return np.array([], np.int64), np.array([], np.int64)
        iu = np.searchsorted(nodes_b, block["u"].to_numpy())
        iv = np.searchsorted(nodes_b, block["v"].to_numpy())
        w = block["w"].to_numpy().astype(np.int64)
        big = np.int64(1) << np.int64(62)
        tgt = np.concatenate([iv, iu])
        src_d = np.concatenate([dist_b[iu], dist_b[iv]])
        ok = src_d < big
        tgt, cand = tgt[ok], src_d[ok] + np.concatenate([w, w])[ok]
        if len(tgt) == 0:
            return np.array([], np.int64), np.array([], np.int64)
        uniq, inv = np.unique(tgt, return_inverse=True)
        best = np.full(len(uniq), big, np.int64)
        np.minimum.at(best, inv, cand)
        return uniq, best

    for _ in range(k):
        dref = ray.put(dist)
        for idx, val in ray.get([relax.remote(b, nref, dref)
                                 for b in refs]):
            np.minimum.at(dist, idx, val)

    m = dist < INF
    return pa.table({"node": pa.array(nodes[m], pa.int64()),
                     "dist": pa.array(dist[m], pa.int64())})


def degree_assortativity(edges_ds, u_col: str = "u", v_col: str = "v",
                         broadcast_deg: bool = True):
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over the DOUBLED (symmetrized) edge list — "do
    hubs link to hubs?" — the one-number mixing diagnostic for a link
    graph.

    Exact-sufficient-statistics shape (the qty_discount_corr
    contract): each block emits FOUR int64 partials (m, Σ(du+dv),
    Σ(du²+dv²), Σ(du·dv)); the driver folds them with
    arbitrary-precision Python ints, so numerator and denominator are
    EXACT integers (the chi2_independence overflow lesson — the SQL
    side needs HUGEINT) and only the final division is floating point:
    both sides divide the identical doubles and round(…, 6) matches
    bit-for-bit.

    Degrees attach via the O(V)-vector broadcast by default
    (``broadcast_deg=True`` — the pagerank/_degree_orient driver
    contract every other graph op here already uses; one degree pass +
    one partial pass, ZERO shuffles, 6.0 → ~1.5 s at sf0.1).
    ``broadcast_deg=False`` keeps the fully-distributed tier (degrees
    fold via :func:`~.dataset_tools.group_sum` and attach with two
    :func:`~.joins.hash_join` passes — the path for graphs whose node
    set outgrows driver vectors; parity-tested).  Returns one row
    (m2, assortativity).
    """
    import ray

    from ..rounding import fround_half_away
    from .dataset_tools import group_sum
    from .joins import hash_join

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"u": t[u_col].cast(pa.int64()),
                         "v": t[v_col].cast(pa.int64())})

    edges = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()

    def ends(t: pa.Table) -> pa.Table:
        nodes, counts = np.unique(
            np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()]),
            return_counts=True)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "d": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    m = s1 = s2 = sxy = 0
    if broadcast_deg:
        dd = (edges.map_batches(ends, batch_format="pyarrow")
              .to_pandas().groupby("node", as_index=False)["d"].sum())
        ref = ray.put((dd["node"].to_numpy(np.int64),
                       dd["d"].to_numpy(np.int64)))

        def bpartial(t: pa.Table) -> pa.Table:
            nodes_b, deg_b = ray.get(ref)
            du = deg_b[np.searchsorted(nodes_b, t["u"].to_numpy())]
            dv = deg_b[np.searchsorted(nodes_b, t["v"].to_numpy())]
            return pa.table({
                "m": pa.array([t.num_rows], pa.int64()),
                "s1": pa.array([int((du + dv).sum())], pa.int64()),
                "s2": pa.array([int((du * du + dv * dv).sum())],
                               pa.int64()),
                "sxy": pa.array([int((du * dv).sum())], pa.int64())})

        folded = edges.map_batches(bpartial,
                                   batch_format="pyarrow").take_all()
        for r in folded:
            m += int(r["m"])
            s1 += int(r["s1"])
            s2 += int(r["s2"])
            sxy += int(r["sxy"])
        num = 2 * m * 2 * sxy - s1 * s1          # exact Python ints
        den = 2 * m * s2 - s1 * s1
        return pd.DataFrame({
            "m2": pd.array([2 * m], dtype="int64"),
            "assortativity": [fround_half_away(float(num) / float(den),
                                               6)]})

    deg = group_sum(edges.map_batches(ends, batch_format="pyarrow"),
                    "node", ["d"]).materialize()

    e1 = hash_join(edges, deg, key_col="u", left_payload=["v"],
                   right_payload=["d"], right_key_col="node",
                   types={"u": pa.int64(), "v": pa.int64(),
                          "d": pa.int64()})
    e1 = e1.map_batches(lambda t: t.rename_columns(
        [{"d": "du"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")
    e2 = hash_join(e1, deg, key_col="v", left_payload=["u", "du"],
                   right_payload=["d"], right_key_col="node",
                   types={"u": pa.int64(), "v": pa.int64(),
                          "du": pa.int64(), "d": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        du = t["du"].to_numpy().astype(np.int64)
        dv = t["d"].to_numpy().astype(np.int64)
        return pa.table({
            "m": pa.array([len(du)], pa.int64()),
            "s1": pa.array([int((du + dv).sum())], pa.int64()),
            "s2": pa.array([int((du * du + dv * dv).sum())], pa.int64()),
            "sxy": pa.array([int((du * dv).sum())], pa.int64())})

    for r in e2.map_batches(partial, batch_format="pyarrow").take_all():
        m += int(r["m"])
        s1 += int(r["s1"])
        s2 += int(r["s2"])
        sxy += int(r["sxy"])
    num = 2 * m * 2 * sxy - s1 * s1          # exact Python ints
    den = 2 * m * s2 - s1 * s1
    return pd.DataFrame({
        "m2": pd.array([2 * m], dtype="int64"),
        "assortativity": [fround_half_away(float(num) / float(den), 6)]})


def adamic_adar(edges_ds, k: int = 10, u_col: str = "u",
                v_col: str = "v", n_parts: int = 32) -> "pd.DataFrame":
    """Adamic–Adar link prediction over a distinct ``u < v`` edge set:
    the top-``k`` NON-ADJACENT pairs by

        ``aa_micro(b, c) = Σ_{z ∈ N(b) ∩ N(c)}  10^12 // L(deg z)``,
        ``L(d) = floor(ln(d)·1e6)``

    — the classic common-neighbor score 1/ln(deg) in exact integer
    micro-units (truncating integer division replays in SQL as ``//``;
    wedge centers always have deg ≥ 2 so L > 0), summation order-free.

    Shape (the :func:`triangle_count` machinery pointed at scores
    instead of counts):

    1. expand edges to both-direction adjacency; ONE degree pass gives
       the O(V) broadcast weight vector (the pagerank contract),
    2. hash-partition adjacency by center ``z`` — each center's full
       neighbor list lands in one partition; a vectorized self-merge
       emits weighted wedge partials (b, c, Σw) pre-aggregated,
    3. co-partition wedge partials with the edge set by the leading
       pair element; per partition, sum scores per pair, DROP pairs
       that are existing edges (link prediction scores absent edges
       only), keep a local top-``k``; the driver folds
       O(n_parts·k) rows.

    Skew note: unlike the triangle count, AA needs EVERY wedge at its
    actual center (the score is per-center, not a counting trick), so
    degree re-orientation cannot bound hub partitions — wedge volume
    is Σ deg², and the upstream support threshold
    (:func:`~.baskets.pair_edges` ``min_count``) is the scale lever.
    Ties broken by (score DESC, b ASC, c ASC) on both sides.
    """
    import pandas as pd
    import ray

    edges_ds = edges_ds.materialize()

    def expand(t: pa.Table) -> pa.Table:
        u = t[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "z": pa.array(np.concatenate([u, v]), pa.int64()),
            "nb": pa.array(np.concatenate([v, u]), pa.int64())})

    adj = edges_ds.map_batches(expand, batch_format="pyarrow")

    def deg_partial(t: pa.Table) -> pa.Table:
        n, c = np.unique(t["z"].to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c, pa.int64())})

    dd = (adj.map_batches(deg_partial, batch_format="pyarrow")
          .to_pandas().groupby("node", as_index=False)["deg"].sum())
    nodes_arr = dd["node"].to_numpy(np.int64)       # sorted (groupby)
    deg_arr = dd["deg"].to_numpy(np.int64)
    lmic = np.floor(np.log(np.maximum(deg_arr, 2).astype(np.float64))
                    * 1_000_000.0).astype(np.int64)
    w_arr = np.where(deg_arr >= 2, 10**12 // lmic, 0)
    wref = ray.put((nodes_arr, w_arr))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["z", "nb"]]
        m = d.merge(d, on="z")
        m = m[m["nb_x"].to_numpy() < m["nb_y"].to_numpy()]
        nodes_b, w_b = ray.get(wref)
        wz = w_b[np.searchsorted(nodes_b, m["z"].to_numpy(np.int64))]
        out = pd.DataFrame({"k": m["nb_x"].to_numpy(np.int64),
                            "k2": m["nb_y"].to_numpy(np.int64),
                            "sc": wz})
        return out.groupby(["k", "k2"], as_index=False)["sc"].sum()

    wed = (_hash_part(adj, "z", n_parts=n_parts).groupby("_part")
           .map_groups(lambda g: wedges(g.drop(columns="_part")),
                       batch_format="pandas"))

    def tag_w(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "k2": t["k2"],
                         "sc": pc.cast(t["sc"], pa.int64()),
                         "is_edge": pa.array([0] * len(t), pa.int8())})

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"k": t[u_col], "k2": t[v_col],
                         "sc": pa.array([0] * len(t), pa.int64()),
                         "is_edge": pa.array([1] * len(t), pa.int8())})

    un = (wed.map_batches(tag_w, batch_format="pyarrow")
          .union(edges_ds.map_batches(tag_e, batch_format="pyarrow")))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["k", "k2"]]
        w = (g[g["is_edge"] == 0]
             .groupby(["k", "k2"], as_index=False)["sc"].sum())
        m = w.merge(e, on=["k", "k2"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"][["k", "k2", "sc"]]
        return (m.sort_values(["sc", "k", "k2"],
                              ascending=[False, True, True])
                .head(k))

    parts = pd.DataFrame(
        _hash_part(un, "k", n_parts=n_parts).groupby("_part")
        .map_groups(lambda g: close(g.drop(columns="_part")),
                    batch_format="pandas").take_all())
    if parts.empty:
        return pd.DataFrame({
            "node_a": pd.array([], dtype="int64"),
            "node_b": pd.array([], dtype="int64"),
            "aa_micro": pd.array([], dtype="int64")})
    out = (parts.sort_values(["sc", "k", "k2"],
                             ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    return pd.DataFrame({
        "node_a": out["k"].astype("int64"),
        "node_b": out["k2"].astype("int64"),
        "aa_micro": out["sc"].astype("int64")})


def clustering_coefficients(edges_ds, u_col: str = "u", v_col: str = "v",
                            n_parts: int = 32, orient: str = "degree"):
    """Per-vertex local clustering coefficient — the community-density
    signal (Watts & Strogatz 1998): ``coeff = 2·tri(v) / (deg(v)·
    (deg(v)−1))``, reported in exact floored micro units.

    Same min-vertex wedge enumeration as :func:`triangle_count`, but
    the wedge rows KEEP their center so a closed wedge credits all
    three vertices: (1) hash-partition by ``u``, vectorized pandas
    self-merge emits (center, k, k2) wedge instances; (2) co-partition
    with the edge set by ``k``, the closing-edge inner merge credits
    (c, k, k2) — each partition pre-folds its per-node counts, so the
    second shuffle's output is bounded by nodes-per-partition; (3)
    per-node triangle totals via :func:`~.dataset_tools.group_sum`,
    degrees likewise, met by one distributed left
    :func:`~.joins.hash_join` (fill 0: a deg≥2 node with no triangles
    has coefficient 0).  Wedge volume is the scale lever — feed a
    support-thresholded edge set (``pair_edges(min_count≥2)``) for
    dense co-occurrence graphs, and ``orient="degree"`` (default, r5)
    enumerates each triangle at its LOWEST-degree vertex via
    :func:`_degree_orient` — per-node credits are identical (a closed
    wedge credits all three vertices wherever it is found;
    ``orient="id"`` parity-tested), but hub centers stop inflating
    their wedge partitions (the triangle_count Chiba–Nishizeki bound;
    measured 9.2 → 5.3 s at sf0.1 on the co-purchase graph).  Returns
    (node, deg, n_tri, coeff_micro) for deg≥2 nodes, sorted by node.
    """
    import pandas as pd

    edges_ds = edges_ds.materialize()
    if orient == "degree":
        edges_ds, rank_lt, deg_df = _degree_orient(edges_ds, u_col, v_col)
    else:
        def rank_lt(ka, kb):
            return ka < kb

        def deg_partial(t: pa.Table) -> pa.Table:
            n, c = np.unique(np.concatenate(
                [t[u_col].to_numpy(), t[v_col].to_numpy()]),
                return_counts=True)
            return pa.table({"node": pa.array(n, pa.int64()),
                             "deg": pa.array(c, pa.int64())})

        deg_df = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
                  .to_pandas().groupby("node", as_index=False)["deg"].sum())

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[u_col, v_col]]
        m = d.merge(d, on=u_col)
        a, b = v_col + "_x", v_col + "_y"
        m = m[rank_lt(m[a].to_numpy(np.int64), m[b].to_numpy(np.int64))]
        return pd.DataFrame({"c": m[u_col].astype("int64"),
                             "k": m[a].astype("int64"),
                             "k2": m[b].astype("int64")})

    wed = (_hash_part(edges_ds, u_col, n_parts=n_parts).groupby("_part")
           .map_groups(lambda g: wedges(g.drop(columns="_part")),
                       batch_format="pandas"))

    def tag_w(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "k2": t["k2"],
                         "c": pc.cast(t["c"], pa.int64()),
                         "is_edge": pa.array([0] * len(t), pa.int8())})

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(t[u_col], pa.int64()),
                         "k2": pc.cast(t[v_col], pa.int64()),
                         "c": pa.array([0] * len(t), pa.int64()),
                         "is_edge": pa.array([1] * len(t), pa.int8())})

    un = (wed.map_batches(tag_w, batch_format="pyarrow")
          .union(edges_ds.map_batches(tag_e, batch_format="pyarrow")))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["k", "k2"]]
        w = g[g["is_edge"] == 0][["c", "k", "k2"]]
        hit = w.merge(e, on=["k", "k2"], how="inner")
        cc = pd.concat([hit["c"], hit["k"], hit["k2"]]).value_counts()
        return pd.DataFrame({"node": cc.index.to_numpy(np.int64),
                             "n_tri": cc.to_numpy(np.int64)})

    tri_parts = (_hash_part(un, "k", n_parts=n_parts).groupby("_part")
                 .map_groups(lambda g: close(g.drop(columns="_part")),
                             batch_format="pandas"))

    # tail driver-fold (r5): each close() partition pre-folds per-node
    # credits, so tri_parts carries at most n_parts·|V| (practically ~|V|)
    # tiny (node, n_tri) rows, and the degree table is already an O(V)
    # driver frame (the pagerank contract, computed for the orientation
    # anyway).  The former group_sum + distributed hash_join + sort tail
    # spent THREE more shuffles at the ~1 s operator floor to join two
    # driver-sized tables (9.2 → ~5 s at sf0.1).
    import ray.data as rd
    trif = (tri_parts.to_pandas().groupby("node", as_index=False)
            ["n_tri"].sum())
    out = deg_df[deg_df["deg"] >= 2].merge(trif, on="node", how="left")
    out["n_tri"] = out["n_tri"].fillna(0).astype("int64")
    d = out["deg"].to_numpy(np.int64)
    tr = out["n_tri"].to_numpy(np.int64)
    out["coeff_micro"] = 2 * tr * 1_000_000 // (d * (d - 1))
    out = (out[["node", "deg", "n_tri", "coeff_micro"]]
           .astype("int64").sort_values("node").reset_index(drop=True))
    return rd.from_pandas(out)


def butterfly_count(edges_ds, n_col: str = "n") -> "pd.DataFrame":
    """Bipartite 4-cycle (butterfly) count — the bipartite analog of
    :func:`triangle_count` (Wang et al., "Vertex priority based butterfly
    counting", VLDB 2019 — public algorithm family).

    A butterfly is two left vertices sharing two right vertices.  Over
    the pair-projection edge table (:func:`~.baskets.pair_edges` output:
    ``(item_a, item_b, n)`` with ``n`` = co-occurrence count), the total
    is simply ``Σ_pairs C(n, 2)``: each of the ``n`` shared groups pairs
    with each other shared group exactly once.  So the expensive step IS
    the pair projection (already distributed, bounded per hash
    partition); this op is one zero-shuffle partial-sum pass over it —
    per-block ``Σ n·(n−1)/2`` int64 partials, driver folds O(blocks)
    scalars in pure Python int (no overflow at any corpus size).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        n = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"b": pa.array([int((n * (n - 1) // 2).sum())],
                                       pa.int64())})

    parts = edges_ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(int(r["b"]) for r in parts)
    return pd.DataFrame({"n_butterflies": pd.array([total], dtype="int64")})
