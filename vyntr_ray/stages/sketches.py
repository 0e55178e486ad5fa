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

t-digest quantiles (Dunning & Ertl 2019, public algorithm) follow the
same partial + merge shape: each batch condenses each group's values to
one bounded centroid set (≤ ~2·delta centroids regardless of row
count), the ``groupby(group)`` merge re-compresses concatenated
centroids, and tiny per-group inversion interpolates the quantiles.
Unlike the fixed-bin histogram scale path
(:func:`..dataset_tools.group_quantiles_approx`) it needs NO prior
value range and keeps *relative rank* error bounded near the tails —
the sketch of choice for long-tailed distributions (latencies, document
lengths) at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.filters import _hash64
from ..rounding import iround_half_away

__all__ = ["hll_sketch_batch", "hll_count_distinct", "group_count_distinct",
           "kmv_distinct", "join_size_est",
           "tdigest_batch", "tdigest_merge", "tdigest_quantile",
           "group_quantiles_tdigest", "frequent_tokens", "cms_estimates",
           "hll_intersect", "bloom_probe", "minhash_accuracy"]


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
    return iround_half_away(float(est))


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


# -- t-digest ---------------------------------------------------------------
#
# Representation: a digest is (min, max, means[float64], weights[float64]),
# serialized as the raw float64 bytes [min, max, m0..mk, w0..wk].  Both the
# per-batch build and the merge run ONE vectorized k-space clustering pass:
# sort by value, place each point's weight-midpoint q on [0, 1], bucket by
# floor(k(q)) where k is the tail-compressing scale function
# k(q) = (delta / 2π)·asin(2q − 1), then weighted-mean each bucket.  Bucket
# count is ≤ delta/2 + 1 by construction, so a digest is O(delta) bytes no
# matter how many rows fed it, and centroid width scales with q(1−q) —
# tight clusters at the tails, coarse in the middle.

def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1.0, 1.0))


def _td_cluster(means: np.ndarray, weights: np.ndarray,
                delta: float) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized compression pass: sorted (mean, weight) pairs →
    ≤ delta+1 centroids bucketed by the scale function."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    qmid = (np.cumsum(weights) - weights / 2) / total
    bucket = np.floor(_k_scale(qmid, delta) + delta / 4).astype(np.int64)
    # weighted mean + weight sum per bucket (buckets are already sorted)
    uniq, inv = np.unique(bucket, return_inverse=True)
    wsum = np.bincount(inv, weights=weights)
    msum = np.bincount(inv, weights=means * weights)
    return msum / wsum, wsum


def tdigest_batch(values: np.ndarray, delta: float = 200.0) -> bytes:
    """Build one serialized digest from a batch of raw values."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return b""
    m, w = _td_cluster(v, np.ones(len(v), np.float64), delta)
    return np.concatenate(
        [[v.min(), v.max()], m, w]).astype(np.float64).tobytes()


def _td_load(blob: bytes) -> tuple[float, float, np.ndarray, np.ndarray]:
    a = np.frombuffer(blob, np.float64)
    k = (len(a) - 2) // 2
    return float(a[0]), float(a[1]), a[2:2 + k], a[2 + k:]


def tdigest_merge(blobs: list[bytes], delta: float = 200.0) -> bytes:
    """Union of digests: concatenate centroids, one compression pass."""
    parts = [_td_load(b) for b in blobs if b]
    if not parts:
        return b""
    lo = min(p[0] for p in parts)
    hi = max(p[1] for p in parts)
    m, w = _td_cluster(np.concatenate([p[2] for p in parts]),
                       np.concatenate([p[3] for p in parts]), delta)
    return np.concatenate([[lo, hi], m, w]).astype(np.float64).tobytes()


def tdigest_quantile(blob: bytes, q: float) -> float:
    """Invert the digest: linear interpolation between centroid
    weight-midpoints, clamped to the tracked [min, max]."""
    lo, hi, m, w = _td_load(blob)
    total = w.sum()
    mids = np.cumsum(w) - w / 2
    t = q * total
    if t <= mids[0]:
        # interpolate from the true minimum to the first centroid
        f = t / mids[0] if mids[0] > 0 else 1.0
        return float(lo + f * (m[0] - lo))
    if t >= mids[-1]:
        f = ((t - mids[-1]) / (total - mids[-1])
             if total > mids[-1] else 0.0)
        return float(m[-1] + f * (hi - m[-1]))
    i = int(np.searchsorted(mids, t, side="right"))
    f = (t - mids[i - 1]) / (mids[i] - mids[i - 1])
    return float(m[i - 1] + f * (m[i] - m[i - 1]))


def group_quantiles_tdigest(ds, group_col: str, value_col: str,
                            qs: tuple = (0.25, 0.5, 0.95),
                            delta: float = 200.0):
    """Per-group approximate quantiles via mergeable t-digests.

    Shape mirrors :func:`hll_count_distinct`: one (group, digest) partial
    row per batch per group — the shuffle carries O(delta)-byte sketches,
    never values — a single ``groupby(group)`` merges, and the quantile
    inversion is per-group O(delta).  No prior value range needed (the
    histogram scale path requires one), and rank error concentrates at
    q(1−q) — accurate tails on skewed data.  Output schema matches
    :func:`..dataset_tools.group_quantiles` (q25/q50/q95 columns).
    """
    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "v": b[value_col].to_pylist()})
        rows = [(g, tdigest_batch(sub["v"].to_numpy(), delta))
                for g, sub in df.groupby(group_col, sort=False)]
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "digest": pa.array([r[1] for r in rows], pa.binary()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        blob = tdigest_merge(list(g["digest"]), delta)
        row = {group_col: [g[group_col].iloc[0]]}
        for q in qs:
            row[f"q{int(round(q * 100))}"] = [tdigest_quantile(blob, q)]
        return pd.DataFrame(row)

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


def frequent_tokens(ds, text_col: str = "text", r: int = 50):
    """EXACT heavy hitters (frequent items) over whitespace tokens.

    Two streaming passes, the classic sketch-then-verify shape:

    1. Per-block bounded partials: count the block's tokens and keep only
       those with block count > n_b/r (< r rows per block by pigeonhole).
       Any token with GLOBAL count c > n/r must survive in at least one
       block (if it were ≤ n_b/r in every block, summing gives c ≤ n/r),
       so the merged candidate set contains every true hitter while only
       O(blocks·r) rows ever cross the shuffle — never the token stream.
    2. Exact recount of the (broadcast) candidate set, filtered by the
       exact integer predicate ``cnt·r > n``.

    Returns (token, cnt) for tokens with cnt·r > n, cnt exact — which is
    why a DuckDB GROUP BY/HAVING oracle can match it value-for-value.
    The reference has no counterpart; this is the frequent-items member
    of the mergeable-sketch family (HLL `hll_count_distinct`, t-digest
    `group_quantiles_tdigest`).
    """
    import ray
    from ray.data.aggregate import Sum

    def _tokens(t: pa.Table) -> pa.Array:
        toks = pc.list_flatten(pc.utf8_split_whitespace(t[text_col]))
        return toks.filter(pc.not_equal(toks, "")).combine_chunks()

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        n_b = len(toks)
        counts = (pa.table({"token": toks}).group_by("token")
                  .aggregate([("token", "count")]))
        keep = counts.filter(pc.greater(
            pc.multiply(pc.cast(counts["token_count"], pa.int64()),
                        pa.scalar(r, pa.int64())),
            pa.scalar(n_b, pa.int64())))
        k = keep.num_rows
        return pa.table({
            "kind": pa.array([0] + [1] * k, pa.int8()),
            "token": pa.concat_arrays(
                [pa.array([""], pa.string()),
                 keep["token"].combine_chunks().cast(pa.string())]),
            "cnt": pa.concat_arrays(
                [pa.array([n_b], pa.int64()),
                 keep["token_count"].combine_chunks().cast(pa.int64())]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    agg = (parts.groupby(["kind", "token"])
           .aggregate(Sum("cnt", alias_name="cnt")).take_all())
    n = sum(row["cnt"] for row in agg if row["kind"] == 0)
    cand = pa.array(sorted({row["token"] for row in agg
                            if row["kind"] == 1}), pa.string())
    cand_ref = ray.put(cand)

    def recount(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(cand_ref)))
        g = (pa.table({"token": toks}).group_by("token")
             .aggregate([("token", "count")]))
        return pa.table({
            "token": g["token"].combine_chunks().cast(pa.string()),
            "cnt": g["token_count"].combine_chunks().cast(pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))
    out = exact.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["cnt"], pa.scalar(r, pa.int64())),
            pa.scalar(n, pa.int64()))),
        batch_format="pyarrow")
    return out.sort(["cnt", "token"], descending=[True, False])


def cms_estimates(ds, text_col: str = "text", d: int = 4, w: int = 1024,
                  n_probes: int = 24, min_len: int = 4):
    """Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm)
    over whitespace tokens, with exact point-query verification.

    The mergeable-sketch shape again: every block condenses its token
    stream to ONE (d × w) counter array (partial CMS — sketch sum is
    associative/commutative, so partial + driver fold is deterministic),
    then point queries read ``min_r sketch[r][h_r(token)]``.  Row hashes
    are md5-derived (``_hash64`` of ``"r:token"`` — the same md5 upper-64
    DuckDB exposes as ``md5_number_upper``), which is what lets a SQL
    replica rebuild the identical sketch and match estimates exactly.

    Probe tokens are data-derived but deterministic: the ``n_probes``
    lexicographically-smallest distinct tokens of length ≥ ``min_len``
    (each block emits at most ``n_probes`` candidates, driver merges —
    bounded rows, never the token set).  Alongside each estimate the
    exact count of the broadcast probes is recounted (one bounded
    groupby), so the result exposes the CMS overestimate directly:
    ``est_cnt >= true_cnt`` always, equal when no bucket collision.
    Driver state is O(d·w + n_probes) — scale-safe at any corpus size.
    Returns (token, est_cnt, true_cnt) sorted by token.
    """
    import ray

    def _tokens(t: pa.Table) -> pa.Array:
        toks = pc.list_flatten(pc.utf8_split_whitespace(t[text_col]))
        return toks.filter(pc.not_equal(toks, "")).combine_chunks()

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        counts = (pa.table({"token": toks}).group_by("token")
                  .aggregate([("token", "count")]))
        tok = counts["token"].combine_chunks().cast(pa.string())
        cnt = counts["token_count"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sk = np.zeros((d, w), np.int64)
        tl = tok.to_pylist()
        for r in range(d):
            b = (_hash64([f"{r}:{s}" for s in tl])
                 % np.uint64(w)).astype(np.int64)
            np.add.at(sk[r], b, cnt)
        # probe candidates: block's n_probes smallest long-enough tokens
        longs = sorted(s for s in set(tl) if len(s) >= min_len)[:n_probes]
        return pa.table({
            "kind": pa.array([0] * d + [1] * len(longs), pa.int8()),
            "row": pa.array(list(range(d)) + [0] * len(longs), pa.int32()),
            "counters": pa.array([sk[r].tolist() for r in range(d)]
                                 + [[]] * len(longs),
                                 pa.list_(pa.int64())),
            "token": pa.array([""] * d + longs, pa.string()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sketch = np.zeros((d, w), np.int64)
    cand = set()
    for row in parts:
        if row["kind"] == 0:
            sketch[row["row"]] += np.asarray(row["counters"], np.int64)
        else:
            cand.add(row["token"])
    probes = sorted(cand)[:n_probes]
    probe_ref = ray.put(pa.array(probes, pa.string()))

    def recount(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(probe_ref)))
        g = (pa.table({"token": toks}).group_by("token")
             .aggregate([("token", "count")]))
        return pa.table({
            "token": g["token"].combine_chunks().cast(pa.string()),
            "cnt": g["token_count"].combine_chunks().cast(pa.int64())})

    true_cnt: dict = {}
    for row in ds.map_batches(recount,
                              batch_format="pyarrow").take_all():
        true_cnt[row["token"]] = true_cnt.get(row["token"], 0) + row["cnt"]

    ests = []
    for s in probes:
        b = (_hash64([f"{r}:{s}" for r in range(d)])
             % np.uint64(w)).astype(np.int64)
        ests.append(int(min(sketch[r][b[r]] for r in range(d))))
    return pd.DataFrame({
        "token": probes,
        "est_cnt": pd.array(ests, dtype="int64"),
        "true_cnt": pd.array([int(true_cnt.get(s, 0)) for s in probes],
                             dtype="int64")})


def hll_intersect(ds, group_col: str, value_col: str, ga, gb,
                  p: int = 12):
    """HLL set algebra: approximate |A|, |B|, |A∪B| and the
    inclusion-exclusion intersection |A∩B| ≈ |A|+|B|−|A∪B| for two
    key populations (e.g. "users who viewed AND purchased") — the
    sketch-union trick that answers overlap questions without a
    distinct-pair shuffle.

    One pass: every block emits THREE register partials (A, B, union
    — the union sketch is the element-wise max of the others' inputs,
    built directly so merge stays one shape), driver folds by register
    max (O(3·2^p)).  Estimates round half-away like the SQL oracle's
    ``round``; the intersection is exact integer arithmetic on the
    three estimates.  Returns one row (est_a, est_b, est_union,
    est_intersect).
    """
    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_pylist()
        v = b[value_col].to_pylist()
        va = [x for x, t in zip(v, g) if t == ga]
        vb = [x for x, t in zip(v, g) if t == gb]
        return pa.table({
            "which": pa.array([0, 1, 2], pa.int8()),
            "sketch": pa.array([hll_sketch_batch(va, p).tobytes(),
                                hll_sketch_batch(vb, p).tobytes(),
                                hll_sketch_batch(va + vb, p).tobytes()],
                               pa.binary())})

    m = 1 << p
    regs = [np.zeros(m, np.uint8) for _ in range(3)]
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        np.maximum(regs[r["which"]],
                   np.frombuffer(r["sketch"], np.uint8),
                   out=regs[r["which"]])
    ea, eb, eu = (_estimate(r) for r in regs)
    return pd.DataFrame({
        "est_a": pd.array([ea], dtype="int64"),
        "est_b": pd.array([eb], dtype="int64"),
        "est_union": pd.array([eu], dtype="int64"),
        "est_intersect": pd.array([ea + eb - eu], dtype="int64")})


def bloom_probe(members_ds, probes_ds, member_col: str, probe_col: str,
                m_bits: int = 8192, k: int = 3,
                key_type: "pa.DataType" = None):
    """Bloom filter (Bloom 1970, public algorithm) as a first-class
    oracled result — the membership sketch completing the family
    (HLL distinct / CMS frequency / t-digest quantile / frequent-items
    / Bloom membership), exposing its false positives directly.

    Build: every block condenses its DISTINCT member keys to the set of
    bit positions they touch (``k`` md5-salted hashes per key,
    ``_hash64("j:key") % m_bits`` — the same md5 upper-64 DuckDB
    exposes as ``md5_number_upper``, which is what lets the SQL oracle
    rebuild the identical bitmap) — one bounded list row per block
    (≤ ``m_bits`` positions, never the key stream).  Driver folds by
    set union into an ``m_bits`` bitmap (O(m) driver state, independent
    of data size) and broadcasts it once via ``ray.put``.

    Probe: a vectorized ``map_batches`` flags each probe key
    (``in_bloom`` = all ``k`` bits set — no false negatives, possible
    false positives), then exact truth rides a distributed
    :func:`~.joins.hash_join` LEFT join against the deduped member
    keys (``is_member``) — so rows with ``in_bloom=1, is_member=0``
    ARE the filter's false positives at this ``m_bits``/``k``.
    Returns (key, in_bloom, is_member) sorted by key.
    """
    import ray

    from .dataset_tools import distinct_rows
    from .joins import hash_join

    key_type = key_type or pa.int64()

    # consumed twice (bitmap partials + distinct member keys) — pin
    # the blocks or the upstream read+filter chain re-executes
    members_ds = members_ds.materialize()

    def positions(keys: list) -> np.ndarray:
        out = np.empty((k, len(keys)), np.int64)
        for j in range(k):
            out[j] = (_hash64([f"{j}:{v}" for v in keys])
                      % np.uint64(m_bits)).astype(np.int64)
        return out

    def partial(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[member_col].combine_chunks()).to_pylist()
        bits = (np.unique(positions(keys).ravel()) if keys
                else np.empty(0, np.int64))
        return pa.table({"bits": pa.array([bits.tolist()],
                                          pa.list_(pa.int32()))})

    bitmap = np.zeros(m_bits, bool)
    for row in members_ds.map_batches(
            partial, batch_format="pyarrow").take_all():
        bitmap[np.asarray(row["bits"], np.int64)] = True
    bm_ref = ray.put(bitmap)

    def flag(t: pa.Table) -> pa.Table:
        keys = t[probe_col].to_pylist()
        bm = ray.get(bm_ref)
        hit = (bm[positions(keys)].all(axis=0).astype(np.int64)
               if keys else np.empty(0, np.int64))
        return pa.table({probe_col: t[probe_col],
                         "in_bloom": pa.array(hit, pa.int64())})

    flagged = probes_ds.map_batches(flag, batch_format="pyarrow")
    mem = (distinct_rows(members_ds, [member_col])
           .map_batches(lambda t: t.append_column(
               "is_member", pa.array([1] * t.num_rows, pa.int64())),
               batch_format="pyarrow"))
    out = hash_join(flagged, mem, probe_col,
                    left_payload=["in_bloom"], right_payload=["is_member"],
                    right_key_col=member_col, how="left",
                    fill={"is_member": 0},
                    types={probe_col: key_type, "in_bloom": pa.int64(),
                           "is_member": pa.int64()})
    return out.sort(probe_col)


def minhash_accuracy(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_perm: int = 16, n_parts: int = 16):
    """MinHash similarity estimates vs TRUE Jaccard, side by side —
    the accuracy diagnostic for the LSH dedup family (Broder 1997),
    shaped like :func:`cms_estimates`/:func:`bloom_probe`: the sketch's
    error is part of the oracled result, not hidden behind a recall
    test.

    Docs pair up as (2m, 2m+1); each doc's DISTINCT word-bigram
    shingles hash ONCE via md5 (``_hash64`` == DuckDB
    ``md5_number_upper``), and the ``n_perm`` permutations are XOR
    folds with md5-derived salts (one md5 per shingle TOTAL, not per
    permutation — XOR with a constant is a 64-bit bijection, the
    standard cheap minhash family; DuckDB replays it with ``xor``).
    Jaccard is computed over the hashed shingle space on BOTH sides
    (identical definition ⇒ exact match by construction).

    One shuffle: shingle-hash rows route by pair (``_by_part``), each
    partition folds its pairs with vectorized numpy (set intersect +
    (n, n_perm) XOR-min).  Pairs missing a side (odd tail, tokenless
    docs) drop out, mirrored by the oracle.  Returns
    (pair_id, n_a, n_b, est_micro, jacc_micro) sorted by pair.
    """
    import re

    from .windows import _by_part

    pat = re.compile(r"[a-z0-9]+")
    salts = _hash64([f"perm:{p}" for p in range(n_perm)])

    def shingle_rows(t: pa.Table) -> pa.Table:
        pairs, sides, hvs = [], [], []
        did = t[id_col].to_pylist()
        for i, txt in enumerate(t[text_col].to_pylist()):
            ws = pat.findall((txt or "").lower())
            gs = sorted(set(" ".join(ws[j:j + 2])
                            for j in range(len(ws) - 1)))
            if not gs:
                continue
            h = _hash64(gs)
            pairs.extend([did[i] // 2] * len(h))
            sides.extend([did[i] % 2] * len(h))
            hvs.append(h)
        flat = (np.concatenate(hvs) if hvs else np.empty(0, np.uint64))
        return pa.table({"pair_id": pa.array(pairs, pa.int64()),
                         "side": pa.array(sides, pa.int8()),
                         "hv": pa.array(flat, pa.uint64())})

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")
    parts = _by_part(rows, "pair_id", n_parts=n_parts)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pair, sub in g.groupby("pair_id", sort=True):
            a = sub.loc[sub["side"] == 0, "hv"].to_numpy(np.uint64)
            b = sub.loc[sub["side"] == 1, "hv"].to_numpy(np.uint64)
            if len(a) == 0 or len(b) == 0:
                continue
            inter = len(np.intersect1d(a, b))
            union = len(a) + len(b) - inter
            siga = (a[:, None] ^ salts[None, :]).min(axis=0)
            sigb = (b[:, None] ^ salts[None, :]).min(axis=0)
            est = int((siga == sigb).sum())
            out.append((int(pair), len(a), len(b),
                        est * 1_000_000 // n_perm,
                        inter * 1_000_000 // union))
        return pd.DataFrame(
            out, columns=["pair_id", "n_a", "n_b",
                          "est_micro", "jacc_micro"]).astype("int64")

    return (parts.groupby("_part")
            .map_groups(lambda g: fold(g.drop(columns="_part")),
                        batch_format="pandas")
            .sort("pair_id"))


def kmv_distinct(ds, value_col: str = "user_id", k: int = 256):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
    "Counting distinct elements in a data stream" — the KMV/bottom-k
    estimator): hash every value to 64 bits, keep the ``k`` SMALLEST
    distinct hashes, estimate ``(k−1)·2⁶⁴ / h₍k₎``.

    Mergeable-sketch shape (the HLL/CMS pattern): each block condenses to
    its bottom-k distinct hashes — blocking-invariant because the bottom-k
    of a union is the bottom-k of the per-part bottom-k's — and the driver
    folds O(n_blocks·k) hashes, never the value set.  The exact companion
    runs alongside via :func:`~.dataset_tools.distinct_rows` (distributed
    dedup), so the result row exposes the sketch error directly.  Hashes
    are ``_hash64`` (md5 upper-64 == DuckDB ``md5_number_upper``), so the
    SQL oracle rebuilds the identical sketch — estimate equality is
    sketch-for-sketch, not a tolerance check.  Estimator arithmetic is
    pure Python int (``(k−1)·2⁶⁴`` overflows int64; the oracle uses
    HUGEINT).  Fewer than ``k`` distinct hashes ⇒ the sketch IS the
    exact set (est = n).  Returns one row (k, n_exact, kmv_est).
    """
    from .dataset_tools import distinct_rows

    def partial(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[value_col], pa.string()).to_pylist()
        u = np.unique(_hash64(vals))          # sorted ascending
        return pa.table({"h": pa.array(u[:k], pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    hs = np.unique(np.array([r["h"] for r in parts], np.uint64))
    n_exact = int(distinct_rows(ds.select_columns([value_col]),
                                [value_col]).count())
    if len(hs) < k:
        est = len(hs)
    else:
        est = (k - 1) * (1 << 64) // int(hs[k - 1])
    return pd.DataFrame({
        "k": pd.array([k], dtype="int64"),
        "n_exact": pd.array([n_exact], dtype="int64"),
        "kmv_est": pd.array([est], dtype="int64")})


def join_size_est(ds_a, ds_b, key_a: str, key_b: str,
                  d: int = 4, w: int = 1024) -> pd.DataFrame:
    """CMS inner-product join-cardinality estimate (Cormode &
    Muthukrishnan 2005 §4.2, the classic optimizer primitive):
    ``|A ⋈ B|`` ≈ ``min_r Σ_j A_r[j]·B_r[j]`` over two d×w count-min
    sketches built with SHARED row hashes — always ≥ the true size
    (collisions only add mass), equal when no bucket collides.

    The mergeable-sketch shape twice (each block condenses its keys to
    one d×w counter array; the driver folds O(d·w) ints per side), plus
    the exact companion ``Σ_k cnt_A(k)·cnt_B(k)`` via per-key
    :func:`~.dataset_tools.group_sum` folds + one distributed
    :func:`~.joins.hash_join` (the many-groups rule — per-key counts are
    data-scaled).  Hashes are ``_hash64(f"{r}:{key}")`` % w (the
    ``cms_freq`` convention), so the SQL oracle rebuilds both sketches
    via ``md5_number_upper`` bucket arithmetic — estimate equality
    INCLUDING collisions.  Products fold in pure-Python int (Σ of
    int64·int64 can pass 2⁶³ at extreme skew).  Returns one row
    (est_rows, true_rows).
    """
    from .dataset_tools import group_sum
    from .joins import hash_join

    def sketch_of(ds, col) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            counts = (pa.table({"k": pc.cast(t[col], pa.string())})
                      .group_by("k").aggregate([("k", "count")]))
            keys = counts["k"].to_pylist()
            cnt = counts["k_count"].to_numpy(zero_copy_only=False)
            sk = np.zeros((d, w), np.int64)
            for r in range(d):
                b = _hash64([f"{r}:{s}" for s in keys]) % np.uint64(w)
                np.add.at(sk[r], b.astype(np.int64), cnt)
            return pa.table({"sk": pa.array([sk.ravel().tolist()],
                                            pa.list_(pa.int64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        out = np.zeros(d * w, np.int64)
        for r in parts:
            out += np.asarray(r["sk"], np.int64)
        return out.reshape(d, w)

    ska = sketch_of(ds_a, key_a)
    skb = sketch_of(ds_b, key_b)
    est = min(sum(int(x) * int(y) for x, y in zip(ska[r], skb[r])
                  if x and y) for r in range(d))

    def ones(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"k": pc.cast(t[col], pa.int64()),
                             "one": pa.array(np.ones(t.num_rows, np.int64))})
        return f

    ca = group_sum(ds_a.map_batches(ones(key_a), batch_format="pyarrow"),
                   "k", ["one"], rename={"one": "na"})
    cb = group_sum(ds_b.map_batches(ones(key_b), batch_format="pyarrow"),
                   "k", ["one"], rename={"one": "nb"})
    met = hash_join(ca, cb, key_col="k",
                    left_payload=["na"], right_payload=["nb"],
                    types={"k": pa.int64(), "na": pa.int64(),
                           "nb": pa.int64()})

    def prod(t: pa.Table) -> pa.Table:
        na = t["na"].to_numpy(zero_copy_only=False).astype(object)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(object)
        return pa.table({"p": pa.array([str(int((na * nb).sum()))],
                                       pa.string())})

    true_rows = sum(int(r["p"])
                    for r in met.map_batches(
                        prod, batch_format="pyarrow").take_all())
    return pd.DataFrame({
        "est_rows": pd.array([est], dtype="int64"),
        "true_rows": pd.array([true_rows], dtype="int64")})
