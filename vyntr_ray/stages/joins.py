"""Temporal joins Ray Data lacks, composed from groupby + map_groups.

``asof_join``: for every left row, the latest right row of the same key
with ``right.ts <= left.ts`` (inner semantics: left rows with no prior
right row are dropped).  The classic point-in-time feature lookup —
"the last view before this click", "the latest price before this trade".

Ray-Data-first shape: both sides are tagged and aligned to ONE typed
schema (missing columns become typed nulls, so the union never degrades
to null/object blocks), unioned, and a single ``groupby(part)`` shuffle
— ``part = hash(key) % n_parts`` — co-locates each key's rows.  The
per-key sweep is NOT one ``map_groups`` call per key (Ray pays ~ms per
group — the PERF.md many-groups rule); each partition group runs ONE
vectorized ``pandas.merge_asof(by=key)`` over all of its keys.  The
partitioning assumption (documented per the build brief): a hash
partition's rows fit in a worker's heap — ``n_parts`` scales with the
cluster, keys are users/instruments, not the corpus.  Ties on ts
resolve to the right row latest in (ts, payload) sort order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join", "range_count_join", "hash_join", "anti_join",
           "semi_join", "bloom_anti_join", "bloom_semi_join",
           "cdc_apply", "window_join", "nearest_join"]


def _pa_type(t) -> pa.DataType:
    """Normalize a Dataset schema entry to an arrow DataType.

    A Dataset whose blocks are pandas (e.g. the output of a
    ``map_groups(..., batch_format="pandas")`` stage) reports numpy dtypes
    from ``.schema()``; joining such a side needs them mapped back.
    ``object`` dtype carries no element type — assumed string (the only
    way pandas blocks represent text)."""
    if isinstance(t, pa.DataType):
        return t
    if t == np.dtype(object):
        return pa.string()
    return pa.from_numpy_dtype(t)


def _part_col(keys: pa.ChunkedArray, n_parts: int) -> pa.Array:
    """md5-derived partition id per key — md5 runs once per DISTINCT key
    (keys repeat heavily in join columns; hashing 240k rows one-by-one
    in Python was the dominant cost of a 600k-row join at sf0.1), then
    a vectorized codes lookup fans it back out.

    Uniques come from Arrow's ``dictionary_encode`` on the ORIGINAL typed
    array, never from a pandas conversion: ``to_pandas`` silently casts a
    null-bearing int64 batch to float64, so the same key would hash as
    ``'7.0'`` in one batch and ``'7'`` in another and route to different
    partitions.  Null keys get their own deterministic partition
    (``md5('\\x00NULL')``) — callers that need SQL join semantics drop
    them before partitioning (``hash_join`` does)."""
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    enc = pc.dictionary_encode(arr)
    uniques = enc.dictionary.to_pylist()
    upart = np.fromiter(
        (int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
         % n_parts for v in uniques), np.int32, count=len(uniques))
    null_part = np.int32(
        int(hashlib.md5(b"\x00NULL").hexdigest()[:8], 16) % n_parts)
    upart = np.append(upart, null_part).astype(np.int32)
    codes = enc.indices.fill_null(len(uniques)).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return pa.array(upart[codes], pa.int32())


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              left_payload: list[str], right_payload: list[str],
              right_prefix: str = "r_", n_parts: int = 64,
              how: str = "inner"):
    """As-of join; returns key, ts, left payload, prefixed right
    payload (incl. ``r_<ts_col>`` of the matched row).  ``how="inner"``
    drops left rows with no prior right row; ``how="left"`` keeps them
    with null ``r_*`` columns (nullable dtypes in the output — callers
    that need exact int columns coalesce to a sentinel)."""
    assert how in ("inner", "left")
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names,
                                               l_schema.types)}
    r_types = {n: _pa_type(t) for n, t in zip(r_schema.names,
                                               r_schema.types)}
    r_out = {right_prefix + c: r_types[c] for c in [ts_col] + right_payload}
    combined = {key_col: l_types[key_col], ts_col: l_types[ts_col],
                "side": pa.int8(),
                **{c: l_types[c] for c in left_payload}, **r_out}

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in combined.items():
                if name == "side":
                    cols[name] = pa.array(np.full(n, side, np.int8))
                elif side == 1 and name in (key_col, ts_col, *left_payload):
                    cols[name] = t[name]
                elif side == 0 and name in (key_col,):
                    cols[name] = t[name]
                elif side == 0 and name.startswith(right_prefix) \
                        and name[len(right_prefix):] in (ts_col,
                                                         *right_payload):
                    cols[name] = t[name[len(right_prefix):]]
                elif side == 0 and name == ts_col:
                    cols[name] = t[ts_col]   # groupless sort key fallback
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    l_tag = (left_ds.select_columns([key_col, ts_col] + left_payload)
             .map_batches(tag(1), batch_format="pyarrow"))
    r_tag = (right_ds.select_columns([key_col, ts_col] + right_payload)
             .map_batches(tag(0), batch_format="pyarrow"))

    out_cols = [key_col, ts_col] + left_payload + list(r_out)
    out_dtypes = {c: combined[c].to_pandas_dtype() for c in out_cols}
    rsort = list(r_out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # one partition = many keys; ONE merge_asof(by=key) does every
        # key's backward sweep vectorized
        left = g[g["side"] == 1]
        right = g[g["side"] == 0]
        empty = pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                              for c in out_cols})
        if left.empty or (right.empty and how == "inner"):
            return empty
        if right.empty:                       # how == "left": null r_*
            out = left[[key_col, ts_col] + left_payload].copy()
            for c in r_out:
                out[c] = np.nan
            for c in [key_col, ts_col] + left_payload:
                out[c] = out[c].astype(out_dtypes[c])
            return out[out_cols]
        # stable sort by (ts, payload): within each key this is exactly
        # the per-key order, and merge_asof only requires the on-column
        # to be globally sorted
        left = left.sort_values([ts_col] + left_payload, kind="mergesort")
        right = right.sort_values(rsort, kind="mergesort")
        # the union's nulls upcast r_<ts> to float when ts is integer
        # (datetime ts stays datetime64/NaT); merge keys must match, and
        # the right rows' r_<ts> values are all non-null, so the cast
        # back to the left ts dtype is exact
        right = right.assign(**{
            right_prefix + ts_col:
                right[right_prefix + ts_col].astype(left[ts_col].dtype)})
        merged = pd.merge_asof(
            left[[key_col, ts_col] + left_payload],
            right[[key_col] + rsort],
            left_on=ts_col, right_on=right_prefix + ts_col,
            by=key_col, direction="backward")
        if how == "inner":
            merged = merged.dropna(subset=[right_prefix + ts_col])
        if merged.empty:
            return empty
        # nulls from the tagged union upcast int columns to float in the
        # per-group pandas frame — restore the source dtypes exactly
        # (r_* columns stay nullable under how="left" when NaN survive)
        merged = merged[out_cols]
        for c in out_cols:
            if merged[c].notna().all():
                merged[c] = merged[c].astype(out_dtypes[c])
        return merged

    both = l_tag.union(r_tag)
    return both.groupby("part").map_groups(merge, batch_format="pandas")


def range_count_join(left_ds, right_ds, key_col: str, ts_col: str,
                     left_payload: list[str], window_us: int,
                     count_name: str = "n_in_window", n_parts: int = 64):
    """Interval join reduced to a count: for each left row, how many right
    rows of the same key fall in ``[left.ts - window, left.ts]``
    (inclusive both ends; ``window_us`` is expressed in the ts column's
    storage unit — µs for parquet timestamp[us]).  Same tagged-union +
    one-``groupby(part)`` shape as :func:`asof_join`; per partition the
    count is the RANK DIFFERENCE of two vectorized
    ``merge_asof(by=key)`` sweeps — ``#(r_ts <= ts) - #(r_ts < ts-w)``
    — so a partition with R right and L left rows costs
    O((L+R) log(L+R)) in sorts, with no per-key Python at all.
    Every left row survives (count 0 when nothing matched).
    """
    l_schema = left_ds.schema()
    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names,
                                               l_schema.types)}
    combined = {key_col: l_types[key_col], ts_col: l_types[ts_col],
                "side": pa.int8(),
                **{c: l_types[c] for c in left_payload}}

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in combined.items():
                if name == "side":
                    cols[name] = pa.array(np.full(n, side, np.int8))
                elif side == 0 and name in left_payload:
                    cols[name] = pa.nulls(n, typ)
                else:
                    cols[name] = t[name]
            out = pa.table(cols)
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    l_tag = (left_ds.select_columns([key_col, ts_col] + left_payload)
             .map_batches(tag(1), batch_format="pyarrow"))
    r_tag = (right_ds.select_columns([key_col, ts_col])
             .map_batches(tag(0), batch_format="pyarrow"))

    out_cols = [key_col, ts_col] + left_payload
    out_dtypes = {c: combined[c].to_pandas_dtype() for c in out_cols}

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1]
        if left.empty:
            e = pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                              for c in out_cols})
            e[count_name] = pd.Series(dtype="int64")
            return e
        def as_i64(s: "pd.Series") -> np.ndarray:
            # int view in the column's NATIVE unit — window_us is
            # expressed in the storage unit by contract
            return s.to_numpy().astype(np.int64)

        right0 = (g.loc[g["side"] == 0, [key_col, ts_col]]
                  .sort_values([key_col, ts_col], kind="mergesort"))
        left = left.sort_values(ts_col, kind="mergesort")
        lts = as_i64(left[ts_col])
        lf = pd.DataFrame({key_col: left[key_col].to_numpy(),
                           "_ts": lts, "_lo_ts": lts - window_us})
        if right0.empty:
            hi = np.zeros(len(lf), np.int64)
            lo = np.zeros(len(lf), np.int64)
        else:
            right = pd.DataFrame({
                key_col: right0[key_col].to_numpy(),
                "_rts": as_i64(right0[ts_col]),
                "_rank": right0.groupby(key_col, sort=False)
                .cumcount().to_numpy() + 1,
            }).sort_values("_rts", kind="mergesort")
            hi = pd.merge_asof(
                lf, right, left_on="_ts", right_on="_rts", by=key_col,
                direction="backward")["_rank"] \
                .fillna(0).to_numpy(np.int64)
            # _lo_ts = _ts - w is order-isomorphic to _ts, so lf stays
            # sorted for the lo sweep and row orders line up
            lo = pd.merge_asof(
                lf, right, left_on="_lo_ts", right_on="_rts", by=key_col,
                direction="backward", allow_exact_matches=False)["_rank"] \
                .fillna(0).to_numpy(np.int64)
        out = left[out_cols].copy()
        for c in out_cols:
            out[c] = out[c].astype(out_dtypes[c])
        out[count_name] = (hi - lo).astype(np.int64)
        return out

    both = l_tag.union(r_tag)
    return both.groupby("part").map_groups(sweep, batch_format="pandas")


def hash_join(left_ds, right_ds, key_col: str,
              left_payload: list[str], right_payload: list[str],
              right_key_col: str | None = None, n_parts: int = 64,
              types: dict | None = None, how: str = "inner",
              fill: dict | None = None):
    """Inner equi-join as tagged union + ONE hash-partition groupby +
    a vectorized pandas merge per partition.

    Exists because ``Dataset.join`` (Ray's JoinOperator) crashes with
    ``ArrowInvalid: No match ... for key field reference`` when a hash
    partition ends up EMPTY on one side (its block degrades to a
    schema-less table) — common for selective filters over small
    scale factors.  This shape tolerates empty sides (the merge just
    returns no rows for that partition), bounds skew by partition
    rather than by key, and pays one shuffle like the native join.
    Payload column names must be disjoint across sides.

    SQL inner-join semantics on keys: null-key rows are dropped on BOTH
    sides before partitioning (pandas ``merge`` would otherwise match
    NaN==NaN), and the right key is cast to the LEFT key's arrow type so
    an int32-vs-int64 pair can't produce inconsistent block schemas or
    divergent str()-based routing.

    ``types`` (optional): arrow type per key/payload column.  When given,
    the ``.schema()`` probes are SKIPPED — on a lazy map chain a schema
    probe can execute the whole upstream pipeline once just to learn
    types the caller already knows statically.

    ``how="left"`` keeps unmatched left rows with ``fill`` values (one
    per right payload column, REQUIRED) substituted for the missing
    right side — the asof_join(how="left") sentinel convention, so
    nulls never enter a driver value hash and int columns stay int64
    through pandas (a NaN would float-cast them).  ``how="full"`` also
    keeps unmatched RIGHT rows (fill then covers both payload sides).
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(f"hash_join: how={how!r} not supported")
    if how == "left" and (fill is None
                          or set(fill) != set(right_payload)):
        raise ValueError("hash_join(how='left') requires fill= with one "
                         "sentinel per right payload column")
    if how == "full" and (fill is None or set(fill)
                          != set(left_payload) | set(right_payload)):
        raise ValueError("hash_join(how='full') requires fill= with one "
                         "sentinel per payload column on BOTH sides")
    rkey = right_key_col or key_col
    if types is not None:
        l_types = {key_col: types[key_col],
                   **{c: types[c] for c in left_payload}}
        r_types = {rkey: types.get(rkey, types[key_col]),
                   **{c: types[c] for c in right_payload}}
    else:
        l_schema = left_ds.schema()
        r_schema = right_ds.schema()
        l_types = {n: _pa_type(t) for n, t in zip(l_schema.names,
                                                  l_schema.types)}
        r_types = {n: _pa_type(t) for n, t in zip(r_schema.names,
                                                  r_schema.types)}
    combined = {key_col: l_types[key_col], "side": pa.int8(),
                **{c: l_types[c] for c in left_payload},
                **{c: r_types[c] for c in right_payload}}

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col if side == 1 else rkey]))
            n = t.num_rows
            cols = {}
            for name, typ in combined.items():
                if name == "side":
                    cols[name] = pa.array(np.full(n, side, np.int8))
                elif name == key_col:
                    k = t[key_col if side == 1 else rkey]
                    # BOTH sides cast to the declared key type: a
                    # types= entry that mismatches the actual left
                    # schema (e.g. int64 declared, double-with-nulls
                    # actual) would otherwise route the two sides
                    # differently and silently drop matches
                    cols[name] = pc.cast(k, typ)
                elif side == 1 and name in left_payload:
                    cols[name] = t[name]
                elif side == 0 and name in right_payload:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    l_tag = (left_ds.select_columns([key_col] + left_payload)
             .map_batches(tag(1), batch_format="pyarrow"))
    r_tag = (right_ds.select_columns([rkey] + right_payload)
             .map_batches(tag(0), batch_format="pyarrow"))

    out_cols = [key_col] + left_payload + right_payload
    out_dtypes = {c: combined[c].to_pandas_dtype() for c in out_cols}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1]
        right = g[g["side"] == 0]
        one_sided_empty = ((left.empty and how != "full")
                           or (right.empty and how == "inner"))
        if one_sided_empty or (left.empty and right.empty):
            return pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                                 for c in out_cols})
        if right.empty and how in ("left", "full"):
            merged = left[[key_col] + left_payload].copy()
            for c in right_payload:
                merged[c] = fill[c]
        elif left.empty:                     # how == "full": right only
            merged = right[[key_col] + right_payload].copy()
            for c in left_payload:
                merged[c] = fill[c]
        else:
            merged = pd.merge(left[[key_col] + left_payload],
                              right[[key_col] + right_payload],
                              on=key_col, how="outer" if how == "full"
                              else how)
            if how in ("left", "full"):
                for c in right_payload:
                    merged[c] = merged[c].fillna(fill[c])
            if how == "full":
                for c in left_payload:
                    merged[c] = merged[c].fillna(fill[c])
        # tagged-union nulls upcast ints to float in the pandas frame;
        # inner output has no nulls and left output is sentinel-filled,
        # so the cast back is exact either way
        for c in out_cols:
            merged[c] = merged[c].astype(out_dtypes[c])
        return merged[out_cols]

    both = l_tag.union(r_tag)
    return both.groupby("part").map_groups(merge, batch_format="pandas")


def anti_join(left_ds, right_ds, key_col: str,
              left_payload: list[str],
              right_key_col: str | None = None, n_parts: int = 64,
              types: dict | None = None, _keep_matches: bool = False):
    """LEFT ANTI equi-join (``WHERE NOT EXISTS (… right.key = left.key)``)
    as the same tagged-union + ONE hash-partition shuffle as
    :func:`hash_join` — both sides route by the same ``_part_col`` hash,
    so each partition decides membership locally with one vectorized
    ``isin``.  Distributed on BOTH sides: unlike the broadcast anti-join
    (J1/J2 — right side shipped to every task), this works when the
    exclusion side scales with the facts (e.g. "customers with no
    orders": the orders key set is customer-scale, too big to ship).

    NOT-EXISTS null semantics: right-side null keys are ignored and
    left-side null keys are dropped (SQL ``NOT IN`` with a null on the
    right would return nothing — callers wanting that must check).

    ``types``: same schema-probe skip as :func:`hash_join`.
    """
    rkey = right_key_col or key_col
    if types is not None:
        l_types = {key_col: types[key_col],
                   **{c: types[c] for c in left_payload}}
    else:
        l_schema = left_ds.schema()
        l_types = {n: _pa_type(t) for n, t in zip(l_schema.names,
                                                  l_schema.types)}
    combined = {key_col: l_types[key_col], "side": pa.int8(),
                **{c: l_types[c] for c in left_payload}}

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col if side == 1 else rkey]))
            n = t.num_rows
            cols = {}
            for name, typ in combined.items():
                if name == "side":
                    cols[name] = pa.array(np.full(n, side, np.int8))
                elif name == key_col:
                    k = t[key_col if side == 1 else rkey]
                    # BOTH sides cast to the declared key type: a
                    # types= entry that mismatches the actual left
                    # schema (e.g. int64 declared, double-with-nulls
                    # actual) would otherwise route the two sides
                    # differently and silently drop matches
                    cols[name] = pc.cast(k, typ)
                elif side == 1:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    l_tag = (left_ds.select_columns([key_col] + left_payload)
             .map_batches(tag(1), batch_format="pyarrow"))
    r_tag = (right_ds.select_columns([rkey])
             .map_batches(tag(0), batch_format="pyarrow"))

    out_cols = [key_col] + left_payload
    out_dtypes = {c: combined[c].to_pandas_dtype() for c in out_cols}

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1]
        if left.empty:
            return pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                                 for c in out_cols})
        right_keys = g.loc[g["side"] == 0, key_col]
        m = left[key_col].isin(right_keys)
        out = left[m if _keep_matches else ~m]
        out = out[out_cols].copy()
        for c in out_cols:
            out[c] = out[c].astype(out_dtypes[c])
        return out

    both = l_tag.union(r_tag)
    return both.groupby("part").map_groups(keep, batch_format="pandas")


def semi_join(left_ds, right_ds, key_col: str,
              left_payload: list[str],
              right_key_col: str | None = None, n_parts: int = 64,
              types: dict | None = None):
    """LEFT SEMI equi-join (``WHERE EXISTS (… right.key = left.key)``) —
    :func:`anti_join` with the membership test kept instead of
    inverted: same tagged union, same ONE hash-partition shuffle, same
    distributed-both-sides contract (use the broadcast filter J4 shape
    when the right side is genuinely small).  Left rows are never
    duplicated by multiple right matches (EXISTS, not a join)."""
    return anti_join(left_ds, right_ds, key_col, left_payload,
                     right_key_col=right_key_col, n_parts=n_parts,
                     types=types, _keep_matches=True)


def _bloom_positions(arr: pa.Array, m_bits: int, k: int):
    """(uniques, codes, positions): one md5 per DISTINCT key (the
    _part_col economy), ``k`` bit positions sliced from the 128-bit
    digest per unique.  ``positions`` is shaped (n_uniques, k)."""
    enc = pc.dictionary_encode(arr)
    uniques = enc.dictionary.to_pylist()
    pos = np.empty((len(uniques), k), np.int64)
    for i, v in enumerate(uniques):
        d = hashlib.md5(str(v).encode("utf-8")).digest()
        for j in range(k):
            pos[i, j] = int.from_bytes(d[4 * j:4 * j + 4],
                                       "little") % m_bits
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uniques, codes, pos


def bloom_anti_join(left_ds, right_ds, key_col: str,
                    left_payload: list[str],
                    right_key_col: str | None = None, n_parts: int = 64,
                    types: dict | None = None,
                    m_bits: int = 1 << 23, k: int = 4,
                    _keep_matches: bool = False):
    """:func:`anti_join` with a Bloom prefilter — the 100-TB shape.

    The plain anti_join shuffles BOTH sides; but in the common case most
    left keys never appear on the right (new urls vs the seen set, rich
    customers vs a narrow order window), so most left rows pay the
    shuffle only to be kept verbatim.  This variant builds a
    fixed-size Bloom bitmap over the right keys (per-block partial
    bitmaps, OR-merged on the driver — O(#blocks x m_bits/8), bounded
    by cluster size, NOT by data; broadcast once via ray.put), then
    splits the left stream: definitely-absent rows (no false negatives
    in a Bloom filter) bypass the shuffle into the output, and only the
    maybe-present minority rides the exact distributed
    :func:`anti_join` — false positives are RE-CHECKED exactly, so the
    result is byte-identical to anti_join at any ``m_bits``.  The same
    probe-before-shuffle move as the crawl's seen prefilter (PERF.md:
    2M soak 6.2k -> 11.2k urls/s).

    ``m_bits`` sizing: ~10 bits/distinct right key keeps FP ~1% at k=4;
    the default 8M bits (1 MiB bitmap) covers ~800k keys.  Right side is
    consumed twice (bloom build + exact pass) and is materialized here.
    """
    import ray

    rkey = right_key_col or key_col
    right = right_ds.materialize()
    nbytes = m_bits // 8
    # bloom hashing must see ONE type on both sides (int64 7 and double
    # 7.0 stringify differently); cast to the declared/derived key type
    if types is not None:
        ktyp = types[key_col]
    else:
        ls = left_ds.schema()
        ktyp = _pa_type(dict(zip(ls.names, ls.types))[key_col])

    def build(t: pa.Table) -> pa.Table:
        arr = t[rkey].combine_chunks() if isinstance(
            t[rkey], pa.ChunkedArray) else t[rkey]
        arr = pc.cast(arr.drop_null(), ktyp)
        bm = np.zeros(nbytes, np.uint8)
        if len(arr):
            _, _, pos = _bloom_positions(arr, m_bits, k)
            flat = pos.reshape(-1)
            np.bitwise_or.at(bm, flat >> 3,
                             (1 << (flat & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    merged = np.zeros(nbytes, np.uint8)
    for row in right.map_batches(build, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["bm"], np.uint8)
    bm_ref = ray.put(merged)

    cols = [key_col] + left_payload

    def flag(t: pa.Table) -> pa.Table:
        t = t.select(cols).filter(pc.is_valid(t[key_col]))
        arr = t[key_col].combine_chunks() if isinstance(
            t[key_col], pa.ChunkedArray) else t[key_col]
        arr = pc.cast(arr, ktyp)
        if t.num_rows == 0:
            return t.append_column("_maybe", pa.array([], pa.bool_()))
        bm = ray.get(bm_ref)
        _, codes, pos = _bloom_positions(arr, m_bits, k)
        hit = ((bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
               ).all(axis=1)
        return t.append_column("_maybe",
                               pa.array(hit[codes], pa.bool_()))

    flagged = left_ds.map_batches(flag, batch_format="pyarrow")

    def absent(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["_maybe"])).drop_columns(["_maybe"])

    def maybe(t: pa.Table) -> pa.Table:
        return t.filter(t["_maybe"]).drop_columns(["_maybe"])

    if _keep_matches:
        # semi mode: definitely-absent rows are DROPPED, so `flagged`
        # is consumed exactly once — no materialize needed; only the
        # maybe-present minority rides the exact distributed semi_join
        # (false positives fail the exact isin, so the result is
        # byte-identical to semi_join at any m_bits)
        return semi_join(
            flagged.map_batches(maybe, batch_format="pyarrow"),
            right, key_col=key_col, left_payload=left_payload,
            right_key_col=rkey, n_parts=n_parts, types=types)
    flagged = flagged.materialize()
    definite = flagged.map_batches(absent, batch_format="pyarrow")
    checked = anti_join(flagged.map_batches(maybe, batch_format="pyarrow"),
                        right, key_col=key_col, left_payload=left_payload,
                        right_key_col=rkey, n_parts=n_parts, types=types)
    return definite.union(checked)


def bloom_semi_join(left_ds, right_ds, key_col: str,
                    left_payload: list[str],
                    right_key_col: str | None = None, n_parts: int = 64,
                    types: dict | None = None,
                    m_bits: int = 1 << 23, k: int = 4):
    """:func:`semi_join` with the Bloom prefilter — EXISTS at fact
    scale.  Definitely-absent left rows (no false negatives) are
    dropped WITHOUT ever entering the shuffle; only the maybe-present
    minority pays the exact distributed membership check, so when most
    left keys miss (decontamination against a small-but-fact-scale
    eval set, urls vs a seen shard) the shuffle moves ~FP-rate of the
    left table instead of all of it.  Byte-identical to
    :func:`semi_join` at any ``m_bits`` (false positives re-check
    exactly)."""
    return bloom_anti_join(left_ds, right_ds, key_col, left_payload,
                           right_key_col=right_key_col, n_parts=n_parts,
                           types=types, m_bits=m_bits, k=k,
                           _keep_matches=True)


def cdc_apply(base_ds, changes_ds, key_col: str, val_col: str,
              seq_cols: list | None = None, op_col: str = "op",
              n_parts: int = 64):
    """Apply a CDC changelog to a base snapshot: per key, the
    highest-``seq_cols`` change wins — an upsert ('U') replaces the
    value, a delete ('D') removes the key; keys with no changes keep
    their base value.  The materialized-view maintenance primitive
    (Debezium-style op streams), generalizing the S9/S10 upsert sinks
    with delete semantics.

    One distributed pass: base rows are tagged with seq = -inf (any
    change outranks the snapshot), both sides align to one typed
    schema, and ONE hash-partition shuffle co-locates each key; per
    partition a vectorized sort + keep-last + drop-deletes sweep covers
    all of its keys (the many-groups rule — never a group per key).
    ``seq_cols`` must totally order each key's changes (e.g.
    (ts, change_id)); base and changes never tie (-inf).  Contract:
    the base snapshot holds at most one row per key (a snapshot by
    definition — duplicate base keys would resolve by union arrival
    order).  Output: (key, val) — the final state."""
    seq_cols = seq_cols or ["seq_us", "seq_id"]

    def tag_base(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col].cast(pa.int64()),
                val_col: t[val_col].cast(pa.int64()),
                op_col: pa.array(["U"] * len(t), pa.string())}
        for c in seq_cols:
            cols[c] = pa.nulls(len(t), pa.int64())   # -inf rank (sorts first)
        return pa.table(cols)

    def tag_change(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col].cast(pa.int64()),
                val_col: t[val_col].cast(pa.int64()),
                op_col: t[op_col].cast(pa.string())}
        for c in seq_cols:
            cols[c] = t[c].cast(pa.int64())
        return pa.table(cols)

    both = (base_ds.map_batches(tag_base, batch_format="pyarrow")
            .union(changes_ds.map_batches(tag_change,
                                          batch_format="pyarrow")))

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t[key_col], n_parts))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # nulls (the base tag) sort FIRST -> last row per key is the
        # max-seq change, or the base row when no change exists
        g = g.sort_values([key_col, *seq_cols], kind="mergesort",
                          na_position="first")
        # whole-row keep-last (groupby.last() is per-column last-non-null
        # and would stitch base seq-nulls with change payloads)
        last = g.drop_duplicates(subset=[key_col], keep="last")
        last = last[last[op_col] != "D"]
        return pd.DataFrame({key_col: last[key_col].to_numpy(np.int64),
                             val_col: last[val_col].to_numpy(np.int64)})

    return (both.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: per_part(g.drop(columns="_part")),
                        batch_format="pandas"))


def window_join(left_ds, right_ds, key_col: str, ts_col: str,
                id_col: str, window_s: int, n_parts: int = 64):
    """Stream-stream interval join: every (left, right) pair with the
    same key and ``right.ts ∈ [left.ts − window, left.ts]`` — "views
    within the hour before each purchase", the bounded-time sibling of
    :func:`asof_join` (which keeps only the LATEST match) and
    ``range_count_join`` (which keeps only the COUNT).

    Same one-shuffle tagged-union shape as the other temporal joins;
    per partition both sides sort once by (key, ts, id) and each left
    row's match range comes from two vectorized ``searchsorted``
    bounds, expanded with ``np.repeat`` — pair volume is bounded by
    window density (a skew contract the caller owns: window_s times
    the hottest key's rate must fit a partition).  Output: (key,
    left id, right id, gap_us ≥ 0), exactly the SQL BETWEEN join."""
    win_us = window_s * 1_000_000

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                         pa.int64())
            out = pa.table({key_col: pc.cast(t[key_col], pa.int64()),
                            "us": us,
                            "id": pc.cast(t[id_col], pa.int64()),
                            "side": pa.array(
                                np.full(len(t), side, np.int8))})
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    both = (left_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(1), batch_format="pyarrow")))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key_col: np.array([], np.int64),
                              "left_id": np.array([], np.int64),
                              "right_id": np.array([], np.int64),
                              "gap_us": np.array([], np.int64)})
        l = g[g["side"] == 0].sort_values([key_col, "us", "id"],
                                          kind="mergesort")
        r = g[g["side"] == 1].sort_values([key_col, "us", "id"],
                                          kind="mergesort")
        if not len(l) or not len(r):
            return empty
        lk, lu = l[key_col].to_numpy(), l["us"].to_numpy()
        rk, ru = r[key_col].to_numpy(), r["us"].to_numpy()
        lo = np.zeros(len(l), np.int64)
        hi = np.zeros(len(l), np.int64)
        # both sides are key-sorted: one searchsorted pair per DISTINCT
        # key (the md5-per-distinct-key granularity), vectorized over
        # all of that key's left rows
        l_keys, l_starts = np.unique(lk, return_index=True)
        l_ends = np.r_[l_starts[1:], len(lk)]
        r_keys, r_starts = np.unique(rk, return_index=True)
        r_ends = np.r_[r_starts[1:], len(rk)]
        pos = np.searchsorted(r_keys, l_keys)
        for j in range(len(l_keys)):
            p = pos[j]
            if p >= len(r_keys) or r_keys[p] != l_keys[j]:
                continue
            ls, le = l_starts[j], l_ends[j]
            rs, re = r_starts[p], r_ends[p]
            lo[ls:le] = rs + np.searchsorted(ru[rs:re],
                                             lu[ls:le] - win_us, "left")
            hi[ls:le] = rs + np.searchsorted(ru[rs:re], lu[ls:le],
                                             "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(l)), cnt)
        # right indices: per-pair offset within its left row's range
        base = np.repeat(lo, cnt)
        within = np.arange(total) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        ri = base + within
        return pd.DataFrame({
            key_col: lk[li],
            "left_id": l["id"].to_numpy()[li],
            "right_id": r["id"].to_numpy()[ri],
            "gap_us": lu[li] - ru[ri]})

    return (both.groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns="part")),
                        batch_format="pandas"))


def nearest_join(left_ds, right_ds, key_col: str, ts_col: str,
                 id_col: str, n_parts: int = 64):
    """Nearest-event join: for every left row, the single same-key
    right row with the smallest ``|left.ts − right.ts|`` — sensor/log
    alignment where :func:`asof_join`'s backward-only match loses the
    closer FUTURE observation.  Ties (equidistant before/after, or
    duplicate right ts) resolve to the earlier right ts then the
    smaller right id — a total order, mirrored by the oracle's
    ``ORDER BY abs(gap), r.ts, r.id``.

    Same one-shuffle tagged-union shape as :func:`window_join`; per
    partition, each DISTINCT key's left rows binary-search the key's
    sorted right run once (prev/next candidate, vectorized choice).
    Inner semantics: left rows whose key has no right rows drop.
    Output: (key, left_id, right_id, gap_us) with gap signed
    (left − right)."""
    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                         pa.int64())
            out = pa.table({key_col: pc.cast(t[key_col], pa.int64()),
                            "us": us,
                            "id": pc.cast(t[id_col], pa.int64()),
                            "side": pa.array(
                                np.full(len(t), side, np.int8))})
            return out.append_column(
                "part", _part_col(out[key_col], n_parts))
        return f

    both = (left_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(1), batch_format="pyarrow")))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key_col: np.array([], np.int64),
                              "left_id": np.array([], np.int64),
                              "right_id": np.array([], np.int64),
                              "gap_us": np.array([], np.int64)})
        l = g[g["side"] == 0].sort_values([key_col, "us", "id"],
                                          kind="mergesort")
        r = g[g["side"] == 1].sort_values([key_col, "us", "id"],
                                          kind="mergesort")
        if not len(l) or not len(r):
            return empty
        lk, lu = l[key_col].to_numpy(), l["us"].to_numpy()
        rk, ru = r[key_col].to_numpy(), r["us"].to_numpy()
        ridx = np.full(len(l), -1, np.int64)
        l_keys, l_starts = np.unique(lk, return_index=True)
        l_ends = np.r_[l_starts[1:], len(lk)]
        r_keys, r_starts = np.unique(rk, return_index=True)
        r_ends = np.r_[r_starts[1:], len(rk)]
        pos = np.searchsorted(r_keys, l_keys)
        for j in range(len(l_keys)):
            p = pos[j]
            if p >= len(r_keys) or r_keys[p] != l_keys[j]:
                continue
            ls, le = l_starts[j], l_ends[j]
            rs, re = r_starts[p], r_ends[p]
            run = ru[rs:re]
            x = lu[ls:le]
            nxt = np.searchsorted(run, x, "left")     # run[nxt-1] < x
            prv = nxt - 1
            big = np.int64(1) << np.int64(62)
            d_prev = np.where(prv >= 0, x - run[np.maximum(prv, 0)], big)
            d_next = np.where(nxt < len(run),
                              run[np.minimum(nxt, len(run) - 1)] - x, big)
            # tie -> earlier ts = the prev side (d_prev==d_next>0)
            use_prev = d_prev <= d_next
            chosen_us = np.where(use_prev, run[np.maximum(prv, 0)],
                                 run[np.minimum(nxt, len(run) - 1)])
            # first row of the chosen-us run = the smallest right id
            ridx[ls:le] = rs + np.searchsorted(run, chosen_us, "left")
        m = ridx >= 0
        if not m.any():
            return empty
        return pd.DataFrame({
            key_col: lk[m],
            "left_id": l["id"].to_numpy()[m],
            "right_id": r["id"].to_numpy()[ridx[m]],
            "gap_us": lu[m] - ru[ridx[m]]})

    return (both.groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns="part")),
                        batch_format="pandas"))
