"""Deterministic corpus sampling / mixing for training-data pipelines.

The operators a 100 TB curation pipeline needs constantly — all
RNG-free (md5-hash order is the seeded randomness), all
parallelism-invariant, all exactly DuckDB-oracled.  The founding two:

- ``hash_sample``: keep a deterministic pseudo-random fraction of rows by
  comparing an md5 prefix of the key against a threshold.  Stateless,
  no shuffle, identical result at any parallelism — the building block
  for reproducible corpus mixing weights.
- ``token_budget_sample``: take documents in md5-hash order (a seeded,
  stable "random" order) until a global token budget is reached — the
  "give me exactly ~N tokens of this corpus" operator.  Distributed
  prefix-sum: one pass computes per-hash-bucket token sums (tiny, one
  row per bucket); the driver picks the boundary bucket and the exact
  cut row inside it from that bucket's metadata only; the final pass
  filters with a pure (hash, key) comparison broadcast to every task —
  no row-id set is ever shipped.

Scale notes: bucket count is the knob — per-bucket sums are O(n_buckets)
driver rows and the boundary bucket's metadata is O(corpus / n_buckets)
(3 narrow columns, never the text); at 10^10 docs raise ``n_buckets`` to
65536.  Hex-string comparison on lowercase md5 equals numeric comparison,
which is what keeps the DuckDB oracle exact.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hash_sample", "token_budget_sample", "weighted_mix",
           "stratified_sample", "pack_sequences", "token_budget_by_group",
           "shuffle_export", "weighted_sample", "dataset_split",
           "systematic_sample"]

_WS_TOKEN = re.compile(r"\S+")


def _md5_hex(vals: list) -> list[str]:
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in vals]


def _ppm_hex(rate_ppm: int) -> str:
    """Zero-padded 8-hex threshold; 'g' for >= 100% (every hex char < 'g'
    lexicographically, so the compare keeps everything)."""
    if rate_ppm >= 1_000_000:
        return "g"
    return format(int(rate_ppm / 1_000_000 * (1 << 32)), "08x")


def hash_sample(ds, rate_ppm: int, key_col: str = "doc_id"):
    """Keep rows whose md5(key) 8-hex-digit prefix < rate_ppm / 1e6.

    The threshold is compared as a zero-padded hex STRING (equal to the
    numeric comparison on lowercase hex), so the DuckDB oracle
    (``substr(md5(key), 1, 8) < '<hex>'``) matches byte-for-byte.
    """
    thresh = _ppm_hex(rate_ppm)

    def keep(batch: pa.Table) -> pa.Table:
        hs = _md5_hex(batch[key_col].to_pylist())
        return batch.filter(pa.array([h[:8] < thresh for h in hs]))

    return ds.map_batches(keep, batch_format="pyarrow")


def token_budget_sample(ds, budget: int, key_col: str = "doc_id",
                        text_col: str = "text", n_buckets: int = 256):
    """Documents in md5(key) hash order until cumulative ws-tokens hit
    ``budget`` (inclusive while the running sum stays <= budget).

    Returns the filtered dataset (all original columns).
    """
    import ray

    def meta(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hs = _md5_hex(keys)
        toks = [len(_WS_TOKEN.findall(t or ""))
                for t in batch[text_col].to_pylist()]
        buckets = [int(h[:4], 16) // (65536 // n_buckets) for h in hs]
        return pa.table({
            key_col: batch[key_col],
            "h": pa.array(hs, pa.string()),
            "tok": pa.array(toks, pa.int64()),
            "bucket": pa.array(buckets, pa.int32()),
        })

    meta_ds = ds.map_batches(meta, batch_format="pyarrow")

    # pass 1: per-bucket token sums — n_buckets tiny rows on the driver
    sums = {int(r["bucket"]): int(r["sum(tok)"])
            for r in meta_ds.groupby("bucket").sum("tok").take_all()}

    # bucket = high bits of h (a true PREFIX), so bucket order IS hash
    # order: walking buckets 0..n-1 equals the global ORDER BY h
    assert 65536 % n_buckets == 0, "n_buckets must divide 65536"
    remaining = budget
    boundary = None
    for b in range(n_buckets):
        s = sums.get(b, 0)
        if s <= remaining:
            remaining -= s
        else:
            boundary = b
            break
    full_upto = boundary if boundary is not None else n_buckets

    cut = None  # (h, key) of the last included row in the boundary bucket
    if boundary is not None:
        rows = meta_ds.map_batches(
            lambda t: t.filter(pc.equal(t["bucket"], boundary)),
            batch_format="pyarrow").take_all()   # metadata only, 1/n_buckets
        rows.sort(key=lambda r: (r["h"], r[key_col]))
        acc = 0
        for r in rows:
            if acc + r["tok"] > remaining:
                break
            acc += r["tok"]
            cut = (r["h"], r[key_col])

    cut_ref = ray.put((full_upto, boundary, cut))

    def keep(batch: pa.Table) -> pa.Table:
        upto, bnd, cut_ = ray.get(cut_ref)
        keys = batch[key_col].to_pylist()
        hs = _md5_hex(keys)
        out = []
        for h, k in zip(hs, keys):
            b = int(h[:4], 16) // (65536 // n_buckets)
            if b < upto:
                out.append(True)
            elif bnd is not None and b == bnd and cut_ is not None:
                out.append((h, k) <= cut_)
            else:
                out.append(False)
        return batch.filter(pa.array(out))

    return ds.map_batches(keep, batch_format="pyarrow")


def pack_sequences(ds, seq_len: int = 2048, key_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 256):
    """Concatenate-and-chunk sequence-packing manifest for LM training.

    Documents are laid out in md5(key) hash order (the same seeded stable
    order as :func:`token_budget_sample`), token counts prefix-summed
    globally, and each document assigned the training sequence that
    contains its first token: ``seq_id = offset // seq_len``.  Returns
    the packing MANIFEST ``(key, tok, offset, seq_id)`` — downstream
    sequence assembly joins text back per ``seq_id`` range, so the wide
    step here never carries payload bytes.

    Distributed prefix-sum, same shape as :func:`token_budget_sample`:
    bucket = high bits of the hash (a true prefix, so bucket order IS
    hash order); pass 1 collects ``n_buckets`` per-bucket sums on the
    driver and exclusive-scans them into bucket base offsets; pass 2 is
    one ``groupby(bucket)`` over METADATA ONLY (key, hash, token count —
    never the text) where each group sorts by (hash, key) and cumsums
    from its broadcast base.  At 10^10 docs raise ``n_buckets`` so a
    bucket's metadata fits a worker heap; the driver state stays
    O(n_buckets) rows either way.
    """
    import pandas as pd
    import ray

    assert 65536 % n_buckets == 0, "n_buckets must divide 65536"

    def meta(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hs = _md5_hex(keys)
        toks = [len(_WS_TOKEN.findall(t or ""))
                for t in batch[text_col].to_pylist()]
        buckets = [int(h[:4], 16) // (65536 // n_buckets) for h in hs]
        return pa.table({
            key_col: batch[key_col],
            "h": pa.array(hs, pa.string()),
            "tok": pa.array(toks, pa.int64()),
            "bucket": pa.array(buckets, pa.int32()),
        })

    meta_ds = ds.map_batches(meta, batch_format="pyarrow")

    # per-bucket sums from per-BLOCK partials (<= n_buckets tiny rows per
    # block) — no sort-based groupby needed for a driver-side scan
    def bucket_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        b = t["bucket"].to_numpy()
        tok = t["tok"].to_numpy()
        ub, inv = np.unique(b, return_inverse=True)
        return pa.table({"bucket": pa.array(ub, pa.int32()),
                         "tok": pa.array(np.bincount(inv, weights=tok)
                                         .astype("int64"), pa.int64())})

    sums: dict[int, int] = {}
    for r in meta_ds.map_batches(bucket_partial,
                                 batch_format="pyarrow").take_all():
        sums[int(r["bucket"])] = sums.get(int(r["bucket"]), 0) + int(r["tok"])
    base, acc = {}, 0
    for b in range(n_buckets):
        base[b] = acc
        acc += sums.get(b, 0)
    base_ref = ray.put(base)

    def pack(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["h", key_col], kind="mergesort")
        start = int(ray.get(base_ref)[int(g["bucket"].iloc[0])])
        off = (start + g["tok"].cumsum().shift(fill_value=0)).to_numpy(
            dtype="int64")
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "tok": g["tok"].to_numpy(),
            "offset": off,
            "seq_id": off // seq_len,
        })

    return meta_ds.groupby("bucket").map_groups(pack, batch_format="pandas")


def stratified_sample(ds, group_col: str, key_col: str = "doc_id",
                      k: int = 100):
    """Exactly k rows per group, deterministically pseudo-random: each
    group keeps its k smallest rows by (md5(key), key).

    The fixed-count companion to :func:`weighted_mix`'s fixed-rate
    sampling — "k docs per language/source" quotas with no RNG state.
    Distributed in the ``group_topk`` shape: each batch emits only ITS
    k-head per group (shuffle bounded by groups-per-batch × k, never
    the corpus), one ``groupby(group)`` merge re-selects by the same
    total order — partial + merge = exact.  md5-hex string order equals
    the DuckDB oracle's ``ORDER BY md5(key::VARCHAR)`` byte-for-byte.
    """
    import pandas as pd

    def partial(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.assign(_h=_md5_hex(b[key_col].tolist()))
        b = b.sort_values([group_col, "_h", key_col], kind="mergesort")
        return b.groupby(group_col, sort=False).head(k)

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["_h", key_col], kind="mergesort").head(k)
        return g.drop(columns="_h")

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def weighted_mix(ds, rate_ppm_by_group: dict, group_col: str = "source",
                 key_col: str = "doc_id", default_ppm: int = 0):
    """Per-group deterministic sampling rates — the corpus-mixing knob.

    Each row keeps iff its md5(key) prefix clears ITS group's threshold
    (``hash_sample`` per source, one pass, no shuffle); groups absent
    from the dict get ``default_ppm``.  Stateless and
    parallelism-invariant, so mixing weights are exactly reproducible
    across runs and cluster sizes.
    """
    thresh = {g: _ppm_hex(p) for g, p in rate_ppm_by_group.items()}
    default_hex = _ppm_hex(default_ppm)

    def keep(batch: pa.Table) -> pa.Table:
        hs = _md5_hex(batch[key_col].to_pylist())
        gs = batch[group_col].to_pylist()
        return batch.filter(pa.array(
            [h[:8] < thresh.get(g, default_hex)
             for h, g in zip(hs, gs)]))

    return ds.map_batches(keep, batch_format="pyarrow")


def token_budget_by_group(ds, budgets: dict, group_col: str = "lang",
                          key_col: str = "doc_id", text_col: str = "text",
                          n_buckets: int = 256, default_budget: int = 0):
    """Per-group token budgets — "N tokens of each language/source", the
    corpus-mixing companion to :func:`token_budget_sample`.

    Same distributed prefix-sum, run for every group in ONE pass: the
    metadata pass emits (group, bucket, token) rows; per-(group, bucket)
    sums (<= groups x n_buckets tiny rows) reach the driver, which walks
    each group's buckets in hash order and picks that group's boundary
    bucket + exact cut row; the final filter broadcasts the per-group
    cuts and keeps a row iff it clears ITS group's cut.  Groups absent
    from ``budgets`` get ``default_budget``.
    """
    import ray

    assert 65536 % n_buckets == 0, "n_buckets must divide 65536"

    def meta(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hs = _md5_hex(keys)
        toks = [len(_WS_TOKEN.findall(t or ""))
                for t in batch[text_col].to_pylist()]
        buckets = [int(h[:4], 16) // (65536 // n_buckets) for h in hs]
        return pa.table({
            key_col: batch[key_col],
            group_col: batch[group_col],
            "h": pa.array(hs, pa.string()),
            "tok": pa.array(toks, pa.int64()),
            "bucket": pa.array(buckets, pa.int32()),
        })

    meta_ds = ds.map_batches(meta, batch_format="pyarrow")
    sums: dict = {}
    for r in meta_ds.groupby([group_col, "bucket"]).sum("tok").take_all():
        sums[(r[group_col], int(r["bucket"]))] = int(r["sum(tok)"])

    groups = {g for g, _ in sums}
    cuts: dict = {}
    for g in groups:
        remaining = budgets.get(g, default_budget)
        boundary = None
        for b in range(n_buckets):
            s = sums.get((g, b), 0)
            if s <= remaining:
                remaining -= s
            else:
                boundary = b
                break
        full_upto = boundary if boundary is not None else n_buckets
        cut = None
        if boundary is not None:
            rows = meta_ds.map_batches(
                lambda t, g=g, b=boundary: t.filter(
                    pc.and_(pc.equal(t[group_col], g),
                            pc.equal(t["bucket"], b))),
                batch_format="pyarrow").take_all()
            rows.sort(key=lambda r: (r["h"], r[key_col]))
            acc = 0
            for r in rows:
                if acc + r["tok"] > remaining:
                    break
                acc += r["tok"]
                cut = (r["h"], r[key_col])
        cuts[g] = (full_upto, boundary, cut)
    cuts_ref = ray.put(cuts)

    def keep(batch: pa.Table) -> pa.Table:
        cut_by_g = ray.get(cuts_ref)
        keys = batch[key_col].to_pylist()
        gs = batch[group_col].to_pylist()
        hs = _md5_hex(keys)
        out = []
        for h, k, g in zip(hs, keys, gs):
            spec = cut_by_g.get(g)
            if spec is None:
                out.append(False)
                continue
            upto, bnd, cut_ = spec
            b = int(h[:4], 16) // (65536 // n_buckets)
            if b < upto:
                out.append(True)
            elif bnd is not None and b == bnd and cut_ is not None:
                out.append((h, k) <= cut_)
            else:
                out.append(False)
        return batch.filter(pa.array(out))

    return ds.map_batches(keep, batch_format="pyarrow")


def shuffle_export(ds, out_dir: str, n_shards: int = 16,
                   key_col: str = "doc_id", text_col: str = "text"):
    """Deterministic shuffled sharded-parquet export — the training-run
    sink: shard by md5(key) (so the global shuffle is seeded and
    parallelism-invariant, no ``random_shuffle`` network pass), order
    WITHIN each shard by (md5 hex, key), write one parquet file per
    shard via temp-file + atomic rename (a killed export leaves no
    partial shard; finished shards survive a rerun), and return the
    manifest (shard, n_docs, n_tokens) as the stable contract.

    Shard count is the resume/parallelism granularity — at 100 TB use
    thousands of shards so one file is object-store-block-sized; each
    shard is written by the one groupby partition that owns it (shard
    IS the partition key; n_shards groups is the bounded-group case
    where groupby+map_groups is the right shape).
    """
    import os

    import numpy as np
    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        hs = _md5_hex(t[key_col].to_pylist())
        shard = np.fromiter((int(h[:8], 16) % n_shards for h in hs),
                            np.int64, count=len(hs))
        toks = pa.array(
            [len(_WS_TOKEN.findall(x or "")) for x in
             t[text_col].to_pylist()], pa.int64())
        return pa.table({
            key_col: t[key_col], text_col: t[text_col],
            "h": pa.array(hs, pa.string()),
            "shard": pa.array(shard),
            "n_tokens": toks})

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", key_col], kind="mergesort")
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(
            g[[key_col, text_col, "n_tokens"]], preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({
            "shard": pd.array([shard], dtype="int64"),
            "n_docs": pd.array([len(g)], dtype="int64"),
            "n_tokens": pd.array([int(g["n_tokens"].sum())],
                                 dtype="int64")})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("shard").map_groups(write_shard,
                                         batch_format="pandas"))


def weighted_sample(ds, k: int, key_col: str = "doc_id",
                    weight_col: str = "n_chars"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006): each row gets key ``u ** (1 / w)`` with ``u`` a
    seeded uniform derived from md5(key) (13 hex digits -> (0, 1], the
    shuffle_export hex-cast contract), and the global top-k by key wins
    — inclusion probability proportional to weight, reproducible at any
    parallelism because nothing depends on row order.

    Distributed as per-block top-k partials (each block ships only k
    rows) + one driver merge — the group_topk shape with a single
    group.  (numpy imported locally: this module is otherwise
    arrow/hashlib-only.)  The selection key is float64 (libm ``pow`` on both engine
    and oracle); the OUTPUT carries no floats, and adjacent order
    statistics are separated far beyond pow's ulp differences, so the
    selected set is stable (documented assumption, same class as the
    pagerank micro-rounding).  Ties (identical keys) break by key_col
    ascending.
    """
    import numpy as np
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_pylist()
        hs = _md5_hex(ids)
        u = (np.array([int(h[:13], 16) for h in hs], np.float64) + 1.0) \
            / float(1 << 52)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        es = np.power(u, 1.0 / w)
        df = pd.DataFrame({key_col: ids,
                           weight_col: t[weight_col].to_numpy(
                               zero_copy_only=False),
                           "_es": es})
        df = df.sort_values(["_es", key_col], ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = pd.DataFrame(
        ds.map_batches(partial, batch_format="pyarrow").take_all())
    top = (top.sort_values(["_es", key_col], ascending=[False, True],
                           kind="mergesort").head(k)
           .drop(columns="_es").reset_index(drop=True))
    top[weight_col] = top[weight_col].astype("int64")
    return top


def dataset_split(ds, key_col: str = "doc_id",
                  train_ppm: int = 800_000, val_ppm: int = 100_000):
    """Deterministic train/val/test assignment by md5(key) — the
    leakage-proof split every training pipeline needs: membership is a
    pure function of the key (stable across reruns, resharding and
    corpus growth; a random split would reshuffle docs between splits
    every run).  Train gets the first ``train_ppm``/1e6 of hash space,
    val the next ``val_ppm``/1e6, test the rest — the
    :func:`hash_sample` zero-padded-hex compare, so the SQL oracle
    replays it byte-for-byte.  Stateless map, no shuffle."""
    t1 = _ppm_hex(train_ppm)
    t2 = _ppm_hex(train_ppm + val_ppm)

    def assign(batch: pa.Table) -> pa.Table:
        h8 = [h[:8] for h in _md5_hex(batch[key_col].to_pylist())]
        lab = ["train" if h < t1 else ("val" if h < t2 else "test")
               for h in h8]
        return pa.table({key_col: batch[key_col],
                         "split": pa.array(lab, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


def systematic_sample(ds, k: int = 10, key_col: str = "doc_id",
                      n_buckets: int = 64):
    """Every k-th row in deterministic md5(key) order — the systematic
    (fixed-interval) sampling design: exactly ``ceil(n/k)`` rows, evenly
    spaced through the hash-shuffled population (better variance than
    Bernoulli :func:`hash_sample` for ordered estimators, and
    parallelism-invariant because the order is data-derived, not
    scheduler-derived).

    Global ranks come from the :func:`token_budget_sample` prefix-sum
    shape: bucket = md5 high bits (a true PREFIX, so bucket order IS
    hash order), per-bucket COUNTS fold to O(n_buckets) driver offsets,
    then one hash-group pass sorts each bucket locally by (h, key) and
    keeps rows whose ``offset + local_index ≡ 0 (mod k)``.  No global
    sort, no driver row set.  Returns the sampled rows (all input
    columns).
    """
    import numpy as np
    import ray

    def meta(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hs = _md5_hex(keys)
        buckets = [int(h[:4], 16) // (65536 // n_buckets) for h in hs]
        return (batch.append_column("_h", pa.array(hs, pa.string()))
                .append_column("_bucket", pa.array(buckets, pa.int32())))

    assert 65536 % n_buckets == 0, "n_buckets must divide 65536"
    withh = ds.map_batches(meta, batch_format="pyarrow").materialize()

    counts = {int(r["_bucket"]): int(r["count()"])
              for r in withh.groupby("_bucket").count().take_all()}
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_ref = ray.put(offsets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = g.sort_values(["_h", key_col], kind="mergesort")
        idx = np.arange(len(g), dtype=np.int64) + ray.get(off_ref)[b]
        return (g[(idx % k) == 0]
                .drop(columns=["_h", "_bucket"]).reset_index(drop=True))

    return withh.groupby("_bucket").map_groups(per_bucket,
                                               batch_format="pandas")
