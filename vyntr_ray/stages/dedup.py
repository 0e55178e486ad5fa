"""Deduplication suite: exact, key-based, MinHash-LSH, SimHash, embedding.

The reference deduplicates only exact URLs (D1/D2); these operators add the
near-duplicate machinery a 100 TB training-data pipeline needs (build
brief), all from public algorithms:

- exact / key dedup      — hash-partitioned ``groupby.min`` (first doc wins)
- MinHash + LSH          — Broder '97 shingling + banded LSH (16 bands × 4
  rows over 64 permutations): shingle→minhash per batch, explode to
  (band, band_hash, id) rows, ``groupby`` the band buckets, verify exact
  Jaccard on candidates
- SimHash                — Charikar '02 64-bit fingerprints; candidate pairs
  by 4×16-bit pigeonhole banding, verified by Hamming distance
- embedding near-dup     — cosine ≥ τ pairs inside blocking groups (label /
  IVF bucket), dense matmul per group

Scale notes: every stage is per-batch vectorized and nothing touches the
driver.  Candidate generation shuffles (band, hash) rows by a hash
partition key (``groupby(pbucket).map_groups``) so each partition holds
complete LSH buckets and pair-expands them vectorized; verification is a
distributed ``Dataset.join`` of the candidate pair-ids against the shingle
(MinHash) or fingerprint (SimHash — the fingerprint rides with the band
rows, so no join at all) table.  Partition counts scale with the cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["add_md5", "dedup_exact", "dedup_by_key", "minhash_signatures",
           "dup_rate_by_group", "containment_pairs",
           "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_batch",
           "simhash_pairs", "embedding_dup_pairs", "word_shingles",
           "jaccard", "shingle_table", "dup_clusters",
           "substring_dup_counts", "fuzzy_dup_pairs",
           "lsh_export", "lsh_lookup"]

_P = (1 << 61) - 1  # Mersenne prime for universal hashing


def _stable_hash64(strings: list[str]) -> np.ndarray:
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
    return out


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = (text or "").split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# --------------------------------------------------------------------------
# exact / key dedup
# --------------------------------------------------------------------------

def add_md5(batch: pa.Table, text_col: str = "text",
            out_col: str = "text_md5") -> pa.Table:
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
           for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(content-hash, surviving-id) — first doc per identical text.
    Content hashes are data-scaled keys, so the min-id fold goes
    through group_fold (combiner + one hash partition), never a
    generic per-group Aggregate (PERF.md many-groups rule)."""
    from vyntr_ray.stages.dataset_tools import group_fold
    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow")
    return group_fold(hashed.select_columns(["text_md5", id_col]),
                      "text_md5", [id_col], how="min",
                      rename={id_col: "keep_id"})


def dedup_by_key(ds, key_fn, id_col: str = "doc_id", key_name: str = "key"):
    """Generic first-wins dedup on a computed key (vectorized key_fn);
    same group_fold min-id shape as :func:`dedup_exact`."""
    from vyntr_ray.stages.dataset_tools import group_fold
    keyed = ds.map_batches(
        lambda b: b.append_column(key_name, key_fn(b)),
        batch_format="pyarrow")
    return group_fold(keyed.select_columns([key_name, id_col]),
                      key_name, [id_col], how="min",
                      rename={id_col: "keep_id"})


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: text → 64-perm minhash signature + LSH band rows.

    Permutation coefficients are generated once per actor from a fixed seed
    (identical across actors — determinism), signatures are vectorized
    numpy mins over the shingle-hash × permutation matrix.
    """

    def __init__(self, n_perm: int = 64, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        rng = np.random.Generator(np.random.PCG64(1234))
        # multiply-shift universal hashing over Z_2^64 (odd multipliers):
        # fully vectorized uint64 wraparound arithmetic — the exact
        # mod-Mersenne family cost Python-bigint loops per permutation
        self.a = (rng.integers(1, 1 << 62, size=n_perm, dtype=np.uint64)
                  << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 62, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, np.uint64)
        base = _stable_hash64(sh)                           # (n_shingles,)
        vals = base[:, None] * self.a[None, :] + self.b[None, :]  # wraps 2^64
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = [self.signature(t or "")
                for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
        })


def minhash_signatures(ds, n_perm: int = 128, shingle_k: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       concurrency: int = 2):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(n_perm=n_perm, shingle_k=shingle_k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def shingle_table(ds, shingle_k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", out_col: str = "shingles"):
    """(id, distinct shingle hashes packed to bytes) — the verify-join side.

    Each doc's distinct shingles become a SORTED uint64-hash array packed
    into one binary cell (flat payloads only survive the shuffle), so
    exact-Jaccard verification is a C-speed ``np.intersect1d`` instead of
    Python set ops.  64-bit hashing makes the Jaccard exact up to hash
    collisions (~n²/2⁶⁴ — negligible, and the oracle would catch one).
    """

    def to_sh(batch: pa.Table) -> pa.Table:
        packed = []
        for t in batch[text_col].to_pylist():
            sh = sorted(set(word_shingles(t or "", shingle_k)))
            packed.append(np.sort(_stable_hash64(sh)).tobytes()
                          if sh else b"")
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         out_col: pa.array(packed, pa.binary())})

    return ds.map_batches(to_sh, batch_format="pyarrow")


def _unpack_shingles(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.uint64) if b else np.empty(0, np.uint64)


def _norm_schema(t: pa.Table, cols: dict[str, pa.DataType],
                 rename: list[str] | None = None) -> pa.Table:
    """Pin a block to an exact (possibly renamed) column set.

    Ray's groupby/aggregate emits schema-less empty blocks on tiny inputs,
    which the hash join and rename_columns reject — normalize them to a
    typed empty table instead.
    """
    names = list(cols)
    if t.num_rows == 0 or t.num_columns < len(names):
        return pa.table({(rename or names)[i]: pa.array([], dt)
                         for i, dt in enumerate(cols.values())})
    t = t.select(names)
    return t.rename_columns(rename) if rename else t


def _bucket_of(arr: np.ndarray, n_parts: int) -> np.ndarray:
    return ((arr.astype(np.uint64) * _GOLD)
            % np.uint64(n_parts)).astype(np.int32)


def _attach_packed(pairs_ds, sh_ds, key_col: str,
                   carry: dict[str, "pa.DataType"], out_col: str,
                   n_parts: int):
    """Reduce-side hash join: pairs(key, *carry) ⋈ sh(id, packed) on key.

    Implemented as union + ``groupby(kbucket).map_groups`` with a
    vectorized pandas merge per partition (Ray's JoinOperator crashes on
    hash partitions whose one side is empty, and can't carry list columns;
    this shape has neither problem and shuffles the same bytes).
    """
    carry_names = list(carry)
    # union schema: k, sh, is_pair, *carry, kbucket — order must match
    int_carries = [c for c, dt in carry.items() if pa.types.is_integer(dt)]

    def _filler(n: int, dt: pa.DataType) -> pa.Array:
        if pa.types.is_integer(dt):
            return pa.array(np.zeros(n, np.int64), dt)
        if pa.types.is_binary(dt):
            return pa.array([b""] * n, dt)
        return pa.array([""] * n, dt)

    def tag_pairs(t: pa.Table) -> pa.Table:
        t = _norm_schema(t, {key_col: pa.int64(), **carry})
        k = np.asarray(t[key_col].to_numpy(zero_copy_only=False), np.int64)
        out = {"k": pa.array(k, pa.int64()),
               "sh": _filler(len(k), pa.binary()),
               "is_pair": pa.array(np.ones(len(k), bool))}
        for c in carry_names:
            out[c] = t[c]
        out["kbucket"] = pa.array(_bucket_of(k, n_parts), pa.int32())
        return pa.table(out)

    def tag_sh(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(0).to_numpy(zero_copy_only=False),
                         np.int64)
        n = len(ids)
        out = {"k": pa.array(ids, pa.int64()),
               "sh": t.column(1),
               "is_pair": pa.array(np.zeros(n, bool))}
        for c, dt in carry.items():  # sentinel fillers keep dtypes stable
            out[c] = _filler(n, dt)
        out["kbucket"] = pa.array(_bucket_of(ids, n_parts), pa.int32())
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["is_pair"]]
        sm = g.loc[~g["is_pair"], ["k", "sh"]]
        if pr.empty or sm.empty:
            cols = {key_col: pd.Series(dtype="int64")}
            for c in carry_names:
                cols[c] = pd.Series(
                    dtype="int64" if c in int_carries else "object")
            cols[out_col] = pd.Series(dtype="object")
            return pd.DataFrame(cols)
        m = pr[["k", *carry_names]].merge(sm, on="k", how="inner")
        m = m.rename(columns={"k": key_col, "sh": out_col})
        for c in int_carries:
            m[c] = m[c].astype("int64")
        return m[[key_col, *carry_names, out_col]]

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        sh_ds.map_batches(tag_sh, batch_format="pyarrow"))
    return tagged.groupby("kbucket").map_groups(merge, batch_format="pandas")


def _band_rows(t: pa.Table, n_bands: int, id_col: str,
               n_parts: int) -> pa.Table:
    """Explode signatures to (id, band, band_hash, pbucket) — vectorized.

    ``band_hash`` is a wrapping multiply-accumulate over the band's rows
    (a false hash collision only creates an extra candidate, which exact
    verification discards); ``pbucket`` is the shuffle key — a hash
    partition of (band, band_hash) so each partition holds complete LSH
    buckets.
    """
    n = t.num_rows
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.uint64()),
                         "pbucket": pa.array([], pa.int32())})
    sig = np.asarray(t["sig"].combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False),
                     dtype=np.uint64).reshape(n, -1)
    r = sig.shape[1] // n_bands
    sig3 = sig[:, :n_bands * r].reshape(n, n_bands, r)
    h = np.zeros((n, n_bands), dtype=np.uint64)
    for j in range(r):
        h = h * _GOLD + sig3[:, :, j]
    ids = np.repeat(
        np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64),
        n_bands)
    band = np.tile(np.arange(n_bands, dtype=np.int32), n)
    hh = h.ravel()
    pb = ((hh * _GOLD + band.astype(np.uint64))
          % np.uint64(n_parts)).astype(np.int32)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "band": pa.array(band, pa.int32()),
                     "band_hash": pa.array(hh, pa.uint64()),
                     "pbucket": pa.array(pb, pa.int32())})


_EMPTY_PAIRS = {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}


def _expand_bucket_pairs(g: pd.DataFrame, id_col: str,
                         bucket_cols: list[str]) -> pd.DataFrame:
    """Pair-expand the multi-member LSH buckets inside one hash partition.

    One vectorized duplicated() mask over the partition; per colliding
    bucket the pairs come from ``np.triu_indices`` (no Python pair loop)
    and a final ``np.unique`` dedups within the partition.
    """
    dup = g[g.duplicated(bucket_cols, keep=False)]
    if dup.empty:
        return pd.DataFrame(_EMPTY_PAIRS)
    chunks = []
    for _, grp in dup.groupby(bucket_cols, sort=False):
        ids = np.unique(grp[id_col].to_numpy())
        if len(ids) < 2:
            continue
        iu = np.triu_indices(len(ids), 1)
        chunks.append(np.stack([ids[iu[0]], ids[iu[1]]], axis=1))
    if not chunks:
        return pd.DataFrame(_EMPTY_PAIRS)
    arr = np.unique(np.concatenate(chunks), axis=0).astype(np.int64)
    return pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1]})


def minhash_lsh_pairs(ds, n_perm: int = 128, n_bands: int = 32,
                      shingle_k: int = 3, threshold: float = 0.7,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_parts: int = 32, join_parts: int = 8,
                      concurrency: int = 4):
    """Near-duplicate id pairs (a < b) with exact-Jaccard verification.

    Fully distributed: shingle→minhash→band rows→``groupby(pbucket)``
    pair-expansion→pair dedup (groupby)→distributed reduce-side join of
    pair ids against the shingle-hash table→vectorized exact-Jaccard
    filter.  No driver-side materialization at any step;
    ``n_parts``/``join_parts`` scale with the cluster.  Returns
    (a, b, jaccard_ppm) where ``jaccard_ppm = |∩|·10⁶ // |∪|`` — integer
    arithmetic on both this and the DuckDB-oracle side, so results
    hash-compare exactly.

    Banding: rows=4 (128 perms × 32 bands).  Miss probability for a true
    pair is (1-J⁴)³² — ≤5e-8 at J=0.8, 1.2e-2 at J=0.6; web-dup corpora
    (and the sf test tables — measured) are strongly bimodal (near-dups
    J≥0.8, background J≤0.1), so candidate recall is effectively exact
    while background pairs at J≈0.05 produce ~2e-4 false candidates each
    (exact verification discards them).  rows=2 would push borderline
    recall to 1e-8 but admits 15% of ALL background pairs as candidates —
    measured 3× slower end-to-end at sf0.1.
    """
    thr_ppm = int(round(threshold * 1_000_000))

    sigs = minhash_signatures(ds, n_perm, shingle_k, id_col, text_col,
                              concurrency=concurrency)
    band_ds = sigs.map_batches(
        lambda t: _band_rows(t, n_bands, id_col, n_parts),
        batch_format="pyarrow")
    pairs = band_ds.groupby("pbucket").map_groups(
        lambda g: _expand_bucket_pairs(g, id_col, ["band", "band_hash"]),
        batch_format="pandas")
    # the same pair surfaces from several bands/partitions — dedup by key.
    # Arrow-convert first: Aggregate over PANDAS blocks costs ~7 ms/group
    # (measured, PERF.md) vs vectorized on Arrow blocks.
    pairs = pairs.map_batches(lambda t: t, batch_format="pyarrow")
    cand = pairs.groupby(["a", "b"]).count().map_batches(
        lambda t: _norm_schema(t, {"a": pa.int64(), "b": pa.int64()}),
        batch_format="pyarrow")

    sh = shingle_table(ds, shingle_k, id_col, text_col)
    with_a = _attach_packed(cand, sh, "a", {"b": pa.int64()}, "sh_a",
                            join_parts)
    joined = _attach_packed(with_a, sh, "b",
                            {"a": pa.int64(), "sh_a": pa.binary()}, "sh_b",
                            join_parts)

    def verify(batch: pa.Table) -> pa.Table:
        oa, ob, op = [], [], []
        for a, b, x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist(),
                              batch["sh_a"].to_pylist(),
                              batch["sh_b"].to_pylist()):
            xs, ys = _unpack_shingles(x), _unpack_shingles(y)
            inter = len(np.intersect1d(xs, ys, assume_unique=True))
            uni = len(xs) + len(ys) - inter
            ppm = 1_000_000 if uni == 0 else (inter * 1_000_000) // uni
            if ppm >= thr_ppm:
                oa.append(a)
                ob.append(b)
                op.append(ppm)
        return pa.table({"a": pa.array(oa, pa.int64()),
                         "b": pa.array(ob, pa.int64()),
                         "jaccard_ppm": pa.array(op, pa.int64())})

    return (joined.map_batches(verify, batch_format="pyarrow")
            .sort(["a", "b"]))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash per row (token-hash bit voting, vectorized)."""
    out = []
    for t in batch[text_col].to_pylist():
        toks = (t or "").split()
        if not toks:
            out.append(0)
            continue
        h = _stable_hash64(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = int((votes > 0).astype(np.uint64)
                 @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
        out.append(fp)
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(np.array(out, dtype=np.uint64), pa.uint64()),
    })


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", n_parts: int = 32):
    """Near-dup pairs by SimHash: 4×16-bit pigeonhole banding + verify.

    Hamming ≤ 3 over 64 bits ⇒ at least one of the four 16-bit bands is
    identical (pigeonhole), so banding finds ALL qualifying pairs — the
    candidate step is exact, not probabilistic.  Fully distributed: the
    fingerprint rides with the band rows, so Hamming verification happens
    inside the same ``groupby(pbucket)`` pass (no second join); duplicate
    pairs across bands collapse with one small pair-key groupby.
    """
    sh = ds.map_batches(
        lambda b: simhash_batch(b, text_col, id_col), batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "band_val": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.uint64()),
                             "pbucket": pa.array([], pa.int32())})
        ids = np.repeat(
            np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64), 4)
        fps = np.asarray(t["simhash"].to_numpy(zero_copy_only=False),
                         np.uint64)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))
        vals = ((fps[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int64)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        pb = ((vals.ravel().astype(np.uint64) * _GOLD
               + band.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int32)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "band": pa.array(band, pa.int32()),
                         "band_val": pa.array(vals.ravel(), pa.int64()),
                         "fp": pa.array(np.repeat(fps, 4), pa.uint64()),
                         "pbucket": pa.array(pb, pa.int32())})

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(["band", "band_val"], keep=False)]
        rows: dict = {}
        for _, grp in dup.groupby(["band", "band_val"], sort=False):
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            ids = grp[id_col].to_numpy()
            fps = grp["fp"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ham = bin(int(fps[i]) ^ int(fps[j])).count("1")
                    if ham <= max_hamming:
                        rows[(int(ids[i]), int(ids[j]))] = ham
        if not rows:
            return pd.DataFrame({**_EMPTY_PAIRS,
                                 "hamming": pd.Series(dtype="int64")})
        arr = sorted(rows.items())
        return pd.DataFrame({"a": [a for (a, _), _ in arr],
                             "b": [b for (_, b), _ in arr],
                             "hamming": [h for _, h in arr]})

    pairs = (sh.map_batches(band_rows, batch_format="pyarrow")
             .groupby("pbucket")
             .map_groups(emit, batch_format="pandas"))
    # a pair can surface from up to 4 bands/partitions; hamming identical.
    # Arrow-convert before the Aggregate (pandas-block path is per-group
    # Python — PERF.md)
    pairs = pairs.map_batches(lambda t: t, batch_format="pyarrow")
    out = pairs.groupby(["a", "b"]).min("hamming")
    return (out.map_batches(
        lambda t: _norm_schema(
            t, {"a": pa.int64(), "b": pa.int64(),
                "min(hamming)": pa.int64()},
            rename=["a", "b", "hamming"]),
        batch_format="pyarrow")
        .sort(["a", "b"]))


def ngram_jaccard_pairs(ds, shingle_k: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_bands: int = 32, n_perm: int = 128):
    """Exact n-gram-Jaccard near-dup pairs, LSH-candidate-generated.

    Same distributed pipeline as :func:`minhash_lsh_pairs` (see the
    banding/recall analysis there); the reported score is the exact
    shingle-set Jaccard in ppm — the LSH step is only a pruning device.
    """
    return minhash_lsh_pairs(ds, n_perm=n_perm, n_bands=n_bands,
                             shingle_k=shingle_k, threshold=threshold,
                             id_col=id_col, text_col=text_col)


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------

def embedding_dup_pairs(ds, threshold: float = 0.95, block_col: str = "label",
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_parts: int = 32, max_block: int = 4096):
    """Cosine-similar pairs (a<b) within blocking groups (IVF-style).

    Fully distributed — nothing reaches the driver but a tiny per-label
    count table; the result is a Dataset (sorted (a, b)).  Shape:

    1. one cheap pass collects per-label row counts (O(labels) driver rows);
       labels larger than ``max_block`` are split into ``s = ceil(n /
       max_block)`` deterministic id-hash chunks — the hot-block salting
       the frontier's hot-host split uses, applied to all-pairs blocking;
    2. each row is routed to every (label, ci, cj) chunk-pair cell it
       participates in (``s`` cells per row; exactly one cell owns any
       given row pair, so no pair dedup pass is needed) and cells are
       hash-partitioned (``n_parts`` Ray groups TOTAL — the PERF.md
       many-groups rule, never one Python call per label);
    3. per partition, each cell computes one dense unit-matmul:
       ``ci == cj`` cells take the upper triangle, cross cells the full
       A×B rectangle.  Only int64 pair ids come out, so the DuckDB oracle
       compares exactly.
    """
    import ray

    def count_partial(t: pa.Table) -> pa.Table:
        labs, cnts = np.unique(
            t[block_col].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({block_col: pa.array(labs),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    totals: dict = {}
    for r in (ds.select_columns([block_col])
              .map_batches(count_partial, batch_format="pyarrow").take_all()):
        totals[r[block_col]] = totals.get(r[block_col], 0) + r["n"]
    chunks = {lab: int(np.ceil(n / max_block))
              for lab, n in totals.items() if n > max_block}
    # int surrogate per label for vectorized cell hashing (labels are few)
    lab_codes = {lab: i for i, lab in enumerate(sorted(totals, key=str))}
    route_ref = ray.put((chunks, lab_codes))

    K = np.uint64(2654435761)

    def route(t: pa.Table) -> pa.Table:
        ch, codes = ray.get(route_ref)
        labs = t[block_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        code = np.array([codes[lab] for lab in labs], np.uint64)
        if not ch:
            my = np.zeros(len(ids), np.int32)
            part = ((code * K) >> np.uint64(16)) % np.uint64(n_parts)
            return (t.append_column("_ci", pa.array(my, pa.int32()))
                     .append_column("_cj", pa.array(my, pa.int32()))
                     .append_column("_my", pa.array(my, pa.int32()))
                     .append_column("_part", pa.array(
                         part.astype(np.int32), pa.int32())))
        s = np.array([ch.get(lab, 1) for lab in labs], np.int64)
        my = ((ids.astype(np.uint64) * K) >> np.uint64(16)) % s.astype(
            np.uint64)
        idx_l, ci_l, cj_l = [], [], []
        for j in range(int(s.max())):  # ≤ max chunk count, not rows
            live = np.nonzero(j < s)[0]
            c = my[live]
            ci_l.append(np.minimum(c, j))
            cj_l.append(np.maximum(c, j))
            idx_l.append(live)
        idx = np.concatenate(idx_l)
        ci = np.concatenate(ci_l).astype(np.int64)
        cj = np.concatenate(cj_l).astype(np.int64)
        cell = (code[idx] * np.uint64(1000003)
                + ci.astype(np.uint64) * np.uint64(8191)
                + cj.astype(np.uint64))
        part = ((cell * K) >> np.uint64(16)) % np.uint64(n_parts)
        return (t.take(pa.array(idx, pa.int64()))
                 .append_column("_ci", pa.array(ci.astype(np.int32),
                                                pa.int32()))
                 .append_column("_cj", pa.array(cj.astype(np.int32),
                                                pa.int32()))
                 .append_column("_my", pa.array(
                     my[idx].astype(np.int32), pa.int32()))
                 .append_column("_part", pa.array(
                     part.astype(np.int32), pa.int32())))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, cg in g.groupby([block_col, "_ci", "_cj"], sort=False):
            ids = cg[id_col].to_numpy().astype(np.int64)
            mat = np.stack(cg[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            ci = int(cg["_ci"].iloc[0])
            cj = int(cg["_cj"].iloc[0])
            if ci == cj:
                sim = unit @ unit.T
                iu = np.triu_indices(len(ids), k=1)
                mask = sim[iu] >= threshold
                a, b = ids[iu[0][mask]], ids[iu[1][mask]]
            else:
                am = cg["_my"].to_numpy() == ci
                bm = ~am
                sim = unit[am] @ unit[bm].T
                ai, bi = np.nonzero(sim >= threshold)
                a, b = ids[am][ai], ids[bm][bi]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pd.DataFrame({"a": a.astype("int64"),
                             "b": b.astype("int64")})

    cells = ds.map_batches(route, batch_format="pyarrow")
    pairs = cells.groupby("_part").map_groups(
        per_part, batch_format="pandas")
    return pairs.sort(["a", "b"])


def dup_clusters(ds, id_col: str = "doc_id", text_col: str = "text",
                 **minhash_kwargs):
    """End-to-end near-duplicate resolution — the full curation chain a
    training-data pipeline runs nightly: LSH candidate pairs with exact
    Jaccard verification (:func:`minhash_lsh_pairs`) -> undirected
    connected components over the verified pairs -> min-id canonical
    document per cluster.

    Every stage is the already-distributed building block: the pair table
    is the banded-groupby output (never materialized on the driver),
    components run the contraction path from ``stages/graph.py``, and
    singleton docs enter via self-edges so EVERY corpus id gets a row.
    Output: ``(id, cluster, keep)`` with ``keep = 1`` iff the doc is its
    cluster's canonical (the survivor set of the dedup).
    """
    import pyarrow.compute as pc

    from .graph import connected_components

    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                              **minhash_kwargs)

    def pair_edges(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["a"].cast(pa.int64()),
                         "v": t["b"].cast(pa.int64())})

    def self_edges(t: pa.Table) -> pa.Table:
        ids = t[id_col].cast(pa.int64())
        return pa.table({"u": ids, "v": ids})

    edges = pairs.map_batches(pair_edges, batch_format="pyarrow").union(
        ds.select_columns([id_col]).map_batches(
            self_edges, batch_format="pyarrow"))
    comp = connected_components(edges)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t["node"],
            "cluster": t["component"],
            "keep": pc.cast(pc.equal(t["node"], t["component"]), pa.int64()),
        })

    return comp.map_batches(out, batch_format="pyarrow")


def substring_dup_counts(ds, window: int = 64, stride: int = 16,
                         id_col: str = "doc_id", text_col: str = "text",
                         n_parts: int = 64):
    """Exact-substring duplication signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    criterion, public): slide a ``window``-char window at ``stride`` over
    each document; a window is DUPLICATED if the identical string occurs
    in >= 2 distinct documents.  Output per doc with >= 1 window:
    ``(id, n_windows, n_dup_windows)`` over the doc's DISTINCT windows —
    the ratio is the doc's copied-content fraction.

    Shape: ONE window-hash-partitioned shuffle + one tiny sum.  Window
    rows (16-byte md5 + id, deduped per doc at emit) carry a hash
    partition key; every window's rows land in the same partition, so a
    ``groupby(part)`` over ``n_parts`` groups — NOT a group per window,
    which at web scale is billions of sub-ms ``map_groups`` calls — does
    the duplicate counting fully vectorized (one pandas ``transform``
    per partition).  Per-doc partials then sum in one ``groupby(id)``
    aggregate.  ``n_parts`` scales with the cluster; ``stride`` is the
    cost knob (windows per doc = len/stride).
    """
    import hashlib

    import pandas as pd

    def windows(b: pa.Table) -> pa.Table:
        ids, whs = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            t = t or ""
            seen = set()
            for s in range(0, len(t) - window + 1, stride):
                seen.add(t[s:s + window])
            for w in seen:
                ids.append(i)
                whs.append(hashlib.md5(w.encode("utf-8")).hexdigest())
        parts = [int(h[:4], 16) % n_parts for h in whs]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "w": pa.array(whs, pa.string()),
                         "part": pa.array(parts, pa.int32())})

    def part_tally(g: "pd.DataFrame") -> "pd.DataFrame":
        # rows are (doc, window) DISTINCT per doc, so group size IS the
        # distinct-doc count of that window
        dup = (g.groupby("w")["w"].transform("size") >= 2).astype("int64")
        agg = (pd.DataFrame({id_col: g[id_col].to_numpy(), "dup": dup})
               .groupby(id_col, sort=False)["dup"]
               .agg(n_windows="count", n_dup_windows="sum").reset_index())
        agg["dpart"] = (agg[id_col] % n_parts).astype("int32")
        return agg

    partials = (ds.map_batches(windows, batch_format="pyarrow")
                .groupby("part").map_groups(part_tally,
                                            batch_format="pandas"))

    # final per-doc sum as ONE vectorized pandas groupby per doc-hash
    # partition — Ray's generic Aggregate walks groups row-by-row and
    # measured 23 s on 65k partial rows / 5k groups; this is 0.2 s
    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        return (g.groupby(id_col, sort=False)
                [["n_windows", "n_dup_windows"]].sum().reset_index())

    return partials.groupby("dpart").map_groups(merge,
                                                batch_format="pandas")


def _lev_band(a: str, b: str, max_dist: int) -> int:
    """Banded Levenshtein: exact distance if <= max_dist, else
    max_dist + 1.  Classic two-row DP restricted to the |i - j| <=
    max_dist diagonal band — O(len x band) instead of O(len^2), with
    early abandon when a full row exceeds the threshold."""
    if abs(len(a) - len(b)) > max_dist:
        return max_dist + 1
    if a == b:
        return 0
    la, lb = len(a), len(b)
    big = max_dist + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - max_dist)
        hi = min(lb, i + max_dist)
        cur = [big] * (lb + 1)
        if i <= max_dist:
            cur[0] = i          # j = 0 cell (b exhausted) is in-band
        ca = a[i - 1]
        best = cur[0]
        for j in range(lo, hi + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]))
            cur[j] = c
            if c < best:
                best = c
        if best > max_dist:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_dist else big


def fuzzy_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                    block_chars: int = 16, probe_chars: int = 64,
                    max_dist: int = 8, n_parts: int = 32,
                    pair_cap: int = 200_000):
    """Edit-distance near-dup pairs: docs sharing a ``block_chars``
    exact prefix whose ``probe_chars`` prefixes are within ``max_dist``
    Levenshtein — the fuzzy tier between exact dedup and MinHash
    (catches small in-place edits MinHash shingles dilute).

    Blocking is deliberately identical on both the engine and the
    oracle (prefix equality), so recall is a DOCUMENTED property of the
    blocking scheme, not a divergence: pairs with differing prefixes
    are out of scope by definition.  One hash-partition shuffle on the
    block key; per-partition pair expansion is bounded by the block
    sizes (``pair_cap`` guards adversarial all-same-prefix corpora —
    exceeding it raises rather than silently truncating).  Returns
    (id_a, id_b, dist) with id_a < id_b.
    """
    import pyarrow.compute as pc

    from .joins import _part_col

    def prep(t: pa.Table) -> pa.Table:
        block = pc.utf8_slice_codeunits(t[text_col], 0, block_chars)
        probe = pc.utf8_slice_codeunits(t[text_col], 0, probe_chars)
        out = pa.table({id_col: t[id_col], "_block": block, "_probe": probe})
        return out.append_column("_part", _part_col(block, n_parts))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, dists = [], [], []
        for _, grp in g.groupby("_block", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col, kind="mergesort")
            ids = grp[id_col].to_numpy()
            ps = grp["_probe"].tolist()
            npairs = len(ids) * (len(ids) - 1) // 2
            if npairs > pair_cap:
                raise ValueError(
                    f"fuzzy_dup_pairs: block of {len(ids)} rows exceeds "
                    f"pair_cap={pair_cap}; tighten block_chars")
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = _lev_band(ps[i], ps[j], max_dist)
                    if d <= max_dist:
                        rows_a.append(ids[i])
                        rows_b.append(ids[j])
                        dists.append(d)
        return pd.DataFrame({
            "id_a": np.array(rows_a, dtype="int64"),
            "id_b": np.array(rows_b, dtype="int64"),
            "dist": np.array(dists, dtype="int64")})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: per_part(g.drop(columns="_part")),
                        batch_format="pandas"))


class LshIndexer(MinHasher):
    """Actor-pool stage for :func:`lsh_export`: text → exploded
    (file, band, band_hash, id, packed shingles) index rows.  Band
    hashing is byte-identical to :func:`_band_rows` (same wrapping
    multiply-accumulate, same ``(h·GOLD + band) % n_files`` routing),
    so a lookup can recompute a query's buckets without the index."""

    def __init__(self, n_perm: int = 128, n_bands: int = 32,
                 n_files: int = 16, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        super().__init__(n_perm, shingle_k, id_col, text_col)
        self.n_bands, self.n_files = n_bands, n_files

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, files, bands, hashes, packs = [], [], [], [], []
        r = self.n_perm // self.n_bands
        for i, txt in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            sig = self.signature(txt or "")
            sh = sorted(set(word_shingles(txt or "", self.k)))
            packed = (np.sort(_stable_hash64(sh)).tobytes()
                      if sh else b"")
            h = np.zeros(self.n_bands, np.uint64)
            s3 = sig[:self.n_bands * r].reshape(self.n_bands, r)
            for j in range(r):
                h = h * _GOLD + s3[:, j]
            f = ((h * _GOLD + np.arange(self.n_bands, dtype=np.uint64))
                 % np.uint64(self.n_files)).astype(np.int32)
            ids += [i] * self.n_bands
            files.append(f)
            bands.append(np.arange(self.n_bands, dtype=np.int32))
            hashes.append(h.view(np.int64))
            packs += [packed] * self.n_bands
        if not ids:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "file": pa.array([], pa.int32()),
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64()),
                             "shingles": pa.array([], pa.binary())})
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "file": pa.array(np.concatenate(files), pa.int32()),
            "band": pa.array(np.concatenate(bands), pa.int32()),
            "band_hash": pa.array(np.concatenate(hashes), pa.int64()),
            "shingles": pa.array(packs, pa.binary())})


def lsh_export(ds, out_dir: str, n_perm: int = 128, n_bands: int = 32,
               shingle_k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", n_files: int = 16,
               concurrency: int = 2):
    """Persisted LSH near-dup INDEX — the similarity-search scale path
    for text (the IVF-layout / BM25-shard / zonemap pattern applied to
    MinHash): band rows land in ``n_files`` parquet files keyed by
    ``(band_hash·GOLD + band) % n_files``, each written by the one
    partition that owns it (temp + atomic rename — killed exports leave
    no partial file), packed shingle hashes ride with the rows so a
    probe verifies exact Jaccard without touching the corpus.  Storage
    is ×n_bands the shingle payload — the classic LSH index tradeoff;
    at 100 TB store shingles once in a doc-keyed side table and make
    the probe a two-hop pruned read.  Returns the manifest
    (file, n_rows, n_docs) sorted by file.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = ds.map_batches(
        LshIndexer,
        fn_constructor_kwargs=dict(n_perm=n_perm, n_bands=n_bands,
                                   n_files=n_files, shingle_k=shingle_k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)

    def write_file(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        f = int(g["file"].iloc[0])
        g = g.sort_values(["band", "band_hash", id_col],
                          kind="mergesort").drop(columns=["file"])
        path = os.path.join(out_dir, f"band-{f:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"file": pd.array([f], dtype="int64"),
                             "n_rows": pd.array([len(g)], dtype="int64"),
                             "n_docs": pd.array(
                                 [g[id_col].nunique()], dtype="int64")})

    manifest = pd.DataFrame(
        rows.groupby("file").map_groups(write_file,
                                        batch_format="pandas").take_all())
    return manifest.sort_values("file").reset_index(drop=True)


def lsh_lookup(index_dir: str, query_text: str, threshold: float = 0.6,
               n_perm: int = 128, n_bands: int = 32, shingle_k: int = 3,
               n_files: int = 16, id_col: str = "doc_id"):
    """Near-dup lookup against a :func:`lsh_export` index: recompute
    the query's ``n_bands`` bucket keys, read ONLY the touched band
    files (≤ n_bands of n_files, column- and predicate-pruned), verify
    candidates by exact Jaccard on the packed shingle hashes, and
    return (id, jaccard_ppm ≥ threshold·10⁶) — integer ppm both sides.
    One raw task per touched file (the fused-fetch shape); the driver
    sees only verified matches.  Recall is the banding guarantee
    (miss ≤ (1−J^r)^bands — negligible for the bimodal near-dup regime,
    the :func:`minhash_lsh_pairs` analysis).
    """
    import os

    import ray

    mh = MinHasher(n_perm, shingle_k, id_col, "text")
    sig = mh.signature(query_text or "")
    r = n_perm // n_bands
    h = np.zeros(n_bands, np.uint64)
    s3 = sig[:n_bands * r].reshape(n_bands, r)
    for j in range(r):
        h = h * _GOLD + s3[:, j]
    files = ((h * _GOLD + np.arange(n_bands, dtype=np.uint64))
             % np.uint64(n_files)).astype(np.int64)
    keys = h.view(np.int64)
    shq = np.sort(_stable_hash64(
        sorted(set(word_shingles(query_text or "", shingle_k)))))
    nq = len(shq)
    thr_ppm = int(round(threshold * 1_000_000))
    qref = ray.put(shq)

    @ray.remote(num_cpus=0.5)
    def probe(path, wanted):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        t = pq.read_table(path,
                          columns=[id_col, "band", "band_hash",
                                   "shingles"])
        m = np.zeros(t.num_rows, bool)
        bh = t["band_hash"].to_numpy()
        bd = t["band"].to_numpy()
        for band, key in wanted:
            m |= (bd == band) & (bh == key)
        cand = t.filter(pa.array(m))
        sq = ray.get(qref)
        seen, out_i, out_p = set(), [], []
        for i, blob in zip(cand[id_col].to_pylist(),
                           cand["shingles"].to_pylist()):
            if i in seen:
                continue
            seen.add(i)
            xs = _unpack_shingles(blob)
            inter = len(np.intersect1d(xs, sq, assume_unique=True))
            uni = len(xs) + nq - inter
            ppm = 1_000_000 if uni == 0 else (inter * 1_000_000) // uni
            if ppm >= thr_ppm:
                out_i.append(i)
                out_p.append(ppm)
        return out_i, out_p

    per_file: dict = {}
    for band, (f, key) in enumerate(zip(files.tolist(), keys.tolist())):
        per_file.setdefault(int(f), []).append((band, key))
    futs = []
    for f, wanted in sorted(per_file.items()):
        path = os.path.join(index_dir, f"band-{f:05d}.parquet")
        if os.path.exists(path):
            futs.append(probe.remote(path, wanted))
    ids: dict = {}
    for out_i, out_p in ray.get(futs):
        for i, p in zip(out_i, out_p):
            ids[i] = p                  # same doc via several bands
    items = sorted(ids.items())
    return pd.DataFrame({
        id_col: pd.array([i for i, _ in items], dtype="int64"),
        "jaccard_ppm": pd.array([p for _, p in items], dtype="int64")})


def dup_rate_by_group(ds, group_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id",
                      n_parts: int = 64) -> pd.DataFrame:
    """Per-source exact-duplicate rate — the curation diagnostic that
    says WHICH sources feed redundant text into a training mix (the
    aggregate view over :func:`dedup_exact`'s keep-list; CCNet §4 keeps
    the first occurrence, so a row is a duplicate iff an identical text
    exists with a smaller ``id_col`` ANYWHERE in the corpus —
    cross-source, the keeper's source absorbs the credit).

    One content-md5 hash partition (complete fingerprint groups per
    partition → vectorized sort + ``duplicated(keep='first')``), each
    partition pre-folds to per-group (n_docs, n_dups) — so the second
    pass is a constant-bounded-key driver fold, never a shuffle
    (``group_col`` cardinality is the source list, not data-scaled).
    Rate in exact floored micro units.  Returns (source, n_docs,
    n_dups, dup_rate_micro) sorted by source.
    """
    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow")

    def addp(t: pa.Table) -> pa.Table:
        # fingerprint IS an md5 hex — its first 8 hex chars are already
        # a uniform hash; no second md5 needed for routing
        fp = t["text_md5"].to_pylist()
        part = np.fromiter((int(f[:8], 16) % n_parts for f in fp),
                           np.int32, count=len(fp))
        return t.append_column("_part", pa.array(part, pa.int32()))

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        dup = g.duplicated("text_md5", keep="first")
        out = pd.DataFrame({group_col: g[group_col],
                            "d": dup.to_numpy(np.int64)})
        return (out.groupby(group_col, as_index=False)
                .agg(n_docs=("d", "size"), n_dups=("d", "sum")))

    parts = (hashed.select_columns(["text_md5", id_col, group_col])
             .map_batches(addp, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(lambda g: mark(g.drop(columns="_part")),
                         batch_format="pandas"))
    rows = (parts.to_pandas().groupby(group_col, as_index=False)
            [["n_docs", "n_dups"]].sum())
    rows["n_docs"] = rows["n_docs"].astype("int64")
    rows["n_dups"] = rows["n_dups"].astype("int64")
    rows["dup_rate_micro"] = (rows["n_dups"] * 1_000_000
                              // rows["n_docs"]).astype("int64")
    return rows.sort_values(group_col).reset_index(drop=True)


def containment_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      shingle_k: int = 3, df_cap: int = 16,
                      thr_ppm: int = 900_000, n_parts: int = 64):
    """Exact CONTAINMENT near-dup pairs: ``|A∩B| / min(|A|,|B|)`` over
    word-shingle sets — the subset-duplication detector (Broder 1997's
    containment measure): a short doc quoted whole inside a long one has
    containment 1.0 but arbitrarily low Jaccard, so the MinHash-LSH tier
    (:func:`ngram_jaccard_pairs`) structurally misses it.

    Candidate generation is an inverted shingle index with a hot-shingle
    cap: shingles with global df > ``df_cap`` are dropped from the
    INTERSECTION counts on both the engine and the oracle side (a
    shingle shared by many docs carries no duplication signal, and the
    cap bounds pair expansion at Σ C(df≤cap, 2) per shingle); set SIZES
    stay exact (uncapped).  Dataflow: one shingle-hash partition
    (complete shingle groups ⇒ global df per partition) → vectorized
    self-merge pair expansion with per-partition pre-fold → one pair
    partition for the final sum; per-doc set sizes ride as O(V)
    broadcast vectors (the pagerank driver contract).  Returns
    (a, b, containment_ppm ≥ thr_ppm) sorted by (a, b).
    """
    import ray

    def sh_rows(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            u = np.unique(_stable_hash64(word_shingles(txt or "",
                                                       shingle_k)))
            ids.append(np.full(len(u), i, np.int64))
            hs.append(u)
        if not ids:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.uint64())})
        return pa.table({"doc": pa.array(np.concatenate(ids), pa.int64()),
                         "sh": pa.array(np.concatenate(hs), pa.uint64())})

    rows = ds.map_batches(sh_rows, batch_format="pyarrow").materialize()

    # per-doc set sizes: a doc's rows never split across blocks (emitted
    # per input row), so per-block partials fold exactly; O(V) driver
    def size_partial(t: pa.Table) -> pa.Table:
        n, c = np.unique(t["doc"].to_numpy(), return_counts=True)
        return pa.table({"doc": pa.array(n, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    sz = (rows.map_batches(size_partial, batch_format="pyarrow")
          .to_pandas().groupby("doc", as_index=False)["n"].sum())
    sz_ref = ray.put((sz["doc"].to_numpy(np.int64),
                      sz["n"].to_numpy(np.int64)))

    def addp(t: pa.Table) -> pa.Table:
        h = t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((h * np.uint64(2654435761)) >> np.uint64(16)) \
            % np.uint64(n_parts)
        return t.append_column(
            "_part", pa.array(part.astype(np.int32), pa.int32()))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["sh"].value_counts()
        keep = vc[vc <= df_cap].index
        g = g[g["sh"].isin(keep)]
        m = g.merge(g, on="sh")
        m = m[m["doc_x"].to_numpy() < m["doc_y"].to_numpy()]
        out = (m.groupby(["doc_x", "doc_y"], as_index=False).size()
               .rename(columns={"doc_x": "a", "doc_y": "b",
                                "size": "inter"}))
        out["inter"] = out["inter"].astype("int64")
        return out

    pairs = (rows.map_batches(addp, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(lambda g: pairs_part(g.drop(columns="_part")),
                         batch_format="pandas"))

    def finish_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], as_index=False)["inter"].sum()
        docs, ns = ray.get(sz_ref)
        na = ns[np.searchsorted(docs, s["a"].to_numpy(np.int64))]
        nb = ns[np.searchsorted(docs, s["b"].to_numpy(np.int64))]
        ppm = (s["inter"].to_numpy(np.int64) * 1_000_000
               // np.minimum(na, nb))
        s["containment_ppm"] = ppm
        return s[ppm >= thr_ppm][["a", "b", "containment_ppm"]]

    from .joins import _part_col

    def addp2(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t["a"], n_parts))

    return (pairs.map_batches(addp2, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: finish_part(g.drop(columns="_part")),
                        batch_format="pandas")
            .sort(["a", "b"]))
