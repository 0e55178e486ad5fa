"""Chunking + embedding + per-document mean-pool (T4/T5/A1/A6).

Rebuild of the embedding toolchain
(`genesis/tools/embedding/generate_embeddings.py`,
`genesis/tools/embedding/merge_embeddings.py`) with the model swapped for a
**deterministic stub encoder** (the sandbox has no torch/transformers — the
Ray-side plumbing, actor signatures, batch sizes and output layout are real
and tested; ``embed_chunks(model="sentence-transformers/...")`` swaps in
the import-gated :class:`HFEncoder` real-model actor, optionally with a
per-actor GPU fraction).

Chunking contract (`generate_embeddings.py:106-165`), tokenizer-agnostic:
``effective_max = max_tokens - num_special - safety_buffer``; a text with
``n ≤ effective_max`` tokens is one chunk; otherwise windows of
``effective_max`` tokens at stride ``effective_max - overlap`` starting at
0, while the start offset is < n.  Chunk ids are sequential per document
(A6, `generate_embeddings.py:169,183-190`).

The stub tokenizer is whitespace splitting (``\\S+`` runs), so chunk counts
and token counts are SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

__all__ = ["chunk_tokens", "Chunker", "StubEncoder", "HFEncoder",
           "embedding_norms", "embedding_covariance",
           "chunk_documents",
           "embed_chunks", "mean_pool", "CHUNK_DEFAULTS"]

_TOKEN_RE = re.compile(r"\S+")

CHUNK_DEFAULTS = dict(max_tokens=512, overlap=50, num_special=2,
                      safety_buffer=15)


def chunk_tokens(n_tokens: int, max_tokens: int = 512, overlap: int = 50,
                 num_special: int = 2, safety_buffer: int = 15) -> list[int]:
    """Return the token count of each chunk for an n-token text."""
    if n_tokens == 0:
        return []
    eff = max(1, max_tokens - num_special - safety_buffer)
    if eff <= overlap:
        overlap = max(0, eff // 4)
    if n_tokens <= eff:
        return [min(n_tokens, max_tokens)]
    stride = eff - overlap
    if stride <= 0:
        stride = max(1, eff // 2)
    out = []
    pos = 0
    while pos < n_tokens:
        out.append(min(eff, n_tokens - pos))
        pos += stride
    return out


class Chunker:
    """Actor-pool stage: text rows → (id, chunk_id, n_tokens, chunk_text).

    State (compiled tokenizer regex, config) loads once per actor — the
    reference reuses one HF tokenizer across files
    (`generate_embeddings.py:308-318`).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 **cfg):
        self.id_col, self.text_col = id_col, text_col
        self.cfg = {**CHUNK_DEFAULTS, **cfg}
        self.token_re = _TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_chunk, out_n, out_text = [], [], [], []
        c = self.cfg
        eff = max(1, c["max_tokens"] - c["num_special"] - c["safety_buffer"])
        overlap = c["overlap"] if eff > c["overlap"] else max(0, eff // 4)
        stride = max(1, eff - overlap)
        for i, t in zip(ids, texts):
            toks = self.token_re.findall(t or "")
            n = len(toks)
            if n == 0:
                continue
            if n <= eff:
                windows = [(0, n)]
            else:
                windows = [(p, min(p + eff, n)) for p in range(0, n, stride)]
            for cid, (a, b) in enumerate(windows):
                out_id.append(i)
                out_chunk.append(cid)
                out_n.append(b - a)
                out_text.append(" ".join(toks[a:b]))
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_chunk, pa.int32()),
            "n_tokens": pa.array(out_n, pa.int32()),
            "chunk_text": pa.array(out_text, pa.string()),
        })


class StubEncoder:
    """Deterministic hash-based sentence encoder (MiniLM stand-in).

    Each token maps to a fixed pseudo-random unit-ish vector (md5-seeded),
    a text embeds as the mean of its token vectors — mirroring the
    reference's mean-pool over ``last_hidden_state``
    (`generate_embeddings.py:199-222`).  Loaded once per actor; encoding is
    vectorized numpy.
    """

    def __init__(self, dim: int = 64, text_col: str = "chunk_text"):
        self.dim = dim
        self.text_col = text_col
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            seed = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
            rng = np.random.Generator(np.random.PCG64(seed))
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._cache[tok] = v
        return v

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall(t or "")
            if toks:
                out[i] = np.mean([self._token_vec(x) for x in toks], axis=0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self.encode(batch[self.text_col].to_pylist())
        return batch.append_column(
            "embedding", pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), self.dim).cast(
                    pa.list_(pa.float32())))


def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                    concurrency: int = 2, **cfg):
    return ds.map_batches(
        Chunker, fn_constructor_kwargs={"id_col": id_col,
                                        "text_col": text_col, **cfg},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)


class HFEncoder:
    """Real-model drop-in for :class:`StubEncoder` (T4's production seam).

    Mirrors the reference's loader (`generate_embeddings.py:236-278`:
    MiniLM-L6-v2 + fast tokenizer loaded ONCE per process, 8-bit on GPU
    when available) as an actor-pool callable: tokenizer + model in
    ``__init__``, attention-masked mean-pool over ``last_hidden_state``
    per batch.  Import-gated — this sandbox ships no torch/transformers,
    so construction raises ``ImportError`` with a clear message (tested);
    the plumbing (``embed_chunks(model=...)``, per-actor GPU fraction) is
    real either way.
    """

    def __init__(self,
                 model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 text_col: str = "chunk_text", device: str | None = None,
                 max_length: int = 512):
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:                      # pragma: no cover
            raise ImportError(
                "HFEncoder requires torch + transformers; pass model=None "
                "to embed_chunks to use the deterministic StubEncoder"
            ) from e
        self.text_col = text_col
        self.max_length = max_length
        self.torch = torch
        self.device = device or (
            "cuda" if torch.cuda.is_available() else "cpu")
        self.tokenizer = AutoTokenizer.from_pretrained(model_name,
                                                       use_fast=True)
        self.model = AutoModel.from_pretrained(model_name).to(self.device)
        self.model.eval()

    def encode(self, texts: list[str]) -> "np.ndarray":  # pragma: no cover
        torch = self.torch
        enc = self.tokenizer(texts, padding=True, truncation=True,
                             max_length=self.max_length,
                             return_tensors="pt").to(self.device)
        with torch.no_grad():
            hidden = self.model(**enc).last_hidden_state
        mask = enc["attention_mask"].unsqueeze(-1).float()
        pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        return pooled.cpu().numpy().astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        emb = self.encode(batch[self.text_col].to_pylist())
        dim = emb.shape[1]
        return batch.append_column(
            "embedding", pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), dim).cast(
                    pa.list_(pa.float32())))


def _hf_map_kwargs(model: str, text_col: str, concurrency: int,
                   batch_size: int, num_gpus: float,
                   device: str | None, max_length: int) -> dict:
    """The exact ``map_batches`` kwargs the HF path uses — split out so the
    contract test can pin the device / batch-size / GPU-fraction plumbing
    without a real model (the fake-transformers monkeypatch can't reach
    map_batches' actor processes)."""
    return dict(
        fn_constructor_kwargs={"model_name": model, "text_col": text_col,
                               "device": device, "max_length": max_length},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size,
        **({"num_gpus": num_gpus} if num_gpus else {"num_cpus": 0.5}))


def embed_chunks(ds, dim: int = 64, text_col: str = "chunk_text",
                 concurrency: int = 2, batch_size: int = 1000,
                 model: str | None = None, num_gpus: float = 0,
                 device: str | None = None, max_length: int = 512):
    """T4: actor-pool encode, ``batch_size`` = the reference's model batch
    (`generate_embeddings.py:37` CHUNK_BATCH_SIZE=1000).

    ``model=None`` (default) uses the deterministic :class:`StubEncoder`;
    pass an HF model name (and optionally ``num_gpus`` per actor /
    ``device`` / ``max_length``) to run :class:`HFEncoder` instead —
    same schema, same batching, setup once per actor.
    """
    if model is not None:
        return ds.map_batches(
            HFEncoder,
            **_hf_map_kwargs(model, text_col, concurrency, batch_size,
                             num_gpus, device, max_length))
    return ds.map_batches(
        StubEncoder, fn_constructor_kwargs={"dim": dim, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=0.5)


def mean_pool(ds, key_col: str = "label", vec_col: str = "embedding",
              round_to: int | None = 6, explode: bool = True,
              n_parts: int = 64):
    """A1: element-wise mean of vectors per key (merge_embeddings.py:92-105).

    With ``explode=True`` returns (key, pos, mean_val) rows — a layout the
    DuckDB oracle can reproduce with parallel unnest.

    Hash-partitioned: ``n_parts`` Ray groups total, ONE vectorized pandas
    pass per partition (factorize + ``np.add.at`` scatter-sum), never a
    Python call per key — at corpus scale (millions of urls) the per-key
    ``map_groups`` shape is the many-groups trap PERF.md measured at
    ~ms/group.
    """
    import hashlib

    import pandas as pd
    import pyarrow.types as pat

    def add_part(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pat.is_integer(col.type):
            k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            part = ((k * np.uint64(2654435761)) >> np.uint64(16)) \
                % np.uint64(n_parts)
            part = part.astype(np.int32)
        else:
            part = np.array(
                [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                 % n_parts for v in col.to_pylist()], np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def pool_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        codes, uniq = pd.factorize(g[key_col], sort=True)
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        dim = mat.shape[1]
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, codes, mat)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.float64)
        m = sums / cnt[:, None]
        if round_to is not None:
            from ..rounding import round_half_away
            m = round_half_away(m.ravel(), round_to).reshape(m.shape)
        if explode:
            return pd.DataFrame({
                key_col: np.repeat(np.asarray(uniq), dim),
                "pos": np.tile(np.arange(1, dim + 1), len(uniq)),
                "mean_val": m.ravel(),
            })
        return pd.DataFrame({key_col: np.asarray(uniq),
                             "embedding": [list(r) for r in m]})

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: pool_part(g.drop(columns="_part")),
                        batch_format="pandas"))


def embedding_norms(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                    k: int = 20, scale: int = 10_000):
    """Exact integer-scaled squared-L2 norms over a ``list<float>``
    column, top-``k`` by magnitude — the vector-math litmus the oracle
    can replay with ``unnest``: each element is scaled per-value
    (×``scale``, half-away like DuckDB ``round``) so the squared norm is
    an exact int64 and no float summation order can diverge.

    Zero-copy arrow list access: one ``values`` buffer + offsets per
    batch, squared and segment-summed with a cumsum difference — no
    per-row Python, no ``np.stack`` materialization of a ragged copy.
    The top-k is Ray's distributed sort + limit (per-block partial sort,
    only k rows leave each block).  Returns (id, dim, norm_sq)."""
    from ..rounding import round_half_away

    def norms(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = round_half_away(
            col.values.to_numpy(zero_copy_only=False).astype(np.float64)
            * float(scale)).astype(np.int64)
        csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(flat * flat)])
        return pa.table({
            id_col: t[id_col],
            "dim": pa.array(offs[1:] - offs[:-1], pa.int64()),
            "norm_sq": pa.array(csum[offs[1:]] - csum[offs[:-1]],
                                pa.int64())})

    return (ds.map_batches(norms, batch_format="pyarrow")
            .sort(["norm_sq", id_col], descending=[True, False])
            .limit(k))


def embedding_covariance(ds, dims: int = 16, vec_col: str = "embedding",
                         scale: int = 10_000):
    """Exact integer second-moment (covariance sufficient-stat) matrix
    over the first ``dims`` elements of a ``list<float>`` column — the
    prerequisite pass for PCA whitening / decorrelation of an embedding
    store, kept oracle-exact the :func:`embedding_norms` way: each
    element is scaled per-value (×``scale``, half-away like DuckDB
    ``round``), so every pairwise product and sum is pure int64.

    Zero-copy arrow list access (values buffer + offsets → one gather
    into an (n, dims) int64 matrix), then each block condenses to ONE
    partial row (n, Σx, XᵀX flattened — the mergeable-sketch shape:
    O(dims²) per block, never the vectors), driver-folds in
    O(dims²), independent of corpus size.  Returns the upper triangle
    as rows (i, j, n_vecs, sum_x, sum_y, sum_xy) with 1-based dims —
    the covariance is ``(sum_xy − sum_x·sum_y/n)/n`` for any consumer,
    left unreduced so the result stays exact.
    """
    import pandas as pd

    from ..rounding import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = round_half_away(
            col.values.to_numpy(zero_copy_only=False).astype(np.float64)
            * float(scale)).astype(np.int64)
        idx = offs[:-1, None] + np.arange(dims)[None, :]
        x = flat[idx]                              # (n, dims) int64
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "p": pa.array([(x.T @ x).ravel().tolist()],
                          pa.list_(pa.int64()))})

    n = 0
    s = np.zeros(dims, np.int64)
    p = np.zeros((dims, dims), np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += row["n"]
        s += np.asarray(row["s"], np.int64)
        p += np.asarray(row["p"], np.int64).reshape(dims, dims)
    ii, jj = np.triu_indices(dims)
    return pd.DataFrame({
        "i": pd.array(ii + 1, dtype="int64"),
        "j": pd.array(jj + 1, dtype="int64"),
        "n_vecs": pd.array(np.full(len(ii), n), dtype="int64"),
        "sum_x": pd.array(s[ii], dtype="int64"),
        "sum_y": pd.array(s[jj], dtype="int64"),
        "sum_xy": pd.array(p[ii, jj], dtype="int64")})
