"""Similarity search over an embedding column (build-brief component).

- ``cosine_topk``  — brute-force cosine top-k against a broadcast query
  matrix: numpy matmul per batch (the K6 pgvector ANN analog,
  `genesis/tools/embedding/search_repl.py:125-147`), then a distributed
  ``sort().limit(k)``.  The query matrix ships once via ``ray.put``.
- ``ivf_topk``     — the scale path: IVF-style bucketing (here the ``label``
  column stands in for the coarse quantizer cell), probe the ``nprobe``
  closest centroids only.  Recall measured against brute force in tests.

Scores are computed in float64 and rounded so results hash-compare stably.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["query_vector", "cosine_topk", "ivf_topk"]


def query_vector(dim: int = 64, seed: int = 7) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def _scores_batch(batch: pa.Table, q: np.ndarray, id_col: str,
                  vec_col: str, round_to: int) -> pa.Table:
    mat = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / norms
    return pa.table({
        id_col: batch[id_col],
        "score": pa.array(np.round(scores, round_to), pa.float64()),
    })


def cosine_topk(ds, q: np.ndarray, k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding", round_to: int = 4):
    """Brute-force cosine top-k; deterministic (score desc, id asc)."""
    import ray
    q_ref = ray.put(np.asarray(q, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        return _scores_batch(batch, ray.get(q_ref), id_col, vec_col, round_to)

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def ivf_topk(ds, q: np.ndarray, k: int = 10, nprobe: int = 2,
             cell_col: str = "label", id_col: str = "vec_id",
             vec_col: str = "embedding", round_to: int = 4):
    """IVF-bucketed ANN: rank cells by centroid similarity, probe top cells.

    Centroids come from a small per-cell mean aggregate (one shuffle over
    the cell key); the probe is a pruned read of only the selected cells.
    """
    import ray

    def partial_centroid(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            cell_col: batch[cell_col].to_pylist(),
            "v": [np.asarray(v, dtype=np.float64)
                  for v in batch[vec_col].to_pylist()],
        })
        rows = []
        for cell, g in df.groupby(cell_col, sort=False):
            rows.append({cell_col: cell,
                         "vsum": np.sum(np.stack(g["v"].to_numpy()), axis=0),
                         "n": len(g)})
        return pa.table({
            cell_col: [r[cell_col] for r in rows],
            "vsum": pa.array([r["vsum"].tolist() for r in rows],
                             pa.list_(pa.float64())),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial_centroid, batch_format="pyarrow").take_all()
    agg: dict = {}
    for r in parts:
        c = r[cell_col]
        if c not in agg:
            agg[c] = [np.zeros(len(r["vsum"])), 0]
        agg[c][0] += np.asarray(r["vsum"])
        agg[c][1] += r["n"]
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    cells = []
    for c, (vsum, n) in agg.items():
        cen = vsum / n
        nrm = np.linalg.norm(cen)
        cells.append((float(cen @ qn / (nrm or 1.0)), c))
    probe = {c for _, c in sorted(cells, reverse=True)[:nprobe]}
    probe_arr = pa.array(sorted(probe))
    q_ref = ray.put(qn)

    def score_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sel = batch.filter(pc.is_in(batch[cell_col], value_set=probe_arr))
        if sel.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return _scores_batch(sel, ray.get(q_ref), id_col, vec_col, round_to)

    scored = ds.map_batches(score_probed, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)
