"""Lossy fieldnorm encoding — the Tantivy/Lucene doc-length quantization.

Tantivy stores each document's field length (its "fieldnorm") as ONE byte
per doc (`tantivy src/fieldnorm/code.rs`), an encoding modeled on Lucene's
``SmallFloat.intToByte4`` / ``byte4ToInt`` (public Lucene source, used by
Lucene's BM25Similarity norms): a 3-bit mantissa with an implicit leading
bit and a 5-bit shift.  Properties (all tested):

- values 0..15 are encoded EXACTLY;
- above 15, encoding truncates DOWN to the nearest representable value
  (id group ``g = id >> 3``; for ``g >= 1`` the value is
  ``(8 + (id & 7)) << (g - 1)`` — step doubles every 8 ids);
- decode(encode(n)) <= n, and both maps are monotone non-decreasing.

BM25 then scores with the DECODED (quantized) length while ``avgdl`` stays
the exact ``total_tokens / total_docs`` from the segment stats — Tantivy's
``Bm25Weight`` precomputes the 256 per-id norm values exactly this way.
`bm25_topk(..., tantivy_norms=True)` reproduces that parameterization;
`tests/test_tantivy_parity.py` pins a golden ranked list against an
independent straight-line implementation of the published formula
(`pulse/src/main.rs:45-54` serves Tantivy scores through this surface).
"""
from __future__ import annotations

import numpy as np

__all__ = ["FIELDNORM_TABLE", "fieldnorm_to_id", "id_to_fieldnorm",
           "quantize_dl"]


def _id_to_fieldnorm(i: int) -> int:
    """Lucene ``SmallFloat.byte4ToInt`` (= Tantivy ``id_to_fieldnorm``)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


#: the 256 representable fieldnorm values, ascending
FIELDNORM_TABLE: np.ndarray = np.array(
    [_id_to_fieldnorm(i) for i in range(256)], dtype=np.int64)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    """Decode fieldnorm ids (uint8) to document lengths."""
    return FIELDNORM_TABLE[np.asarray(ids, np.int64)]


def fieldnorm_to_id(fieldnorms: np.ndarray) -> np.ndarray:
    """Encode doc lengths to the byte id (floor to nearest representable
    value — Lucene ``intToByte4`` truncates, never rounds up)."""
    fn = np.asarray(fieldnorms, np.int64)
    # searchsorted 'right' - 1 == largest table entry <= value
    ids = np.searchsorted(FIELDNORM_TABLE, fn, side="right") - 1
    return np.clip(ids, 0, 255)


def quantize_dl(dls: np.ndarray) -> np.ndarray:
    """decode(encode(dl)) — the quantized length BM25 actually scores with
    when norms are byte-encoded (identity for dl <= 15)."""
    return FIELDNORM_TABLE[fieldnorm_to_id(dls)]
