"""Tantivy BM25 scoring parity (r4-verdict item 3).

Pins `bm25_topk(..., tantivy_norms=True)` to Tantivy's exact BM25
parameterization — the scoring the reference serves through Pulse
(`pulse/src/main.rs:45-54`, `pulse/src/bin/server.rs:75-77`):

    idf      = ln(1 + (N − df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl_q/avgdl))
    k1 = 1.2, b = 0.75 (Tantivy's Bm25Params defaults)

with ``dl_q`` the one-byte-quantized fieldnorm (`stages/fieldnorm.py`,
modeled on Lucene SmallFloat byte4 — Tantivy's `src/fieldnorm/code.rs`
encoding) and ``avgdl`` the exact segment total.  The golden corpus keeps
every doc ≤ 15 tokens, where EVERY byte fieldnorm encoding is exact — so
the golden ranked lists pin Tantivy's scoring independent of table
micro-details; the lossy path is covered separately with long docs.
"""
from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pytest

from vyntr_ray.stages.fieldnorm import (FIELDNORM_TABLE, fieldnorm_to_id,
                                        id_to_fieldnorm, quantize_dl)

_TOK = re.compile(r"[a-z0-9]+")

_DOCS = {
    1: "ray data streams blocks through the object store",
    2: "ray ray ray tasks and actors",
    3: "arrow batches are zero copy in ray data",
    4: "the quick brown fox jumps over the lazy dog",
    5: "data pipelines shuffle data between data nodes",
    6: "ray",
    7: "object store memory and spill pressure in ray clusters",
    8: "search engines score documents with bm25 ranking",
}

# golden ranked lists (score rounded to 4, ties → doc_id ascending),
# hand-computed from the formula above (verified by _reference_bm25)
_GOLDEN = {
    ("ray", "data"): [(5, 1.4784), (1, 1.3468), (3, 1.3468),
                      (2, 0.7956), (6, 0.7572), (7, 0.4372)],
    ("object", "store"): [(1, 2.4011), (7, 2.2743)],
    ("ray",): [(2, 0.7956), (6, 0.7572), (1, 0.4616),
               (3, 0.4616), (7, 0.4372)],
}


def _reference_bm25(docs: dict[int, str], query: tuple[str, ...],
                    k1: float = 1.2, b: float = 0.75,
                    quantize: bool = False) -> list[tuple[int, float]]:
    """Independent straight-line Tantivy BM25 (no shared code with the
    engine's scorer beyond the fieldnorm table when quantize=True)."""
    toks = {i: _TOK.findall(t.lower()) for i, t in docs.items()}
    n = len(docs)
    dl = {i: len(v) for i, v in toks.items()}
    avgdl = sum(dl.values()) / n          # exact segment total (Tantivy)
    out: dict[int, float] = {}
    for term in set(query):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = Counter(v)[term]
            if tf == 0:
                continue
            d = (int(quantize_dl(np.array([dl[i]]))[0]) if quantize
                 else dl[i])
            out[i] = out.get(i, 0.0) + (
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * d / avgdl)))
    return sorted(((i, round(s, 4)) for i, s in out.items()),
                  key=lambda kv: (-kv[1], kv[0]))


class TestFieldnormEncoding:
    def test_exact_below_16(self):
        n = np.arange(16)
        assert (quantize_dl(n) == n).all()
        assert (fieldnorm_to_id(n) == n).all()

    def test_doubling_pattern(self):
        # group g = id >> 3; value = (8 + (id & 7)) << (g - 1) for g >= 1
        assert id_to_fieldnorm(np.array([16, 17, 23, 24, 31, 40])).tolist() \
            == [16, 18, 30, 32, 60, 128]

    def test_floor_monotone_idempotent(self):
        n = np.arange(0, 100_000, 7)
        q = quantize_dl(n)
        assert (q <= n).all()                       # truncates down
        assert (np.diff(q) >= 0).all()              # monotone
        assert (quantize_dl(q) == q).all()          # representable ⇒ fixed
        assert (np.diff(FIELDNORM_TABLE) > 0).all()  # table strictly sorted

    def test_roundtrip_on_table(self):
        ids = np.arange(256)
        assert (fieldnorm_to_id(id_to_fieldnorm(ids)) == ids).all()


class TestTantivyGoldenRanking:
    @pytest.fixture(scope="class")
    def index_dir(self, ray_session, tmp_path_factory):
        import pyarrow as pa
        import ray.data as rd
        from vyntr_ray.stages.search_index import build_text_index
        ds = rd.from_arrow(pa.table({
            "doc_id": list(_DOCS), "text": list(_DOCS.values())}))
        return build_text_index(
            ds, "tantivy_golden", n_shards=4,
            cache_root=str(tmp_path_factory.mktemp("tantivy_idx")))

    @pytest.mark.parametrize("query", list(_GOLDEN))
    def test_golden_ranked_list(self, index_dir, query):
        from vyntr_ray.stages.search_index import bm25_topk
        got = bm25_topk(index_dir, list(query), k=10,
                        tantivy_norms=True).take_all()
        got_list = [(r["doc_id"], r["score"]) for r in got]
        assert got_list == _GOLDEN[query]
        # and the independent reference reproduces the same golden list
        assert _reference_bm25(_DOCS, query) == _GOLDEN[query]

    def test_quantized_long_docs(self, ray_session, tmp_path):
        """Docs past the exact range: the engine must score with the
        DECODED byte fieldnorm, not the true length."""
        import pyarrow as pa
        import ray.data as rd
        from vyntr_ray.stages.search_index import (bm25_topk,
                                                   build_text_index)
        docs = {
            1: "needle " + "filler word soup " * 20,          # dl 61 → 60
            2: "needle needle short doc",                     # dl 4 (exact)
            3: "needle " + "padding token stream " * 9,       # dl 28 → 28
            4: "no match here at all",
        }
        ds = rd.from_arrow(pa.table({
            "doc_id": list(docs), "text": list(docs.values())}))
        idx = build_text_index(ds, "tantivy_long", n_shards=2,
                               cache_root=str(tmp_path))
        got = [(r["doc_id"], r["score"])
               for r in bm25_topk(idx, ["needle"], k=10,
                                  tantivy_norms=True).take_all()]
        assert got == _reference_bm25(docs, ("needle",), quantize=True)
        exact = [(r["doc_id"], r["score"])
                 for r in bm25_topk(idx, ["needle"], k=10,
                                    tantivy_norms=False).take_all()]
        assert exact == _reference_bm25(docs, ("needle",), quantize=False)
        assert got != exact      # the lossy path measurably engages
