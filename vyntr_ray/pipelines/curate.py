"""curate — the composed training-data curation flagship.

One pipeline chaining the curation primitives the way a real corpus run
does, each stage the already-tested operator:

1. **normalize** — Unicode NFC + whitespace collapse
   (`text_analysis.normalize_batch`);
2. **quality gate** — C4-style filters on the normalized text
   (>= ``min_words`` whitespace tokens, punctuation density <=
   ``max_punct_ppm``; integer ppm arithmetic);
3. **exact dedup** — keep the min-id document per md5(lower(norm_text))
   fingerprint.  Uses the hash-partition ``map_groups`` shape (ONE
   bounded-group shuffle + a vectorized pandas drop_duplicates per
   partition) — NOT a per-fingerprint groupby, per the PERF.md
   many-groups rule;
4. **token budget** — documents in md5(id) hash order until
   ``budget`` whitespace tokens (`sampling.token_budget_sample`'s
   distributed prefix-sum).

Every stage streams: nothing driver-side except the sampler's
O(n_buckets) bucket sums.  Output: ``(id, tok)`` of the surviving docs.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

__all__ = ["curate"]

_WS = re.compile(r"\S+")
_PUNCT = re.compile(r"[.,;:!?]")


def curate(ds, id_col: str = "doc_id", text_col: str = "text",
           min_words: int = 5, max_punct_ppm: int = 200_000,
           budget: int = 5000, n_parts: int = 64, n_buckets: int = 16):
    import pandas as pd

    from ..stages.sampling import token_budget_sample
    from ..stages.text_analysis import normalize_batch

    norm = ds.map_batches(lambda b: normalize_batch(b, text_col),
                          batch_format="pyarrow")

    def gate(t: pa.Table) -> pa.Table:
        keep = []
        for s in t["norm_text"].to_pylist():
            s = s or ""
            nw = len(_WS.findall(s))
            punct_ppm = (len(_PUNCT.findall(s)) * 1_000_000
                         // max(len(s), 1))
            keep.append(nw >= min_words and punct_ppm <= max_punct_ppm)
        return t.filter(pa.array(keep))

    gated = norm.map_batches(gate, batch_format="pyarrow")

    def add_fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5((s or "").lower().encode("utf-8")).hexdigest()
               for s in t["norm_text"].to_pylist()]
        parts = [int(f[:4], 16) % n_parts for f in fps]
        return (t.append_column("fp", pa.array(fps, pa.string()))
                .append_column("part", pa.array(parts, pa.int32())))

    def dedup_part(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["fp", id_col], kind="mergesort")
        return (g.drop_duplicates("fp", keep="first")
                .drop(columns=["fp", "part"]))

    deduped = (gated.map_batches(add_fp, batch_format="pyarrow")
               .groupby("part").map_groups(dedup_part,
                                           batch_format="pandas"))

    sampled = token_budget_sample(deduped, budget=budget, key_col=id_col,
                                  text_col="norm_text",
                                  n_buckets=n_buckets)

    def project(t: pa.Table) -> pa.Table:
        toks = [len(_WS.findall(s or ""))
                for s in t["norm_text"].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "tok": pa.array(toks, pa.int64())})

    return sampled.map_batches(project, batch_format="pyarrow")
