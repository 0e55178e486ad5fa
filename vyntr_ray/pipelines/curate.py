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

__all__ = ["curate", "pretrain_pipeline"]

_WS = re.compile(r"\S+")
_PUNCT = re.compile(r"[.,;:!?]")


def _normalize_gate_dedup(ds, id_col: str, text_col: str,
                          min_words: int, max_punct_ppm: int,
                          n_parts: int):
    """Stages 1-3 of the curation chain (normalize -> quality gate ->
    exact dedup), shared by :func:`curate` and
    :func:`pretrain_pipeline`.  Returns a Dataset carrying
    ``norm_text``."""
    import pandas as pd

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

    return (gated.map_batches(add_fp, batch_format="pyarrow")
            .groupby("part").map_groups(dedup_part,
                                        batch_format="pandas"))


def curate(ds, id_col: str = "doc_id", text_col: str = "text",
           min_words: int = 5, max_punct_ppm: int = 200_000,
           budget: int = 5000, n_parts: int = 64, n_buckets: int = 16):
    from ..stages.sampling import token_budget_sample

    deduped = _normalize_gate_dedup(ds, id_col, text_col, min_words,
                                    max_punct_ppm, n_parts)

    sampled = token_budget_sample(deduped, budget=budget, key_col=id_col,
                                  text_col="norm_text",
                                  n_buckets=n_buckets)

    def project(t: pa.Table) -> pa.Table:
        toks = [len(_WS.findall(s or ""))
                for s in t["norm_text"].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "tok": pa.array(toks, pa.int64())})

    return sampled.map_batches(project, batch_format="pyarrow")


def pretrain_pipeline(ds, bench_ds, id_col: str = "doc_id",
                      text_col: str = "text", min_words: int = 5,
                      max_punct_ppm: int = 200_000,
                      jaccard: float = 0.6, contam_n: int = 3,
                      budget: int = 5000, n_parts: int = 64,
                      n_buckets: int = 16):
    """The FULL pretraining-corpus curation flagship — :func:`curate`
    extended with the two load-bearing steps a real run adds
    (RefinedWeb / Dolma-style):

    1-3. normalize → quality gate → exact dedup (shared stages);
    4. **near-dup removal**: MinHash-LSH candidates with exact-Jaccard
       ≥ ``jaccard`` verification over the NORMALIZED text → connected
       components → only each cluster's min-id canonical survives
       (``stages/dedup.dup_clusters``), applied back via a distributed
       ``semi_join`` — no driver materialization of the survivor set;
    5. **decontamination**: survivors sharing ANY word-``contam_n``-gram
       with the held-out benchmark split (``bench_ds``, raw text; the
       ``doc_id % 97`` convention) are dropped — broadcast gram set,
       one streaming pass;
    6. token-budget sample in md5(id) order (distributed prefix-sum).

    Every stage is the already-oracled operator; the composed oracle
    replays the identical chain as ONE recursive-CTE SQL statement.
    Output: ``(id, tok)`` of the final corpus.
    """
    import pyarrow.compute as pc

    from ..stages.dedup import dup_clusters
    from ..stages.joins import semi_join
    from ..stages.sampling import token_budget_sample
    from ..stages.text_analysis import decontaminate

    import ray

    deduped = _normalize_gate_dedup(ds, id_col, text_col, min_words,
                                    max_punct_ppm, n_parts)
    # consumed by dup_clusters AND the semi_join below — pin it, or
    # the whole normalize/gate/dedup chain re-executes (PERF.md rule).
    # Re-block to a CPU-scaled count first: the dedup groupby emits
    # n_parts micro-blocks, and the minhash actor stage pays per-block
    # overhead (measured 8.0 -> 2.7 s at sf0.1 on 64 -> 16 blocks)
    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 16)) // 2)
    deduped = deduped.repartition(n_blocks).materialize()

    nd = dup_clusters(deduped.map_batches(
        lambda t: t.select([id_col, "norm_text"]),
        batch_format="pyarrow"),
        id_col=id_col, text_col="norm_text", threshold=jaccard)
    keepers = nd.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], pa.scalar(1, pa.int64())))
        .select([id_col]).rename_columns(["k_id"]),
        batch_format="pyarrow")
    survivors = semi_join(deduped, keepers, id_col,
                          left_payload=["norm_text"],
                          right_key_col="k_id",
                          types={id_col: pa.int64(),
                                 "norm_text": pa.string()})

    def non_bench(t: pa.Table) -> pa.Table:
        m = (t[id_col].to_numpy(zero_copy_only=False) % 97) != 0
        return t.filter(pa.array(m))

    corpus = survivors.map_batches(non_bench, batch_format="pyarrow")
    bench_nt = bench_ds.map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            "norm_text": t[text_col]}),
        batch_format="pyarrow")
    clean = decontaminate(corpus, bench_nt, n=contam_n, id_col=id_col,
                          text_col="norm_text")
    # the budget sampler's two passes (bucket sums + emit) would
    # re-execute the semi_join + decontaminate chain twice otherwise
    clean = clean.materialize()

    sampled = token_budget_sample(clean, budget=budget, key_col=id_col,
                                  text_col="norm_text",
                                  n_buckets=n_buckets)

    def project(t: pa.Table) -> pa.Table:
        toks = [len(_WS.findall(s or ""))
                for s in t["norm_text"].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "tok": pa.array(toks, pa.int64())})

    return sampled.map_batches(project, batch_format="pyarrow")
