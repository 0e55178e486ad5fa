"""Inverted-index build + BM25 ranked search — the Pulse analog.

The reference indexes crawl analyses into a Tantivy full-text index with a
field schema (`pulse/src/main.rs:45-54`) and serves scored top-k search
(`pulse/src/bin/server.rs:75-77`).  Re-expressed Ray-Data-first:

- **build**: tokenize → (term, doc_id, tf, dl, shard, block) rows → ONE
  shuffle (``groupby([shard, block])`` where shard = hash(term) % n_shards
  and block = doc_id // block_span) → vectorized posting assembly per
  group into **(term, doc-block) sub-lists** (term, block, df, total_tf,
  doc_ids, tfs, dls; df/total_tf are BLOCK-level) → partitioned parquet
  ``shard=XX/`` dirs.  Document length rides inside the postings
  (Lucene-norms-style denormalization) so scoring needs no corpus-side
  join.  Global stats (N, avgdl, block_span) land in ``_stats.json``.
- **search**: resolve the query terms' shards, then TWO pruned reads of
  only those ``shard=XX/`` dirs — a (term, df)-columns-only pass that
  sums block dfs into term-total df for the idf (tiny, columnar-pruned),
  and the scoring pass: filter to the query terms, explode posting
  sub-lists, vectorized BM25, ``groupby(doc).sum`` → ``sort().limit(k)``.

Scale notes: the only all-to-all is the build groupby, and the doc-block
subkey bounds every group — a stop-word-grade hot term is spread over
ceil(n_docs / block_span) groups instead of concentrating one, so no
posting row or shuffle group exceeds ~block_span entries at any corpus
size.  Search I/O is O(postings of the query terms' shards), independent
of corpus size.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
from ..rounding import iround_half_away, round_half_away

__all__ = ["build_text_index", "bm25_topk", "index_summary",
           "term_rows_batch", "TEXT_TOKEN", "tfidf_keywords",
           "build_fielded_index", "bm25_fielded_topk"]

TEXT_TOKEN = re.compile(r"[a-z0-9]+")

CACHE_DIR = "/tmp/vyntr_ray_cache/text_index"

# posting sub-lists span ≤ this many doc ids: bounds every shuffle group
# and every Arrow list row even for stop-word-grade terms
DEFAULT_BLOCK_SPAN = 1 << 16


def _shard_of(term: str, n_shards: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8],
               16) % n_shards


def term_rows_batch(batch: pa.Table, n_shards: int, id_col: str = "doc_id",
                    text_col: str = "text",
                    block_span: int = DEFAULT_BLOCK_SPAN) -> pa.Table:
    """(term, doc_id, tf, dl, shard, block) rows for one Arrow batch."""
    ids, terms, tfs, dls, shards = [], [], [], [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        toks = TEXT_TOKEN.findall((t or "").lower())
        if not toks:
            continue
        dl = len(toks)
        for term, tf in Counter(toks).items():
            ids.append(i)
            terms.append(term)
            tfs.append(tf)
            dls.append(dl)
            shards.append(_shard_of(term, n_shards))
    id_arr = pa.array(ids, pa.int64())
    import pyarrow.compute as pc
    return pa.table({
        "term": pa.array(terms, pa.string()),
        id_col: id_arr,
        "tf": pa.array(tfs, pa.int64()),
        "dl": pa.array(dls, pa.int64()),
        "shard": pa.array(shards, pa.int32()),
        # int64 // span (doc ids are non-negative, so trunc == floor)
        "block": pc.cast(pc.divide(id_arr,
                                   pa.scalar(block_span, pa.int64())),
                         pa.int32()),
    })


def build_text_index(ds, cache_key: str, n_shards: int = 16,
                     id_col: str = "doc_id", text_col: str = "text",
                     cache_root: str = CACHE_DIR,
                     block_span: int = DEFAULT_BLOCK_SPAN) -> str:
    """One-time index build; idempotent via _SUCCESS (resumable output)."""
    out = os.path.join(cache_root, cache_key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    rows = ds.map_batches(
        lambda b: term_rows_batch(b, n_shards, id_col, text_col, block_span),
        batch_format="pyarrow")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        # one (shard, doc-block) group: every term's sub-list here spans at
        # most block_span docs, so group size and posting-row length stay
        # bounded no matter how hot a term is; df/total_tf are block-level
        g = g.sort_values(["term", id_col], kind="mergesort")
        agg = g.groupby("term", sort=False).agg(
            df=(id_col, "size"), total_tf=("tf", "sum"),
            doc_ids=(id_col, list), tfs=("tf", list), dls=("dl", list),
            shard=("shard", "first"), block=("block", "first"))
        return agg.reset_index()

    postings = rows.groupby(["shard", "block"]).map_groups(
        assemble, batch_format="pandas")
    postings.write_parquet(out, partition_cols=["shard"])

    # global stats: docs-with-tokens count + mean doc length (tiny)
    import pyarrow.compute as pc

    def dl_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({id_col: b[id_col].to_pylist(),
                           "dl": b["dl"].to_pylist()})
        u = df.drop_duplicates(id_col)
        return pa.table({"n": pa.array([len(u)], pa.int64()),
                         "dl_sum": pa.array([int(u["dl"].sum())],
                                            pa.int64())})

    parts = rows.map_batches(dl_partial, batch_format="pyarrow").take_all()
    # a doc's rows never split across batches (term_rows emits per input
    # row), so per-batch distinct-doc partials sum exactly
    n_docs = sum(p["n"] for p in parts)
    dl_sum = sum(p["dl_sum"] for p in parts)
    with open(os.path.join(out, "_stats.json"), "w", encoding="utf-8") as f:
        json.dump({"n_docs": n_docs, "dl_sum": dl_sum,
                   "n_shards": n_shards, "block_span": block_span}, f)
    with open(marker, "w", encoding="utf-8"):
        pass
    return out


def _read_shards(index_dir: str, shards: set[int], columns: list[str]):
    import ray.data as rd
    paths = []
    for s in sorted(shards):
        d = os.path.join(index_dir, f"shard={s}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    return rd.read_parquet(paths, columns=columns) if paths else None


def bm25_topk(index_dir: str, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              round_to: int = 4, tantivy_norms: bool = False):
    """BM25 top-k over the built index — reads ONLY the query terms' shards.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (the Lucene BM25 variant —
    also exactly Tantivy's ``ln(1 + (N − df + 0.5)/(df + 0.5))``);
    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    ``tantivy_norms=True`` scores with Tantivy's exact parameterization
    (the Pulse serving surface, `pulse/src/main.rs:45-54`): the per-doc
    length is quantized through the one-byte fieldnorm encoding
    (`stages/fieldnorm.py`, identity for dl ≤ 15) while ``avgdl`` stays
    the exact segment total — matching ``Bm25Weight``'s 256-entry norm
    cache.  Default False keeps exact lengths (a strictly more faithful
    score; the option exists for ranked-list parity with Tantivy).
    """
    import ray

    with open(os.path.join(index_dir, "_stats.json"), encoding="utf-8") as f:
        stats = json.load(f)
    n_docs, avgdl = stats["n_docs"], stats["dl_sum"] / stats["n_docs"]
    n_shards = stats["n_shards"]

    import pyarrow.compute as _pc

    terms = sorted(set(t.lower() for t in query_terms))
    shards = {_shard_of(t, n_shards) for t in terms}

    # pass 1 — columnar-pruned (term, df) read: postings are (term,
    # doc-block) sub-lists, so term-total df for the idf is the sum of the
    # matched blocks' dfs (a handful of rows; the list columns never load)
    df_ds = _read_shards(index_dir, shards, ["term", "df"])
    if df_ds is None:
        import ray.data as rd
        return rd.from_items([])
    want_arr = pa.array(terms, pa.string())
    df_rows = df_ds.map_batches(
        lambda t: t.filter(_pc.is_in(t["term"], value_set=want_arr)),
        batch_format="pyarrow").take_all()
    df_tot: dict[str, int] = {}
    for r in df_rows:
        df_tot[r["term"]] = df_tot.get(r["term"], 0) + int(r["df"])

    probe = _read_shards(index_dir, shards,
                         ["term", "doc_ids", "tfs", "dls"])
    idf_ref = ray.put({t: float(np.log((n_docs - df + 0.5)
                                       / (df + 0.5) + 1.0))
                       for t, df in df_tot.items()})

    def score(batch: pa.Table) -> pa.Table:
        idf_of = ray.get(idf_ref)
        ids_out, sc_out = [], []
        for term, dids, tfs, dls in zip(
                batch["term"].to_pylist(),
                batch["doc_ids"].to_pylist(), batch["tfs"].to_pylist(),
                batch["dls"].to_pylist()):
            idf = idf_of.get(term)
            if idf is None:
                continue
            tf = np.asarray(tfs, np.float64)
            dl = np.asarray(dls, np.float64)
            if tantivy_norms:
                from .fieldnorm import quantize_dl
                dl = quantize_dl(np.asarray(dls, np.int64)).astype(np.float64)
            s = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids_out.append(np.asarray(dids, np.int64))
            sc_out.append(s)
        if not ids_out:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "partial": pa.array([], pa.float64())})
        return pa.table({id_col: pa.array(np.concatenate(ids_out),
                                          pa.int64()),
                         "partial": pa.array(np.concatenate(sc_out),
                                             pa.float64())})

    from ray.data.aggregate import Sum
    import pyarrow.compute as pc

    agg = (probe.map_batches(score, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("partial", alias_name="score")))
    rounded = agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pa.array(round_half_away(
                t["score"].to_numpy(zero_copy_only=False), round_to),
                pa.float64())),
        batch_format="pyarrow")
    return rounded.sort(["score", id_col],
                        descending=[True, False]).limit(k)


def build_fielded_index(ds, cache_key: str, fields: list[tuple[str, str]],
                        n_shards: int = 16, id_col: str = "doc_id",
                        attr_cols: list[str] | None = None,
                        cache_root: str = CACHE_DIR,
                        block_span: int = DEFAULT_BLOCK_SPAN) -> str:
    """Multi-field inverted index — the Pulse QueryParser analog.

    Pulse indexes a field schema and searches ``[title, content,
    meta_tags, language]`` with per-field weighting
    (`pulse/src/main.rs:45-54`, `pulse/src/bin/server.rs:165-173`); the
    website adds ``NOT nsfw:true``
    (`website/src/lib/server/search.ts:102-124`).  Here:

    - ``fields`` is ``[(field_name, source_column), ...]``; each field
      gets its own postings (per-field df / dl / avgdl, Lucene-style).
    - ``attr_cols`` are doc-level filter attributes (language, nsfw flag)
      that RIDE WITH the posting sub-lists as parallel arrays — filtered
      search needs no corpus-side join, only the same pruned shard reads.
    - layout/sharding identical to :func:`build_text_index` ((shard,
      doc-block) groups bound every shuffle group and posting row).
    """
    attr_cols = attr_cols or []
    out = os.path.join(cache_root, cache_key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    field_names = [f for f, _ in fields]

    def rows_batch(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in
                                 ["field", "term", id_col, "tf", "dl",
                                  "shard"] + [f"a_{c}" for c in attr_cols]}
        ids = batch[id_col].to_pylist()
        attrs = {c: batch[c].to_pylist() for c in attr_cols}
        for fname, src in fields:
            texts = batch[src].to_pylist()
            for row_i, (i, t) in enumerate(zip(ids, texts)):
                toks = TEXT_TOKEN.findall((t or "").lower())
                if not toks:
                    continue
                dl = len(toks)
                for term, tf in Counter(toks).items():
                    cols["field"].append(fname)
                    cols["term"].append(term)
                    cols[id_col].append(i)
                    cols["tf"].append(tf)
                    cols["dl"].append(dl)
                    cols["shard"].append(_shard_of(term, n_shards))
                    for c in attr_cols:
                        cols[f"a_{c}"].append(attrs[c][row_i])
        import pyarrow.compute as pc
        id_arr = pa.array(cols[id_col], pa.int64())
        tbl = {
            "field": pa.array(cols["field"], pa.string()),
            "term": pa.array(cols["term"], pa.string()),
            id_col: id_arr,
            "tf": pa.array(cols["tf"], pa.int64()),
            "dl": pa.array(cols["dl"], pa.int64()),
            "shard": pa.array(cols["shard"], pa.int32()),
            "block": pc.cast(pc.divide(id_arr,
                                       pa.scalar(block_span, pa.int64())),
                             pa.int32()),
        }
        for c in attr_cols:
            tbl[f"a_{c}"] = pa.array(cols[f"a_{c}"])
        return pa.table(tbl)

    rows = ds.map_batches(rows_batch, batch_format="pyarrow")

    a_names = [f"a_{c}" for c in attr_cols]

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["field", "term", id_col], kind="mergesort")
        spec = dict(df=(id_col, "size"), total_tf=("tf", "sum"),
                    doc_ids=(id_col, list), tfs=("tf", list),
                    dls=("dl", list), shard=("shard", "first"),
                    block=("block", "first"))
        for a in a_names:
            spec[a] = (a, list)
        agg = g.groupby(["field", "term"], sort=False).agg(**spec)
        return agg.reset_index()

    postings = rows.groupby(["shard", "block"]).map_groups(
        assemble, batch_format="pandas")
    postings.write_parquet(out, partition_cols=["shard"])

    # per-field stats: docs-with-tokens + dl sums (tiny partials)
    def dl_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"field": b["field"].to_pylist(),
                           id_col: b[id_col].to_pylist(),
                           "dl": b["dl"].to_pylist()})
        u = (df.drop_duplicates(["field", id_col])
             .groupby("field", sort=False)
             .agg(n=(id_col, "size"), dl_sum=("dl", "sum")).reset_index())
        return pa.table({"field": pa.array(u["field"], pa.string()),
                         "n": pa.array(u["n"], pa.int64()),
                         "dl_sum": pa.array(u["dl_sum"], pa.int64())})

    per_field: dict[str, list[int]] = {f: [0, 0] for f in field_names}
    for r in rows.map_batches(dl_partial, batch_format="pyarrow").take_all():
        per_field[r["field"]][0] += r["n"]
        per_field[r["field"]][1] += r["dl_sum"]
    with open(os.path.join(out, "_stats.json"), "w", encoding="utf-8") as f:
        json.dump({"fields": {fn: {"n_docs": v[0], "dl_sum": v[1]}
                              for fn, v in per_field.items()},
                   "attr_cols": attr_cols, "n_shards": n_shards,
                   "block_span": block_span}, f)
    with open(marker, "w", encoding="utf-8"):
        pass
    return out


def bm25_fielded_topk(index_dir: str, query_terms: list[str], k: int = 10,
                      boosts: dict[str, float] | None = None,
                      language: str | None = None,
                      lang_attr: str = "lang",
                      exclude_attr: str | None = None,
                      k1: float = 1.2, b: float = 0.75,
                      id_col: str = "doc_id", round_to: int = 4):
    """Fielded BM25: ``score(d) = Σ_f boost_f · BM25_f(d)``, doc filters
    applied inline (Pulse's ``AND language:xx`` rewrite and the website's
    ``NOT nsfw:true`` — implemented as pure filters, no score
    contribution, the standard IR reading).  Reads ONLY the query terms'
    shards, both passes columnar-pruned; filters use the attribute arrays
    that ride with the postings, so no corpus join ever happens.
    """
    import ray

    with open(os.path.join(index_dir, "_stats.json"), encoding="utf-8") as f:
        stats = json.load(f)
    n_shards = stats["n_shards"]
    fstats = stats["fields"]
    boosts = boosts or {fn: 1.0 for fn in fstats}

    import pyarrow.compute as _pc

    terms = sorted(set(t.lower() for t in query_terms))
    shards = {_shard_of(t, n_shards) for t in terms}

    df_ds = _read_shards(index_dir, shards, ["field", "term", "df"])
    if df_ds is None:
        import ray.data as rd
        return rd.from_items([])
    want_arr = pa.array(terms, pa.string())
    df_tot: dict[tuple[str, str], int] = {}
    for r in df_ds.map_batches(
            lambda t: t.filter(_pc.is_in(t["term"], value_set=want_arr)),
            batch_format="pyarrow").take_all():
        key = (r["field"], r["term"])
        df_tot[key] = df_tot.get(key, 0) + int(r["df"])
    idf = {}
    for (fn, t), df in df_tot.items():
        n_docs = fstats[fn]["n_docs"]
        idf[(fn, t)] = float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
    avgdl = {fn: (s["dl_sum"] / s["n_docs"] if s["n_docs"] else 1.0)
             for fn, s in fstats.items()}

    probe_cols = ["field", "term", "doc_ids", "tfs", "dls"]
    if language is not None:
        probe_cols.append(f"a_{lang_attr}")
    if exclude_attr is not None:
        probe_cols.append(f"a_{exclude_attr}")
    probe = _read_shards(index_dir, shards, probe_cols)
    ctx_ref = ray.put((idf, avgdl, dict(boosts)))

    def score(batch: pa.Table) -> pa.Table:
        idf_of, avgdl_of, boost_of = ray.get(ctx_ref)
        ids_out, sc_out = [], []
        langs = (batch[f"a_{lang_attr}"].to_pylist()
                 if language is not None else None)
        excl = (batch[f"a_{exclude_attr}"].to_pylist()
                if exclude_attr is not None else None)
        for ri, (fn, term, dids, tfs, dls) in enumerate(zip(
                batch["field"].to_pylist(), batch["term"].to_pylist(),
                batch["doc_ids"].to_pylist(), batch["tfs"].to_pylist(),
                batch["dls"].to_pylist())):
            key_idf = idf_of.get((fn, term))
            boost = boost_of.get(fn, 0.0)
            if key_idf is None or boost == 0.0:
                continue
            tf = np.asarray(tfs, np.float64)
            dl = np.asarray(dls, np.float64)
            keep = np.ones(len(tf), dtype=bool)
            if langs is not None:
                keep &= np.asarray(
                    [v == language for v in langs[ri]], dtype=bool)
            if excl is not None:
                keep &= ~np.asarray(excl[ri], dtype=bool)
            if not keep.any():
                continue
            s = (boost * key_idf * tf * (k1 + 1.0)
                 / (tf + k1 * (1.0 - b + b * dl / avgdl_of[fn])))
            ids_out.append(np.asarray(dids, np.int64)[keep])
            sc_out.append(s[keep])
        if not ids_out:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "partial": pa.array([], pa.float64())})
        return pa.table({id_col: pa.array(np.concatenate(ids_out),
                                          pa.int64()),
                         "partial": pa.array(np.concatenate(sc_out),
                                             pa.float64())})

    from ray.data.aggregate import Sum
    import pyarrow.compute as pc

    agg = (probe.map_batches(score, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("partial", alias_name="score")))
    rounded = agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score",
            pa.array(round_half_away(
                t["score"].to_numpy(zero_copy_only=False), round_to),
                pa.float64())),
        batch_format="pyarrow")
    return rounded.sort(["score", id_col],
                        descending=[True, False]).limit(k)


def index_summary(index_dir: str):
    """(term, df, total_tf) summary — block-level rows summed per term."""
    from ray.data.aggregate import Sum
    with open(os.path.join(index_dir, "_stats.json"), encoding="utf-8") as f:
        n_shards = json.load(f)["n_shards"]
    ds = _read_shards(index_dir, set(range(n_shards)),
                      ["term", "df", "total_tf"])
    assert ds is not None
    return (ds.groupby("term")
            .aggregate(Sum("df", alias_name="df"),
                       Sum("total_tf", alias_name="total_tf")))


def tfidf_keywords(ds, k: int = 5, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Per-document keyword extraction: top-``k`` terms by tf-idf.

    Ranking uses an INTEGER surrogate — ``score_micro = tf *
    round(ln(n_docs / df) * 1e6)`` — so the top-k selection is exact on
    both the engine and the DuckDB oracle side (ranking raw float
    products risks near-tie rank flips between engines; exact ties break
    on term asc).  The (term, df) table reaches the driver as one
    aggregate — O(vocab) rows, the same broadcast-size envelope as the
    unigram model (cap the vocab the same way past ~10^7 distinct
    terms).  Top-k per doc happens inside the scoring batch — no per-doc
    shuffle at all.  Output: (id, term, tf, score_micro).
    """
    import math

    import ray

    def df_partial(b: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for t in b[text_col].to_pylist():
            c.update(set(TEXT_TOKEN.findall((t or "").lower())))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    df_rows = (ds.map_batches(df_partial, batch_format="pyarrow")
               .groupby("term").sum("df").take_all())
    n_docs = ds.count()
    idf_micro = {r["term"]: iround_half_away(
        math.log(n_docs / r["sum(df)"]) * 1_000_000) for r in df_rows}
    idf_ref = ray.put(idf_micro)

    def score(b: pa.Table) -> pa.Table:
        from collections import Counter
        idf = ray.get(idf_ref)
        ids, terms, tfs, scores = [], [], [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            tf = Counter(TEXT_TOKEN.findall((t or "").lower()))
            ranked = sorted(
                ((tf_v * idf[w], w, tf_v) for w, tf_v in tf.items()),
                key=lambda x: (-x[0], x[1]))[:k]
            for s, w, tf_v in ranked:
                ids.append(i)
                terms.append(w)
                tfs.append(tf_v)
                scores.append(s)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "score_micro": pa.array(scores, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def suggest_terms(ds, queries: list[str], max_dist: int = 2, k: int = 5,
                  text_col: str = "text") -> "pd.DataFrame":
    """Spell suggestions ("did you mean"): for each query term, the
    top-k corpus vocabulary terms within Levenshtein distance
    ``max_dist``, ranked by (distance ASC, frequency DESC, term ASC).

    Serving-path sibling of autocomplete (the reference's search UI
    rewrites queries; SURVEY §2 K7 is the prefix variant, this is the
    edit-distance variant).  Distributed shape:

    1. corpus term frequencies — per-block Counter partials folded by
       dataset_tools.group_sum (data-scaled key rule, never a generic
       Aggregate),
    2. the tiny query list rides into every vocab block; a vectorized
       length-band prefilter (|len(term) - len(q)| <= max_dist) drops
       most of the vocab before the banded DP (dedup._lev_band — the
       same kernel fuzzy_dup_pairs oracles against DuckDB),
    3. per-block top-k partials -> driver fold of O(queries x k x
       blocks) rows.
    """
    import pandas as pd

    from .dataset_tools import group_sum
    from .dedup import _lev_band

    def counts(t: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for txt in t[text_col].to_pylist():
            c.update(TEXT_TOKEN.findall((txt or "").lower()))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "freq": pa.array(list(c.values()), pa.int64())})

    vocab = group_sum(ds.map_batches(counts, batch_format="pyarrow"),
                      "term", ["freq"])

    def match_block(t: pa.Table) -> pa.Table:
        import numpy as np
        terms = t["term"].to_pylist()
        freqs = t["freq"].to_pylist()
        lens = np.array([len(w) for w in terms])
        out = {"query": [], "term": [], "dist": [], "freq": []}
        for q in queries:
            band = np.flatnonzero(np.abs(lens - len(q)) <= max_dist)
            cand = sorted(
                ((d, -freqs[i], terms[i])
                 for i in band
                 if (d := _lev_band(q, terms[i], max_dist))
                 <= max_dist),
            )[:k]
            for d, nf, w in cand:
                out["query"].append(q)
                out["term"].append(w)
                out["dist"].append(d)
                out["freq"].append(-nf)
        return pa.table({"query": pa.array(out["query"], pa.string()),
                         "term": pa.array(out["term"], pa.string()),
                         "dist": pa.array(out["dist"], pa.int64()),
                         "freq": pa.array(out["freq"], pa.int64())})

    rows = vocab.map_batches(match_block,
                             batch_format="pyarrow").take_all()
    df = pd.DataFrame(rows, columns=["query", "term", "dist", "freq"])
    df = (df.sort_values(["query", "dist", "freq", "term"],
                         ascending=[True, True, False, True])
          .groupby("query", as_index=False).head(k)
          .reset_index(drop=True))
    for c in ("dist", "freq"):
        df[c] = df[c].astype("int64")
    return df
