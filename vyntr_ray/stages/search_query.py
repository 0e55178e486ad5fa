"""Tantivy-QueryParser-style phrase + boolean search over the text index.

The reference serves full query syntax through Tantivy's QueryParser
(`pulse/src/bin/server.rs:165-173`): quoted phrases, AND/OR trees and
NOT/``-`` exclusions over the indexed fields.  Round 3 covered fielded
term search (:mod:`search_index`); this module adds the query-language
layer, Ray-Data-first:

- **positional index** — :func:`build_positional_index` extends the
  (shard, doc-block) posting layout with a per-(term, doc) token-position
  list, the standard phrase-query substrate (Lucene/Tantivy store the
  same).  Layout, sharding and boundedness are identical to
  ``build_text_index`` — positions add O(total_tf) ints spread over the
  same bounded sub-lists.
- **phrase match** — a k-term phrase matches doc d with frequency
  ``|∩_i (positions_i - i)|`` (adjacent offsets).  Verified distributedly:
  pruned shard reads for the phrase's terms only, exploded to (doc, term
  slot, positions) rows, ONE hash-partition groupby(doc), vectorized
  intersection per candidate doc.  Candidates are bounded by the phrase
  terms' postings, never the corpus.
- **boolean queries** — :func:`parse_query` builds OR-of-groups:
  ``a b`` / ``a AND b`` conjoin within a group, ``OR`` splits groups,
  ``-x`` / ``NOT x`` excludes, ``"a b"`` embeds a phrase node.  A doc
  matches if ANY group has all its positive nodes and none of its
  negatives.  Evaluation is the flag-aggregation shape (one groupby over
  (doc, node) presence rows), not a driver set op.

Scoring is an INTEGER surrogate so the DuckDB oracle compares exactly
(the ``tfidf_keywords`` precedent): ``idf_micro(node) = round(ln((N - df
+ 0.5) / (df + 0.5) + 1) · 1e6)`` and ``score_micro(d) = Σ tf_node(d) ·
idf_micro(node)`` over the query's DISTINCT positive nodes — both sides
compute the identical double before the one round.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from ..rounding import iround_half_away
from .search_index import (CACHE_DIR, DEFAULT_BLOCK_SPAN, TEXT_TOKEN,
                           _read_shards, _shard_of)

__all__ = ["build_positional_index", "parse_query", "phrase_match",
           "jaccard_rerank",
           "boolean_search"]


# --------------------------------------------------------------------------
# query parser
# --------------------------------------------------------------------------

def parse_query(q: str) -> list[dict]:
    """Parse a Tantivy-flavored query into OR-groups.

    Returns ``[{"must": [node, ...], "must_not": [node, ...]}, ...]``
    where node is ``("term", t)`` or ``("phrase", (t1, ..., tk))``.
    Grammar: ``OR`` (upper-case) splits groups; within a group,
    whitespace and ``AND`` conjoin; a leading ``-`` or a preceding
    ``NOT`` negates; ``"..."`` is a phrase; terms are lower-cased and
    tokenized with the index's token pattern.
    """
    import re as _re

    toks = _re.findall(r'"[^"]*"|\S+', q)
    groups: list[dict] = [{"must": [], "must_not": []}]
    neg = False
    for raw in toks:
        if raw == "OR":
            groups.append({"must": [], "must_not": []})
            neg = False
            continue
        if raw == "AND":
            continue
        if raw == "NOT":
            neg = True
            continue
        if raw.startswith("-") and len(raw) > 1:
            neg, raw = True, raw[1:]
        elif raw.startswith("+") and len(raw) > 1:
            raw = raw[1:]
        if raw.startswith('"'):
            terms = tuple(TEXT_TOKEN.findall(raw.strip('"').lower()))
            node = (("phrase", terms) if len(terms) > 1
                    else ("term", terms[0]) if terms else None)
        else:
            terms = TEXT_TOKEN.findall(raw.lower())
            node = ("term", terms[0]) if terms else None
        if node is not None:
            groups[-1]["must_not" if neg else "must"].append(node)
        neg = False
    return [g for g in groups if g["must"] or g["must_not"]]


# --------------------------------------------------------------------------
# positional index
# --------------------------------------------------------------------------

def build_positional_index(ds, cache_key: str, n_shards: int = 16,
                           id_col: str = "doc_id", text_col: str = "text",
                           cache_root: str = CACHE_DIR,
                           block_span: int = DEFAULT_BLOCK_SPAN) -> str:
    """``build_text_index`` + a per-(term, doc) position list."""
    out = os.path.join(cache_root, cache_key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def rows_batch(batch: pa.Table) -> pa.Table:
        ids, terms, tfs, dls, shards, poss = [], [], [], [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = TEXT_TOKEN.findall((t or "").lower())
            if not toks:
                continue
            dl = len(toks)
            by_term: dict[str, list[int]] = {}
            for p, tok in enumerate(toks):
                by_term.setdefault(tok, []).append(p)
            for term, plist in by_term.items():
                ids.append(i)
                terms.append(term)
                tfs.append(len(plist))
                dls.append(dl)
                shards.append(_shard_of(term, n_shards))
                poss.append(plist)
        import pyarrow.compute as pc
        id_arr = pa.array(ids, pa.int64())
        return pa.table({
            "term": pa.array(terms, pa.string()),
            id_col: id_arr,
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
            "positions": pa.array(poss, pa.list_(pa.int64())),
            "shard": pa.array(shards, pa.int32()),
            "block": pc.cast(pc.divide(id_arr,
                                       pa.scalar(block_span, pa.int64())),
                             pa.int32()),
        })

    rows = ds.map_batches(rows_batch, batch_format="pyarrow")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="mergesort")
        agg = g.groupby("term", sort=False).agg(
            df=(id_col, "size"), total_tf=("tf", "sum"),
            doc_ids=(id_col, list), tfs=("tf", list), dls=("dl", list),
            positions=("positions", lambda s: [list(x) for x in s]),
            shard=("shard", "first"), block=("block", "first"))
        return agg.reset_index()

    postings = rows.groupby(["shard", "block"]).map_groups(
        assemble, batch_format="pandas")
    postings.write_parquet(out, partition_cols=["shard"])

    def dl_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({id_col: b[id_col].to_pylist(),
                           "dl": b["dl"].to_pylist()})
        u = df.drop_duplicates(id_col)
        return pa.table({"n": pa.array([len(u)], pa.int64()),
                         "dl_sum": pa.array([int(u["dl"].sum())],
                                            pa.int64())})

    parts = rows.map_batches(dl_partial, batch_format="pyarrow").take_all()
    n_docs = sum(p["n"] for p in parts)
    dl_sum = sum(p["dl_sum"] for p in parts)
    with open(os.path.join(out, "_stats.json"), "w", encoding="utf-8") as f:
        json.dump({"n_docs": n_docs, "dl_sum": dl_sum,
                   "n_shards": n_shards, "block_span": block_span,
                   "positional": True}, f)
    with open(marker, "w", encoding="utf-8"):
        pass
    return out


def _stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_stats.json"), encoding="utf-8") as f:
        return json.load(f)


# --------------------------------------------------------------------------
# phrase match
# --------------------------------------------------------------------------

def phrase_match(index_dir: str, phrase: list[str],
                 id_col: str = "doc_id", n_parts: int = 32):
    """(doc_id, phrase_tf) for docs containing the adjacent phrase.

    Pruned shard reads for the phrase's terms only → (doc, slot,
    positions) rows → ONE hash-partition groupby(doc) → per-candidate
    vectorized offset intersection.  Returns a Dataset.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    terms = [t.lower() for t in phrase]
    k_terms = len(terms)
    st = _stats(index_dir)
    shards = {_shard_of(t, st["n_shards"]) for t in terms}
    probe = _read_shards(index_dir, shards,
                         ["term", "doc_ids", "positions"])
    if probe is None:
        return rd.from_items([])
    # a term repeated in the phrase ("batch batch") occupies SEVERAL
    # slots — its one posting row fans out to every slot it fills
    slots_by_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        slots_by_term.setdefault(t, []).append(i)
    want = pa.array(sorted(slots_by_term), pa.string())

    def explode(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["term"], value_set=want))
        docs, slots, poss = [], [], []
        for term, dids, plists in zip(b["term"].to_pylist(),
                                      b["doc_ids"].to_pylist(),
                                      b["positions"].to_pylist()):
            for slot in slots_by_term[term]:
                for d, pl in zip(dids, plists):
                    docs.append(d)
                    slots.append(slot)
                    poss.append(pl)
        return pa.table({
            id_col: pa.array(docs, pa.int64()),
            "slot": pa.array(slots, pa.int32()),
            "pos": pa.array(poss, pa.list_(pa.int64()))})

    from .joins import _part_col

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t[id_col], n_parts))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # candidates must hold every slot (a term repeated in the phrase
        # occupies several slots but ships one posting row — dedup first)
        g = g.drop_duplicates(subset=[id_col, "slot"])
        counts = g.groupby(id_col, sort=False)["slot"].transform("nunique")
        g = g[counts == k_terms]
        out_docs, out_tf = [], []
        for doc, sub in g.groupby(id_col, sort=False):
            base = None
            for slot in range(k_terms):
                pos = np.asarray(
                    sub.loc[sub["slot"] == slot, "pos"].iloc[0], np.int64)
                off = pos - slot
                base = off if base is None else np.intersect1d(
                    base, off, assume_unique=True)
                if base.size == 0:
                    break
            if base is not None and base.size:
                out_docs.append(doc)
                out_tf.append(int(base.size))
        return pd.DataFrame({id_col: np.asarray(out_docs, np.int64),
                             "phrase_tf": np.asarray(out_tf, np.int64)})

    return (probe.map_batches(explode, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: verify(g.drop(columns="_part")),
                        batch_format="pandas"))


# --------------------------------------------------------------------------
# boolean search
# --------------------------------------------------------------------------

def boolean_search(index_dir: str, query: str, k: int = 10,
                   id_col: str = "doc_id", n_parts: int = 32):
    """Top-k docs matching a Tantivy-style boolean query.

    Output (doc_id, score_micro), score desc / id asc, limit k.  A doc
    matches if ANY OR-group has all positive nodes present and no
    negative node; ``score_micro = Σ tf · idf_micro`` over the query's
    distinct positive nodes present in the doc (integer-exact — see
    module docstring).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    groups = parse_query(query)
    st = _stats(index_dir)
    n_docs = st["n_docs"]

    # node inventory: nid -> node; per-group positive/negative nid sets
    nodes: list[tuple] = []
    nid_of: dict[tuple, int] = {}

    def intern(node: tuple) -> int:
        if node not in nid_of:
            nid_of[node] = len(nodes)
            nodes.append(node)
        return nid_of[node]

    g_pos, g_neg = [], []
    for g in groups:
        g_pos.append(sorted({intern(n) for n in g["must"]}))
        g_neg.append(sorted({intern(n) for n in g["must_not"]}))
    positive_nids = sorted({n for g in g_pos for n in g})

    # (doc, nid, tf) rows per node — pruned term reads; phrases via the
    # positional verify (each a small bounded Dataset)
    term_nodes = {nid: n[1] for nid, n in enumerate(nodes)
                  if n[0] == "term"}
    phrase_nodes = {nid: n[1] for nid, n in enumerate(nodes)
                    if n[0] == "phrase"}

    parts = []
    if term_nodes:
        shards = {_shard_of(t, st["n_shards"])
                  for t in term_nodes.values()}
        probe = _read_shards(index_dir, shards, ["term", "doc_ids", "tfs"])
        nid_by_term: dict[str, list[int]] = {}
        for nid, t in term_nodes.items():
            nid_by_term.setdefault(t, []).append(nid)
        want = pa.array(sorted(nid_by_term), pa.string())

        def explode(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b["term"], value_set=want))
            docs, nids, tfs = [], [], []
            for term, dids, tfl in zip(b["term"].to_pylist(),
                                       b["doc_ids"].to_pylist(),
                                       b["tfs"].to_pylist()):
                for nid in nid_by_term[term]:
                    docs.extend(dids)
                    nids.extend([nid] * len(dids))
                    tfs.extend(tfl)
            return pa.table({id_col: pa.array(docs, pa.int64()),
                             "nid": pa.array(nids, pa.int32()),
                             "tf": pa.array(tfs, pa.int64())})

        if probe is not None:
            parts.append(probe.map_batches(explode,
                                           batch_format="pyarrow"))
    for nid, terms in phrase_nodes.items():
        pm = phrase_match(index_dir, list(terms), id_col=id_col,
                          n_parts=n_parts)

        def tag(b: pa.Table, _nid=nid) -> pa.Table:
            return pa.table({
                id_col: b[id_col],
                "nid": pa.array(np.full(b.num_rows, _nid, np.int32)),
                "tf": b["phrase_tf"]})

        parts.append(pm.map_batches(tag, batch_format="pyarrow"))

    if not parts:
        return rd.from_items([])
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.union(p)
    rows = rows.materialize()   # consumed twice: df count + evaluation

    # node df (docs containing the node) -> idf_micro, O(nodes) driver rows
    import ray
    from ray.data.aggregate import Count

    df_rows = (rows.groupby("nid").aggregate(Count(alias_name="df"))
               .take_all())
    idf_micro = np.zeros(len(nodes), np.int64)
    for r in df_rows:
        df = int(r["df"])
        idf_micro[r["nid"]] = iround_half_away(
            float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)) * 1e6)
    ctx_ref = ray.put((idf_micro, [set(g) for g in g_pos],
                       [set(g) for g in g_neg], set(positive_nids)))

    from .joins import _part_col

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t[id_col], n_parts))

    def evaluate(g: pd.DataFrame) -> pd.DataFrame:
        idf, pos_sets, neg_sets, pos_all = ray.get(ctx_ref)
        out_docs, out_sc = [], []
        for doc, sub in g.groupby(id_col, sort=False):
            present = dict(zip(sub["nid"].to_numpy(),
                               sub["tf"].to_numpy()))
            matched = any(
                all(n in present for n in ps)
                and not any(n in present for n in ns)
                for ps, ns in zip(pos_sets, neg_sets))
            if not matched:
                continue
            sc = sum(int(tf) * int(idf[n]) for n, tf in present.items()
                     if n in pos_all)
            out_docs.append(doc)
            out_sc.append(sc)
        return pd.DataFrame({id_col: np.asarray(out_docs, np.int64),
                             "score_micro": np.asarray(out_sc, np.int64)})

    scored = (rows.map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(lambda g: evaluate(g.drop(columns="_part")),
                          batch_format="pandas"))
    return scored.sort(["score_micro", id_col],
                       descending=[True, False]).limit(k)


def jaccard_rerank(ds, query_terms: list[str], k: int = 20,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Retrieve-wide / rerank-exact: OR-candidate recall (any query term
    present) then top-k by exact token-set Jaccard — the classical
    second-stage reranker shape (a cross-encoder would slot into the
    same stage; this scorer is deterministic so the oracle can replay
    it).

    Integer exactness: Jaccard = inter/union is a ratio of small ints,
    so both sides rank on ``score_micro = (inter · 1e6) // union``
    (DuckDB ``//`` floors identically on non-negative BIGINTs), ties
    broken by doc id — a total order, stable at the k boundary.
    Candidate generation is a stateless vectorized-per-doc map (set
    intersection against the broadcast-in-closure query set — O(|Q|)
    per doc, never per pair); only matching docs enter the distributed
    ``sort().limit(k)``, whose input is bounded by the posting mass of
    the query terms, not the corpus."""
    qset = frozenset(t.lower() for t in query_terms)
    qn = len(qset)

    def score(t: pa.Table) -> pa.Table:
        ids, inters, unis, scores = [], [], [], []
        for i, txt in enumerate(t[text_col].to_pylist()):
            toks = set(TEXT_TOKEN.findall((txt or "").lower()))
            inter = len(qset & toks)
            if inter == 0:
                continue
            uni = len(toks) + qn - inter
            ids.append(i)
            inters.append(inter)
            unis.append(uni)
            scores.append(inter * 1_000_000 // uni)
        return pa.table({
            id_col: t[id_col].take(pa.array(ids, pa.int64())),
            "inter": pa.array(inters, pa.int64()),
            "uni": pa.array(unis, pa.int64()),
            "score_micro": pa.array(scores, pa.int64()),
        })

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["score_micro", id_col], descending=[True, False])
            .limit(k))
