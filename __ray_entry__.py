"""Driver contract for the vyntr_ray engine (Ray Data target).

``entry()`` runs the flagship crawl pipeline; ``queries()`` registers one
callable per implemented operator/pipeline from SURVEY.md §2 (plus the
training-data additions); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible entry.  Ray is initialised by the driver — nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _rd():
    import ray.data as rd
    return rd


def _concat_refs(ds, schema: pa.Schema) -> pa.Table:
    """``concat_tables`` over a small Dataset's pinned block refs,
    tolerating EMPTY blocks: a fully-filtered block degrades to a
    schema-less zero-column table, and ``pa.concat_tables`` refuses to
    mix schemas.  ``schema`` also covers the all-empty case."""
    import ray
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs)


def _read(sf_dir: str, table: str, **kw):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", **kw)


def _round_ha(x, ndigits: int = 0) -> pa.Array:
    """round() with DuckDB semantics: half-AWAY-from-zero, bit-exact.

    ``pc.round`` defaults to half-to-even (banker's), DuckDB ``round`` is
    half-away (``round(15010.5)`` → 15011, pc default → 15010).  Every
    centi/dmilli integer-scaling site must use this so ties in the
    driver's data round identically on the engine and oracle side.  See
    ``vyntr_ray/rounding.py`` for why pyarrow's own
    ``half_towards_infinity`` mode is not exact enough.
    """
    from vyntr_ray.rounding import round_half_away
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    return pa.array(round_half_away(x.to_numpy(zero_copy_only=False),
                                    ndigits), pa.float64())


_BLOCKLIST = frozenset({"src1", "src7", "src13"})
_QDIM, _QSEED = 64, 7


def _qvec() -> np.ndarray:
    from vyntr_ray.stages.similarity import query_vector
    return query_vector(_QDIM, _QSEED)


def _planted_dup_docs(sf_dir: str):
    """documents ∪ perturbed copies of the 20 lowest doc_ids (near-dups).

    Copies drop the last word and get ids offset by 1_000_000 —
    deterministic planted near-duplicates for the minhash/simhash queries,
    reproducible in SQL (see ``_DUP_CORPUS_SQL``).
    """
    import pyarrow.parquet as pq
    tab = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    base = tab.to_pandas()
    dup = base.nsmallest(20, "doc_id").copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    dup["text"] = dup["text"].str.rsplit(" ", n=1).str[0]
    return _rd().from_pandas(pd.concat([base, dup], ignore_index=True))


# SQL mirror of _planted_dup_docs: ' [^ ]*$' strips everything after the
# LAST literal space — exactly str.rsplit(" ", 1)[0].
_DUP_CORPUS_SQL = """
    dup_corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               CASE WHEN strpos(text, ' ') > 0
                    THEN regexp_replace(text, ' [^ ]*$', '')
                    ELSE text END AS text
        FROM (SELECT doc_id, text FROM documents
              ORDER BY doc_id LIMIT 20)
    )
"""

# exact shingle-set n-gram machinery over dup_corpus (k = 3)
_SHINGLE_SQL = r"""
    tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
            FROM dup_corpus),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                       WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                       ELSE [array_to_string(toks[i:i+2], ' ')
                             for i in generate_series(1, len(toks) - 2)]
                  END AS shs
           FROM tok),
    shx AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
    sz AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY doc_id),
    ipair AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM shx x JOIN shx y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
"""


_CONTAINMENT_SQL = f"""
    WITH {_DUP_CORPUS_SQL}, {_SHINGLE_SQL},
    df AS (SELECT s, count(*) AS df FROM shx GROUP BY s),
    kept AS (SELECT shx.doc_id, shx.s FROM shx
             JOIN df USING (s) WHERE df.df <= 16),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM kept x JOIN kept y
              ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
    SELECT i.a, i.b,
           (i.inter * 1000000) // least(sa.n, sb.n) AS containment_ppm
    FROM inter i
    JOIN sz sa ON i.a = sa.doc_id
    JOIN sz sb ON i.b = sb.doc_id
    WHERE (i.inter * 1000000) // least(sa.n, sb.n) >= 900000
    ORDER BY a, b
"""


def _jaccard_pairs_sql(thr_ppm: int) -> str:
    """Exact pairwise n-gram-Jaccard oracle (integer ppm arithmetic)."""
    return f"""
        WITH {_DUP_CORPUS_SQL}, {_SHINGLE_SQL}
        SELECT i.a, i.b,
               (i.inter * 1000000) // (sa.n + sb.n - i.inter) AS jaccard_ppm
        FROM ipair i
        JOIN sz sa ON i.a = sa.doc_id
        JOIN sz sb ON i.b = sb.doc_id
        WHERE (i.inter * 1000000) // (sa.n + sb.n - i.inter) >= {thr_ppm}
    """


def _bfs_sql(k: int = 4) -> str:
    """Unrolled k-round BFS oracle over the shared doc graph: one
    (expand, min-fold) CTE pair per hop, BIGINT only — exact."""
    parts = ["""
        WITH e AS MATERIALIZED (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 2 AND a.doc_id > 0
            UNION ALL
            SELECT a.doc_id, b.doc_id
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 3 AND a.doc_id > 0),
        d0 AS MATERIALIZED (
            SELECT doc_id AS node, 0::BIGINT AS hop
            FROM documents WHERE doc_id % 100 = 1)"""]
    for i in range(k):
        parts.append(f""",
        c{i + 1} AS (SELECT e.v AS node, d.hop + 1 AS hop
                     FROM e JOIN d{i} d ON e.u = d.node),
        d{i + 1} AS MATERIALIZED (
            SELECT node, min(hop)::BIGINT AS hop FROM (
                SELECT * FROM d{i} UNION ALL SELECT * FROM c{i + 1})
            GROUP BY node)""")
    parts.append(f"""
        SELECT node, hop FROM d{k}""")
    return "".join(parts)


def _hits_sql(n_iter: int = 4) -> str:
    """Unrolled integer HITS oracle: one (auth, hub) CTE pair per
    round, BIGINT sums only — exact, no float tolerance needed
    (contrast _pagerank_sql's micro rounding)."""
    parts = ["""
        WITH e AS MATERIALIZED (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 2 AND a.doc_id > 0
            UNION ALL
            SELECT a.doc_id, b.doc_id
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 3 AND a.doc_id > 0),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e)),
        h0 AS MATERIALIZED (SELECT node, 1::BIGINT AS w FROM nodes)"""]
    for k in range(n_iter):
        parts.append(f""",
        a{k + 1} AS MATERIALIZED (
            SELECT nd.node, coalesce(s.sm, 0)::BIGINT AS w
            FROM nodes nd LEFT JOIN (
                SELECT e.v AS node, sum(h.w) AS sm
                FROM e JOIN h{k} h ON e.u = h.node GROUP BY e.v) s
            ON nd.node = s.node),
        h{k + 1} AS MATERIALIZED (
            SELECT nd.node, coalesce(s.sm, 0)::BIGINT AS w
            FROM nodes nd LEFT JOIN (
                SELECT e.u AS node, sum(a.w) AS sm
                FROM e JOIN a{k + 1} a ON e.v = a.node GROUP BY e.u) s
            ON nd.node = s.node)""")
    parts.append(f"""
        SELECT n.node, h.w AS hub, a.w AS auth
        FROM nodes n JOIN h{n_iter} h ON n.node = h.node
                     JOIN a{n_iter} a ON n.node = a.node""")
    return "".join(parts)


def _pagerank_sql(n_iter: int = 10, damping: float = 0.85) -> str:
    """Unrolled PageRank oracle: one CTE pair (dangling mass, next rank)
    per iteration, mirroring ``stages/graph.pagerank``'s float recurrence
    term-for-term.  All literals cast ::DOUBLE so DuckDB's decimal
    arithmetic never enters (1 - 0.85 must be the IEEE 0.15000000000000002,
    not decimal 0.15)."""
    d = f"{damping!r}::DOUBLE"
    parts = ["""
        WITH e AS MATERIALIZED (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 2 AND a.doc_id > 0
            UNION ALL
            SELECT a.doc_id, b.doc_id
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id * 3 AND a.doc_id > 0),
        deg AS MATERIALIZED (
            SELECT u AS node, count(*) AS outdeg FROM e GROUP BY u),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e)),
        nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
        pr0 AS MATERIALIZED (
            SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank
            FROM nodes)"""]
    for k in range(n_iter):
        parts.append(f""",
        dang{k} AS MATERIALIZED (
                    SELECT coalesce(sum(rank), 0.0::DOUBLE) AS dm
                    FROM pr{k}
                    WHERE node NOT IN (SELECT node FROM deg)),
        pr{k + 1} AS MATERIALIZED (
            SELECT nd.node,
                   (1.0::DOUBLE - {d}) / (SELECT n FROM nn)
                   + {d} * (coalesce(c.contrib, 0.0::DOUBLE)
                            + (SELECT dm FROM dang{k}) / (SELECT n FROM nn))
                       AS rank
            FROM nodes nd LEFT JOIN (
                SELECT e.v AS node, sum(p.rank / deg.outdeg) AS contrib
                FROM e JOIN pr{k} p ON e.u = p.node
                       JOIN deg ON deg.node = e.u
                GROUP BY e.v) c ON nd.node = c.node)""")
    parts.append(f"""
        SELECT node, CAST(round(rank * 1000000) AS BIGINT) AS rank_micro
        FROM pr{n_iter}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def _q_clean_content(sf_dir: str):
    from vyntr_ray.stages.clean import clean_documents
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return clean_documents(ds)


def _q_topk_largest(sf_dir: str):
    from vyntr_ray.stages.dataset_tools import topk_largest
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return topk_largest(ds, k=100)


def _q_remove_largest(sf_dir: str):
    from vyntr_ray.stages.dataset_tools import remove_largest
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return remove_largest(ds, k=100)


def _q_dedup_exact(sf_dir: str):
    from vyntr_ray.stages.dedup import dedup_exact
    return dedup_exact(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_dedup_prefix(sf_dir: str):
    from vyntr_ray.stages.dedup import dedup_by_key

    def key3(batch: pa.Table) -> pa.Array:
        keys = [" ".join((t or "").split()[:3])
                for t in batch["text"].to_pylist()]
        return pa.array(keys, pa.string())

    return dedup_by_key(_read(sf_dir, "documents", columns=["doc_id", "text"]),
                        key3)


def _q_token_totals(sf_dir: str):
    from vyntr_ray.stages.text_analysis import token_totals
    return token_totals(_read(sf_dir, "documents", columns=["lang", "text"]))


def _q_quality(sf_dir: str):
    from vyntr_ray.stages.text_analysis import quality_batch
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(quality_batch, batch_format="pyarrow")
            .drop_columns(["text"]))


def _q_fingerprints(sf_dir: str):
    from vyntr_ray.stages.text_analysis import fingerprint_batch
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(fingerprint_batch, batch_format="pyarrow")
            .drop_columns(["text"]))


def _q_decontaminate(sf_dir: str):
    """Eval-leakage guard: word-3-gram overlap vs a held-out benchmark
    split (docs with doc_id % 97 == 0); reports matched-instance counts
    for contaminated corpus docs.  Broadcast small-side semi-join."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.text_analysis import (benchmark_ngrams,
                                                contamination_report)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy() % 97 == 0
            return t.filter(pa.array(m if want_bench else ~m))
        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    grams = benchmark_ngrams(bench, n=3)
    rep = contamination_report(corpus, grams, n=3)
    return rep.map_batches(
        lambda t: t.filter(pc.greater(t["n_matched"], 0)),
        batch_format="pyarrow")


def _q_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document."""
    from vyntr_ray.stages.text_analysis import repetition_batch
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(repetition_batch, batch_format="pyarrow")
            .drop_columns(["text"]))


def _q_hash_sample(sf_dir: str):
    """Deterministic 30% corpus sample by md5(doc_id) prefix threshold."""
    from vyntr_ray.stages.sampling import hash_sample
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return hash_sample(ds, rate_ppm=300_000)


def _q_token_budget(sf_dir: str):
    """Token-budget subsample: docs in md5-hash order until 2000 ws-tokens."""
    from vyntr_ray.stages.sampling import _WS_TOKEN, token_budget_sample
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = token_budget_sample(ds, budget=2000, n_buckets=16)

    def project(t: pa.Table) -> pa.Table:
        toks = [len(_WS_TOKEN.findall(x or ""))
                for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "tok": pa.array(toks, pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


def _q_weighted_mix(sf_dir: str):
    """Corpus mixing: per-source deterministic sampling rates."""
    from vyntr_ray.stages.sampling import weighted_mix
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return weighted_mix(ds, {"src0": 1_000_000, "src1": 500_000,
                             "src2": 250_000}, default_ppm=100_000)


def _q_ngram_counts(sf_dir: str):
    """Corpus-wide word-trigram count table, top 100 by (count desc,
    gram asc) — the n-gram-LM / infini-gram building block.  Per-block
    Counter partials (distinct grams per block cross the shuffle, not
    the gram stream) -> one groupby -> distributed sort.limit."""
    from collections import Counter

    from vyntr_ray.stages.text_analysis import _GRAM_TOKEN

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        c = Counter()
        for t in b["text"].to_pylist():
            ws = _GRAM_TOKEN.findall((t or "").lower())
            c.update(" ".join(ws[i:i + 3]) for i in range(len(ws) - 2))
        return pa.table({"gram": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    from vyntr_ray.stages.dataset_tools import group_sum
    # ~10^5 distinct grams: data-scaled string key -> many-groups rule
    out = group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                    "gram", ["cnt"], n_parts=16)
    return out.sort(["cnt", "gram"], descending=[True, False]).limit(100)


def _q_blob_stats(sf_dir: str):
    """Binary-column processing with an EXACT oracle — the hash-checked
    counterpart of the rows-only multimodal pipelines: documents.text is
    re-materialized as an opaque binary payload column (the image/audio
    layout), then per-blob byte length + md5 digest are computed over
    the raw bytes in a batch stage (the digest doubles as the content
    fingerprint a dedup-by-checksum pass would key on)."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_blob(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "payload": t["text"].cast(pa.binary())})

    def stats(t: pa.Table) -> pa.Table:
        pl = t["payload"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bytes": pa.array([len(b) for b in pl], pa.int64()),
            "digest": pa.array([hashlib.md5(b).hexdigest() for b in pl],
                               pa.string()),
        })

    return (ds.map_batches(to_blob, batch_format="pyarrow")
            .map_batches(stats, batch_format="pyarrow"))


def _q_lag_diff(sf_dir: str):
    """Per-key LAG window: value - lag(value) OVER (PARTITION BY user
    ORDER BY ts, id), centi-scaled exact int64, first row per key = 0."""
    from vyntr_ray.stages.windows import lag_diff
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return lag_diff(ds)


def _q_tpch_q3ish(sf_dir: str):
    """TPC-H Q3 analog: segment-filtered customers (broadcast semi-join,
    the small side ships once) -> date-filtered orders -> large-large
    hash join with shipdate-filtered lineitem revenue -> top-10 orders
    by exact integer dmilli revenue."""
    import datetime

    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    cutoff = datetime.datetime(1998, 1, 1)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ck = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"]), batch_format="pyarrow").take_all()
    key_ref = ray.put(pa.array(sorted(r["c_custkey"] for r in ck),
                               pa.int64()))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        # vectorized is_in probe against the broadcast Arrow key array
        keep = pc.and_(
            pc.less(t["o_orderdate"], pa.scalar(cutoff)),
            pc.is_in(t["o_custkey"], value_set=ray.get(key_ref)))
        return t.filter(keep).select(["o_orderkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev_dmilli": pc.cast(_round_ha(
                pc.multiply(r, pa.scalar(10_000.0))), pa.int64())})

    o = orders.map_batches(ofilt, batch_format="pyarrow")
    r = li.map_batches(rev, batch_format="pyarrow")
    joined = r.join(o, join_type="inner", num_partitions=8,
                    on=("l_orderkey",), right_on=("o_orderkey",))
    from vyntr_ray.stages.dataset_tools import group_sum
    agg = group_sum(joined, "l_orderkey", ["rev_dmilli"], n_parts=16,
                    rename={"rev_dmilli": "revenue_dmilli"})
    return agg.sort(["revenue_dmilli", "l_orderkey"],
                    descending=[True, False]).limit(10)


def _q_tpch_q5ish(sf_dir: str):
    """TPC-H Q5 analog: local-supplier revenue per ASIA nation in one
    order-year.  Shape: tiny dims (region x nation, 25 rows) resolved on
    the driver; customer filtered by the broadcast nation set; orders
    date-filtered then LARGE-LARGE hash-joined to customers; supplier
    (the medium side) broadcast as a suppkey->nationkey array; lineitem
    carries exact integer dmilli revenue + supplier nation through a
    second large-large join; the local-supplier predicate
    (s_nation == c_nation) filters post-join, then a 5-group sum."""
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = {r["r_regionkey"] for r in reg.to_pylist()
            if r["r_name"] == "ASIA"}
    name_of = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
               if r["n_regionkey"] in asia}
    nk_ref = ray.put(frozenset(name_of))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cfilt(t: pa.Table) -> pa.Table:
        keys = pa.array(sorted(ray.get(nk_ref)), pa.int64())
        return t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                 value_set=keys))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    oc = (orders.map_batches(ofilt, batch_format="pyarrow")
          .join(cust.map_batches(cfilt, batch_format="pyarrow"),
                join_type="inner", num_partitions=8,
                on=("o_custkey",), right_on=("c_custkey",))
          .select_columns(["o_orderkey", "c_nationkey"]))

    # supplier: dense suppkey -> nationkey int array, ray.put ONCE
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    snat = np.full(smax + 1, -1, dtype=np.int64)
    snat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    snat_ref = ray.put(snat)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def lrev(t: pa.Table) -> pa.Table:
        lut = ray.get(snat_ref)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "s_nat": pa.array(lut[t["l_suppkey"].to_numpy()], pa.int64()),
            "rev_dmilli": pc.cast(_round_ha(
                pc.multiply(rev, pa.scalar(10_000.0))), pa.int64())})

    joined = (li.map_batches(lrev, batch_format="pyarrow")
              .join(oc, join_type="inner", num_partitions=8,
                    on=("l_orderkey",), right_on=("o_orderkey",)))
    local = joined.map_batches(
        lambda t: t.filter(pc.equal(
            t["s_nat"], pc.cast(t["c_nationkey"], pa.int64()))),
        batch_format="pyarrow")
    agg = local.groupby("s_nat").aggregate(
        Sum("rev_dmilli", alias_name="revenue_dmilli"))
    names_ref = ray.put(name_of)

    def add_name(t: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        return pa.table({
            "n_name": pa.array([names[int(k)] for k in
                                t["s_nat"].to_pylist()], pa.string()),
            "revenue_dmilli": t["revenue_dmilli"]})

    return (agg.map_batches(add_name, batch_format="pyarrow")
            .sort(["revenue_dmilli", "n_name"], descending=[True, False]))


def _q_qty_discount_corr(sf_dir: str):
    """Pearson correlation of (quantity, discount) per returnflag from
    EXACT integer sufficient statistics: each batch emits per-group
    (n, sx, sy, sxx, syy, sxy) int64 partials, a 3-group sum merges them,
    and the final double-precision formula runs once per group — the
    one-pass mergeable shape any 100-TB moment/corr/variance reduction
    uses (no row ever crosses the shuffle, only 6 ints per group/batch).
    Both engine and oracle compute the SAME IEEE-double expression from
    the SAME exact integer sums, so round(..., 6) matches bit-for-bit."""
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(_round_ha(t["l_quantity"]), pa.int64())
        y = pc.cast(_round_ha(pc.multiply(t["l_discount"],
                                         pa.scalar(100.0))), pa.int64())
        b = pa.table({
            "l_returnflag": t["l_returnflag"], "one": pa.array(
                np.ones(t.num_rows, dtype=np.int64)),
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y)})
        g = b.group_by("l_returnflag").aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return g.rename_columns(
            ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("l_returnflag")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("syy", alias_name="syy"),
                         Sum("sxy", alias_name="sxy")))

    def finalize(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        corrs = []
        for r in rows:
            n, sx, sy = float(r["n"]), float(r["sx"]), float(r["sy"])
            sxx, syy, sxy = (float(r["sxx"]), float(r["syy"]),
                             float(r["sxy"]))
            num = n * sxy - sx * sy
            den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            # DuckDB round(x, 6) is half-away-from-zero; Python round is
            # half-to-even — both sides see the identical double, so only
            # the tie mode can diverge.
            from vyntr_ray.rounding import fround_half_away
            corrs.append(fround_half_away(num / den, 6))
        return pa.table({
            "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                     pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "corr_qd": pa.array(corrs, pa.float64())})

    return (merged.map_batches(finalize, batch_format="pyarrow")
            .sort("l_returnflag"))


def _q_frequent_tokens(sf_dir: str):
    """Exact heavy hitters over document tokens (support n/50): bounded
    per-block partials (< r rows survive per block by pigeonhole) →
    candidate merge → exact recount of the broadcast candidates — the
    frequent-items member of the mergeable-sketch family.  Integer
    predicate cnt·50 > n on both sides; no float enters the result."""
    from vyntr_ray.stages.sketches import frequent_tokens

    ds = _read(sf_dir, "documents", columns=["text"])
    return frequent_tokens(ds, text_col="text", r=50)


def _transitions_counts(sf_dir: str):
    """Shared bigram-count pipeline for event_transitions/event_markov:
    (src, dst, n) Dataset, hash-partitioned, one vectorized shift per
    partition (never a Ray group per user).  Routing is one md5 per
    DISTINCT user per batch (joins._part_col — the r3 perf rule; the
    original per-row Python loop cost 16 s at sf0.1)."""
    import pandas as pd

    from vyntr_ray.stages.joins import _part_col

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _part_col(t["user_id"], 32))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        key = g["user_id"].to_numpy()
        ev = g["event_type"].to_numpy()
        same = key[1:] == key[:-1]
        src, dst = ev[:-1][same], ev[1:][same]
        if len(src) == 0:
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "dst": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        out = (pd.DataFrame({"src": src, "dst": dst})
               .groupby(["src", "dst"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    part = (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: per_part(g.drop(columns="_part")),
                        batch_format="pandas"))
    # partition partials → one tiny final combine (bigram vocab is small)
    part = part.map_batches(lambda t: t, batch_format="pyarrow")
    out = part.groupby(["src", "dst"]).sum("n")
    return out.map_batches(
        lambda t: t.rename_columns(["src", "dst", "n"]),
        batch_format="pyarrow")


def _q_hll_intersect(sf_dir: str):
    """Viewer∩purchaser overlap via HLL inclusion-exclusion
    (stages/sketches.py:hll_intersect): three p=12 register partials
    per block, driver max-fold O(3·4096) — the overlap question with
    no distinct-pair shuffle.  SQL rebuilds all three estimates from
    md5_number_upper bit tests (the distinct_users_hll replica)."""
    from vyntr_ray.stages.sketches import hll_intersect

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_intersect(ds, "event_type", "user_id",
                         ga="view", gb="purchase")


def _q_locf_fill(sf_dir: str):
    """Daily LOCF resample of event values per user
    (stages/windows.py:locf_fill): spine from first to last observed
    day, centi value carried forward from the latest (ts, id)-ordered
    event — exact ints, one hash-partition shuffle, vectorized spine +
    searchsorted sweep."""
    from vyntr_ray.stages.windows import locf_fill

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return locf_fill(ds, key_col="user_id", ts_col="ts",
                     id_col="event_id", val_col="value")


def _q_lift_table(sf_dir: str):
    """Decile gains table over orders: NTILE(10) by (total price DESC,
    orderkey), per-decile exact order count / centi revenue / urgent
    count (stages/dataset_tools.py:lift_table — rank_select boundary
    broadcast, O(q×blocks) driver partials)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import lift_table

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderpriority"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "centi": pc.cast(_round_ha(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "urgent": pc.cast(pc.equal(t["o_orderpriority"],
                                       pa.scalar("1-URGENT")),
                              pa.int64())})

    return lift_table(ds.map_batches(prep, batch_format="pyarrow"),
                      value_col="centi", flag_col="urgent",
                      key_col="o_orderkey", q=10)


def _q_systematic_sample(sf_dir: str):
    """Every 10th document in md5(doc_id) order
    (stages/sampling.py:systematic_sample): fixed-interval sampling via
    the bucket prefix-sum rank machinery — evenly spaced through the
    hash order, exactly ceil(n/10) rows, parallelism-invariant."""
    from vyntr_ray.stages.sampling import systematic_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return systematic_sample(ds, k=10, key_col="doc_id")


def _q_cms_freq(sf_dir: str):
    """Count-min sketch point queries over document tokens
    (stages/sketches.py:cms_estimates): d=4 md5-salted rows × w=1024
    buckets, per-block partial sketches folded on the driver (O(d·w)),
    probe set = the 24 smallest distinct ≥4-char tokens, exact recount
    alongside.  The SQL oracle REBUILDS the identical sketch via
    md5_number_upper bucket arithmetic (the distinct_users_hll
    pattern), so est_cnt matches value-for-value including collisions."""
    from vyntr_ray.stages.sketches import cms_estimates

    ds = _read(sf_dir, "documents", columns=["text"])
    return cms_estimates(ds, text_col="text", d=4, w=1024,
                         n_probes=24, min_len=4)


def _q_event_transitions(sf_dir: str):
    """Per-user behavior bigrams: counts of consecutive (event_type →
    next event_type) transitions ordered by (ts, id) — the Markov-chain
    table a session-model fit starts from."""
    return _transitions_counts(sf_dir)


def _q_event_markov(sf_dir: str):
    """Markov transition PROBABILITIES from the behavior bigrams:
    P(dst|src) in exact floored micro units (n·10⁶ // row_total) — the
    normalized chain a next-event model samples from.  The bigram vocab
    is constant-bounded (|event_type|²), so the normalize step is one
    driver fold over the distributed counts; no float enters the
    result (DuckDB ``//`` floors identically on positive BIGINTs)."""
    import pandas as pd

    counts = pd.DataFrame(_transitions_counts(sf_dir).take_all())
    if counts.empty:
        return pd.DataFrame({"src": pd.Series(dtype="object"),
                             "dst": pd.Series(dtype="object"),
                             "n": pd.array([], dtype="int64"),
                             "row_total": pd.array([], dtype="int64"),
                             "prob_micro": pd.array([], dtype="int64")})
    counts["row_total"] = counts.groupby("src")["n"].transform("sum")
    counts["prob_micro"] = (counts["n"] * 1_000_000) // counts["row_total"]
    for c in ("n", "row_total", "prob_micro"):
        counts[c] = counts[c].astype("int64")
    return counts.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_bigram_pmi(sf_dir: str):
    """Collocation mining: PMI-ranked adjacent word pairs (the phrase-
    detection pass a tokenizer-training pipeline runs before BPE).
    Tagged per-block Counter partials (unigram + bigram in one pass over
    the text) -> ONE groupby -> support filter bounds the candidate set
    (top-2000 by count) -> unigram counts for candidate tokens only are
    broadcast back (O(candidates), never the full vocab) -> PMI.  The
    score is ln((cxy/nb)/((cx/nu)(cy/nu))) computed TERM-FOR-TERM
    identically to the SQL oracle and floored to micro units (floor has
    no tie mode, unlike round-half-even vs half-away)."""
    import math
    from collections import Counter

    import pyarrow.compute as pc

    from vyntr_ray.stages.text_analysis import _GRAM_TOKEN

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        cu: Counter = Counter()
        cb: Counter = Counter()
        for t in b["text"].to_pylist():
            ws = _GRAM_TOKEN.findall((t or "").lower())
            cu.update(ws)
            cb.update(ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1))
        return pa.table({
            "kind": pa.array([0] * len(cu) + [1] * len(cb), pa.int8()),
            "gram": pa.array(list(cu.keys()) + list(cb.keys()), pa.string()),
            "cnt": pa.array(list(cu.values()) + list(cb.values()),
                            pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["kind", "gram"]).sum("cnt")
           .map_batches(lambda t: t.rename_columns(["kind", "gram", "cnt"]),
                        batch_format="pyarrow")
           .materialize())  # distinct grams only; reused by 4 consumers
    uni = agg.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).drop_columns(["kind"]),
        batch_format="pyarrow")
    bi = agg.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).drop_columns(["kind"]),
        batch_format="pyarrow")
    nu, nb = uni.sum("cnt"), bi.sum("cnt")
    cand = (bi.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], pa.scalar(5))),
        batch_format="pyarrow")
        .sort(["cnt", "gram"], descending=[True, False])
        .limit(2000).take_all())
    toks = {w for r in cand for w in r["gram"].split(" ")}
    toks_arr = pa.array(sorted(toks), pa.string())
    urows = uni.map_batches(
        lambda t: t.filter(pc.is_in(t["gram"], value_set=toks_arr)),
        batch_format="pyarrow").take_all()
    ucnt = {r["gram"]: r["cnt"] for r in urows}
    grams, cnts, micro = [], [], []
    for r in cand:
        x, y = r["gram"].split(" ")
        pmi = (math.log(r["cnt"]) - math.log(nb) - math.log(ucnt[x])
               + math.log(nu) - math.log(ucnt[y]) + math.log(nu))
        grams.append(r["gram"])
        cnts.append(r["cnt"])
        micro.append(int(math.floor(pmi * 1000000)))
    out = pa.table({"gram": pa.array(grams, pa.string()),
                    "cnt": pa.array(cnts, pa.int64()),
                    "pmi_micro": pa.array(micro, pa.int64())})
    idx = pc.sort_indices(out, sort_keys=[("pmi_micro", "descending"),
                                          ("gram", "ascending")])
    return out.take(idx[:100])


def _q_funnel(sf_dir: str):
    """Conversion funnel view -> signup -> purchase: users reaching each
    ordered step (each step strictly after the earliest completion of
    the previous).  Hash-partitioned per-key sweep, O(steps) driver rows."""
    from vyntr_ray.stages.windows import funnel

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel(ds, ["view", "signup", "purchase"])


def _q_tpch_q4ish(sf_dir: str):
    """TPC-H Q4 analog (order priority checking): EXISTS semi-join —
    orders in a one-year window having at least one returned lineitem,
    counted by priority.  The semi side is LARGE (a quarter of all
    lineitems), so it is deduped with a distributed groupby and joined
    hash-partitioned — never broadcast (contrast tpch_q18ish, where a
    HAVING bounds the qualifying set first)."""
    import datetime

    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import distinct_rows

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    keys = distinct_rows(li.map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R"))
        .select(["l_orderkey"]), batch_format="pyarrow"),
        ["l_orderkey"])
    lo = pa.scalar(datetime.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1997, 1, 1), pa.timestamp("us"))
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    ofil = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi))).drop_columns(["o_orderdate"]),
        batch_format="pyarrow")
    j = ofil.join(keys, join_type="inner", num_partitions=8,
                  on=("o_orderkey",), right_on=("l_orderkey",))
    return (j.groupby("o_orderpriority").count()
            .map_batches(lambda t: t.rename_columns(
                ["o_orderpriority", "n"]), batch_format="pyarrow")
            .sort("o_orderpriority"))


def _q_tpch_q13ish(sf_dir: str):
    """TPC-H Q13 analog (customer order-count distribution): a LEFT
    OUTER join shape — customers with ZERO orders must survive into the
    histogram.  No join operator is needed: per-batch value_counts
    partials from orders (combiner pre-aggregation) are UNION'd with a
    zero-count row per customer, one groupby sums both sides (the
    union+groupby merge pattern), and a second tiny groupby builds the
    count-of-counts histogram.  Shuffle = O(distinct custkeys), driver
    = O(distinct counts)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def opart(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["o_custkey"])
        n = len(vc)
        return pa.table({
            "c_custkey": vc.field("values"),
            "n_orders": pc.cast(vc.field("counts"), pa.int64()),
            "is_cust": pa.array([0] * n, pa.int64())})

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def cpart(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "n_orders": pa.array([0] * n, pa.int64()),
            "is_cust": pa.array([1] * n, pa.int64())})

    from vyntr_ray.stages.dataset_tools import group_sum
    # custkey is data-scaled (15k/SF0.1) -> many-groups rule
    merged = group_sum(
        orders.map_batches(opart, batch_format="pyarrow")
        .union(cust.map_batches(cpart, batch_format="pyarrow")),
        "c_custkey", ["n_orders", "is_cust"], n_parts=16,
        rename={"n_orders": "c_count"})
    per_cust = merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["is_cust"],
                                            pa.scalar(1, pa.int64())))
        .select(["c_count"]), batch_format="pyarrow")
    hist = per_cust.groupby("c_count").count().map_batches(
        lambda t: t.rename_columns(["c_count", "custdist"]),
        batch_format="pyarrow")
    return hist.sort(["custdist", "c_count"], descending=[True, True])


def _q_tpch_q16ish(sf_dir: str):
    """TPC-H Q16 analog (supplier-part relationship count): COUNT
    (DISTINCT suppkey) per (brand, type, size) as TWO distributed
    dedup groupbys — distinct (partkey, suppkey) pairs from lineitem
    (the partsupp analog), part attributes attached from a broadcast
    dimension map (Brand#1 pre-excluded), then distinct (brand, type,
    size, suppkey) with per-batch local pre-dedup before the final
    count — the distinct-aggregate never holds a group's values in one
    worker."""

    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    # part is a bounded dimension (the q5ish supplier precedent) —
    # broadcast partkey -> (brand, type, size) with Brand#1 already
    # excluded instead of shipping a join; the 240k-pair x 2k-part
    # JoinOperator was the dominant cost of the earlier shape (PERF.md)
    import pyarrow.compute as pc

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    part = part.filter(pc.invert(pc.equal(part["p_brand"], "Brand#1")))
    # broadcast parallel Arrow arrays, probed with index_in/take — never
    # a per-row Python dict loop
    pref = ray.put({
        "key": part["p_partkey"].combine_chunks(),
        "brand": part["p_brand"].combine_chunks(),
        "type": part["p_type"].combine_chunks(),
        "size": part["p_size"].combine_chunks()})

    from vyntr_ray.stages.dataset_tools import distinct_rows

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pairs = distinct_rows(li, ["l_partkey", "l_suppkey"])

    def attach(t: pa.Table) -> pa.Table:
        mm = ray.get(pref)
        idx = pc.index_in(t["l_partkey"], value_set=mm["key"])
        keep = pc.is_valid(idx)
        idx = idx.filter(keep)
        df = pa.table({
            "p_brand": pc.take(mm["brand"], idx),
            "p_type": pc.take(mm["type"], idx),
            "p_size": pc.take(mm["size"], idx),
            "l_suppkey": t.filter(keep)["l_suppkey"],
        }).to_pandas()
        # local pre-dedup shrinks the distinct shuffle
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("p_brand", pa.string()), ("p_type", pa.string()),
                       ("p_size", pa.int32()),
                       ("l_suppkey", pa.int64())]))

    d2 = distinct_rows(
        pairs.map_batches(attach, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        part_key="l_suppkey")

    def pcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_brand", "p_type", "p_size"], as_index=False)
        return g.size().rename(columns={"size": "n_part"})

    # final merge on the driver: the result is bounded by the
    # brand x type x size attribute product (1.7k rows here), and a Ray
    # multi-key Aggregate's cost tracks group count (~30 s for these
    # 1.7k string-key groups at sf0.1, PERF.md) — partials shrink the
    # driver transfer to O(partitions x groups)
    out = (d2.map_batches(pcount, batch_format="pandas").to_pandas()
           .groupby(["p_brand", "p_type", "p_size"], as_index=False)
           ["n_part"].sum().rename(columns={"n_part": "supplier_cnt"}))
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return (out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort")
        .reset_index(drop=True))


def _q_tpch_q7ish(sf_dir: str):
    """TPC-H Q7 analog (volume shipping between two nations, by year):
    the supplier key->nation map broadcasts once (supplier is a genuinely
    bounded dimension — 10k/SF — and the probe is a vectorized
    ``index_in``); the CUSTOMER side stays DISTRIBUTED — customers scale
    with the fact tables (~150k/SF), so orders⋈customer is a
    hash-partitioned join, not a broadcast — then orders meets lineitem
    in a second hash-partitioned large-large join.  Year extraction + the
    cross-nation predicate run post-join; exact integer dmilli revenue."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from vyntr_ray.stages.joins import hash_join

    n1, n2 = "NATION_3", "NATION_8"
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pylist()
    nk = {r["n_nationkey"]: r["n_name"] for r in nat
          if r["n_name"] in (n1, n2)}
    nkeys = pa.array(sorted(nk), pa.int32())
    nnames = pa.array([nk[k] for k in sorted(nk)], pa.string())

    def nation_attach(key_name: str, out_name: str):
        def f(t: pa.Table) -> pa.Table:
            idx = pc.index_in(t[key_name], value_set=nkeys)
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            return (t.drop_columns([key_name])
                    .append_column(out_name,
                                   pc.take(nnames, idx.filter(keep))))
        return f

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        nation_attach("c_nationkey", "cust_nation"), batch_format="pyarrow")
    srows = (_read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
             .map_batches(nation_attach("s_nationkey", "supp_nation"),
                          batch_format="pyarrow").take_all())
    sref = ray.put({
        "key": pa.array([r["s_suppkey"] for r in srows], pa.int64()),
        "nation": pa.array([r["supp_nation"] for r in srows], pa.string())})

    lo = pa.scalar(datetime.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), pa.timestamp("us"))

    # customer scales with the fact tables — distributed hash join, not a
    # broadcast (Dataset.join crashes on the empty-sided partitions the
    # 2/25-nation filter creates at small sf; hash_join tolerates them);
    # explicit types let both joins skip the .schema() probes
    # that would otherwise execute the upstream chains once extra, so the
    # whole two-join pipeline streams end to end
    o = hash_join(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        cust, key_col="o_custkey", left_payload=["o_orderkey"],
        right_payload=["cust_nation"], right_key_col="c_custkey",
        n_parts=16,
        types={"o_custkey": pa.int64(), "c_custkey": pa.int64(),
               "o_orderkey": pa.int64(), "cust_nation": pa.string()})

    def lmap(t: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        idx = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=sm["key"])
        keep = pc.is_valid(idx)
        t = t.filter(keep)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "supp_nation": pc.take(sm["nation"], idx.filter(keep)),
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "rev_dmilli": pc.cast(_round_ha(pc.multiply(
                rev, pa.scalar(10_000.0))), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"]).map_batches(
        lmap, batch_format="pyarrow")
    j = hash_join(li, o, key_col="l_orderkey",
                  left_payload=["supp_nation", "l_year", "rev_dmilli"],
                  right_payload=["cust_nation"],
                  right_key_col="o_orderkey", n_parts=16,
                  types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
                         "supp_nation": pa.string(), "l_year": pa.int64(),
                         "rev_dmilli": pa.int64(),
                         "cust_nation": pa.string()})
    cross = j.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(
            t["supp_nation"], t["cust_nation"]))),
        batch_format="pyarrow")
    agg = (cross.groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("rev_dmilli", alias_name="revenue_dmilli")))
    return agg.sort(["supp_nation", "cust_nation", "l_year"])


def _q_tpch_q2ish(sf_dir: str):
    """TPC-H Q2 analog (minimum-balance supplier per part): the
    correlated min-subquery decorrelated into groupby(part).min +
    a hash-partitioned join-back, keeping the argmin rows.  Distinct
    supplier pairs come from lineitem (the partsupp analog); the
    type-filtered part keys broadcast once and prune BEFORE the
    pair-dedup shuffle; supplier attributes broadcast once (smallest
    dim); the argmin join-back is hash_join (tolerates the empty
    partitions the selective filters create)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Min

    from vyntr_ray.stages.joins import hash_join

    # the type filter keeps ~1/6 of the part dimension — broadcast the
    # surviving partkeys once (the q3ish precedent) and apply them
    # BEFORE the distinct groupby, so the pair-dedup shuffle carries
    # only qualifying rows (one shuffle fewer than joining part in)
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = (part.map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], "STANDARD"))
        .select(["p_partkey"]), batch_format="pyarrow").take_all())
    pk_ref = ray.put(pa.array(sorted(r["p_partkey"] for r in pk),
                              pa.int64()))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def lfilt(t: pa.Table) -> pa.Table:
        # vectorized membership probe (pc.is_in against the broadcast
        # Arrow key array) — never a Python per-row `k in set` loop
        return t.filter(pc.is_in(t["l_partkey"],
                                 value_set=ray.get(pk_ref)))

    from vyntr_ray.stages.dataset_tools import distinct_rows
    j = distinct_rows(li.map_batches(lfilt, batch_format="pyarrow"),
                      ["l_partkey", "l_suppkey"])

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_acctbal", "s_name"])
    sref = ray.put({
        "key": sup["s_suppkey"].combine_chunks(),
        "bal_centi": pc.cast(_round_ha(pc.multiply(
            sup["s_acctbal"].combine_chunks(), pa.scalar(100.0))),
            pa.int64()),
        "name": sup["s_name"].combine_chunks()})

    def attach(t: pa.Table) -> pa.Table:
        # index_in + take against broadcast parallel Arrow arrays — the
        # vectorized replacement for the per-row dict probe
        sm = ray.get(sref)
        idx = pc.index_in(t["l_suppkey"], value_set=sm["key"])
        return pa.table({
            "p_partkey": t["l_partkey"],
            "s_name": pc.take(sm["name"], idx),
            "acctbal_centi": pc.take(sm["bal_centi"], idx)})

    # withbal is consumed twice (min aggregation + join-back) and
    # hash_join's schema() probes would otherwise re-execute the whole
    # upstream chain each time — pin the bounded intermediate (one row
    # per distinct (part, supplier) pair of the filtered dimension)
    # in the object store once
    withbal = j.map_batches(attach, batch_format="pyarrow").materialize()
    mins = (withbal.groupby("p_partkey")
            .aggregate(Min("acctbal_centi", alias_name="min_centi"))
            .materialize())
    back = hash_join(withbal, mins, key_col="p_partkey",
                     left_payload=["s_name", "acctbal_centi"],
                     right_payload=["min_centi"], n_parts=16)
    return back.map_batches(
        lambda t: t.filter(pc.equal(t["acctbal_centi"], t["min_centi"]))
        .select(["p_partkey", "s_name", "acctbal_centi"]),
        batch_format="pyarrow")


def _q_user_set_ops(sf_dir: str):
    """INTERSECT / EXCEPT over user sets (which users did BOTH purchase
    and signup; which purchased but never signed up): distinct (user,
    type) per batch partial -> one groupby ORs the two membership flags
    -> the set op is a vectorized flag predicate, never a driver set."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "signup"]))
        t = t.filter(keep)
        isp = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "has_purchase": isp,
                         "has_signup": pc.subtract(
                             pa.scalar(1, pa.int64()), isp)})

    agg = (ev.map_batches(flags, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Max("has_purchase", alias_name="has_purchase"),
                      Max("has_signup", alias_name="has_signup")))

    def emit(t: pa.Table) -> pa.Table:
        both = t.filter(pc.and_(pc.equal(t["has_purchase"], 1),
                                pc.equal(t["has_signup"], 1)))
        only = t.filter(pc.and_(pc.equal(t["has_purchase"], 1),
                                pc.equal(t["has_signup"], 0)))
        return pa.concat_tables([
            pa.table({"op": pa.array(["both"] * len(both), pa.string()),
                      "user_id": both["user_id"]}),
            pa.table({"op": pa.array(["purchase_only"] * len(only),
                                     pa.string()),
                      "user_id": only["user_id"]})])

    return agg.map_batches(emit, batch_format="pyarrow")


def _q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) over documents: doc counts + char
    totals at all three granularities, 'ALL' sentinel for rolled-up
    levels (no NULL enters the value hash)."""
    from vyntr_ray.stages.dataset_tools import rollup_counts
    ds = _read(sf_dir, "documents",
               columns=["lang", "source", "n_chars"])
    return rollup_counts(ds, "lang", "source", "n_chars")


def _q_group_ranks(sf_dir: str):
    """Per-user RANK + DENSE_RANK of events by value desc (tie-safe:
    both are functions of the value, unlike row_number)."""
    from vyntr_ray.stages.windows import group_ranks
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "value"])
    return group_ranks(ds)


def _q_running_total(sf_dir: str):
    """Per-user running total (unbounded-preceding window frame),
    exact centi ints — the cumulative sibling of rolling_sum."""
    from vyntr_ray.stages.windows import running_total
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return running_total(ds)


def _q_value_quantiles_cont(sf_dir: str):
    """Exact per-event-type INTERPOLATED quantiles (quantile_cont
    convention), integer 1e-4-unit arithmetic on both sides."""
    from vyntr_ray.stages.dataset_tools import group_quantiles_cont
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return group_quantiles_cont(ds, "event_type", "value")


def _q_regex_extract(sf_dir: str):
    """Regex-extraction table: every match of a word pattern flat-mapped
    out of each document with per-doc counts.  A doc's text lives in one
    row, so per-batch Counter emission is already final — zero shuffle."""
    import re
    from collections import Counter

    pat = re.compile(r"\b[st][a-z]{3,}\b")

    def extract(t: pa.Table) -> pa.Table:
        ids, terms, ns = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            for term, n in Counter(pat.findall(txt or "")).items():
                ids.append(did)
                terms.append(term)
                ns.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(extract, batch_format="pyarrow")


def _q_retention(sf_dir: str):
    """Daily cohort retention triangle over the event log: distinct
    users with any event at age-a days after their first-event day.
    Hash-partitioned per-key pass, O(cohorts x ages) driver rows."""
    from vyntr_ray.stages.windows import retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return retention(ds, period_s=86_400)


def _q_tpch_q18ish(sf_dir: str):
    """TPC-H Q18 analog (large-volume customers): distributed
    groupby(l_orderkey).sum(qty) -> HAVING > 150 makes the qualifying
    set small -> broadcast it into a pruned orders scan -> distributed
    hash join with customer for the name -> top-100.  Quantities are
    integral doubles; per-row centi scaling keeps every sum exact int64."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def centi(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "qty_centi": pc.cast(_round_ha(pc.multiply(
                t["l_quantity"], pa.scalar(100.0))), pa.int64())})

    from vyntr_ray.stages.dataset_tools import group_sum
    # ~15k orderkeys/SF0.1: data-scaled key -> many-groups rule
    agg = group_sum(li.map_batches(centi, batch_format="pyarrow"),
                    "l_orderkey", ["qty_centi"], n_parts=16,
                    rename={"qty_centi": "sum_qty_centi"})
    qual = agg.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty_centi"],
                                      pa.scalar(15_000, pa.int64()))),
        batch_format="pyarrow").materialize()

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    # qualifying orders are a tiny fraction by construction (HAVING), so
    # broadcast is the default — but a lowered threshold / skewed data at
    # 100x could make it driver-sized, so SIZE-GUARD: count first (one
    # cheap aggregate on the pinned qual), fall back to the distributed
    # hash_join above the threshold.
    if qual.count() <= 500_000:
        qtab = _concat_refs(qual, pa.schema([
            ("l_orderkey", pa.int64()), ("sum_qty_centi", pa.int64())]))
        qmap_ref = ray.put({
            "key": qtab["l_orderkey"].combine_chunks(),
            "sum": qtab["sum_qty_centi"].combine_chunks()})

        def ofilt(t: pa.Table) -> pa.Table:
            # vectorized index_in probe against the broadcast key array
            qm = ray.get(qmap_ref)
            idx = pc.index_in(t["o_orderkey"], value_set=qm["key"])
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            return t.append_column(
                "sum_qty_centi", pc.take(qm["sum"], idx.filter(keep)))

        o = orders.map_batches(ofilt, batch_format="pyarrow")
    else:
        from vyntr_ray.stages.joins import hash_join
        o = hash_join(orders, qual, key_col="o_orderkey",
                      left_payload=["o_custkey", "o_orderdate"],
                      right_payload=["sum_qty_centi"],
                      right_key_col="l_orderkey", n_parts=16)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    joined = o.join(cust, join_type="inner", num_partitions=8,
                    on=("o_custkey",), right_on=("c_custkey",))
    out = joined.select_columns(["c_name", "o_custkey", "o_orderkey",
                                 "o_orderdate", "sum_qty_centi"])
    return out.sort(["sum_qty_centi", "o_orderkey"],
                    descending=[True, False]).limit(100)


def _q_ntile_buckets(sf_dir: str):
    """NTILE(4) per event_type over (value, id) order — the quantile-
    bucket label a stratified curriculum sampler keys on.  One pass per
    hash partition: each event_type is wholly inside one partition, rank
    via lexsort, tile = floor(rank * 4 / n) with the SQL NTILE remainder
    rule (first n%4 tiles get the extra row)."""
    import hashlib

    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        parts = [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 8
                 for v in t["event_type"].to_pylist()]
        return t.append_column("_part", pa.array(parts, pa.int32()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, kg in g.groupby("event_type", sort=False):
            n = len(kg)
            # sort by the RAW value (SQL: ORDER BY value, event_id) — a
            # rounded key would collapse distinct values on finer-grained
            # data and shift tile boundaries.
            order = np.lexsort((kg["event_id"].to_numpy(),
                                kg["value"].to_numpy()))
            rank = np.empty(n, np.int64)
            rank[order] = np.arange(n)
            # SQL NTILE: sizes ceil then floor — first (n % 4) tiles are
            # one longer
            q, r = divmod(n, 4)
            bounds = np.cumsum([q + 1] * r + [q] * (4 - r))
            tile = np.searchsorted(bounds, rank, side="right") + 1
            outs.append(pd.DataFrame({
                "event_id": kg["event_id"].to_numpy(),
                "event_type": kg["event_type"].to_numpy(),
                "tile": tile.astype("int64")}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "event_type": pd.Series(dtype="object"),
                          "tile": pd.Series(dtype="int64")})

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda g: per_part(g.drop(columns="_part")),
                        batch_format="pandas"))


def _q_point_lookup(sf_dir: str):
    """J6 serving-path point lookups: fetch a fixed id set with the
    filter pushed INTO the parquet scan (row-group pruning — only
    matching row groups are decoded), the Ray analog of the website's
    keyed SELECT."""
    import pyarrow.compute as pc
    ids = [3, 17, 42, 97, 123, 250, 444]
    ds = _rd().read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=pc.field("doc_id").isin(ids))
    return ds


def _q_token_budget_by_group(sf_dir: str):
    """Per-language token budgets — "N tokens of each language" (the
    corpus-mixing companion to the global token budget)."""
    from vyntr_ray.stages.sampling import _WS_TOKEN, token_budget_by_group
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = token_budget_by_group(
        ds, {"en": 3000, "de": 1000}, group_col="lang",
        n_buckets=16, default_budget=500)

    def project(t: pa.Table) -> pa.Table:
        toks = [len(_WS_TOKEN.findall(x or ""))
                for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "tok": pa.array(toks, pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


def _q_pack_sequences(sf_dir: str):
    """LM sequence packing: concatenate-and-chunk manifest at 2048
    tokens/sequence over the hash-ordered corpus (distributed
    prefix-sum; metadata-only shuffle)."""
    from vyntr_ray.stages.sampling import pack_sequences
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=2048, n_buckets=16)


def _q_unigram_logprob(sf_dir: str):
    """CCNet-style quality signal: per-doc log-likelihood under a
    unigram LM fit on the corpus itself (top-4096 vocab)."""
    from vyntr_ray.stages.text_analysis import unigram_logprob
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_logprob(ds, vocab_size=4096)


def _q_curate(sf_dir: str):
    """Composed curation flagship: normalize -> quality gate -> exact
    dedup (min-id per fingerprint) -> token-budget sample."""
    from vyntr_ray.pipelines.curate import curate
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return curate(ds)


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (hashed unigram+bigram models, target =
    doc_id %% 97 == 0 — the decontaminate held-out convention)."""
    from vyntr_ray.stages.text_analysis import dsir_weights
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dsir_weights(ds, n_buckets=8192)


def _q_normalize_text(sf_dir: str):
    """Unicode NFC + whitespace-run collapse + edge trim per doc."""
    from vyntr_ray.stages.text_analysis import normalize_text
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_text(ds)


def _q_dup_substrings(sf_dir: str):
    """Exact-substring duplication counts (Lee et al. ExactSubstr
    criterion): 64-char windows at stride 16 over the planted-dup
    corpus; a window is duplicated iff it appears in >= 2 docs."""
    from vyntr_ray.stages.dedup import substring_dup_counts
    return substring_dup_counts(_planted_dup_docs(sf_dir))


def _q_dup_clusters(sf_dir: str):
    """End-to-end near-dedup: LSH pairs -> verified Jaccard >= 0.6 ->
    connected components -> min-id canonical per cluster (keep=1)."""
    from vyntr_ray.stages.dedup import dup_clusters
    return dup_clusters(_planted_dup_docs(sf_dir), threshold=0.6)


def _q_asof_join(sf_dir: str):
    """Point-in-time lookup: latest 'view' at or before each 'click'."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import asof_join

    def only(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind))
        return f

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    views = ev.map_batches(only("view"), batch_format="pyarrow")
    out = asof_join(clicks, views, "user_id", "ts",
                    ["event_id"], ["event_id"])
    return out.map_batches(
        lambda t: pa.table({"event_id": t["event_id"],
                            "user_id": t["user_id"],
                            "view_id": t["r_event_id"]}),
        batch_format="pyarrow")


def _q_asof_join_left(sf_dir: str):
    """LEFT as-of variant: every click kept, view_id = -1 when no prior
    view exists (sentinel instead of NULL so the value hash is
    engine-neutral)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import asof_join

    def only(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind))
        return f

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    views = ev.map_batches(only("view"), batch_format="pyarrow")
    out = asof_join(clicks, views, "user_id", "ts",
                    ["event_id"], ["event_id"], how="left")

    def project(t: pa.Table) -> pa.Table:
        import pandas as pd
        vid = t["r_event_id"].to_pandas().fillna(-1).astype("int64")
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "view_id": pa.array(vid, pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


def _q_range_join(sf_dir: str):
    """Interval join: clicks in the 5 minutes before each purchase."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import range_count_join

    def only(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind))
        return f

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow")
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    out = range_count_join(purchases, clicks, "user_id", "ts",
                           ["event_id"], window_us=5 * 60 * 1_000_000,
                           count_name="n_clicks")
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "n_clicks"]),
        batch_format="pyarrow")


def _q_value_quantiles(sf_dir: str):
    """Exact per-event-type value quantiles (quantile_disc convention)."""
    from vyntr_ray.stages.dataset_tools import group_quantiles
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return group_quantiles(ds, "event_type", "value")


def _q_group_topk(sf_dir: str):
    """Top-3 events by value per event_type (bounded partial top-k)."""
    from vyntr_ray.stages.dataset_tools import group_topk
    ds = _read(sf_dir, "events",
               columns=["event_type", "event_id", "value"])
    return group_topk(ds, "event_type", "value", "event_id", k=3)


def _q_event_pivot(sf_dir: str):
    """Pivot: per-user event_type counts, wide (combiner partials)."""
    from vyntr_ray.stages.dataset_tools import pivot_counts
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type",
                        categories=["click", "error", "purchase",
                                    "signup", "view"])


def _q_rolling_sum(sf_dir: str):
    """Per-user moving sum of the last 5 events (exact centi ints)."""
    from vyntr_ray.stages.windows import rolling_sum
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return rolling_sum(ds, k=5)


def _q_ab_ttest(sf_dir: str):
    """Welch two-sample t statistic between the 'click' and 'purchase'
    event values, from EXACT int64 sufficient statistics (n, sum_centi,
    sumsq) per variant — the qty_discount_corr shape: zero-shuffle
    per-block partials (constant-bounded keys), one driver-side IEEE
    formula mirrored term-for-term in the oracle so round(..., 6)
    matches bit-for-bit."""
    import math

    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        v = pc.cast(_round_ha(pc.multiply(t["value"],
                                          pa.scalar(100.0))), pa.int64())
        b = pa.table({"variant": t["event_type"],
                      "one": pa.array(np.ones(t.num_rows, np.int64)),
                      "s": v, "ss": pc.multiply(v, v)})
        g = b.group_by("variant").aggregate(
            [("one", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["variant", "n", "s", "ss"])

    stats = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["variant"], ["n", "s", "ss"])
    row = {r["variant"]: (int(r["n"]), int(r["s"]), int(r["ss"]))
           for r in stats.to_dict("records")}
    (n1, s1, ss1), (n2, s2, ss2) = row["click"], row["purchase"]
    m1 = float(s1) / float(n1)
    m2 = float(s2) / float(n2)
    var1 = (float(ss1) - float(s1) * float(s1) / float(n1)) \
        / float(n1 - 1)
    var2 = (float(ss2) - float(s2) * float(s2) / float(n2)) \
        / float(n2 - 1)
    t_stat = (m1 - m2) / math.sqrt(var1 / float(n1) + var2 / float(n2))
    return pd.DataFrame({
        "n_click": pd.array([n1], dtype="int64"),
        "n_purchase": pd.array([n2], dtype="int64"),
        "t_welch": [round(t_stat, 6)]})


def _q_gaps_islands(sf_dir: str):
    """Consecutive-day activity islands per user (gaps-and-islands on
    the distinct activity-day set) — one key-hash shuffle, vectorized
    run-break sweep per partition."""
    from vyntr_ray.stages.windows import gaps_islands

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return gaps_islands(ds, key_col="user_id", ts_col="ts")


def _q_event_throttle(sf_dir: str):
    """LAG-based duplicate suppression: keep events whose previous
    (user, type) sibling is >300 s older (alert-throttle semantics)."""
    from vyntr_ray.stages.windows import event_throttle

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return event_throttle(ds, gap_s=300)


def _q_scd2_intervals(sf_dir: str):
    """SCD-2 validity intervals: one row per run of equal event_type per
    user, valid_from = run start, valid_to = next run's start (sentinel
    9999-12-31 on the open run — the asof-left NULL convention)."""
    from vyntr_ray.stages.windows import scd2_intervals

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return scd2_intervals(ds)


def _q_group_median(sf_dir: str):
    """Exact per-user discrete median of event values (quantile_disc
    selection rule ceil(q*n)-1, centi-int exact) — the keyed sibling of
    value_quantiles; data-scaled key domain through ONE hash shuffle."""
    from vyntr_ray.stages.windows import group_median

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    return group_median(ds, key_col="user_id", value_col="value")


def _q_weekday_bitmap(sf_dir: str):
    """Per-user weekday-activity bitmask (bit d set iff the user has an
    event on DuckDB weekday d, 0=Sunday) + distinct-weekday count.
    DISTINCT (user, dow) via the hash-partition dedup, then mask =
    sum of distinct bits (OR == SUM after dedup) through group_sum —
    no generic Aggregate, two bounded shuffles total."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import distinct_rows, group_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def dow(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # epoch day 0 = Thursday = DuckDB dayofweek 4 -> (day+4) % 7
        d = (us // 86_400_000_000 + 4) % 7
        return pa.table({"user_id": t["user_id"],
                         "dow": pa.array(d, pa.int64())})

    dd = distinct_rows(ds.map_batches(dow, batch_format="pyarrow"),
                       ["user_id", "dow"])

    def bits(t: pa.Table) -> pa.Table:
        t = pa.table(t) if not isinstance(t, pa.Table) else t
        return pa.table({
            "user_id": t["user_id"],
            "dow_mask": pc.shift_left(pa.scalar(1, pa.int64()), t["dow"]),
            "n_dows": pa.array(np.ones(t.num_rows, np.int64))})

    return group_sum(dd.map_batches(bits, batch_format="pyarrow"),
                     "user_id", ["dow_mask", "n_dows"])


def _q_embedding_norms(sf_dir: str):
    """Top-20 vectors by exact integer-scaled squared-L2 norm — the
    list<float> math litmus: per-element x1e4 half-away scaling makes
    the norm an exact int64 the oracle replays with unnest."""
    from vyntr_ray.stages.embed import embedding_norms

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_norms(ds, k=20)


def _q_readability(sf_dir: str):
    """Flesch-Kincaid grades from exact RE2 counts (words / vowel-group
    syllables / sentence runs) + a shared-IEEE formula — streaming, no
    shuffle."""
    from vyntr_ray.stages.text_analysis import readability

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return readability(ds)


def _q_group_mad(sf_dir: str):
    """Per-user median absolute deviation (robust dispersion), exact
    centi-int via two discrete-median passes inside one hash
    partition."""
    from vyntr_ray.stages.windows import group_mad

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    return group_mad(ds, key_col="user_id", value_col="value")


def _q_last_touch(sf_dir: str):
    """Last-touch attribution: every purchase joined to the latest
    strictly-preceding click of the same user (sentinel -1 when none)."""
    from vyntr_ray.stages.windows import last_touch

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return last_touch(ds, touch="click", target="purchase")


def _q_watermark_filter(sf_dir: str):
    """Streaming late-data gate: watermark = running max event-time over
    the arrival order (event_id), 600 s allowed lateness; per-type
    kept/dropped counts.  Distributed prefix-max (O(n_buckets) driver
    array), zero-shuffle count fold."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.windows import watermark_filter

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])
    wf = watermark_filter(ds, allowed_s=600)

    def partial(t: pa.Table) -> pa.Table:
        b = pa.table({"event_type": t["event_type"],
                      "k": pc.cast(t["kept"], pa.int64()),
                      "one": pa.array(np.ones(t.num_rows, np.int64))})
        g = b.group_by("event_type").aggregate(
            [("k", "sum"), ("one", "sum")])
        return g.rename_columns(["event_type", "n_kept", "n_total"])

    agg = _sum_keyed_partials(
        wf.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n_kept", "n_total"])
    agg["n_dropped"] = (agg["n_total"] - agg["n_kept"]).astype("int64")
    return agg.drop(columns=["n_total"])


def _q_next_event_gap(sf_dir: str):
    """Per-user time-to-next-event (LEAD gap, churn feature), sentinel
    -1 on each user's last event."""
    from vyntr_ray.stages.windows import next_event_gap

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return next_event_gap(ds)


def _q_session_paths(sf_dir: str):
    """Top-20 session journey paths (first 3 event types per 1800 s-gap
    session).  Path domain is |event types|^3-bounded, so partials fold
    driver-side — the shuffle never carries event rows."""
    from vyntr_ray.stages.windows import session_path_partials

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    parts = session_path_partials(ds, gap_s=1800, k_steps=3)
    g = _sum_keyed_partials(parts, ["path"], ["n"])
    g = g.rename(columns={"n": "n_sessions"})
    g = g.sort_values(["n_sessions", "path"],
                      ascending=[False, True]).head(20)
    return g.reset_index(drop=True)


def _q_gap_fill_months(sf_dir: str):
    """Calendar-spine zero fill: monthly order counts with EVERY month
    between min and max present (gap months = 0).  Counts fold as
    bounded keyed partials; the spine is an O(months) driver array —
    nothing here scales with row count except the scan."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        ym = pc.add(pc.multiply(pc.year(d), pa.scalar(100, pa.int64())),
                    pc.cast(pc.month(d), pa.int64()))
        b = pa.table({"ym": ym,
                      "one": pa.array(np.ones(t.num_rows, np.int64))})
        g = b.group_by("ym").aggregate([("one", "sum")])
        return g.rename_columns(["ym", "n"])

    got = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["ym"], ["n"])
    counts = dict(zip(got["ym"], got["n"]))
    lo, hi = int(got["ym"].min()), int(got["ym"].max())
    spine = []
    y, m = divmod(lo, 100)
    while y * 100 + m <= hi:
        spine.append(y * 100 + m)
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return pd.DataFrame({
        "ym": pd.array(spine, dtype="int64"),
        "n_orders": pd.array([int(counts.get(s, 0)) for s in spine],
                             dtype="int64")})


def _q_fk_check(sf_dir: str):
    """Referential-integrity audit: per FK edge, total rows + orphans
    (facts whose key misses the dimension).  Fact->fact edges run the
    distributed-both-sides ``anti_join`` (the exclusion side scales);
    the constant nation dim is a broadcast probe with zero-shuffle count
    partials.  Output is O(edges) rows."""
    import ray

    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import anti_join

    def edge_anti(fact, fcol, dim, dcol):
        f = _read(sf_dir, fact, columns=[fcol])
        d = _read(sf_dir, dim, columns=[dcol])
        n = f.count()
        orph = anti_join(f, d, fcol, [], right_key_col=dcol,
                         types={fcol: pa.int64()}).count()
        return int(n), int(orph)

    rows = []
    for fact, fcol, dim, dcol, edge in [
            ("lineitem", "l_orderkey", "orders", "o_orderkey",
             "lineitem->orders"),
            ("orders", "o_custkey", "customer", "c_custkey",
             "orders->customer"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey",
             "lineitem->supplier")]:
        n, o = edge_anti(fact, fcol, dim, dcol)
        rows.append((edge, n, o))

    nat = sorted(r["n_nationkey"] for r in _read(
        sf_dir, "nation", columns=["n_nationkey"]).take_all())
    nref = ray.put(nat)

    def part(t: pa.Table) -> pa.Table:
        ks = ray.get(nref)
        ok = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                      value_set=pa.array(ks, pa.int64()))
        bad = int(t.num_rows
                  - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0))
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "orph": pa.array([bad], pa.int64())})

    parts = _read(sf_dir, "customer", columns=["c_nationkey"]) \
        .map_batches(part, batch_format="pyarrow").to_pandas()
    rows.append(("customer->nation", int(parts["n"].sum()),
                 int(parts["orph"].sum())))
    return pd.DataFrame(rows, columns=["edge", "n_rows", "n_orphans"]) \
        .astype({"n_rows": "int64", "n_orphans": "int64"})


def _q_monthly_growth(sf_dir: str):
    """Period-over-period reporting: monthly centi revenue + delta vs
    the previous calendar month (sentinel 0 on the first).  Months are
    a CONSTANT-bounded key space -> zero-shuffle per-block partials
    (_sum_keyed_partials rule); the lag is a driver fold over
    O(months) rows."""
    import pyarrow.compute as pc

    def part(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        ym = (d.astype("datetime64[M]").astype(np.int64))  # months
        cents = _round_ha(pc.multiply(t["o_totalprice"],
                                      pa.scalar(100.0)))
        df = pd.DataFrame({
            "ym": ym,
            "rev_centi": pc.cast(cents, pa.int64()).to_numpy()})
        g = df.groupby("ym", as_index=False)["rev_centi"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    g = _sum_keyed_partials(
        ds.map_batches(part, batch_format="pyarrow"),
        ["ym"], ["rev_centi"])
    g = g.sort_values("ym").reset_index(drop=True)
    # calendar-aware lag: previous MONTH, not previous row
    prev = dict(zip(g["ym"], g["rev_centi"]))
    g["delta_centi"] = [
        int(r) - int(prev.get(m - 1, r))
        for m, r in zip(g["ym"], g["rev_centi"])]
    # ym -> year*100 + month for a readable join key
    years = 1970 + g["ym"] // 12
    months = g["ym"] % 12 + 1
    g["ym"] = (years * 100 + months).astype("int64")
    g["delta_centi"] = g["delta_centi"].astype("int64")
    return g


def _q_rfm_segments(sf_dir: str):
    """RFM segmentation over orders: per-customer recency/frequency/
    monetary + global NTILE(4) labels per metric
    (stages/dataset_tools.py:rfm_segments — mixed hash-partition fold,
    then rank_select boundary rows per metric broadcast for vectorized
    tile assignment; the driver never holds customer rows)."""
    from vyntr_ray.stages.dataset_tools import rfm_segments

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])
    return rfm_segments(ds)


def _q_suggest_terms(sf_dir: str):
    """Spell suggestions ("did you mean") for four misspelled query
    terms: top-5 vocab terms within edit distance 2 by (dist, freq
    DESC, term) (stages/search_index.py:suggest_terms — group_sum
    vocab counts, banded-DP match per vocab block, bounded partials).
    The oracle brute-forces DuckDB levenshtein over the same vocab."""
    from vyntr_ray.stages.search_index import suggest_terms

    ds = _read(sf_dir, "documents", columns=["text"])
    return suggest_terms(ds, ["mrege", "windwo", "custmer", "qery"],
                         max_dist=2, k=5)


def _q_search_snippets(sf_dir: str):
    """Result-page snippets: first-occurrence token index + ±3-token
    context for every doc containing 'merge'
    (stages/text_analysis.py:search_snippets — vectorized substring
    prefilter, per-doc window assembly on survivors only)."""
    from vyntr_ray.stages.text_analysis import search_snippets

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return search_snippets(ds, term="merge", width=3)


def _q_bfs_hops(sf_dir: str):
    """k-bounded BFS (min-hop ≤ 4) from the doc_id % 100 == 1 seed set
    over the shared doc graph (stages/graph.py:bfs_hops — per-round
    hash_join expansion + min fold, distances never on the driver).
    Oracled by an unrolled 4-round CTE chain (exact ints)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.graph import bfs_hops

    def to_seeds(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        s = d[d % 100 == 1]
        return pa.table({"node": pa.array(s, pa.int64()),
                         "hop": pa.array([0] * len(s), pa.int64())})

    seeds = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(to_seeds, batch_format="pyarrow"))
    return bfs_hops(_doc_graph_edges(sf_dir), seeds, k=4)


def _q_heatmap_bins(sf_dir: str):
    """(weekday × hour) activity heat map with exact centi value sums —
    the 2-D fixed-bin histogram (bins constant-bounded at 7×24, so the
    zero-shuffle _sum_keyed_partials fold; the q6ish litmus in 2-D).
    Weekday = the weekday_bitmap epoch-day convention (0=Sunday)."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # epoch day 0 = Thursday = DuckDB dayofweek 4 -> (day+4) % 7
        dow = (us // 86_400_000_000 + 4) % 7
        hour = (us // 3_600_000_000) % 24
        centi = _round_ha(pc.multiply(t["value"], pa.scalar(100.0)))
        agg = (pd.DataFrame({
            "dow": dow, "hour": hour, "n": 1,
            "sum_centi": pc.cast(centi, pa.int64()).to_numpy()})
            .groupby(["dow", "hour"], as_index=False).sum())
        return pa.Table.from_pandas(agg.astype("int64"),
                                    preserve_index=False)

    return _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dow", "hour"], ["n", "sum_centi"])


def _q_ks_drift(sf_dir: str):
    """Exact-integer two-sample KS distance between view and purchase
    value distributions (stages/dataset_tools.py:ks_statistic): D as
    the fraction d_num/d_den = max|F_A·m − F_B·n| / (n·m) — the
    distribution-drift gate, no float anywhere."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import ks_statistic

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "centi": pc.cast(_round_ha(pc.multiply(
                t["value"], pa.scalar(100.0))), pa.int64())})

    return ks_statistic(ds.map_batches(prep, batch_format="pyarrow"),
                        "event_type", "centi", ga="view", gb="purchase")


def _q_mwu_drift(sf_dir: str):
    """Mann–Whitney 2U between view and purchase value distributions
    (stages/dataset_tools.py:mwu_statistic) — exact integer rank test,
    ties counted ½ via the doubled statistic; u2/(2·n·m) is the
    common-language effect size."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import mwu_statistic

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "centi": pc.cast(_round_ha(pc.multiply(
                t["value"], pa.scalar(100.0))), pa.int64())})

    return mwu_statistic(ds.map_batches(prep, batch_format="pyarrow"),
                         "event_type", "centi", ga="view", gb="purchase")


def _q_gini_index(sf_dir: str):
    """Revenue concentration across orders
    (stages/dataset_tools.py:gini_index): exact HUGEINT-class integer
    sums from one distributed sort + rank offsets, one shared final
    division, round(…, 6) bit-for-bit."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import gini_index

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"centi": pc.cast(_round_ha(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())})

    return gini_index(ds.map_batches(prep, batch_format="pyarrow"),
                      "centi")


def _q_psi_drift(sf_dir: str):
    """Population Stability Index between view and purchase value
    distributions over $20 fixed bins
    (stages/dataset_tools.py:psi_statistic) — the third drift monitor
    next to ks_drift/mwu_drift: exact integer micro-nat sum
    Σ (ca·m − cb·n)·(L(ca·m) − L(cb·n)), one shared division by
    n·m·1e6, round(…, 6) bit-for-bit."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import psi_statistic

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "centi": pc.cast(_round_ha(pc.multiply(
                t["value"], pa.scalar(100.0))), pa.int64())})

    return psi_statistic(ds.map_batches(prep, batch_format="pyarrow"),
                         "event_type", "centi", ga="view", gb="purchase",
                         width=2000)


def _q_snapshot_diff(sf_dir: str):
    """Keyed reconciliation of two order-book snapshots — per-customer
    order count + centi revenue in 1995 vs 1996, classified
    added/removed/changed (stages/dataset_tools.py:snapshot_diff):
    tag-expand + ONE group_sum hash-partition fold; the output is the
    change set (bounded by churn, not table size)."""
    import datetime

    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import snapshot_diff

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(lo: str, hi: str):
        lo_ts = pa.scalar(datetime.datetime.fromisoformat(lo),
                          pa.timestamp("us"))
        hi_ts = pa.scalar(datetime.datetime.fromisoformat(hi),
                          pa.timestamp("us"))

        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(
                pc.greater_equal(t["o_orderdate"], lo_ts),
                pc.less(t["o_orderdate"], hi_ts)))
            return pa.table({
                "o_custkey": t["o_custkey"],
                "centi": pc.cast(_round_ha(pc.multiply(
                    t["o_totalprice"], pa.scalar(100.0))), pa.int64())})
        return fn

    ds_a = orders.map_batches(prep("1995-01-01", "1996-01-01"),
                              batch_format="pyarrow")
    ds_b = orders.map_batches(prep("1996-01-01", "1997-01-01"),
                              batch_format="pyarrow")
    return snapshot_diff(ds_a, ds_b, "o_custkey",
                         ["centi"]).sort("o_custkey")


def _q_zipf_fit(sf_dir: str):
    """Zipf-law slope/intercept over the top-100 unigram frequencies
    (stages/text_analysis.py:zipf_fit) — corpus-health diagnostic;
    OLS on (L(rank), L(count)) micro-nats, exact integer sufficient
    stats, two shared divisions round(…, 6) bit-for-bit."""
    from vyntr_ray.stages.text_analysis import zipf_fit

    ds = _read(sf_dir, "documents", columns=["text"])
    return zipf_fit(ds, k=100)


def _q_funnel_windowed(sf_dir: str):
    """Windowed conversion funnel view -> signup -> purchase where each
    step must land within 72 h of the previous step's earliest
    completion (stages/windows.py:funnel with max_gap_us) — the
    time-bounded variant of the funnel query; greedy-anchor semantics
    on both sides."""
    from vyntr_ray.stages.windows import funnel

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel(ds, ["view", "signup", "purchase"],
                  max_gap_us=72 * 3600 * 1_000_000)


def _q_lsh_lookup(sf_dir: str):
    """Query-time near-dup lookup against a PERSISTED LSH index
    (stages/dedup.py:lsh_export/lsh_lookup — the IVF/BM25/zonemap
    pruned-probe pattern applied to MinHash): index the planted-dup
    corpus once, then probe with doc 0's text reading only its ≤32
    band buckets; exact-Jaccard verify in integer ppm.  Oracle = exact
    shingle Jaccard of every corpus doc vs doc 0 (the minhash_dups
    recall argument: candidates are bimodal, banding recall ~1)."""
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from vyntr_ray.stages.dedup import lsh_export, lsh_lookup

    out = os.path.join("/tmp/vyntr_ray_cache",
                       f"lsh_idx_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    lsh_export(_planted_dup_docs(sf_dir), out)
    qt = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    qtext = qt.filter(pc.equal(qt["doc_id"], 0))["text"][0].as_py()
    return lsh_lookup(out, qtext, threshold=0.6)


def _q_conversion_lag(sf_dir: str):
    """Time-to-convert percentiles: per-user first view → first
    strictly-later purchase lag, exact quantile_disc selections at
    25/50/75/90 via distributed rank_select (the funnel step-time
    follow-up; lags computed in one user-keyed hash partition)."""
    import math

    import pandas as pd

    from vyntr_ray.stages.dataset_tools import rank_select
    from vyntr_ray.stages.windows import _by_part

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def lags(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"u": g["user_id"].to_numpy(),
                          "t": us, "e": g["event_type"].to_numpy()})
        t1 = (g[g["e"] == "view"].groupby("u")["t"].min()
              .rename("t1").reset_index())
        p = g[g["e"] == "purchase"].merge(t1, on="u")
        p = p[p["t"] > p["t1"]]
        t2 = p.groupby("u", as_index=False).agg(t2=("t", "min"),
                                                t1=("t1", "first"))
        return pd.DataFrame({
            "lag_us": (t2["t2"] - t2["t1"]).astype("int64")})

    lag_ds = (_by_part(ds, "user_id").groupby("_part").map_groups(
        lambda g: lags(g.drop(columns="_part")), batch_format="pandas")
        .materialize())
    n = lag_ds.count()
    qs = (0.25, 0.5, 0.75, 0.9)
    ranks = [min(n - 1, max(0, math.ceil(q * n) - 1)) for q in qs]
    rows = rank_select(lag_ds, ["lag_us"], ranks)
    out = {"n": pd.array([n], dtype="int64")}
    for q, r in zip(qs, rows):
        out[f"q{int(round(q * 100))}"] = pd.array([int(r["lag_us"])],
                                                  dtype="int64")
    return pd.DataFrame(out)


def _q_monthly_share(sf_dir: str):
    """Revenue share per order priority within each month, exact
    floored micro units (rev·10⁶ // month total) — the windowed-share
    report.  (month × priority) is constant-bounded: zero-shuffle
    _sum_keyed_partials fold, share math on O(months·priorities)
    driver rows.  Overflow bound rev·1e6 < 2⁶³ ⇒ monthly centi
    revenue < 9·10¹²¢ (document past that: HUGEINT / Python ints)."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        m = pc.month(t["o_orderdate"])
        ym = pc.add(pc.multiply(pc.cast(y, pa.int64()),
                                pa.scalar(100, pa.int64())),
                    pc.cast(m, pa.int64()))
        rev = pc.cast(_round_ha(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0))),
                      pa.int64())
        b = pa.table({"ym": ym, "pri": t["o_orderpriority"],
                      "n": pa.array(np.ones(t.num_rows, np.int64)),
                      "rev": rev})
        g = b.group_by(["ym", "pri"]).aggregate([("n", "sum"),
                                                 ("rev", "sum")])
        return g.rename_columns(["ym", "pri", "n", "rev"])

    g = _sum_keyed_partials(ds.map_batches(partial,
                                           batch_format="pyarrow"),
                            ["ym", "pri"], ["n", "rev"])
    tot = g.groupby("ym")["rev"].transform("sum")
    g["share_micro"] = ((g["rev"] * 1_000_000) // tot).astype("int64")
    return g.sort_values(["ym", "pri"]).reset_index(drop=True)


def _q_distinctive_terms(sf_dir: str):
    """Top-10 language-distinctive tokens by Dunning G² in exact
    integer micro-nats (stages/text_analysis.py:distinctive_terms) —
    per-block partials, one token-keyed hash partition, bounded
    per-group top-k partials; L(x)=floor(ln·1e6) shared-libm both
    sides."""
    from vyntr_ray.stages.text_analysis import distinctive_terms

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    return distinctive_terms(ds, group_col="lang", text_col="text",
                             k=10)


def _q_degree_assortativity(sf_dir: str):
    """Hub-mixing diagnostic of the co-purchase graph
    (stages/graph.py:degree_assortativity): Pearson corr of endpoint
    degrees over symmetrized edges — exact integer sufficient stats
    (Python-int driver fold, HUGEINT in SQL), one shared final
    division, round(…, 6) bit-for-bit."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import degree_assortativity

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=1)
    return degree_assortativity(edges, u_col="item_a", v_col="item_b")


def _q_itemsets3(sf_dir: str):
    """Apriori level 3: top-50 co-purchased part TRIPLES
    (stages/baskets.py:itemsets3 — per-basket triple partials, one
    first-item hash-partition fold, bounded top-k partials).  Tie-break
    (n DESC, a, b, c) mirrored in the oracle's LIMIT."""
    from vyntr_ray.stages.baskets import itemsets3

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return itemsets3(ds, "l_orderkey", "l_partkey", min_count=1, k=50)


def _q_basket_pairs(sf_dir: str):
    """Market-basket: top-100 co-purchased part pairs by order count
    (stages/baskets.py:basket_pairs — per-basket pair partials, one
    pair-key hash partition fold, bounded top-k partials).  Tie-break
    (n DESC, item_a, item_b) mirrored in the oracle's LIMIT."""
    from vyntr_ray.stages.baskets import basket_pairs

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return basket_pairs(ds, "l_orderkey", "l_partkey", min_count=1,
                        k=100)


def _q_triangle_count(sf_dir: str):
    """Exact triangle count over the SUPPORT-THRESHOLDED co-purchase
    graph (edges = part pairs sharing ≥2 orders, the adamic_adar /
    clustering_coeff graph; stages/graph.py:triangle_count — min-vertex
    wedge enumeration, co-partitioned closing-edge membership join).
    min_count=2 is the documented wedge-volume lever (r4 verdict item 5);
    the oracle mirrors it as HAVING count(*) >= 2."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import triangle_count

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=2)
    return triangle_count(edges, u_col="item_a", v_col="item_b")


def _q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (Gopher redundancy signal;
    stages/text_analysis.py:compression_ratio).  ROWS-ONLY by nature:
    no SQL engine exposes a compressor — determinism within the zlib
    build is pinned by pytest bounds instead."""
    from vyntr_ray.stages.text_analysis import compression_ratio

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return compression_ratio(ds).sort("doc_id")


def _q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction on the co-purchase graph: top-10
    non-adjacent part pairs by Σ 1/ln(deg) over common neighbors, in
    exact integer micro-units (stages/graph.py:adamic_adar — the
    weighted-wedge variant of the triangle machinery).  AA needs every
    wedge at its actual center (Σ deg² volume — degree orientation
    can't help), so the documented scale lever applies: the
    support-thresholded min_count=2 graph (same as clustering_coeff;
    was min_count=1 at 20.6 s/sf0.1, this shape ~4 s)."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import adamic_adar

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=2)
    out = adamic_adar(edges, k=10, u_col="item_a", v_col="item_b")
    return out.rename(columns={"node_a": "item_a", "node_b": "item_b"})


def _q_bloom_probe(sf_dir: str):
    """Bloom membership sketch with its false positives exposed
    (stages/sketches.py:bloom_probe): bitmap over the distinct heavy
    parts (l_quantity > 49), probed for every part key.  Completes the
    oracled sketch family (HLL / CMS / t-digest / frequent-items /
    Bloom); the SQL oracle rebuilds the identical m=8192/k=3 bitmap via
    md5_number_upper bucket arithmetic, so in_bloom matches
    value-for-value INCLUDING collisions (rows with in_bloom=1,
    is_member=0 are the filter's real FPs)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.sketches import bloom_probe

    mem = (_read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
           .map_batches(lambda t: t.filter(
               pc.greater(t["l_quantity"], 49.0)).select(["l_partkey"]),
               batch_format="pyarrow"))
    probes = _read(sf_dir, "part", columns=["p_partkey"])
    return bloom_probe(mem, probes, "l_partkey", "p_partkey",
                       m_bits=8192, k=3)


def _q_tfidf_topk(sf_dir: str):
    """Per-document top-3 TF-IDF keywords in exact integer micro-nats
    (stages/text_analysis.py:tfidf_topk) — idf_micro = floor(ln(N/df)
    ·1e6) via the shared-libm trick, score = tf·idf_micro pure int64;
    token df rides group_sum, the join back is one distributed
    hash_join, and the per-doc top-3 is a bounded combiner + ONE
    doc-hash partition.  Sibling of tfidf_keywords (search_index's
    integer-surrogate score): this one carries the REAL ln-idf
    weighting, exactly."""
    from vyntr_ray.stages.text_analysis import tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


def _q_fk_orphans(sf_dir: str):
    """FULL referential-integrity audit over the star schema
    (stages/dataset_tools.py:fk_orphans): orphan AND null-key counts
    for all SIX declared FKs — the complete-coverage, null-aware
    superset of fk_check (which audits orphans on two edges).
    Dimension parents broadcast (zero shuffle); the fact-scaled
    lineitem→orders edge rides the distributed anti_join — neither
    side lands on the driver."""
    from vyntr_ray.stages.dataset_tools import fk_orphans

    cons = [
        ("customer.nation",
         _read(sf_dir, "customer", columns=["c_nationkey"]), "c_nationkey",
         _read(sf_dir, "nation", columns=["n_nationkey"]), "n_nationkey",
         "broadcast"),
        ("lineitem.orders",
         _read(sf_dir, "lineitem", columns=["l_orderkey"]), "l_orderkey",
         _read(sf_dir, "orders", columns=["o_orderkey"]), "o_orderkey",
         "shuffle"),
        ("lineitem.part",
         _read(sf_dir, "lineitem", columns=["l_partkey"]), "l_partkey",
         _read(sf_dir, "part", columns=["p_partkey"]), "p_partkey",
         "broadcast"),
        ("lineitem.supplier",
         _read(sf_dir, "lineitem", columns=["l_suppkey"]), "l_suppkey",
         _read(sf_dir, "supplier", columns=["s_suppkey"]), "s_suppkey",
         "broadcast"),
        ("nation.region",
         _read(sf_dir, "nation", columns=["n_regionkey"]), "n_regionkey",
         _read(sf_dir, "region", columns=["r_regionkey"]), "r_regionkey",
         "broadcast"),
        ("orders.customer",
         _read(sf_dir, "orders", columns=["o_custkey"]), "o_custkey",
         _read(sf_dir, "customer", columns=["c_custkey"]), "c_custkey",
         "broadcast"),
    ]
    return fk_orphans(cons)


def _q_json_field_stats(sf_dir: str):
    """Per-event-type stats of the integer field inside the flat-JSON
    props payload (stages/dataset_tools.py:json_field_stats) — ONE
    vectorized RE2 extraction pass (pc.extract_regex; the vectorized
    replacement for event_json's per-row re.search, with null-tracking
    + min/max the sibling lacks), parity-tested vs json.loads; the
    constant-bounded key takes the zero-shuffle driver fold.  Oracle
    extracts via DuckDB's native json operator — independent path."""
    from vyntr_ray.stages.dataset_tools import json_field_stats

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    return json_field_stats(ds, "event_type", "props", "k")


def _q_embedding_covariance(sf_dir: str):
    """Exact integer second-moment matrix over the first 16 embedding
    dims (stages/embed.py:embedding_covariance) — the PCA/whitening
    sufficient stats: per-value half-away scaling (embedding_norms
    convention) makes every pairwise product int64-exact; each block
    condenses to one O(dims²) partial, driver folds O(dims²)."""
    from vyntr_ray.stages.embed import embedding_covariance

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_covariance(ds, dims=16)


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two customer
    rankings — top-100 by account balance and top-100 by order count —
    fused as rrf_micro = Σ 1e6 // (60 + rank), exact int64.  Each
    ranking is a distributed sort + limit (only 100 rows leave each);
    the fuse itself is an O(200)-row driver fold.  Sentinel rank 0
    marks absence from a list (mirrored by the oracle's coalesce)."""
    import pandas as pd

    from vyntr_ray.stages.dataset_tools import group_sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    top_bal = (cust.sort(["c_acctbal", "c_custkey"],
                         descending=[True, False]).limit(100).take_all())
    orders = (_read(sf_dir, "orders", columns=["o_custkey"])
              .map_batches(lambda t: t.append_column(
                  "one", pa.array(np.ones(t.num_rows, np.int64))),
                  batch_format="pyarrow"))
    cnt = group_sum(orders, "o_custkey", ["one"], rename={"one": "n"})
    top_cnt = (cnt.sort(["n", "o_custkey"], descending=[True, False])
               .limit(100).take_all())

    rb = {r["c_custkey"]: i + 1 for i, r in enumerate(top_bal)}
    rc = {r["o_custkey"]: i + 1 for i, r in enumerate(top_cnt)}
    rows = []
    for k in sorted(set(rb) | set(rc)):
        r1, r2 = rb.get(k, 0), rc.get(k, 0)
        rrf = ((1_000_000 // (60 + r1) if r1 else 0)
               + (1_000_000 // (60 + r2) if r2 else 0))
        rows.append((k, rrf, r1, r2))
    rows.sort(key=lambda t: (-t[1], t[0]))
    rows = rows[:20]
    return pd.DataFrame({
        "c_custkey": pd.array([r[0] for r in rows], dtype="int64"),
        "rrf_micro": pd.array([r[1] for r in rows], dtype="int64"),
        "rank_bal": pd.array([r[2] for r in rows], dtype="int64"),
        "rank_cnt": pd.array([r[3] for r in rows], dtype="int64")})


_POIS1_T = (6786177901268885504, 13572355802537771008,
            16965444753172213760, 18096474403383695360,
            18379231815936565248)  # floor(cumP_k(Poisson(1)) * 2^64)


def _q_poisson_bootstrap(sf_dir: str):
    """Deterministic distributed Poisson bootstrap (the scale-out
    bootstrap: per-row independent Poisson(1) weights instead of a
    global resample — Chamandy et al. 2012, public) over order totals:
    32 resamples, weight = inverse-CDF draw from the md5 uniform of
    (b, orderkey) decided by EXACT integer thresholds (floor(cumP·2^64)
    — no float compare anywhere), per-resample exact int sums folded
    from per-block partials, mean reported with the shared division.
    Consumers read the CI straight off the 32-row table."""
    import pyarrow.compute as pc

    from vyntr_ray.rounding import fround_half_away
    from vyntr_ray.state.filters import _hash64

    B = 32
    thresholds = np.array(_POIS1_T, np.uint64)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_pylist()
        v = pc.cast(_round_ha(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))),
            pa.int64()).to_numpy(zero_copy_only=False)
        bs, sws, swxs = [], [], []
        for b in range(B):
            h = _hash64([f"{b}:{i}" for i in ids])
            w = np.searchsorted(thresholds, h, side="right").astype(
                np.int64)
            bs.append(b)
            sws.append(int(w.sum()))
            swxs.append(int((w * v).sum()))
        return pa.table({"b": pa.array(bs, pa.int64()),
                         "sw": pa.array(sws, pa.int64()),
                         "swx": pa.array(swxs, pa.int64())})

    df = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["b"], ["sw", "swx"]).sort_values("b", ignore_index=True)
    df["mean_centi"] = [fround_half_away(float(x) / float(w), 6)
                        for x, w in zip(df["swx"], df["sw"])]
    for c in ("b", "sw", "swx"):
        df[c] = df[c].astype("int64")
    return df[["b", "sw", "swx", "mean_centi"]]


def _q_chunk_digests(sf_dir: str):
    """Content chunk table — the rsync/CDC-style fingerprint manifest a
    blob-sync or chunk-level dedup keys on: each document split into
    256-char chunks, per chunk the byte length + md5 digest (md5 of a
    VARCHAR is md5 of its UTF-8 bytes on both engines, so the digests
    replay exactly).  Stateless vectorized-per-block map; empty docs
    emit no chunks (oracle filters the empty piece)."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids, nos, nb, dg = [], [], [], []
        did = t["doc_id"].to_pylist()
        for i, txt in enumerate(t["text"].to_pylist()):
            txt = txt or ""
            for no in range(0, (len(txt) + 255) // 256):
                piece = txt[no * 256:(no + 1) * 256]
                raw = piece.encode("utf-8")
                ids.append(did[i])
                nos.append(no)
                nb.append(len(raw))
                dg.append(hashlib.md5(raw).hexdigest())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_no": pa.array(nos, pa.int64()),
                         "n_bytes": pa.array(nb, pa.int64()),
                         "digest": pa.array(dg, pa.string())})

    return (ds.map_batches(chunks, batch_format="pyarrow")
            .sort(["doc_id", "chunk_no"]))


def _q_wilson_ranking(sf_dir: str):
    """Sources ranked by quality-pass rate with the Wilson score lower
    bound (z=1.96) — the small-sample-correct ranking (a 3/3 source
    must NOT outrank a 95/100 one, which raw rate does).  Exact int
    sufficient stats (n, k) via zero-shuffle keyed partials; the float
    bound is evaluated in the identical operation order as the oracle
    (all z terms from the same 1.96 literal), round(…, 6) half-away."""
    import math

    import pyarrow.compute as pc

    from vyntr_ray.rounding import fround_half_away

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        passing = pc.cast(pc.greater_equal(
            t["n_chars"], pa.scalar(500, pa.int64())), pa.int64())
        return pa.table({"source": t["source"],
                         "one": pa.array(np.ones(t.num_rows, np.int64)),
                         "k": passing})

    df = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["one", "k"]).rename(columns={"one": "n"})
    z = 1.96
    rows = []
    for _, r in df.iterrows():
        n, k = int(r["n"]), int(r["k"])
        nd = float(n)
        p = float(k) / nd
        wl = ((p + z * z / (2.0 * nd)
               - z * math.sqrt((p * (1.0 - p) + z * z / (4.0 * nd))
                               / nd))
              / (1.0 + z * z / nd))
        rows.append((r["source"], n, k, wl))
    rows.sort(key=lambda t: (-t[3], t[0]))
    return pd.DataFrame({
        "source": [r[0] for r in rows],
        "n": pd.array([r[1] for r in rows], dtype="int64"),
        "k": pd.array([r[2] for r in rows], dtype="int64"),
        "wilson_lower": [fround_half_away(r[3], 6) for r in rows]})


def _q_day_churn_jaccard(sf_dir: str):
    """Day-over-day user-base stability: Jaccard similarity of
    consecutive days' ACTIVE-USER sets in exact floored micro units —
    the churn diagnostic next to retention's cohort view.  Distinct
    (day, user) rows each feed TWO day-pairs (as side B of yesterday's
    pair and side A of today's); ONE pair-hash partition folds
    inter/union vectorized (the minhash_accuracy fold pointed at
    activity sets).  Pairs need both days non-empty (oracle inner
    join)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import distinct_rows
    from vyntr_ray.stages.windows import _by_part

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day, pa.int64()),
                         "user_id": t["user_id"]})

    du = distinct_rows(ev.map_batches(day_user, batch_format="pyarrow"),
                       ["day", "user_id"])

    def fan(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        # pair p = (day p, day p+1); this row is side A of pair d and
        # side B of pair d-1
        return pa.table({
            "pair": pa.array(np.concatenate([d, d - 1]), pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(len(d), np.int8),
                 np.ones(len(d), np.int8)])),
            "user_id": pa.array(np.concatenate([u, u]), pa.int64())})

    rows = du.map_batches(fan, batch_format="pyarrow")

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for p, sub in g.groupby("pair", sort=True):
            a = sub.loc[sub["side"] == 0, "user_id"].to_numpy(np.int64)
            b = sub.loc[sub["side"] == 1, "user_id"].to_numpy(np.int64)
            if len(a) == 0 or len(b) == 0:
                continue
            inter = len(np.intersect1d(a, b))
            union = len(a) + len(b) - inter
            out.append((int(p), len(a), len(b), inter,
                        inter * 1_000_000 // union))
        return pd.DataFrame(out, columns=[
            "day", "n_today", "n_next", "inter",
            "jacc_micro"]).astype("int64")

    return (_by_part(rows, "pair", n_parts=16)
            .groupby("_part")
            .map_groups(lambda g: fold(g.drop(columns="_part")),
                        batch_format="pandas")
            .sort("day"))


def _q_bitmap_lookup(sf_dir: str):
    """Chunked bitmap-index build + AND-probe
    (stages/bitmap_index.py): one bitmap shard per (value, 4096-row
    chunk), OR-folded per co-partition; the conjunctive predicate
    lang='en' AND source='src7' is a per-chunk bitmap AND + popcount —
    no scan, no O(corpus) bitmap anywhere.  Completes the persisted-
    index family (IVF / LSH / zonemap / zorder / range / bitmap)."""
    from vyntr_ray.stages.bitmap_index import (bitmap_and_count,
                                               bitmap_build)

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source"])
    ia = bitmap_build(docs, "lang")
    ib = bitmap_build(docs, "source")
    return bitmap_and_count(ia, ib, "en", "src7")


def _q_forecast_naive_error(sf_dir: str):
    """Seasonal-naive backtest over daily revenue: forecast(day) =
    revenue(day − 7), scored as exact integer absolute errors + a
    floored-micro MAPE — the baseline every real forecast must beat.
    Daily centi-revenue via zero-shuffle keyed partials (calendar-
    bounded day domain), python-int driver fold; only days whose lag-7
    day EXISTS score (mirrored by the oracle's inner self-join)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        rev = pc.cast(_round_ha(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        g = (pa.table({"day": pa.array(day, pa.int64()), "rev": rev})
             .group_by("day").aggregate([("rev", "sum")]))
        return g.rename_columns(["day", "rev"])

    df = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["rev"])
    rev = {int(d): int(v) for d, v in zip(df["day"], df["rev"])}
    n = 0
    sum_abs = 0
    sum_ape_micro = 0
    for d in sorted(rev):
        if d - 7 in rev:
            err = abs(rev[d] - rev[d - 7])
            n += 1
            sum_abs += err
            sum_ape_micro += err * 1_000_000 // max(rev[d], 1)
    return pd.DataFrame({
        "n_days": pd.array([n], dtype="int64"),
        "sum_abs_err_centi": pd.array([sum_abs], dtype="int64"),
        "mape_micro": pd.array([sum_ape_micro // max(n, 1)],
                               dtype="int64")})


def _q_lateness_quantiles(sf_dir: str):
    """Stream out-of-orderness profile
    (stages/windows.py:lateness_quantiles): lateness vs the inclusive
    arrival-order watermark, exact quantile_disc selections via the
    distributed prefix-max + rank_select — the diagnostic that sizes a
    watermark allowance."""
    from vyntr_ray.stages.windows import lateness_quantiles

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])
    return lateness_quantiles(ds)


def _q_pretrain_pipeline(sf_dir: str):
    """The FULL pretraining-corpus curation flagship
    (pipelines/curate.py:pretrain_pipeline): normalize → quality gate
    → exact dedup → MinHash near-dup canonicalization (exact-Jaccard
    ≥0.6 verified, components, min-id keep) → 3-gram decontamination
    vs the %97 benchmark split → 5000-token budget sample.  curate
    extended with the two load-bearing steps of a real corpus run;
    the oracle replays the whole chain as one recursive-CTE SQL."""
    import pyarrow.compute as pc

    from vyntr_ray.pipelines.curate import pretrain_pipeline

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0)),
        batch_format="pyarrow")
    out = pretrain_pipeline(docs, bench)
    return out.sort("doc_id")


def _q_diversified_topk(sf_dir: str):
    """Diversity-constrained top-k (the search-results re-rank rule):
    global top-10 documents by length with AT MOST 2 per language —
    per-group head via the bounded group_topk combiner, then one
    distributed sort+limit.  Standard per-group-head-then-global-head
    semantics, mirrored by the oracle's QUALIFY window."""
    from vyntr_ray.stages.dataset_tools import group_topk

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])
    per_lang = group_topk(ds, "lang", "n_chars", "doc_id", k=2)
    return (per_lang.sort(["n_chars", "doc_id"],
                          descending=[True, False]).limit(10))


def _q_source_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources — the corpus-
    comparison diagnostic (how much does wiki's vocabulary overlap
    web's?): distinct (source, token) rows → per-token source BITMASK
    via group_sum (each bit appears once post-dedup, so sum == OR) →
    O(2^sources) mask counts fold on the driver; sizes and every
    pairwise intersection read off the mask histogram — ONE token
    shuffle total, never a token-pair join.  Zero-overlap pairs are
    omitted (mirrors the oracle's inner join)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import distinct_rows

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    pat = __import__("re").compile(r"[a-z0-9]+")

    def rows(t: pa.Table) -> pa.Table:
        srcs, toks = [], []
        sv = t["source"].to_pylist()
        for i, txt in enumerate(t["text"].to_pylist()):
            for w in set(pat.findall((txt or "").lower())):
                srcs.append(sv[i])
                toks.append(w)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    dst = distinct_rows(ds.map_batches(rows, batch_format="pyarrow"),
                        ["source", "token"])
    srcs = sorted(set(_sum_keyed_partials(
        dst.map_batches(lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow"), ["source"], ["one"])["source"]))
    bit_of = {s: 1 << i for i, s in enumerate(srcs)}

    def with_bit(t: pa.Table) -> pa.Table:
        bits = [bit_of[s] for s in t["source"].to_pylist()]
        return pa.table({"token": t["token"],
                         "bit": pa.array(bits, pa.int64())})

    from vyntr_ray.stages.dataset_tools import group_sum
    masks = group_sum(dst.map_batches(with_bit, batch_format="pyarrow"),
                      "token", ["bit"], rename={"bit": "mask"})
    hist = _sum_keyed_partials(
        masks.map_batches(lambda t: pa.table({
            "mask": t["mask"],
            "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"), ["mask"], ["one"])
    mk = hist["mask"].to_numpy(np.int64)
    ct = hist["one"].to_numpy(np.int64)
    has = {s: (mk & bit_of[s]) != 0 for s in srcs}
    size = {s: int(ct[has[s]].sum()) for s in srcs}

    out = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = int(ct[has[a] & has[b]].sum())
            if inter == 0:
                continue
            na, nb = size[a], size[b]
            out.append((a, b, na, nb, inter,
                        inter * 1_000_000 // (na + nb - inter)))
    out.sort()
    return pd.DataFrame({
        "src_a": [r[0] for r in out], "src_b": [r[1] for r in out],
        "n_a": pd.array([r[2] for r in out], dtype="int64"),
        "n_b": pd.array([r[3] for r in out], dtype="int64"),
        "inter": pd.array([r[4] for r in out], dtype="int64"),
        "jacc_micro": pd.array([r[5] for r in out], dtype="int64")})


def _q_markov_stationary(sf_dir: str):
    """Stationary distribution of the behavior Markov chain — where a
    random session spends its time in the limit: 12 synchronized
    power-iteration steps over the event_markov transition table in
    EXACT floored micro units (each term ``(π_i·n_ij) // total_i``,
    non-negative trunc==floor), python-int driver fold over the
    bounded state set; the oracle is the identical unrolled
    MATERIALIZED-CTE chain (the pagerank/kcore/sssp replay family)."""
    trans = _transitions_counts(sf_dir).to_pandas()
    states = sorted(set(trans["src"]))
    totals = trans.groupby("src")["n"].sum().to_dict()
    edges = [(r["src"], r["dst"], int(r["n"])) for _, r in
             trans.iterrows() if r["dst"] in set(states)]
    pi = {s: 1_000_000 // len(states) for s in states}
    for _ in range(12):
        nxt = {s: 0 for s in states}
        for s, d, n in edges:
            nxt[d] += (pi[s] * n) // int(totals[s])
        pi = nxt
    return pd.DataFrame({
        "event_type": states,
        "pi_micro": pd.array([pi[s] for s in states], dtype="int64")})


def _q_lerp_fill(sf_dir: str):
    """Linear-interpolation daily resample per user
    (stages/windows.py:lerp_fill) — anchors keep their latest value,
    gap days take the exact integer lerp between surrounding anchors
    (non-negative domain: engine floor-div == oracle trunc ``//``)."""
    from vyntr_ray.stages.windows import lerp_fill

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return lerp_fill(ds).sort(["user_id", "day_us"])


def _q_schema_evolution_read(sf_dir: str):
    """Lakehouse schema-evolution read (sources/evolve.py:
    read_union_by_name): two parquet generations written with different
    column subsets (gen1 = even orderkeys, pre-price schema; gen2 = odd
    orderkeys with o_totalprice) are read back UNION-BY-NAME with a
    null default for the missing column — pruned per-generation reads,
    vectorized align stage, streaming union, no shuffle.  The oracle
    replays the generation split arithmetically (orderkey parity)."""
    import tempfile

    import pyarrow.compute as pc

    from vyntr_ray.sources.evolve import read_union_by_name

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    # scratch under the documented cleanable cache dir (CLAUDE.md)
    cache = "/tmp/vyntr_ray_cache/evolve"
    os.makedirs(cache, exist_ok=True)
    root = tempfile.mkdtemp(prefix="gen_", dir=cache)
    g1, g2 = f"{root}/gen1", f"{root}/gen2"
    (ds.map_batches(lambda t: t.filter(pc.equal(
        pc.bit_wise_and(t["o_orderkey"], pa.scalar(1, pa.int64())),
        pa.scalar(0, pa.int64()))).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow").write_parquet(g1))
    (ds.map_batches(lambda t: t.filter(pc.equal(
        pc.bit_wise_and(t["o_orderkey"], pa.scalar(1, pa.int64())),
        pa.scalar(1, pa.int64()))),
        batch_format="pyarrow").write_parquet(g2))

    merged = read_union_by_name(
        [g1, g2],
        schema={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                "o_totalprice": pa.float64()},
        defaults={"o_totalprice": None})

    def project(t: pa.Table) -> pa.Table:
        # round the VALID values only (the numpy round path turns
        # nulls into NaN, which cast-to-int rejects), then substitute
        # the -1 sentinel by mask
        valid = pc.is_valid(t["o_totalprice"])
        filled = pc.fill_null(t["o_totalprice"], 0.0)
        price = pc.cast(_round_ha(pc.multiply(
            filled, pa.scalar(100.0))), pa.int64())
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_centi": pc.if_else(valid, price,
                                      pa.scalar(-1, pa.int64()))})

    return (merged.map_batches(project, batch_format="pyarrow")
            .sort("o_orderkey"))


def _q_autocorr_daily(sf_dir: str):
    """Lag-1 autocorrelation of daily revenue — the time-series
    persistence diagnostic: daily centi-revenue via zero-shuffle keyed
    partials (day domain is calendar-bounded), consecutive-day pairs
    folded to exact PYTHON-int sufficient stats on the driver (Σx²
    wraps int64 at fact scale — the oracle uses HUGEINT), Pearson via
    the qty_discount_corr shared-IEEE formula."""
    import pyarrow.compute as pc

    from vyntr_ray.rounding import fround_half_away

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        rev = pc.cast(_round_ha(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        g = (pa.table({"day": pa.array(day, pa.int64()), "rev": rev})
             .group_by("day").aggregate([("rev", "sum")]))
        return g.rename_columns(["day", "rev"])

    df = _sum_keyed_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["rev"]).sort_values("day", ignore_index=True)
    xs = [int(v) for v in df["rev"]]
    pairs = list(zip(xs[:-1], xs[1:]))
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    import math
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                    * (float(n) * float(syy) - float(sy) * float(sy)))
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "autocorr": [fround_half_away(num / den, 6)]})


def _q_mahalanobis2(sf_dir: str):
    """Top-10 bivariate outliers by 2-D Mahalanobis distance on
    (quantity, extendedprice)
    (stages/dataset_tools.py:mahalanobis_outliers) — the multivariate
    member of the outlier family; exact int sufficient stats, shared
    IEEE closed-form 2×2 inverse per row."""
    from vyntr_ray.stages.dataset_tools import mahalanobis_outliers

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice"])
    return mahalanobis_outliers(ds, "l_quantity", "l_extendedprice",
                                ["l_orderkey", "l_linenumber"], k=10)


def _q_path_topk(sf_dir: str):
    """Top-20 daily user-journey paths (stages/windows.py:path_topk):
    FULL '>'-joined event-type sequences per (user, calendar day) in
    (ts, id) order — unbounded path domain, so counts ride group_sum
    (data-scaled string key) after ONE user-hash partition builds the
    paths.  Contrast session_paths: 1800s-gap sessions truncated to 3
    steps, whose |types|³-bounded domain folds driver-side."""
    from vyntr_ray.stages.windows import path_topk

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    return path_topk(ds, k=20)


def _q_pmi_pairs(sf_dir: str):
    """Top-20 DOCUMENT-co-occurrence associations by PMI among
    frequent terms (stages/text_analysis.py:pmi_pairs) in exact integer
    micro-nats — unbounded-distance pairs within a doc (topic
    association), vs bigram_pmi's ADJACENT-pair collocations (phrase
    detection).  The df ≥ N/20 gate bounds the kept vocabulary (a
    corpus-shape constant) so pair fan-out never explodes."""
    from vyntr_ray.stages.text_analysis import pmi_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pmi_pairs(ds, k=20, min_pair=5, df_frac=20)


def _q_benford_deviation(sf_dir: str):
    """Benford first-digit audit of order totals
    (stages/dataset_tools.py:benford_deviation): observed vs expected
    digit shares in exact floored micro units, zero-shuffle (9-key
    driver fold), shared-libm log10."""
    from vyntr_ray.stages.dataset_tools import benford_deviation

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    return benford_deviation(ds, "o_totalprice")


def _q_group_moments(sf_dir: str):
    """Per-event-type skewness + excess kurtosis from exact integer
    sufficient stats (stages/dataset_tools.py:group_moments): Σx³/Σx⁴
    ride as decimal strings (the chi2 HUGEINT class), the shared-IEEE
    reduction uses m2·sqrt(m2) — sqrt is exact where pow is not."""
    from vyntr_ray.stages.dataset_tools import group_moments

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return group_moments(ds, "event_type", "value", scale=100)


def _q_clustering_coeff(sf_dir: str):
    """Local clustering coefficients on the support-thresholded
    co-purchase graph (edges in ≥2 orders;
    stages/graph.py:clustering_coefficients): min-vertex wedges credit
    all three triangle vertices, coeff in exact floored micro units.
    The min_count=2 threshold is the documented wedge-volume lever."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import clustering_coefficients

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=2)
    return clustering_coefficients(edges, u_col="item_a",
                                   v_col="item_b")


def _q_minhash_accuracy(sf_dir: str):
    """MinHash estimate vs TRUE Jaccard per document pair
    (stages/sketches.py:minhash_accuracy): one md5 per shingle, 16
    XOR-fold permutations, exact hashed-space Jaccard alongside — the
    sketch-error diagnostic, fully replayed by the oracle via
    md5_number_upper + xor."""
    from vyntr_ray.stages.sketches import minhash_accuracy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_accuracy(ds, n_perm=16)


def _q_bigram_logprob(sf_dir: str):
    """Per-doc corpus-fit bigram LM score in exact micro-nats
    (stages/text_analysis.py:bigram_logprob) — the CCNet-style fluency
    / quality signal one order above unigram_logprob; floored
    shared-libm logs keep engine and oracle in pure int64."""
    from vyntr_ray.stages.text_analysis import bigram_logprob

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_logprob(ds)


def _q_rolling_sum_time(sf_dir: str):
    """Per-user trailing 1-hour sum — the RANGE-frame (time-window)
    sibling of rolling_sum (stages/windows.py:rolling_sum_time).
    SQL RANGE semantics: equal-ts peers are in frame regardless of the
    id tie-break, mirrored by searchsorted bounds on both sides."""
    from vyntr_ray.stages.windows import rolling_sum_time
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return rolling_sum_time(ds, window_s=3600)


def _q_group_zscores(sf_dir: str):
    """Per-event-type z-score normalization of event values (broadcast
    moments, no per-row shuffle)."""
    from vyntr_ray.stages.text_analysis import group_zscores
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    return group_zscores(ds, "event_type", "value", "event_id")


def _q_distinct_users(sf_dir: str):
    """Exact distinct users per event_type (pair-dedup, no value sets)."""
    from vyntr_ray.stages.sketches import group_count_distinct
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return group_count_distinct(ds, "event_type", "user_id")


def _q_distinct_users_hll(sf_dir: str):
    """Approximate distinct users per event_type via mergeable HLL
    sketches.  Oracled EXACTLY: the md5-derived hash is DuckDB's
    ``md5_number_upper``, so the oracle rebuilds the same p=12
    registers in SQL (index = top 12 bits, rank = leading zeros of the
    low 52 via integer bit tests) and applies the same estimator +
    small-range correction — sketch-for-sketch equivalence, not a
    tolerance check."""
    from vyntr_ray.stages.sketches import hll_count_distinct
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_count_distinct(ds, "event_type", "user_id")


def _q_value_quantiles_tdigest(sf_dir: str):
    """Per-event-type approximate quantiles via mergeable t-digests —
    the no-prior-range, tail-accurate scale path for `value_quantiles`
    (rows-only check: interpolated estimates are not SQL-expressible;
    rank error vs exact is pinned by tests/test_stages.py)."""
    from vyntr_ray.stages.sketches import group_quantiles_tdigest
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return group_quantiles_tdigest(ds, "event_type", "value")


def _q_scrub_pii(sf_dir: str):
    """PII redaction over text with deterministically planted PII (the
    synthetic corpus has none, so both sides append the same suffix)."""
    from vyntr_ray.stages.clean import scrub_pii_batch

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        planted = [
            f"{x or ''} contact user{i}@example.com or 10.0.{i % 256}."
            f"{(i * 7) % 256} tel +1-555-0100"
            for i, x in zip(ids, t["text"].to_pylist())]
        return t.set_column(t.schema.get_field_index("text"), "text",
                            pa.array(planted, pa.string()))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(plant, batch_format="pyarrow")
            .map_batches(scrub_pii_batch, batch_format="pyarrow"))


def _q_components(sf_dir: str):
    """Dedup-cluster resolution: connected components over a
    deterministic edge set (doc d linked to 2d and 3d when present)."""
    import pyarrow.compute as pc
    import ray

    from vyntr_ray.stages.graph import connected_components

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    ids_ref = ray.put(pa.array(
        sorted(r["doc_id"] for r in ds.take_all()), pa.int64()))

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        d = d[d > 0]
        us, vs = [], []
        for mult in (2, 3):
            cand = d * mult
            ok = pc.is_in(pa.array(cand, pa.int64()),
                          value_set=ray.get(ids_ref)).to_numpy(
                              zero_copy_only=False)
            us.append(d[ok])
            vs.append(cand[ok])
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    return connected_components(ds.map_batches(edges,
                                               batch_format="pyarrow"))


def _q_pagerank(sf_dir: str):
    """Link-importance over the same deterministic doc graph as
    `components` (d → 2d, 3d), 10 damped iterations.  Oracled against
    an UNROLLED 10-iteration DuckDB CTE chain mirroring the exact float
    recurrence; ranks micro-scaled to int64 on both sides (per-step
    float drift is ~1e-15, nine orders below the rounding boundary)."""
    import pyarrow.compute as pc
    import ray

    from vyntr_ray.stages.graph import pagerank

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    ids_ref = ray.put(pa.array(
        sorted(r["doc_id"] for r in ds.take_all()), pa.int64()))

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        d = d[d > 0]
        us, vs = [], []
        for mult in (2, 3):
            cand = d * mult
            ok = pc.is_in(pa.array(cand, pa.int64()),
                          value_set=ray.get(ids_ref)).to_numpy(
                              zero_copy_only=False)
            us.append(d[ok])
            vs.append(cand[ok])
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    out = pagerank(ds.map_batches(edges, batch_format="pyarrow"))

    def micro(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        r = pc.cast(_round_ha(pc.multiply(t["rank"], pa.scalar(1_000_000.0))),
                    pa.int64())
        return pa.table({"node": t["node"], "rank_micro": r})

    return out.map_batches(micro, batch_format="pyarrow")


def _q_stratified_sample(sf_dir: str):
    """Exactly 40 events per event_type, deterministic md5-hash order."""
    from vyntr_ray.stages.sampling import stratified_sample
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type"])
    return stratified_sample(ds, "event_type", key_col="event_id", k=40)


def _q_keep_best_doc(sf_dir: str):
    """Canonicalization dedup: per (lang, source) keep the single best
    doc by (n_chars desc, doc_id asc) — group_topk with k=1 over a
    composite key."""
    from vyntr_ray.stages.dataset_tools import group_topk

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "source", "n_chars"])

    def with_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(t["lang"], t["source"], "|")
        return t.append_column("grp", key)

    out = group_topk(ds.map_batches(with_key, batch_format="pyarrow"),
                     "grp", "n_chars", "doc_id", k=1)
    return out.map_batches(lambda t: t.drop_columns(["grp"]),
                           batch_format="pyarrow")


def _q_filter_above_median(sf_dir: str):
    """Quantile-gated filtering: events strictly above their type's
    exact median (quantile_disc 0.5) — the 'keep the top half by
    quality' curation step.  The tiny per-group median table broadcasts
    (`ray.put` once); no shuffle touches the event rows."""
    import ray

    from vyntr_ray.stages.dataset_tools import group_quantiles

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    med = {r["event_type"]: r["q50"]
           for r in group_quantiles(ds, "event_type", "value",
                                    qs=(0.5,)).take_all()}
    med_ref = ray.put(med)

    def keep(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        vals = t["value"].to_numpy()
        gates = np.array([m[g] for g in t["event_type"].to_pylist()])
        return t.filter(pa.array(vals > gates))

    return ds.map_batches(keep, batch_format="pyarrow")


def _q_index_prep(sf_dir: str):
    from vyntr_ray.stages.index_prep import index_prep
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source"])
    out = index_prep(ds, blocklist=_BLOCKLIST)
    return out.select_columns(["doc_id", "preview", "lang", "nsfw"])


def _q_mean_pool(sf_dir: str):
    from vyntr_ray.stages.embed import mean_pool
    return mean_pool(_read(sf_dir, "embeddings"))


def _q_chunks(sf_dir: str):
    from vyntr_ray.stages.embed import chunk_documents
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds).select_columns(
        ["doc_id", "chunk_id", "n_tokens"])


def _q_chunk_embeddings(sf_dir: str):
    """chunk → embed → per-doc mean-pool, exploded (doc_id, pos, mean_val)."""
    from vyntr_ray.stages.embed import chunk_documents, embed_chunks, mean_pool
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    chunks = chunk_documents(ds)
    emb = embed_chunks(chunks, dim=16)
    return mean_pool(emb, key_col="doc_id")


def _q_ann_topk(sf_dir: str):
    from vyntr_ray.stages.similarity import cosine_topk
    return cosine_topk(_read(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"]),
                       _qvec(), k=10)


def _q_knn_join(sf_dir: str):
    """Batch k-NN: top-5 neighbors for every query row (vec_id % 50 == 0)."""
    import numpy as np

    from vyntr_ray.stages.similarity import knn_join
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["vec_id"].to_numpy() % 50 == 0))

    # only the (small) query side reaches the driver
    qrows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    q_mat = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    q_ids = np.array([r["vec_id"] for r in qrows], np.int64)
    return knn_join(ds, q_mat, q_ids, k=5)


def _q_embedding_dups(sf_dir: str):
    from vyntr_ray.stages.dedup import embedding_dup_pairs
    return embedding_dup_pairs(_read(sf_dir, "embeddings"), threshold=0.3)


def _q_autocomplete(sf_dir: str):
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["source"])
    filtered = ds.map_batches(
        lambda t: t.filter(pc.starts_with(t["source"], "src1")),
        batch_format="pyarrow")
    counted = filtered.groupby("source").count().map_batches(
        lambda t: t.rename_columns(["source", "n"]), batch_format="pyarrow")
    return counted.sort(["n", "source"], descending=[True, False]).limit(10)


def _q_query_counts(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    out = ds.groupby("event_type").count()
    return out.map_batches(lambda t: t.rename_columns(["event_type", "n"]),
                           batch_format="pyarrow")


def _q_query_counts_merge(sf_dir: str):
    """A5 counter upsert: merge a base counts table with new increments.

    Models `website/src/lib/server/search.ts:126-144` (ON CONFLICT count =
    count + 1): counts from the first half of the log merged into counts
    from the second half via union + groupby-sum.
    """
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def split(batch: pa.Table, keep_low: bool) -> pa.Table:
        mask = pc.less(pc.bit_wise_and(batch["event_id"], 1), 1)
        return batch.filter(mask if keep_low else pc.invert(mask))

    low = ds.map_batches(lambda b: split(b, True), batch_format="pyarrow")
    high = ds.map_batches(lambda b: split(b, False), batch_format="pyarrow")
    base = low.groupby("event_type").count().map_batches(
        lambda t: t.rename_columns(["event_type", "n"]),
        batch_format="pyarrow")
    inc = high.groupby("event_type").count().map_batches(
        lambda t: t.rename_columns(["event_type", "n"]),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return base.union(inc).groupby("event_type").aggregate(
        Sum("n", alias_name="count"))


def _q_trending_items(sf_dir: str):
    """Trending items: top-5 JSON prop values per day by day-over-day
    count growth (n − n at day−1, 0 when absent) — the "what's rising"
    leaderboard.  (day × k) is CONSTANT-bounded, so the partial counts
    fold zero-shuffle on the driver (_sum_keyed_partials rule); the
    calendar self-join + rank run on O(days·items) rows."""
    import re

    import pandas as pd
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["ts", "props"])
    pat = re.compile(r'"k":\s*(\d+)')
    day = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(day, pa.int64())).to_numpy()
        ks = [int(m.group(1)) if (m := pat.search(p or "")) else 0
              for p in t["props"].to_pylist()]
        agg = (pd.DataFrame({"d": d, "k": ks}).groupby(["d", "k"])
               .size().rename("n").reset_index())
        return pa.Table.from_pandas(agg.astype("int64"),
                                    preserve_index=False)

    g = _sum_keyed_partials(ds.map_batches(partial,
                                           batch_format="pyarrow"),
                            ["d", "k"], ["n"])
    prev = g.rename(columns={"n": "n_prev"}).copy()
    prev["d"] = prev["d"] + 1
    m = g.merge(prev, on=["d", "k"], how="left")
    m["n_prev"] = m["n_prev"].fillna(0).astype("int64")
    m["growth"] = (m["n"] - m["n_prev"]).astype("int64")
    m = m.sort_values(["d", "growth", "k"],
                      ascending=[True, False, True])
    top = m.groupby("d", as_index=False).head(5)
    return pd.DataFrame({
        "day_us": (top["d"] * day).astype("int64").to_numpy(),
        "k": top["k"].to_numpy(),
        "n": top["n"].to_numpy(),
        "n_prev": top["n_prev"].to_numpy(),
        "growth": top["growth"].to_numpy()})


def _q_event_json(sf_dir: str):
    """JSON prop extraction + exact integer aggregate per event type."""
    import re

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    pat = re.compile(r'"k":\s*(\d+)')

    def extract(batch: pa.Table) -> pa.Table:
        ks = [int(m.group(1)) if (m := pat.search(p or "")) else 0
              for p in batch["props"].to_pylist()]
        return pa.table({"event_type": batch["event_type"],
                         "k": pa.array(ks, pa.int64())})

    from ray.data.aggregate import Count, Sum
    return (ds.map_batches(extract, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("k", alias_name="sum_k"),
                       Count(alias_name="n_events")))


def _q_events_window(sf_dir: str):
    """Tumbling 1-hour window per user: count + value sum (streaming shape)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def win(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        w = pc.divide(us, 3_600_000_000)
        return pa.table({"user_id": batch["user_id"],
                         "window_id": w, "value": batch["value"]})

    agg = (ds.map_batches(win, batch_format="pyarrow")
           .groupby(["user_id", "window_id"])
           .aggregate(Count(alias_name="n"),
                      Sum("value", alias_name="sum_value")))
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("sum_value"),
                               "sum_value", _round_ha(t["sum_value"], 3)),
        batch_format="pyarrow")


def _q_sliding_window(sf_dir: str):
    """Overlapping 2h windows every 1h per user (explode + one groupby)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.windows import sliding
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    agg = sliding(ds, size_s=7200, step_s=3600)
    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("sum_value"),
                               "sum_value", _round_ha(t["sum_value"], 3)),
        batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    """Gap-based sessions (30 min) per user — gaps-and-islands."""
    from vyntr_ray.stages.windows import sessionize
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    return sessionize(ds, gap_s=1800)


def _q_lineitem_join(sf_dir: str):
    """Large-large hash join (Dataset.join) + grouped revenue aggregate."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])

    def revenue(batch: pa.Table) -> pa.Table:
        # per-row integer scaling (price and discount are 2-decimal, so
        # price·(1−disc)·10⁴ is exactly integral): the SUM is then exact
        # int64 arithmetic on both engine and oracle side — a float sum
        # rounded post-hoc is 1-ulp flaky at ~1e8 magnitude (the
        # sessionize lesson)
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        rev_dmilli = pc.cast(_round_ha(pc.multiply(rev, pa.scalar(10_000.0))),
                             pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "revenue_dmilli": rev_dmilli})

    revenue_ds = li.map_batches(revenue, batch_format="pyarrow")
    joined = revenue_ds.join(orders, join_type="inner", num_partitions=8,
                             on=("l_orderkey",), right_on=("o_orderkey",))
    return (joined.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_items"),
                       Sum("revenue_dmilli",
                           alias_name="total_revenue_dmilli")))


def _q_tpch_q1(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def derive(batch: pa.Table) -> pa.Table:
        # per-row integer scaling (see _q_lineitem_join): quantity is
        # integral, price 2-decimal, price·(1−disc) 4-decimal — exact
        # int64 sums replace float-sum-then-round (1-ulp flaky at 1e8+)
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": pc.cast(_round_ha(batch["l_quantity"]), pa.int64()),
            "base_centi": pc.cast(_round_ha(pc.multiply(
                batch["l_extendedprice"], pa.scalar(100.0))), pa.int64()),
            "disc_dmilli": pc.cast(_round_ha(pc.multiply(
                disc, pa.scalar(10_000.0))), pa.int64()),
        })

    return (ds.map_batches(derive, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty", alias_name="sum_qty"),
                       Sum("base_centi", alias_name="sum_base_price_centi"),
                       Sum("disc_dmilli", alias_name="sum_disc_price_dmilli"),
                       Count(alias_name="count_order")))


def _q_region_customers(sf_dir: str):
    """customer ⋈ nation ⋈ region via broadcast small-side lookups."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({n: r2name[r] for n, r in n2r.items()})

    def attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        names = [lut[n] for n in batch["c_nationkey"].to_pylist()]
        return batch.append_column("r_name", pa.array(names, pa.string()))

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def centi(batch: pa.Table) -> pa.Table:
        # acctbal is 2-decimal → exact int64 sum (see _q_tpch_q1)
        return batch.append_column(
            "acctbal_centi",
            pc.cast(_round_ha(pc.multiply(batch["c_acctbal"],
                                         pa.scalar(100.0))), pa.int64()))

    return (ds.map_batches(attach, batch_format="pyarrow")
            .map_batches(centi, batch_format="pyarrow")
            .groupby("r_name")
            .aggregate(Count(alias_name="n_customers"),
                       Sum("acctbal_centi", alias_name="total_acctbal_centi")))


def _q_orders_topk(sf_dir: str):
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return (ds.sort(["o_totalprice", "o_orderkey"],
                    descending=[True, False]).limit(10)
            .select_columns(["o_orderkey", "o_totalprice"]))


def _q_relevant_text(sf_dir: str):
    """M9 projection (Title/Description/Content template + strip)."""
    from vyntr_ray.functions.project import relevant_text_batch
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(
        lambda b: relevant_text_batch(b, content_col="text"),
        batch_format="pyarrow")
        .select_columns(["doc_id", "relevant_text"]))


def _q_inactive_customers(sf_dir: str):
    """J2-style left anti-join: keys in customer never seen in events."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    active = set(pq.read_table(f"{sf_dir}/events.parquet",
                               columns=["user_id"])["user_id"].to_pylist())
    ref = ray.put(pa.array(sorted(active), pa.int64()))

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(
            batch["c_custkey"], value_set=ray.get(ref))))

    ds = _read(sf_dir, "customer", columns=["c_custkey"])
    return ds.map_batches(anti, batch_format="pyarrow")


def _q_nation_agg(sf_dir: str):
    """J3-style join + ordered string_agg per group."""
    import pyarrow.parquet as pq
    import ray

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    lut_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        names = [lut[n] for n in batch["c_nationkey"].to_pylist()]
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "c_name": batch["c_name"]})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": [g["n_name"].iloc[0]],
            "customers": [" ".join(sorted(g["c_name"]))],
        })

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_name"])
    return (ds.map_batches(attach, batch_format="pyarrow")
            .groupby("n_name").map_groups(agg, batch_format="pandas"))


_BM25_TERMS = ["data", "scan", "merge"]


def _q_chunk_upsert(sf_dir: str):
    """S9/S10 upsert-sink semantics end-to-end: seed the keyed store
    with (doc_id, chunk_id) rows, then upsert a conflicting second
    batch (ON CONFLICT DO UPDATE — incoming wins) and read the store
    back.  The merge is per-hash-partition with atomic renames."""
    import shutil

    from vyntr_ray.sources.upsert import read_store, upsert_parquet

    store = os.path.join("/tmp/vyntr_ray_cache",
                         f"upsert_demo_{os.path.basename(sf_dir)}")
    shutil.rmtree(store, ignore_errors=True)

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def batch1(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        d = d[d % 2 == 0]
        ids = np.repeat(d, 2)
        cks = np.tile(np.array([0, 1], np.int64), len(d))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(cks, pa.int64()),
                         "val": pa.array(ids * 100 + cks, pa.int64())})

    def batch2(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        d = d[d % 3 == 0]
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "chunk_id": pa.array(np.zeros(len(d), np.int64)),
                         "val": pa.array(d * 1000 + 7, pa.int64())})

    keys = ["doc_id", "chunk_id"]
    upsert_parquet(ds.map_batches(batch1, batch_format="pyarrow"),
                   store, keys, n_parts=8).materialize()
    upsert_parquet(ds.map_batches(batch2, batch_format="pyarrow"),
                   store, keys, n_parts=8).materialize()
    return read_store(store).select_columns(["doc_id", "chunk_id", "val"])


def _q_inverted_index(sf_dir: str):
    """Inverted-index build (Pulse analog): (term, df, total_tf) summary."""
    from vyntr_ray.stages.search_index import build_text_index, index_summary
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_text_index(ds, cache_key=_cache_key(sf_dir, "textidx"))
    return index_summary(idx)


def _q_bm25_topk(sf_dir: str):
    """BM25 ranked top-10 over the inverted index (pruned shard reads)."""
    from vyntr_ray.stages.search_index import bm25_topk, build_text_index
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_text_index(ds, cache_key=_cache_key(sf_dir, "textidx"))
    return bm25_topk(idx, _BM25_TERMS, k=10)


def _q_bm25_tantivy(sf_dir: str):
    """Tantivy-parameterized BM25 top-10 (r5): same pruned-index read as
    bm25_topk, scored with the one-byte lossy fieldnorm
    (stages/fieldnorm.py — keep-top-4-significant-bits floor on the doc
    length, Lucene SmallFloat byte4 == Tantivy src/fieldnorm/code.rs
    model) while avgdl stays the exact segment mean — the parameterization
    Pulse actually serves (pulse/src/main.rs:45-54).  The oracle replays
    the quantization as (dl >> (bits−4)) << (bits−4) via printf('%b'),
    verified identical to the 256-entry table for dl in 1..200k."""
    from vyntr_ray.stages.search_index import bm25_topk, build_text_index
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_text_index(ds, cache_key=_cache_key(sf_dir, "textidx"))
    return bm25_topk(idx, _BM25_TERMS, k=10, tantivy_norms=True)


def _q_bm25_fielded(sf_dir: str):
    """Multi-field BM25 with filters — the Pulse QueryParser surface
    (`pulse/src/bin/server.rs:165-173`: fields [title, content, meta,
    language]; `website/src/lib/server/search.ts:102-124`: NOT nsfw).
    Fields derived deterministically from documents: title = first 8
    tokens, content = text, meta = source; language filter 'en', nsfw =
    the index_prep blocklist sources.  Boosts title 2.0 / meta 1.5 /
    content 1.0."""
    from vyntr_ray.stages.search_index import (TEXT_TOKEN,
                                               bm25_fielded_topk,
                                               build_fielded_index)
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source"])

    def derive(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        srcs = t["source"].to_pylist()
        titles = [" ".join(TEXT_TOKEN.findall((x or "").lower())[:8])
                  for x in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "title": pa.array(titles, pa.string()),
            "content": t["text"],
            "meta": t["source"],
            "lang": t["lang"],
            "nsfw": pa.array([s in _BLOCKLIST for s in srcs], pa.bool_()),
        })

    fds = ds.map_batches(derive, batch_format="pyarrow")
    idx = build_fielded_index(
        fds, _cache_key(sf_dir, "fieldedidx"),
        fields=[("title", "title"), ("content", "content"),
                ("meta", "meta")],
        attr_cols=["lang", "nsfw"])
    return bm25_fielded_topk(
        idx, _BM25_TERMS, k=10,
        boosts={"title": 2.0, "content": 1.0, "meta": 1.5},
        language="en", exclude_attr="nsfw")


def _q_bm25_phrase(sf_dir: str):
    """Quoted-phrase search — the Tantivy QueryParser phrase syntax
    (`pulse/src/bin/server.rs:165-173`): '"data line"' matches docs where
    the terms are ADJACENT, via the positional index; integer
    ``score_micro = phrase_tf · idf_micro`` (the tfidf surrogate) keeps
    the top-k exact on both engines."""
    from vyntr_ray.stages.search_query import (boolean_search,
                                               build_positional_index)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_positional_index(ds, cache_key=_cache_key(sf_dir, "positidx"))
    return boolean_search(idx, '"data line"', k=50)


def _q_search_boolean(sf_dir: str):
    """Boolean query tree — Tantivy QueryParser AND/OR/NOT semantics:
    ``merge join -spark OR "batch batch"`` = (merge AND join AND NOT
    spark) OR the adjacent phrase.  Distributed flag-aggregation match +
    integer tf·idf_micro scoring over the positive nodes."""
    from vyntr_ray.stages.search_query import (boolean_search,
                                               build_positional_index)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_positional_index(ds, cache_key=_cache_key(sf_dir, "positidx"))
    return boolean_search(idx, 'merge join -spark OR "batch batch"', k=50)


def _q_tfidf_keywords(sf_dir: str):
    """Per-doc keyword extraction: top-5 terms by tf-idf (integer
    score surrogate -> exact top-k on both engines)."""
    from vyntr_ray.stages.search_index import tfidf_keywords
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_keywords(ds, k=5)


def _q_search_topk(sf_dir: str):
    """K5: term-frequency scored top-10 (Pulse search analog)."""
    import re

    terms = [re.compile(r"crawl"), re.compile(r"index")]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sc = [sum(len(t.findall(x or "")) for t in terms) for x in texts]
        return pa.table({"doc_id": batch["doc_id"],
                         "score": pa.array(sc, pa.int64())})

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["score", "doc_id"], descending=[True, False]).limit(10))


# --- non-SQL (rows-only) ----------------------------------------------------

_FLAGSHIP_ORACLE_WD = "/tmp/vyntr_ray_cache/flagship_oracle_wd"


def _q_crawl_flagship(_sf_dir: str):
    """Flagship crawl, returned as the (url, partition, wave, pos)
    projection of the analyses so it can be HASH-oracled (r2 verdict
    item 10): the schedule log is an independently-written artifact of
    the same run, and DuckDB recomputes partition = md5(url)[0:2]
    (`genesis/src/db.rs:110-114` semantics) from its fetched rows — any
    parse-stage drift in url/partition/wave/pos breaks the match.
    Full-text byte parity stays pinned in tests/test_crawl.py."""
    from vyntr_ray.pipelines.flagship import run_flagship
    df = run_flagship(n_pages=1500, budget=300,
                      workdir=_FLAGSHIP_ORACLE_WD)
    return (df[["url", "partition", "wave", "pos"]]
            .sort_values(["wave", "pos"]).reset_index(drop=True))


def _q_extract_text(_sf_dir: str):
    from vyntr_ray.pipelines.crawl import parse_pages_batch
    from vyntr_ray.pipelines.flagship import cached_pages
    ds = _rd().read_parquet(cached_pages(1500), columns=["url", "html"])
    return (ds.map_batches(lambda b: parse_pages_batch(b),
                           batch_format="pyarrow", batch_size=256)
            .select_columns(["url", "language", "title", "content_text",
                             "partition"]))


def _q_minhash_dups(sf_dir: str):
    from vyntr_ray.stages.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_planted_dup_docs(sf_dir), threshold=0.6)


def _q_simhash_dups(sf_dir: str):
    from vyntr_ray.stages.dedup import simhash_pairs
    return simhash_pairs(_planted_dup_docs(sf_dir), max_hamming=3)


def _q_ngram_jaccard(sf_dir: str):
    from vyntr_ray.stages.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_planted_dup_docs(sf_dir), threshold=0.5)


def _q_lang_id(sf_dir: str):
    from vyntr_ray.stages.text_analysis import lang_id
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = lang_id(ds).groupby("pred_lang").count()
    return out.map_batches(lambda t: t.rename_columns(["pred_lang", "n"]),
                           batch_format="pyarrow")


def _cache_key(sf_dir: str, tag: str) -> str:
    import re
    return f"{tag}_{re.sub(r'[^A-Za-z0-9.]+', '_', sf_dir.strip('/'))}"


def _q_ivf_ann(sf_dir: str):
    from vyntr_ray.stages.similarity import ivf_topk
    return ivf_topk(_read(sf_dir, "embeddings"), _qvec(), k=10, nprobe=2,
                    cache_key=_cache_key(sf_dir, "label"))


def _q_ivf_kmeans(sf_dir: str):
    """IVF over LEARNED cells: k-means quantizer → partitioned layout →
    pruned probe.  Rows-only (k-means isn't SQL-expressible); recall vs
    brute force is pinned in tests/test_stages.py."""
    from vyntr_ray.stages.similarity import (assign_cells, ivf_topk,
                                             kmeans_cells)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cen = kmeans_cells(ds, n_cells=8, iters=5)
    celled = assign_cells(ds, cen)
    return ivf_topk(celled, _qvec(), k=10, nprobe=3, cell_col="cell",
                    cache_key=_cache_key(sf_dir, "kmeans"))


# deterministic "dirt" wrapped around every document so each cleaner
# pattern actually fires (the sf corpora are already-clean text);
# mirrored in the cleaning_stats oracle via chr() concatenation
_DIRT_PRE = "<p> x\t y</p>\x01�&amp; [link](url) "
_DIRT_POST = " ?track=1\n\n\n\n end"


def _q_cleaning_stats(sf_dir: str):
    from vyntr_ray.stages.clean import cleaning_stats

    def dirty(batch: pa.Table) -> pa.Table:
        txt = [_DIRT_PRE + (t or "") + _DIRT_POST
               for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(txt, pa.string())})

    ds = (_read(sf_dir, "documents", columns=["doc_id", "text"])
          .map_batches(dirty, batch_format="pyarrow"))
    res = cleaning_stats(ds)
    # strip the aggregate's sum(...) wrapper so columns match the oracle
    return pd.DataFrame([{k[4:-1]: v for k, v in res.items()}])


def _q_multimodal(_sf_dir: str):
    from vyntr_ray.stages.multimodal import decode_images, make_fake_image
    rows = [{"doc_id": i,
             "image": make_fake_image(32 + i % 8, 24 + i % 4, seed=i)}
            for i in range(200)]
    ds = _rd().from_items(rows)
    return decode_images(ds, resize_to=16)


def _q_video_frames(_sf_dir: str):
    from vyntr_ray.stages.multimodal import make_fake_video, sample_frames
    rows = [{"doc_id": i, "video": make_fake_video(8, 16, 12, seed=i)}
            for i in range(50)]
    return sample_frames(_rd().from_items(rows), every=2)


def _q_audio_windows(_sf_dir: str):
    from vyntr_ray.stages.multimodal import chunk_audio, make_fake_audio
    rows = [{"doc_id": i,
             "audio": make_fake_audio(16_000 * 3 + i * 100, seed=i)}
            for i in range(60)]
    return chunk_audio(_rd().from_items(rows), window_s=1.0)


def _sum_partials(ds, cols: list[str]):
    """Collapse per-block int64 partial-sum rows to ONE driver row.

    The distributed global-sum shape: every block emits one row of int64
    partials (map_batches), so the driver receives #blocks rows — O(cluster),
    never O(data) — and the final add is a trivial numpy sum."""
    parts = ds.take_all()
    return pd.DataFrame({c: pd.array(
        [int(sum(r[c] for r in parts))], dtype="int64") for c in cols})


def _sum_keyed_partials(ds, keys: list[str], cols: list[str]):
    """Keyed variant of :func:`_sum_partials`: every block emits ONE
    partial row per key combination, so the driver receives
    O(#blocks x #groups) rows and folds them with one pandas groupby.
    ONLY for key spaces bounded by a constant (years, lag buckets,
    nation x year) — never for data-scaled keys; those go through the
    hash-partition map_groups pattern instead."""
    parts = pd.DataFrame(ds.take_all())
    if parts.empty:
        return pd.DataFrame({c: pd.array([], dtype="int64")
                             for c in keys + cols})
    g = parts.groupby(keys, as_index=False, sort=True)[cols].sum()
    for c in cols:
        g[c] = g[c].astype("int64")
    return g


def _q_tpch_q6ish(sf_dir: str):
    """TPC-H Q6 analog (forecast-revenue change): pure scan-filter-sum,
    zero shuffle.  Columns are pruned at the read; each block emits one
    int64 partial row; the discount band compares CENTI INTEGERS on both
    sides (a float BETWEEN on 0.05/0.07 would be representation-dependent).
    The litmus test that a simple reduction stays embarrassingly
    parallel at 100 TB — no groupby, no driver row set beyond #blocks."""
    import datetime

    import pyarrow.compute as pc

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        dc = pc.cast(_round_ha(pc.multiply(t["l_discount"],
                                           pa.scalar(100.0))), pa.int64())
        keep = pc.and_(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))), pc.and_(
            pc.and_(pc.greater_equal(dc, pa.scalar(5, pa.int64())),
                    pc.less_equal(dc, pa.scalar(7, pa.int64()))),
            pc.less(t["l_quantity"], pa.scalar(24.0))))
        t2 = t.filter(keep)
        rev = pc.cast(_round_ha(pc.multiply(
            pc.multiply(t2["l_extendedprice"], t2["l_discount"]),
            pa.scalar(10_000.0))), pa.int64())
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_dmilli": pa.array([s], pa.int64()),
                         "n_rows": pa.array([t2.num_rows], pa.int64())})

    return _sum_partials(li.map_batches(partial, batch_format="pyarrow"),
                         ["revenue_dmilli", "n_rows"])


def _q_tpch_q14ish(sf_dir: str):
    """TPC-H Q14 analog (promo revenue): part is the MEDIUM dimension —
    broadcast as a dense partkey->is_promo bitmask (one byte per part,
    ray.put once), never a shuffle; lineitem streams through one
    map_batches that filters by month, scales revenue to exact dmilli
    ints and splits it promo/total; per-block partials sum on the
    driver.  Ratio left to the reader — two exact int64 sums are the
    stable contract (the reference's float division is one line away)."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    pmax = int(pc.max(part["p_partkey"]).as_py())
    promo = np.zeros(pmax + 1, dtype=bool)
    promo[part.filter(pc.equal(part["p_type"], "PROMO"))
          ["p_partkey"].to_numpy()] = True
    promo_ref = ray.put(promo)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        mask = ray.get(promo_ref)
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                       pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(keep)
        rev = pc.cast(_round_ha(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10_000.0))), pa.int64()).to_numpy(
                zero_copy_only=False)
        is_promo = mask[t["l_partkey"].to_numpy()]
        return pa.table({
            "promo_dmilli": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "total_dmilli": pa.array([int(rev.sum())], pa.int64())})

    return _sum_partials(li.map_batches(partial, batch_format="pyarrow"),
                         ["promo_dmilli", "total_dmilli"])


def _q_tpch_q10ish(sf_dir: str):
    """TPC-H Q10 analog (returned-item revenue, top-20 customers):
    date-filtered orders LARGE-LARGE hash-joined with R-flag lineitem
    revenue, pre-aggregated per custkey (bounded by active customers in
    the window, far below lineitem), then a second distributed hash_join
    attaches the customer name/nation — customer scales with facts, so
    no broadcast — and the 25-row nation map rides as a driver lookup.
    Exact dmilli int revenue; top-20 via sort-limit."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from vyntr_ray.stages.joins import hash_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def lrev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.cast(_round_ha(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10_000.0))), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_dmilli": rev})

    j = hash_join(
        li.map_batches(lrev, batch_format="pyarrow"),
        orders.map_batches(ofilt, batch_format="pyarrow"),
        key_col="l_orderkey", left_payload=["rev_dmilli"],
        right_payload=["o_custkey"], right_key_col="o_orderkey",
        n_parts=16,
        types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
               "rev_dmilli": pa.int64(), "o_custkey": pa.int64()})

    from vyntr_ray.stages.dataset_tools import group_sum
    # ~8k active custkeys: data-scaled key -> many-groups rule, never a
    # generic Aggregate (group_sum: combiner + ONE hash partition)
    custrev = group_sum(j, "o_custkey", ["rev_dmilli"], n_parts=16,
                        rename={"rev_dmilli": "revenue_dmilli"})

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_nationkey"])
    named = hash_join(
        custrev, cust, key_col="o_custkey",
        left_payload=["revenue_dmilli"],
        right_payload=["c_name", "c_nationkey"], right_key_col="c_custkey",
        n_parts=16,
        types={"o_custkey": pa.int64(), "c_custkey": pa.int64(),
               "revenue_dmilli": pa.int64(), "c_name": pa.string(),
               "c_nationkey": pa.int64()})

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmax = int(pc.max(nat["n_nationkey"]).as_py())
    names = np.array([""] * (nmax + 1), dtype=object)
    names[nat["n_nationkey"].to_numpy()] = np.asarray(
        nat["n_name"].to_pylist(), dtype=object)

    def attach(t: pa.Table) -> pa.Table:
        nn = names[t["c_nationkey"].to_numpy(zero_copy_only=False)
                   .astype(np.int64)]
        return pa.table({
            "c_custkey": t["o_custkey"], "c_name": t["c_name"],
            "n_name": pa.array(list(nn), pa.string()),
            "revenue_dmilli": t["revenue_dmilli"]})

    return (named.map_batches(attach, batch_format="pyarrow")
            .sort(["revenue_dmilli", "c_custkey"],
                  descending=[True, False]).limit(20))


def _q_tpch_q17ish(sf_dir: str):
    """TPC-H Q17 analog (small-quantity-order revenue): the correlated
    per-part average is decorrelated into a bounded per-part aggregate
    over the brand-filtered lineitem (parts of ONE brand — 1/25 of the
    part dim), broadcast back, and the threshold ``qty < 0.2*avg(qty)``
    is cross-multiplied into the EXACT integer predicate
    ``qty_centi * cnt * 5 < sum_qty_centi`` — no division ever happens,
    so no float can diverge between engine and oracle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    pks = part.filter(pc.equal(part["p_brand"], "Brand#23"))["p_partkey"]
    pk_ref = ray.put(pc.cast(pks.combine_chunks(), pa.int64()))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def lfilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"],
                              value_set=ray.get(pk_ref)))
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty_centi": pc.cast(_round_ha(pc.multiply(
                t["l_quantity"], pa.scalar(100.0))), pa.int64()),
            "price_centi": pc.cast(_round_ha(pc.multiply(
                t["l_extendedprice"], pa.scalar(100.0))), pa.int64())})

    flt = li.map_batches(lfilt, batch_format="pyarrow").materialize()

    stats = (flt.groupby("l_partkey")
             .aggregate(Sum("qty_centi", alias_name="sq"),
                        Count(alias_name="cnt")))
    stab = _concat_refs(stats, pa.schema([
        ("l_partkey", pa.int64()), ("sq", pa.int64()),
        ("cnt", pa.int64())]))
    smap_ref = ray.put({
        "key": stab["l_partkey"].combine_chunks(),
        "sq": stab["sq"].combine_chunks(),
        "cnt": pc.cast(stab["cnt"].combine_chunks(), pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        sm = ray.get(smap_ref)
        idx = pc.index_in(t["l_partkey"], value_set=sm["key"])
        sq = pc.take(sm["sq"], idx).to_numpy(zero_copy_only=False)
        cnt = pc.take(sm["cnt"], idx).to_numpy(zero_copy_only=False)
        qc = t["qty_centi"].to_numpy()
        keep = qc * cnt * 5 < sq
        pr = t["price_centi"].to_numpy()[keep]
        return pa.table({
            "price_sum_centi": pa.array([int(pr.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64())})

    return _sum_partials(flt.map_batches(partial, batch_format="pyarrow"),
                         ["price_sum_centi", "n_rows"])


def _q_tpch_q19ish(sf_dir: str):
    """TPC-H Q19 analog (disjunctive discounted-revenue): part's
    (brand, size) attributes broadcast as dense partkey-indexed arrays,
    the three-arm OR evaluated fully vectorized in numpy inside one
    map_batches — the shape for predicate trees too irregular for
    parquet row-group pruning.  Per-block int partials; zero shuffle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pmax = int(pc.max(part["p_partkey"]).as_py())
    brand = np.zeros(pmax + 1, dtype=np.int8)
    for i, b in enumerate(["Brand#12", "Brand#23", "Brand#34"], start=1):
        brand[part.filter(pc.equal(part["p_brand"], b))
              ["p_partkey"].to_numpy()] = i
    size = np.zeros(pmax + 1, dtype=np.int64)
    size[part["p_partkey"].to_numpy()] = part["p_size"].to_numpy()
    luts_ref = ray.put((brand, size))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        b_lut, s_lut = ray.get(luts_ref)
        pk = t["l_partkey"].to_numpy()
        b, s = b_lut[pk], s_lut[pk]
        q = np.asarray(_round_ha(t["l_quantity"]).to_numpy(
            zero_copy_only=False), np.int64)
        keep = (((b == 1) & (s <= 15) & (q >= 1) & (q <= 11))
                | ((b == 2) & (s <= 25) & (q >= 10) & (q <= 20))
                | ((b == 3) & (s <= 35) & (q >= 20) & (q <= 30)))
        t2 = t.filter(pa.array(keep))
        rev = pc.cast(_round_ha(pc.multiply(
            pc.multiply(t2["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t2["l_discount"])),
            pa.scalar(10_000.0))), pa.int64())
        s_ = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_dmilli": pa.array([s_], pa.int64()),
                         "n_rows": pa.array([t2.num_rows], pa.int64())})

    return _sum_partials(li.map_batches(partial, batch_format="pyarrow"),
                         ["revenue_dmilli", "n_rows"])


def _q_tpch_q22ish(sf_dir: str):
    """TPC-H Q22 analog (global sales opportunity): customers with an
    above-average positive balance and NO orders in a half-year window,
    counted per nation.  The mean gate is the exact integer
    cross-multiplication ``bal_centi * n > s`` (driver sees two ints);
    the no-orders test is the DISTRIBUTED :func:`anti_join` — the
    window's orders key set is customer-scale, so a broadcast NOT IN
    would ship a fact-sized set to every task.  Nation (25 rows)
    attaches via driver lookup."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    from vyntr_ray.stages.joins import anti_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_nationkey"])

    def bal(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "bal_centi": pc.cast(_round_ha(pc.multiply(
                t["c_acctbal"], pa.scalar(100.0))), pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64())})

    cb = cust.map_batches(bal, batch_format="pyarrow").materialize()

    def avg_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["bal_centi"], pa.scalar(0, pa.int64())))
        s = pc.sum(pos["bal_centi"]).as_py() or 0
        return pa.table({"s": pa.array([s], pa.int64()),
                         "n": pa.array([pos.num_rows], pa.int64())})

    tot = _sum_partials(cb.map_batches(avg_partial, batch_format="pyarrow"),
                        ["s", "n"])
    s, n = int(tot["s"][0]), int(tot["n"][0])

    rich = cb.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["bal_centi"], pa.scalar(n, pa.int64())),
            pa.scalar(s, pa.int64()))), batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    owin = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        .select(["o_custkey"]), batch_format="pyarrow")
    noorder = anti_join(
        rich, owin, key_col="c_custkey",
        left_payload=["bal_centi", "c_nationkey"],
        right_key_col="o_custkey", n_parts=16,
        types={"c_custkey": pa.int64(), "o_custkey": pa.int64(),
               "bal_centi": pa.int64(), "c_nationkey": pa.int64()})

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmax = int(pc.max(nat["n_nationkey"]).as_py())
    names = np.array([""] * (nmax + 1), dtype=object)
    names[nat["n_nationkey"].to_numpy()] = np.asarray(
        nat["n_name"].to_pylist(), dtype=object)

    def attach(t: pa.Table) -> pa.Table:
        nn = names[t["c_nationkey"].to_numpy(zero_copy_only=False)
                   .astype(np.int64)]
        return pa.table({"n_name": pa.array(list(nn), pa.string()),
                         "bal_centi": t["bal_centi"]})

    return (noorder.map_batches(attach, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Count(alias_name="numcust"),
                       Sum("bal_centi", alias_name="totacctbal_centi"))
            .sort("n_name"))


def _q_tpch_q8ish(sf_dir: str):
    """TPC-H Q8 analog (national market share, regionalized): per order
    year, the volume of STANDARD-part sales to ASIA-region customers
    split into the ASIA-supplier ("local") slice and the total — two
    exact int sums per year, ratio left to the reader (the q14ish
    contract).  Shape: part bitmask + supplier->region dense array
    broadcast (both medium dims), lineitem->orders and ->customer are
    LARGE-LARGE hash joins (customer scales with facts), the 25-row
    nation->region map rides as a driver lookup, and the final fold is
    per-block keyed partials over a two-year key space."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import hash_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = int(reg.filter(pc.equal(reg["r_name"], "ASIA"))
               ["r_regionkey"][0].as_py())
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmax = int(pc.max(nat["n_nationkey"]).as_py())
    nreg = np.full(nmax + 1, -1, dtype=np.int64)
    nreg[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    pmax = int(pc.max(part["p_partkey"]).as_py())
    std = np.zeros(pmax + 1, dtype=bool)
    std[part.filter(pc.equal(part["p_type"], "STANDARD"))
        ["p_partkey"].to_numpy()] = True
    std_ref = ray.put(std)

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    sreg = np.full(smax + 1, -1, dtype=np.int64)
    sreg[sup["s_suppkey"].to_numpy()] = nreg[sup["s_nationkey"].to_numpy()]
    sreg_ref = ray.put(sreg)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def lprep(t: pa.Table) -> pa.Table:
        mask = ray.get(std_ref)[t["l_partkey"].to_numpy()]
        t = t.filter(pa.array(mask, pa.bool_()))
        vol = pc.cast(_round_ha(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10_000.0))), pa.int64())
        s_asia = ray.get(sreg_ref)[t["l_suppkey"].to_numpy()] == asia
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "vol_dmilli": vol,
                         "s_asia": pa.array(s_asia, pa.bool_())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                           pa.int64())})

    j1 = hash_join(
        li.map_batches(lprep, batch_format="pyarrow"),
        orders.map_batches(ofilt, batch_format="pyarrow"),
        key_col="l_orderkey", left_payload=["vol_dmilli", "s_asia"],
        right_payload=["o_custkey", "o_year"], right_key_col="o_orderkey",
        n_parts=16,
        types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
               "vol_dmilli": pa.int64(), "s_asia": pa.bool_(),
               "o_custkey": pa.int64(), "o_year": pa.int64()})

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j2 = hash_join(
        j1, cust, key_col="o_custkey",
        left_payload=["vol_dmilli", "s_asia", "o_year"],
        right_payload=["c_nationkey"], right_key_col="c_custkey",
        n_parts=16,
        types={"o_custkey": pa.int64(), "c_custkey": pa.int64(),
               "vol_dmilli": pa.int64(), "s_asia": pa.bool_(),
               "o_year": pa.int64(), "c_nationkey": pa.int64()})

    nreg_ref = ray.put(nreg)

    def partial(t: pa.Table) -> pa.Table:
        creg = ray.get(nreg_ref)[
            t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)]
        t = t.filter(pa.array(creg == asia, pa.bool_()))
        vol = t["vol_dmilli"].to_numpy(zero_copy_only=False)
        sa = t["s_asia"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "o_year": t["o_year"].to_numpy(zero_copy_only=False),
            "nation_dmilli": vol * sa.astype(np.int64),
            "total_dmilli": vol})
        g = df.groupby("o_year", as_index=False, sort=True).sum()
        return pa.table({
            "o_year": pa.array(g["o_year"].to_numpy(), pa.int64()),
            "nation_dmilli": pa.array(g["nation_dmilli"].to_numpy(),
                                      pa.int64()),
            "total_dmilli": pa.array(g["total_dmilli"].to_numpy(),
                                     pa.int64())})

    return _sum_keyed_partials(
        j2.map_batches(partial, batch_format="pyarrow"),
        ["o_year"], ["nation_dmilli", "total_dmilli"])


def _q_tpch_q9ish(sf_dir: str):
    """TPC-H Q9 analog (product-type profit by nation x year; the
    reference schema has no partsupp, so profit is the discounted
    revenue of 'widget' parts): part bitmask + supplier->nation-name
    dense array broadcast, ONE large-large hash join attaches the order
    year, and the (nation, year) fold — bounded by 25 nations x 7
    years — is per-block keyed partials, never a string-key Aggregate
    (PERF.md: multi-key Aggregate cost tracks group count)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import hash_join

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    pmax = int(pc.max(part["p_partkey"]).as_py())
    widget = np.zeros(pmax + 1, dtype=bool)
    widget[part.filter(pc.match_substring(part["p_name"], "widget"))
           ["p_partkey"].to_numpy()] = True
    widget_ref = ray.put(widget)

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmax = int(pc.max(nat["n_nationkey"]).as_py())
    nname = np.array([""] * (nmax + 1), dtype=object)
    nname[nat["n_nationkey"].to_numpy()] = np.asarray(
        nat["n_name"].to_pylist(), dtype=object)
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    snm = np.array([""] * (smax + 1), dtype=object)
    snm[sup["s_suppkey"].to_numpy()] = nname[sup["s_nationkey"].to_numpy()]
    snm_ref = ray.put(snm)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def lprep(t: pa.Table) -> pa.Table:
        mask = ray.get(widget_ref)[t["l_partkey"].to_numpy()]
        t = t.filter(pa.array(mask, pa.bool_()))
        profit = pc.cast(_round_ha(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10_000.0))), pa.int64())
        nn = ray.get(snm_ref)[t["l_suppkey"].to_numpy()]
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "n_name": pa.array(list(nn), pa.string()),
                         "profit_dmilli": profit})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def oyear(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                           pa.int64())})

    j = hash_join(
        li.map_batches(lprep, batch_format="pyarrow"),
        orders.map_batches(oyear, batch_format="pyarrow"),
        key_col="l_orderkey", left_payload=["n_name", "profit_dmilli"],
        right_payload=["o_year"], right_key_col="o_orderkey", n_parts=16,
        types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
               "n_name": pa.string(), "profit_dmilli": pa.int64(),
               "o_year": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "n_name": t["n_name"].to_pylist(),
            "o_year": t["o_year"].to_numpy(zero_copy_only=False),
            "p": t["profit_dmilli"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["n_name", "o_year"], as_index=False, sort=True)
        s = g["p"].sum()
        return pa.table({"n_name": pa.array(s["n_name"], pa.string()),
                         "o_year": pa.array(s["o_year"].to_numpy(),
                                            pa.int64()),
                         "profit_dmilli": pa.array(s["p"].to_numpy(),
                                                   pa.int64())})

    return _sum_keyed_partials(
        j.map_batches(partial, batch_format="pyarrow"),
        ["n_name", "o_year"], ["profit_dmilli"])


def _q_tpch_q11ish(sf_dir: str):
    """TPC-H Q11 analog (important stock; no partsupp in the schema, so
    a part's "value" is its shipped extendedprice from ASIA-region
    suppliers): the supplier key set (one region ~ 1/5 of a medium dim)
    broadcasts as an is_in value set; per-part value sums go through
    the hash-partition map_groups pattern (parts scale with SF — never
    a per-key Aggregate); the HAVING fraction is scale-free and exactly
    integer: value * n_parts > 2 * total (i.e. > 2x the mean part
    value), with (total, n_parts) folded by per-block partials over the
    bounded grouped set and broadcast back."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import _part_col

    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = int(reg.filter(pc.equal(reg["r_name"], "ASIA"))
               ["r_regionkey"][0].as_py())
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    asia_nk = set(nat.filter(pc.equal(nat["n_regionkey"], asia))
                  ["n_nationkey"].to_pylist())
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sks = pa.array(sorted(
        s for s, n in zip(sup["s_suppkey"].to_pylist(),
                          sup["s_nationkey"].to_pylist())
        if n in asia_nk), pa.int64())
    sk_ref = ray.put(sks)

    n_parts = 16
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def lprep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["l_suppkey"], pa.int64()),
                              value_set=ray.get(sk_ref)))
        out = pa.table({
            "l_partkey": t["l_partkey"],
            "v": pc.cast(_round_ha(pc.multiply(
                t["l_extendedprice"], pa.scalar(100.0))), pa.int64())})
        return out.append_column("part",
                                 _part_col(out["l_partkey"], n_parts))

    def psum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_partkey", as_index=False, sort=True)["v"].sum()
        return pd.DataFrame({
            "l_partkey": s["l_partkey"].astype("int64"),
            "value_centi": s["v"].astype("int64")})

    grouped = (li.map_batches(lprep, batch_format="pyarrow")
               .groupby("part").map_groups(psum, batch_format="pandas")
               .materialize())

    def tot_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": pa.array([pc.sum(t["value_centi"]).as_py() or 0],
                          pa.int64()),
            "np": pa.array([t.num_rows], pa.int64())})

    tot = _sum_partials(
        grouped.map_batches(tot_partial, batch_format="pyarrow"),
        ["s", "np"])
    s, np_ = int(tot["s"][0]), int(tot["np"][0])

    return (grouped.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["value_centi"], pa.scalar(np_, pa.int64())),
            pa.scalar(2 * s, pa.int64()))), batch_format="pyarrow")
        .sort(["value_centi", "l_partkey"], descending=[True, False]))


def _q_tpch_q12ish(sf_dir: str):
    """TPC-H Q12 analog (shipping-lag priority histogram; the schema has
    no shipmode/commitdate, so the "mode" is the ship lag bucket):
    lineitem LARGE-LARGE hash-joined to orders, the day lag vectorized
    in numpy, bucketed over the band [-120, 120) days as
    (lag+120)//30 — non-negative on both sides, so integer division
    cannot diverge — and high/low priority line counts folded as keyed
    partials over the 8-bucket key space."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    j = hash_join(
        li, orders, key_col="l_orderkey",
        left_payload=["l_shipdate"],
        right_payload=["o_orderdate", "o_orderpriority"],
        right_key_col="o_orderkey", n_parts=16,
        types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
               "l_shipdate": pa.timestamp("us"),
               "o_orderdate": pa.timestamp("us"),
               "o_orderpriority": pa.string()})

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        lag = ((ship - od).astype("timedelta64[D]")).astype(np.int64)
        keep = (lag >= -120) & (lag < 120)
        lag = lag[keep]
        pri = np.asarray(t["o_orderpriority"].to_pylist(),
                         dtype=object)[keep]
        high = (pri == "1-URGENT") | (pri == "2-HIGH")
        bucket = (lag + 120) // 30
        df = pd.DataFrame({"lag_bucket": bucket, "h": high.astype(np.int64),
                           "l": (~high).astype(np.int64)})
        g = df.groupby("lag_bucket", as_index=False, sort=True).sum()
        return pa.table({
            "lag_bucket": pa.array(g["lag_bucket"].to_numpy(), pa.int64()),
            "high_count": pa.array(g["h"].to_numpy(), pa.int64()),
            "low_count": pa.array(g["l"].to_numpy(), pa.int64())})

    return _sum_keyed_partials(
        j.map_batches(partial, batch_format="pyarrow"),
        ["lag_bucket"], ["high_count", "low_count"])


def _q_tpch_q15ish(sf_dir: str):
    """TPC-H Q15 analog (top supplier): half-year revenue per suppkey
    via the hash-partition map_groups pattern (suppliers scale with
    SF), the global max taken as ONE Dataset.max() scalar over the
    bounded grouped set, and the argmax rows (all ties) filtered
    distributedly — the decorrelated MAX-subquery shape.  Supplier
    names attach from a driver-side medium-dim lookup."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import _part_col

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    n_parts = 16

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def lprep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                       pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(keep)
        out = pa.table({
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pc.cast(_round_ha(pc.multiply(pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"])),
                pa.scalar(10_000.0))), pa.int64())})
        return out.append_column("part",
                                 _part_col(out["l_suppkey"], n_parts))

    def psum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_suppkey", as_index=False, sort=True)["rev"].sum()
        return pd.DataFrame({
            "s_suppkey": s["l_suppkey"].astype("int64"),
            "total_revenue_dmilli": s["rev"].astype("int64")})

    grouped = (li.map_batches(lprep, batch_format="pyarrow")
               .groupby("part").map_groups(psum, batch_format="pandas")
               .materialize())
    best = int(grouped.max("total_revenue_dmilli"))

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    snames = np.array([""] * (smax + 1), dtype=object)
    snames[sup["s_suppkey"].to_numpy()] = np.asarray(
        sup["s_name"].to_pylist(), dtype=object)
    sn_ref = ray.put(snames)

    def attach(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["total_revenue_dmilli"],
                              pa.scalar(best, pa.int64())))
        nm = ray.get(sn_ref)[t["s_suppkey"].to_numpy()]
        return pa.table({
            "s_suppkey": t["s_suppkey"],
            "s_name": pa.array(list(nm), pa.string()),
            "total_revenue_dmilli": t["total_revenue_dmilli"]})

    return (grouped.map_batches(attach, batch_format="pyarrow")
            .sort("s_suppkey"))


def _q_tpch_q20ish(sf_dir: str):
    """TPC-H Q20 analog (suppliers with excess shipped stock; no
    partsupp/availqty in the schema, so the gate is a fixed quantity
    threshold): 'widget' part bitmask broadcast, one year of lineitem
    summed per (suppkey, partkey) through the hash-partition
    map_groups pattern partitioned by SUPPKEY (both key dims scale with
    SF; every (supp, part) group lands whole in the supplier's
    partition), the HAVING + per-supplier dedup applied inside the
    partition, and the ASIA/EUROPE region gate + name attach from the
    driver-side medium supplier dim."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import _part_col

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    n_parts = 16

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    pmax = int(pc.max(part["p_partkey"]).as_py())
    widget = np.zeros(pmax + 1, dtype=bool)
    widget[part.filter(pc.match_substring(part["p_name"], "widget"))
           ["p_partkey"].to_numpy()] = True
    widget_ref = ray.put(widget)

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_partkey", "l_quantity",
                        "l_shipdate"])

    def lprep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                       pc.less(t["l_shipdate"], pa.scalar(hi)))
        t = t.filter(keep)
        mask = ray.get(widget_ref)[t["l_partkey"].to_numpy()]
        t = t.filter(pa.array(mask, pa.bool_()))
        out = pa.table({
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "l_partkey": t["l_partkey"],
            "qc": pc.cast(_round_ha(pc.multiply(
                t["l_quantity"], pa.scalar(100.0))), pa.int64())})
        return out.append_column("part",
                                 _part_col(out["l_suppkey"], n_parts))

    def heavy(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["l_suppkey", "l_partkey"], as_index=False)["qc"].sum()
        hits = s.loc[s["qc"] > 5000, "l_suppkey"].drop_duplicates()
        return pd.DataFrame({"s_suppkey": hits.astype("int64")})

    hits = (li.map_batches(lprep, batch_format="pyarrow")
            .groupby("part").map_groups(heavy, batch_format="pandas"))

    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    want = set(reg.filter(pc.is_in(reg["r_name"], value_set=pa.array(
        ["ASIA", "EUROPE"])))["r_regionkey"].to_pylist())
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    ok_nk = set(nat.filter(pa.array(
        [rk in want for rk in nat["n_regionkey"].to_pylist()],
        pa.bool_()))["n_nationkey"].to_pylist())
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    snames = np.array([""] * (smax + 1), dtype=object)
    snames[sup["s_suppkey"].to_numpy()] = np.asarray(
        sup["s_name"].to_pylist(), dtype=object)
    ok = np.zeros(smax + 1, dtype=bool)
    ok[[s for s, n in zip(sup["s_suppkey"].to_pylist(),
                          sup["s_nationkey"].to_pylist())
        if n in ok_nk]] = True
    nm_ref, ok_ref = ray.put(snames), ray.put(ok)

    def attach(t: pa.Table) -> pa.Table:
        keys = t["s_suppkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ray.get(ok_ref)[keys], pa.bool_()))
        nm = ray.get(nm_ref)[t["s_suppkey"].to_numpy(zero_copy_only=False)]
        return pa.table({"s_name": pa.array(list(nm), pa.string())})

    return hits.map_batches(attach, batch_format="pyarrow").sort("s_name")


def _q_tpch_q21ish(sf_dir: str):
    """TPC-H Q21 analog (suppliers who kept orders waiting; no
    receipt/commit dates in the schema, so "late" is shipping >60 days
    after the order date): finalized orders hash-joined to lineitem,
    then ONE hash-partition by orderkey with a fully vectorized pandas
    pass per partition — per order: distinct suppliers, distinct LATE
    suppliers; a supplier qualifies when it is the SOLE late supplier
    on a multi-supplier order (the EXISTS / NOT-EXISTS pair collapsed
    to set sizes).  Per-supplier counts then fold through a second
    hash partition (suppliers scale with SF), names attach from the
    medium driver dim."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from vyntr_ray.stages.joins import _part_col, hash_join

    n_parts = 16

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return t.select(["o_orderkey", "o_orderdate"])

    j = hash_join(
        li, orders.map_batches(ofilt, batch_format="pyarrow"),
        key_col="l_orderkey",
        left_payload=["l_suppkey", "l_shipdate"],
        right_payload=["o_orderdate"], right_key_col="o_orderkey",
        n_parts=16,
        types={"l_orderkey": pa.int64(), "o_orderkey": pa.int64(),
               "l_suppkey": pa.int64(),
               "l_shipdate": pa.timestamp("us"),
               "o_orderdate": pa.timestamp("us")})

    def part1(t: pa.Table) -> pa.Table:
        return t.append_column("part",
                               _part_col(t["l_orderkey"], n_parts))

    def waiting(g: pd.DataFrame) -> pd.DataFrame:
        late = (g["l_shipdate"] - g["o_orderdate"]
                ) > pd.Timedelta(days=60)
        ns = g.groupby("l_orderkey")["l_suppkey"].nunique()
        lrows = g.loc[late, ["l_orderkey", "l_suppkey"]].drop_duplicates()
        nl = lrows.groupby("l_orderkey").size()
        ok = ns.index[(ns >= 2)].intersection(nl.index[nl == 1])
        out = lrows[lrows["l_orderkey"].isin(ok)]
        return pd.DataFrame({"s_suppkey": out["l_suppkey"]
                             .astype("int64")})

    waits = (j.map_batches(part1, batch_format="pyarrow")
             .groupby("part").map_groups(waiting, batch_format="pandas"))

    def part2(t: pa.Table) -> pa.Table:
        return t.append_column("part",
                               _part_col(t["s_suppkey"], n_parts))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("s_suppkey", as_index=False, sort=True).size()
        return pd.DataFrame({"s_suppkey": c["s_suppkey"].astype("int64"),
                             "numwait": c["size"].astype("int64")})

    counts = (waits.map_batches(part2, batch_format="pyarrow")
              .groupby("part").map_groups(count, batch_format="pandas"))

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"])
    smax = int(pc.max(sup["s_suppkey"]).as_py())
    snames = np.array([""] * (smax + 1), dtype=object)
    snames[sup["s_suppkey"].to_numpy()] = np.asarray(
        sup["s_name"].to_pylist(), dtype=object)
    sn_ref = ray.put(snames)

    def attach(t: pa.Table) -> pa.Table:
        nm = ray.get(sn_ref)[t["s_suppkey"].to_numpy(zero_copy_only=False)]
        return pa.table({"s_name": pa.array(list(nm), pa.string()),
                         "numwait": t["numwait"]})

    return (counts.map_batches(attach, batch_format="pyarrow")
            .sort(["numwait", "s_name"], descending=[True, False]))


_PARA_SEG_WORDS = 20


def _q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph-level dedup (Wenzek et al. 2020 §4.1 keeps
    one occurrence of every duplicated paragraph corpus-wide).  The
    synthetic documents carry no newline structure, so the paragraph
    unit is a deterministic segmentation: consecutive
    ``_PARA_SEG_WORDS``-word windows of the whitespace token stream.
    A segment is kept iff its (doc_id, seg_idx) is the MINIMAL
    occurrence of its md5 corpus-wide — hash-partition by segment md5,
    one vectorized first-occurrence drop per partition (the
    keep_best_doc k=1 shape, never a per-key groupby), then a second
    hash-partition regroups kept segments per doc in order."""
    import hashlib

    from vyntr_ray.stages.joins import _part_col

    n_parts = 16

    def segment(t: pa.Table) -> pa.Table:
        import re
        ids, idxs, segs, hashes, nsegs = [], [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            words = re.findall(r"\S+", txt or "")
            k = (len(words) + _PARA_SEG_WORDS - 1) // _PARA_SEG_WORDS
            for i in range(k):
                seg = " ".join(words[i * _PARA_SEG_WORDS:
                                     (i + 1) * _PARA_SEG_WORDS])
                ids.append(did)
                idxs.append(i + 1)
                segs.append(seg)
                hashes.append(hashlib.md5(
                    seg.encode("utf-8")).hexdigest())
                nsegs.append(k)
        out = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "i": pa.array(idxs, pa.int64()),
            "seg": pa.array(segs, pa.string()),
            "h": pa.array(hashes, pa.string()),
            "n_segs": pa.array(nsegs, pa.int64())})
        return out.append_column("part", _part_col(out["h"], n_parts))

    def first_only(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id", "i"], kind="mergesort")
        kept = g.drop_duplicates("h", keep="first")
        return kept[["doc_id", "i", "seg", "n_segs"]]

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "i"], kind="mergesort")
        agg = g.groupby("doc_id", sort=True)
        out = pd.DataFrame({
            "doc_id": np.asarray(list(agg.groups), np.int64),
            "n_segs": agg["n_segs"].first().to_numpy(np.int64),
            "n_kept": agg.size().to_numpy(np.int64),
            "kept_text": agg["seg"].apply(" ".join).to_numpy(object)})
        return out

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = (docs.map_batches(segment, batch_format="pyarrow")
            .groupby("part").map_groups(first_only, batch_format="pandas"))

    def part2(t: pa.Table) -> pa.Table:
        return t.append_column("part", _part_col(t["doc_id"], n_parts))

    return (kept.map_batches(part2, batch_format="pyarrow")
            .groupby("part").map_groups(regroup, batch_format="pandas"))


def _q_anti_join_bloom(sf_dir: str):
    """Customers with no orders in a half-year window via the
    Bloom-prefiltered distributed anti-join: the right (orders) key
    bitmap is OR-merged from per-block partials and broadcast once;
    definitely-absent customers bypass the shuffle, the maybe-present
    minority rides the exact anti_join — byte-identical to NOT EXISTS
    at any bitmap size (false positives re-check exactly)."""
    import datetime

    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import bloom_anti_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    owin = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        .select(["o_custkey"]), batch_format="pyarrow")
    return bloom_anti_join(
        cust, owin, key_col="c_custkey", left_payload=["c_mktsegment"],
        right_key_col="o_custkey", n_parts=16, m_bits=1 << 16,
        types={"c_custkey": pa.int64(), "o_custkey": pa.int64(),
               "c_mktsegment": pa.string()})


def _q_shuffle_export(sf_dir: str):
    """Training-run export sink: deterministic md5-shard global shuffle,
    one parquet file per shard written via temp-file + atomic rename
    (resumable — a killed export leaves no partial shard), returning
    the (shard, n_docs, n_tokens) manifest.  Oracled exactly: shard =
    int(md5(doc_id)[:8], 16) % 16 is recomputed in SQL via the hex
    cast, token counts are the shared ``\\S+`` rule."""
    import shutil

    from vyntr_ray.stages.sampling import shuffle_export

    out = os.path.join("/tmp/vyntr_ray_cache",
                       f"shuffle_export_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return shuffle_export(ds, out, n_shards=16)


# ---------------------------------------------------------------------------
# the public contract
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship crawl pipeline on a deterministic synthetic page table."""
    from vyntr_ray.pipelines.flagship import run_flagship
    return run_flagship(n_pages=600, budget=200)


def _q_merge_intervals(sf_dir: str):
    """Interval union per user: each event spawns [ts, ts + |value| s)
    (duration integer-scaled half-away, exact at any float precision);
    overlapping-or-touching spans coalesce via ONE hash-partition
    shuffle + vectorized int64 sweep (stages/windows.py:merge_intervals
    — gaps-and-islands over arbitrary spans, the streaming-window
    operator the reference lacks, SURVEY §2.9)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.windows import merge_intervals

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def iv(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        dur = pc.cast(_round_ha(pc.multiply(pc.abs(t["value"]),
                                            pa.scalar(1_000_000.0))),
                      pa.int64())
        return pa.table({"user_id": t["user_id"], "s_us": us,
                         "e_us": pc.add(us, dur)})

    return merge_intervals(ds.map_batches(iv, batch_format="pyarrow"),
                           key_col="user_id")


def _q_interval_coverage(sf_dir: str):
    """Per-user busy-time after interval union (same spans as
    merge_intervals): total covered duration, island count, longest
    island — one hash-partition shuffle, per-key aggregate exact inside
    the sweep (stages/windows.py:interval_coverage)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.windows import interval_coverage

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def iv(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        dur = pc.cast(_round_ha(pc.multiply(pc.abs(t["value"]),
                                            pa.scalar(1_000_000.0))),
                      pa.int64())
        return pa.table({"user_id": t["user_id"], "s_us": us,
                         "e_us": pc.add(us, dur)})

    return interval_coverage(ds.map_batches(iv, batch_format="pyarrow"),
                             key_col="user_id")


def _q_window_distinct(sf_dir: str):
    """Rolling 7-day distinct users per day (rolling MAU): contribution
    expansion of deduped (user, day) pairs ×7, one global pair dedup,
    O(#days) driver fold (stages/windows.py:window_distinct) — the
    COUNT(DISTINCT) OVER RANGE no window engine can express."""
    from vyntr_ray.stages.windows import window_distinct

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return window_distinct(ds, key_col="user_id", ts_col="ts",
                           n_periods=7)


def _q_cumulative_distinct(sf_dir: str):
    """Running distinct-user curve by day: first-seen-day per user via
    hash-partition min-fold (users are data-scaled — never a per-key
    group), bounded per-day counts, one O(#days) driver prefix sum.
    COUNT(DISTINCT) OVER a cumulative frame, distributed."""
    from vyntr_ray.stages.windows import cumulative_distinct

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return cumulative_distinct(ds, key_col="user_id", ts_col="ts")


def _q_group_mode(sf_dir: str):
    """Modal source per language (tie -> lexicographically smallest):
    bounded-cardinality partial counts per block, driver argmax — the
    rollup_counts O(|cats|^2) shape."""
    from vyntr_ray.stages.dataset_tools import group_mode

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return group_mode(ds, "lang", "source")


def _q_price_histogram(sf_dir: str):
    """$20k fixed-width histogram of order totals: zero-shuffle partial
    fold (the q6ish litmus — each block emits one row per occupied bin,
    bins bounded by range/width, embarrassingly parallel at any scale).
    Centi-int bin arithmetic on both sides; DuckDB ``//`` floors like
    numpy int64 division (prices are positive either way)."""
    from vyntr_ray.stages.dataset_tools import histogram_fixed

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    return histogram_fixed(ds, "o_totalprice", width_centi=2_000_000)


def _q_skyline_orders(sf_dir: str):
    """2-D Pareto front of orders (maximize total price, minimize order
    date): local skyline per block -> skyline of the union (dominance is
    transitive, so every dominated point loses to a survivor of some
    local pass).  Driver holds only concatenated local fronts.  Oracle
    is the window formulation verified equivalent to the NOT EXISTS
    dominance definition (fuzz-tested)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import skyline

    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "price_centi": pc.cast(_round_ha(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "date_us": pc.cast(t["o_orderdate"], pa.int64())})

    return skyline(ds.map_batches(prep, batch_format="pyarrow"),
                   "price_centi", "date_us")


def _q_group_regression(sf_dir: str):
    """Least-squares price ~ quantity per returnflag from EXACT integer
    sufficient statistics (the qty_discount_corr shape: 5 int64 partials
    per group/block, one bounded-key merge, the IEEE-double formula
    evaluated term-for-term identically on both sides so round(..., 6)
    matches bit-for-bit)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from vyntr_ray.rounding import fround_half_away

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(_round_ha(t["l_quantity"]), pa.int64())
        y = pc.cast(_round_ha(pc.multiply(t["l_extendedprice"],
                                          pa.scalar(100.0))), pa.int64())
        b = pa.table({
            "l_returnflag": t["l_returnflag"],
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "x": x, "y": y, "xx": pc.multiply(x, x),
            "xy": pc.multiply(x, y)})
        g = b.group_by("l_returnflag").aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("xy", "sum")])
        return g.rename_columns(["l_returnflag", "n", "sx", "sy",
                                 "sxx", "sxy"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("l_returnflag")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("sxy", alias_name="sxy")))

    def finalize(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        slopes, iceps = [], []
        for r in rows:
            n, sx, sy = float(r["n"]), float(r["sx"]), float(r["sy"])
            sxx, sxy = float(r["sxx"]), float(r["sxy"])
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            slopes.append(fround_half_away(slope, 6))
            iceps.append(fround_half_away((sy - slope * sx) / n, 6))
        return pa.table({
            "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                     pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "slope_6": pa.array(slopes, pa.float64()),
            "icept_6": pa.array(iceps, pa.float64())})

    return merged.map_batches(finalize, batch_format="pyarrow")


def _q_unpivot_measures(sf_dir: str):
    """UNPIVOT (wide measures -> long): every lineitem of each 10th
    order explodes into four (measure, val_centi) rows — a pure
    per-batch Arrow reshape, zero shuffle, column-pruned at the read."""
    import pyarrow.compute as pc

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax"])
    measures = [("quantity", "l_quantity"),
                ("extendedprice", "l_extendedprice"),
                ("discount", "l_discount"), ("tax", "l_tax")]

    def unp(t: pa.Table) -> pa.Table:
        keep = (t["l_orderkey"].to_numpy(zero_copy_only=False) % 10) == 0
        t = t.filter(pa.array(keep, pa.bool_()))
        ok = t["l_orderkey"]
        ln = pc.cast(t["l_linenumber"], pa.int64())
        outs = []
        for name, col in measures:
            outs.append(pa.table({
                "l_orderkey": ok, "l_linenumber": ln,
                "measure": pa.array([name] * t.num_rows, pa.string()),
                "val_centi": pc.cast(_round_ha(pc.multiply(
                    t[col], pa.scalar(100.0))), pa.int64())}))
        return pa.concat_tables(outs)

    return li.map_batches(unp, batch_format="pyarrow")


def _doc_graph_edges(sf_dir: str):
    """The deterministic doc graph shared by components/pagerank/HITS:
    edges d -> 2d and d -> 3d whenever both endpoints exist (broadcast
    id set, per-block vectorized membership)."""
    import pyarrow.compute as pc
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    ids_ref = ray.put(pa.array(
        sorted(r["doc_id"] for r in ds.take_all()), pa.int64()))

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        d = d[d > 0]
        us, vs = [], []
        for mult in (2, 3):
            cand = d * mult
            ok = pc.is_in(pa.array(cand, pa.int64()),
                          value_set=ray.get(ids_ref)).to_numpy(
                              zero_copy_only=False)
            us.append(d[ok])
            vs.append(cand[ok])
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    return ds.map_batches(edges, batch_format="pyarrow")


def _q_hits(sf_dir: str):
    """Integer-exact HITS (stages/graph.py:hits_counts): 4 alternating
    path-count rounds over the shared doc graph — no float parity risk
    at all (contrast pagerank's micro-rounding); oracled by an unrolled
    join+sum CTE chain."""
    from vyntr_ray.stages.graph import hits_counts

    return hits_counts(_doc_graph_edges(sf_dir), n_iter=4)


def _q_weighted_sample(sf_dir: str):
    """Efraimidis-Spirakis weighted top-100 sample of documents by
    n_chars (stages/sampling.py:weighted_sample), md5-derived uniforms
    so both sides compute identical selection keys."""
    from vyntr_ray.stages.sampling import weighted_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(ds, k=100)


def _q_time_weighted_avg(sf_dir: str):
    """TWAP per user over the events log (stages/windows.py:
    time_weighted_avg): exact int64 centi x ms sufficient sums, one
    shared IEEE division, (ts, event_id) LEAD tie-break on both
    sides."""
    from vyntr_ray.stages.windows import time_weighted_avg

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return time_weighted_avg(ds)


def _q_first_last(sf_dir: str):
    """FIRST_VALUE/LAST_VALUE per user over (ts, event_id)
    (stages/windows.py:first_last) — entry/exit observation, exact
    centi ints, deterministic tie-break mirrored in the oracle."""
    from vyntr_ray.stages.windows import first_last

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return first_last(ds)


def _q_value_pivot(sf_dir: str):
    """Pivot-aggregate: per-user centi-value SUMS by event_type, wide
    (stages/dataset_tools.py:pivot_sum — crosstab partials + the
    group_sum many-groups fold)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import pivot_sum

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def centi(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "v_centi": pc.cast(_round_ha(pc.multiply(
                t["value"], pa.scalar(100.0))), pa.int64())})

    return pivot_sum(ds.map_batches(centi, batch_format="pyarrow"),
                     "user_id", "event_type", "v_centi",
                     categories=["click", "error", "purchase",
                                 "signup", "view"])


def _q_active_customers_bloom(sf_dir: str):
    """The active_customers EXISTS through the Bloom-prefiltered path
    (stages/joins.py:bloom_semi_join): definitely-absent customers are
    dropped before the shuffle; byte-identical result (same oracle)."""
    import datetime

    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import bloom_semi_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(keep).select(["o_custkey"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return bloom_semi_join(
        cust, orders.map_batches(ofilt, batch_format="pyarrow"),
        key_col="c_custkey", left_payload=["c_nationkey"],
        right_key_col="o_custkey", n_parts=16,
        types={"c_custkey": pa.int64(), "o_custkey": pa.int64(),
               "c_nationkey": pa.int64()})


def _q_daily_reconcile(sf_dir: str):
    """FULL OUTER join (stages/joins.py:hash_join how="full"): per-day
    event counts against per-day order counts — days alive on only one
    side survive with the other side's count filled to 0 (sentinels,
    never nulls, on both sides)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import group_sum
    from vyntr_ray.stages.joins import hash_join

    day_us = 86_400_000_000

    def daily(col: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            d = pc.multiply(pc.divide(pc.cast(t[col], pa.int64()),
                                      day_us), day_us)
            return pa.table({"day_us": d,
                             out: pa.array([1] * t.num_rows, pa.int64())})
        return f

    ev = group_sum(_read(sf_dir, "events", columns=["ts"])
                   .map_batches(daily("ts", "n_events"),
                                batch_format="pyarrow"),
                   "day_us", ["n_events"], n_parts=8)
    od = group_sum(_read(sf_dir, "orders", columns=["o_orderdate"])
                   .map_batches(daily("o_orderdate", "n_orders"),
                                batch_format="pyarrow"),
                   "day_us", ["n_orders"], n_parts=8)
    return hash_join(
        ev, od, key_col="day_us", left_payload=["n_events"],
        right_payload=["n_orders"], n_parts=8, how="full",
        fill={"n_events": 0, "n_orders": 0},
        types={"day_us": pa.int64(), "n_events": pa.int64(),
               "n_orders": pa.int64()})


def _q_active_customers(sf_dir: str):
    """EXISTS semi-join (stages/joins.py:semi_join): customers with at
    least one 1996-H1 order — the inverse of inactive_customers' NOT
    EXISTS, distributed on both sides, no row duplication from multiple
    matching orders."""
    import datetime

    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import semi_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def ofilt(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                       pc.less(t["o_orderdate"], pa.scalar(hi)))
        return t.filter(keep).select(["o_custkey"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return semi_join(
        cust, orders.map_batches(ofilt, batch_format="pyarrow"),
        key_col="c_custkey", left_payload=["c_nationkey"],
        right_key_col="o_custkey", n_parts=16,
        types={"c_custkey": pa.int64(), "o_custkey": pa.int64(),
               "c_nationkey": pa.int64()})


def _q_left_join_returns(sf_dir: str):
    """Generic distributed LEFT OUTER join (stages/joins.py:hash_join
    how="left", sentinel fill — asof-left convention): orders against
    per-order R-flag return revenue, then per-priority counts.  Orders
    with no returns survive with ret_dmilli = 0; fills (not nulls)
    enter the aggregate, mirrored by coalesce in the oracle."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.dataset_tools import group_sum
    from vyntr_ray.stages.joins import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def rrev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.cast(_round_ha(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10_000.0))), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ret_dmilli": rev})

    per_order = group_sum(li.map_batches(rrev, batch_format="pyarrow"),
                          "l_orderkey", ["ret_dmilli"], n_parts=16)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(
        orders, per_order, key_col="o_orderkey",
        left_payload=["o_orderpriority"], right_payload=["ret_dmilli"],
        right_key_col="l_orderkey", n_parts=16, how="left",
        fill={"ret_dmilli": 0},
        types={"o_orderkey": pa.int64(), "l_orderkey": pa.int64(),
               "o_orderpriority": pa.string(), "ret_dmilli": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "o_orderpriority": t["o_orderpriority"].to_pylist(),
            "n_orders": 1,
            "n_with_returns": pc.cast(
                pc.not_equal(t["ret_dmilli"], pa.scalar(0, pa.int64())),
                pa.int64()).to_numpy(zero_copy_only=False),
            "ret_dmilli": t["ret_dmilli"].to_numpy(zero_copy_only=False)})
        return df.groupby("o_orderpriority", as_index=False).sum()

    return _sum_keyed_partials(
        j.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"], ["n_orders", "n_with_returns", "ret_dmilli"])


def _q_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang), (source)) over documents — the
    explicit-set sibling of rollup/cube, same single fine-level pass
    (stages/dataset_tools.py:grouping_sets)."""
    from vyntr_ray.stages.dataset_tools import grouping_sets

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return grouping_sets(ds, "lang", "source", "n_chars",
                         sets=((0,), (1,)))


def _q_percentile_ranks(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per user over value DESC (relative-rank
    windows; stages/windows.py:percentile_ranks).  Both sides divide
    the identical exact int64 operands in IEEE doubles, so round(.., 6)
    matches bit-for-bit (the qty_discount_corr contract)."""
    from vyntr_ray.stages.windows import percentile_ranks

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return percentile_ranks(ds)


def _q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(lang, source) count+sum over documents — the full
    lattice from one distributed fine-level pass
    (stages/dataset_tools.py:cube_counts)."""
    from vyntr_ray.stages.dataset_tools import cube_counts

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return cube_counts(ds, "lang", "source", "n_chars")


def _q_table_profile(sf_dir: str):
    """Per-column profile of orders: n / n_null / exact n_distinct.
    Distinct counts via block-local uniques -> one hash-partition dedup
    (stages/dataset_tools.py:table_profile)."""
    from vyntr_ray.stages.dataset_tools import table_profile

    ds = _read(sf_dir, "orders")
    return table_profile(ds, ["o_orderkey", "o_custkey", "o_orderstatus",
                              "o_totalprice", "o_orderdate",
                              "o_orderpriority"])


def _q_fuzzy_dup_pairs(sf_dir: str):
    """Edit-distance near-dup pairs: shared 16-char prefix block,
    64-char-prefix banded Levenshtein <= 8 (stages/dedup.py:
    fuzzy_dup_pairs).  Blocking is identical in the oracle, so the
    result set is exactly the SQL self-join's."""
    from vyntr_ray.stages.dedup import fuzzy_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return fuzzy_dup_pairs(ds)


def _q_zonemap_export(sf_dir: str):
    """Range-bucketed parquet export + zone-map manifest
    (sources/zonemap.py): one sorted file per o_orderkey // 1000
    bucket via tmp+atomic-rename, manifest = (bucket, min, max, n)."""
    import shutil

    from vyntr_ray.sources.zonemap import zonemap_export

    out = os.path.join("/tmp/vyntr_ray_cache",
                       f"zonemap_orders_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])
    return zonemap_export(ds, out, "o_orderkey", width=1000)


def _q_token_entropy(sf_dir: str):
    """Per-doc unigram token entropy in exact integer micro-nats
    (stages/text_analysis.py:token_entropy) — the Shannon-diversity
    quality signal; n·L(n) − Σ c·L(c) with L = floor(ln·1e6), order-free
    int64 sums on both sides."""
    from vyntr_ray.stages.text_analysis import token_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_entropy(ds)


def _q_ohlc_bars(sf_dir: str):
    """Daily OHLC candles per event type (stages/windows.py:ohlc_bars):
    bounded-key driver fold with argmin/argmax merge, centi-int values,
    (ts, event_id) tie order."""
    from vyntr_ray.stages.windows import ohlc_bars

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"])
    return ohlc_bars(ds, key_col="event_type", bucket_s=86_400)


def _q_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier audit of n_chars per language
    (stages/dataset_tools.py:iqr_outliers): quantile_disc q1/q3, the
    cross-multiplied 2x/5-3 integer fence, zero-shuffle count fold."""
    from vyntr_ray.stages.dataset_tools import iqr_outliers

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return iqr_outliers(ds, "lang", "n_chars")


def _q_degree_histogram(sf_dir: str):
    """Degree distribution of the co-purchase graph
    (stages/graph.py:degree_histogram): two group_sum folds — node
    degrees (data-scaled key) then degree counts (bounded by max
    degree)."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import degree_histogram

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=1)
    return degree_histogram(edges, u_col="item_a", v_col="item_b")


def _q_rolling_outliers(sf_dir: str):
    """Trailing-50-row 3-sigma anomaly flags per user
    (stages/windows.py:rolling_outliers): cross-multiplied variance
    inequality (n·v − s)² > 9(n·q − s²), all centi-int64."""
    from vyntr_ray.stages.windows import rolling_outliers

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return rolling_outliers(ds, k=50, z=3)


def _q_kcore(sf_dir: str):
    """3-core of the co-purchase graph (stages/graph.py:kcore_nodes):
    6 synchronized peel rounds, pinned-block raw tasks + broadcast
    alive mask; oracle = the identical unrolled materialized-CTE peel."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import kcore_nodes

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=1)
    return kcore_nodes(edges, k=3, u_col="item_a", v_col="item_b",
                       n_rounds=6)


def _q_sssp(sf_dir: str):
    """Weighted shortest paths on the co-purchase graph
    (stages/graph.py:sssp_rounds): 6 synchronized Bellman-Ford rounds,
    pinned edge blocks + broadcast distance vector, source = smallest
    item, edge weight = (a+b)%9+1 (integer, derivable in SQL).  Oracle
    = the identical unrolled materialized-CTE relaxation."""
    import numpy as np

    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import sssp_rounds

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=1)

    def wcol(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False).astype("int64")
        b = t["item_b"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"item_a": pa.array(a, pa.int64()),
                         "item_b": pa.array(b, pa.int64()),
                         "w": pa.array((a + b) % 9 + 1, pa.int64())})

    return sssp_rounds(edges.map_batches(wcol, batch_format="pyarrow"),
                       k=6, u_col="item_a", v_col="item_b", w_col="w")


def _q_cdc_apply(sf_dir: str):
    """CDC merge (stages/joins.py:cdc_apply): customer balances as the
    base snapshot, orders as the changelog (status F = delete, else
    upsert to the order total), last (orderdate, orderkey) change wins;
    keys with no changes keep the snapshot value."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import cdc_apply

    base = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    chg = _read(sf_dir, "orders",
                columns=["o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate"])

    def prep_base(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "val_centi": pc.cast(_round_ha(pc.multiply(
                t["c_acctbal"], pa.scalar(100.0))), pa.int64())})

    def prep_chg(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                     pa.int64())
        return pa.table({
            "c_custkey": t["o_custkey"],
            "val_centi": pc.cast(_round_ha(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "op": pc.if_else(pc.equal(t["o_orderstatus"],
                                      pa.scalar("F")),
                             pa.scalar("D"), pa.scalar("U")),
            "seq_us": us,
            "seq_id": t["o_orderkey"]})

    return cdc_apply(base.map_batches(prep_base, batch_format="pyarrow"),
                     chg.map_batches(prep_chg, batch_format="pyarrow"),
                     key_col="c_custkey", val_col="val_centi")


def _q_assoc_rules(sf_dir: str):
    """Association rules over the top-50 co-purchased pairs
    (stages/baskets.py:assoc_rules): floored micro confidence both
    directions + cross-multiplied lift, supports fetched only for the
    winning pairs' items."""
    from vyntr_ray.stages.baskets import assoc_rules

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return assoc_rules(ds, "l_orderkey", "l_partkey", k=50, min_count=1)


def _q_range_export(sf_dir: str):
    """Balanced range-partitioned export of orders by centi price
    (sources/zonemap.py:range_export): exact NTILE splitters via
    distributed rank_select, skew-proof ~n/8 buckets; result = the
    manifest, oracled by the quantile_disc splitter replay."""
    import shutil

    import pyarrow.compute as pc

    from vyntr_ray.sources.zonemap import range_export

    out = os.path.join("/tmp/vyntr_ray_cache",
                       f"range_orders_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_centi": pc.cast(_round_ha(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64())})

    return range_export(ds.map_batches(prep, batch_format="pyarrow"),
                        out, "price_centi", n_buckets=8)


def _q_group_topk_ties(sf_dir: str):
    """Top-5 longest docs per language WITH TIES (RANK, not row_number
    — stages/dataset_tools.py:group_topk_ties), vs the QUALIFY rank()
    oracle."""
    from vyntr_ray.stages.dataset_tools import group_topk_ties

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars", "doc_id"])
    return group_topk_ties(ds, "lang", "n_chars", "doc_id", k=5)


def _q_srp_partition(sf_dir: str):
    """SimHash-for-vectors bucket assignment over the embeddings table
    (stages/similarity.py:srp_partition): 16 md5-parity ±1 hyperplanes,
    int-scaled order-free dots — the bit-exact vector-LSH shuffle
    key."""
    from vyntr_ray.stages.similarity import srp_partition

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return srp_partition(ds, n_planes=16, dim=64)


def _q_window_join(sf_dir: str):
    """Stream-stream interval join (stages/joins.py:window_join):
    every (purchase, view) pair of the same user with the view in the
    hour before the purchase — pairs, not counts (range_count_join)
    nor latest-only (asof_join)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import window_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def keep(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], pa.scalar(kind)))
        return f

    return window_join(ev.map_batches(keep("purchase"),
                                      batch_format="pyarrow"),
                       ev.map_batches(keep("view"),
                                      batch_format="pyarrow"),
                       key_col="user_id", ts_col="ts",
                       id_col="event_id", window_s=3600)


def _q_dataset_split(sf_dir: str):
    """Leakage-proof deterministic train/val/test assignment
    (stages/sampling.py:dataset_split): 80/10/10 of md5 hash space,
    zero-padded-hex compare — stable under reruns and corpus growth."""
    from vyntr_ray.stages.sampling import dataset_split

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return dataset_split(ds, "doc_id")


def _q_chi2_independence(sf_dir: str):
    """Chi-square independence contributions for lang × source
    (stages/dataset_tools.py:chi2_independence): full grid incl. zero
    cells, per-cell floored micro (O·N − R·C)²/(N·R·C) — Python-int
    exact vs the HUGEINT oracle."""
    from vyntr_ray.stages.dataset_tools import chi2_independence

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return chi2_independence(ds, "lang", "source")


def _q_copartition_join(sf_dir: str):
    """Shuffle-free bucket-aligned join (sources/zonemap.py:
    copartition_join): customer and orders exported range-partitioned
    on ONE shared custkey splitter set, then joined one raw task per
    bucket pair — the storage-partitioned join; oracled vs the plain
    SQL equi-join."""
    import shutil

    from vyntr_ray.sources.zonemap import (copartition_join,
                                           export_splitters, range_export)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def okey(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_custkey": t["o_custkey"]})

    tag = os.path.basename(sf_dir)
    dir_a = os.path.join("/tmp/vyntr_ray_cache", f"copart_cust_{tag}")
    dir_b = os.path.join("/tmp/vyntr_ray_cache", f"copart_ord_{tag}")
    shutil.rmtree(dir_a, ignore_errors=True)
    shutil.rmtree(dir_b, ignore_errors=True)
    splits = export_splitters(cust, "c_custkey", n_buckets=8)
    range_export(cust, dir_a, "c_custkey", splits=splits)
    range_export(orders.map_batches(okey, batch_format="pyarrow"),
                 dir_b, "c_custkey", splits=splits)
    return copartition_join(dir_a, dir_b, "c_custkey")


def _q_novelty_scores(sf_dir: str):
    """Per-doc trigram novelty (stages/text_analysis.py:novelty_scores):
    fraction of the doc's distinct trigrams appearing nowhere else,
    floored micro — distinct flat-map -> gram df -> df joined back and
    folded per doc."""
    from vyntr_ray.stages.text_analysis import novelty_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return novelty_scores(ds, n=3)


def _q_winsorized_stats(sf_dir: str):
    """Per-lang winsorized n_chars stats
    (stages/dataset_tools.py:winsorized_stats): clip to the [q05, q95]
    quantile_disc selections, exact int64 clipped sums."""
    from vyntr_ray.stages.dataset_tools import winsorized_stats

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return winsorized_stats(ds, "lang", "n_chars")


def _q_nearest_join(sf_dir: str):
    """Closest-view alignment per purchase (stages/joins.py:
    nearest_join): smallest |gap| either direction, ties to the
    earlier view then smaller id — the sensor-alignment join asof
    can't express."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import nearest_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def keep(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], pa.scalar(kind)))
        return f

    return nearest_join(ev.map_batches(keep("purchase"),
                                       batch_format="pyarrow"),
                        ev.map_batches(keep("view"),
                                       batch_format="pyarrow"),
                        key_col="user_id", ts_col="ts",
                        id_col="event_id")


def _q_rolling_median(sf_dir: str):
    """Per-user trailing-5 median (stages/windows.py:rolling_median):
    pandas rolling 'lower' quantile == DuckDB windowed
    quantile_disc(0.5) selection, centi-int exact."""
    from vyntr_ray.stages.windows import rolling_median

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return rolling_median(ds, k=5)


_OLD_SNAPSHOT_SOURCES = [f"src{i}" for i in range(10)]


def _q_dedup_incremental(sf_dir: str):
    """Incremental-crawl dedup: drop re-crawled docs whose content
    fingerprint the previous snapshot (sources src0-src9) already
    holds — fingerprint_batch (M-series md5 contract) + the distributed
    anti_join, both sides fact-scaled (stages/joins.py:anti_join)."""
    import pyarrow.compute as pc

    from vyntr_ray.stages.joins import anti_join
    from vyntr_ray.stages.text_analysis import fingerprint_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    fp = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    old_set = pa.array(_OLD_SNAPSHOT_SOURCES, pa.string())

    def only_old(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["source"], value_set=old_set))

    old = fp.map_batches(only_old, batch_format="pyarrow")
    return anti_join(fp, old, key_col="fingerprint",
                     left_payload=["doc_id", "source"],
                     types={"fingerprint": pa.string(),
                            "doc_id": pa.int64(),
                            "source": pa.string()})


def _q_key_skew(sf_dir: str):
    """Shuffle-key skew audit of events.user_id
    (stages/dataset_tools.py:key_skew): top-10 heavy keys + global
    collision mass sum(cnt^2) — the salting decision input."""
    from vyntr_ray.stages.dataset_tools import key_skew

    ds = _read(sf_dir, "events", columns=["user_id"])
    return key_skew(ds, "user_id", topk=10)


def _q_zorder_export(sf_dir: str):
    """Morton-interleaved 2-D layout export of orders on (custkey,
    orderdate-day) (sources/zonemap.py:zorder_export): one sorted
    parquet per z-bucket via tmp+atomic-rename, manifest prunes on
    EITHER dimension.  Result = the manifest; the oracle replays the
    identical bit-interleave arithmetic."""
    import shutil

    import pyarrow.compute as pc

    from vyntr_ray.sources.zonemap import zorder_export

    out = os.path.join("/tmp/vyntr_ray_cache",
                       f"zorder_orders_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                     pa.int64())
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "x": t["o_custkey"],
            "y": pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))})

    return zorder_export(ds.map_batches(prep, batch_format="pyarrow"),
                         out, "x", "y", bits=21, width=1 << 20)


_RERANK_TERMS = ["merge", "window", "spark", "hash"]


def _q_jaccard_rerank(sf_dir: str):
    """OR-recall + exact token-set-Jaccard rerank, top-20
    (stages/search_query.py:jaccard_rerank): integer score_micro =
    inter·1e6 // union, doc-id tie-break."""
    from vyntr_ray.stages.search_query import jaccard_rerank

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return jaccard_rerank(ds, _RERANK_TERMS, k=20)



# --------------------------------------------------------------------------
# round-5 additions
# --------------------------------------------------------------------------

def _q_butterfly_count(sf_dir: str):
    """Bipartite 4-cycle (butterfly) count over the order x part
    incidence (stages/graph.py:butterfly_count) - the bipartite analog
    of triangle_count: total = sum over co-occurring part pairs of
    C(co-occurrence, 2), a zero-shuffle partial-sum pass over the
    distributed pair projection (pair_edges)."""
    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import butterfly_count

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = pair_edges(ds, "l_orderkey", "l_partkey", min_count=1)
    return butterfly_count(edges)


def _q_kmv_distinct(sf_dir: str):
    """K-minimum-values distinct-user sketch next to its exact companion
    (stages/sketches.py:kmv_distinct): bottom-256 distinct md5-upper64
    hashes, est = (k-1)*2^64 // h_(k) in pure-Python int.  The oracle
    rebuilds the identical sketch via md5_number_upper + HUGEINT -
    sketch-for-sketch equality, the HLL/CMS/Bloom pattern."""
    from vyntr_ray.stages.sketches import kmv_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    return kmv_distinct(ds, "user_id", k=256)


def _q_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate rate over documents
    (stages/dedup.py:dup_rate_by_group) - the curation diagnostic view
    over the dedup_exact keep-list: a doc is a dup iff an identical
    text exists with a smaller doc_id anywhere in the corpus; exact
    floored micro rates per source."""
    from vyntr_ray.stages.dedup import dup_rate_by_group

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return dup_rate_by_group(ds, "source")



def _q_containment_dups(sf_dir: str):
    """Containment near-dup pairs over the planted corpus
    (stages/dedup.py:containment_pairs): |A∩B| / min(|A|,|B|) catches
    subset-duplication Jaccard misses; the planted truncated copies are
    strict shingle subsets, so they surface at containment 1.0.  The
    df_cap=16 hot-shingle cap is mirrored in the oracle's kept CTE."""
    from vyntr_ray.stages.dedup import containment_pairs

    return containment_pairs(_planted_dup_docs(sf_dir))


def _q_join_size_est(sf_dir: str):
    """CMS inner-product join-cardinality estimate for
    events.user_id = orders.o_custkey next to the exact size
    (stages/sketches.py:join_size_est) - min_r of the sketch row dot
    products, oracled sketch-for-sketch via md5_number_upper buckets."""
    from vyntr_ray.stages.sketches import join_size_est

    ev = _read(sf_dir, "events", columns=["user_id"])
    od = _read(sf_dir, "orders", columns=["o_custkey"])
    return join_size_est(ev, od, "user_id", "o_custkey")



def _q_mutual_nn(sf_dir: str):
    """Mutual nearest-neighbor pairs over the embeddings table
    (stages/similarity.py:mutual_nn) - reciprocal best match under
    (rounded cosine DESC, id ASC); knn_join k=1 both ways + an O(V)
    driver mutuality fold."""
    from vyntr_ray.stages.similarity import mutual_nn

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return mutual_nn(ds)



def _q_bow_dedup(sf_dir: str):
    """Order-invariant bag-of-words dedup (r5): key = md5 of the SORTED
    token list - catches shuffled/reordered duplicates that byte-exact
    dedup_exact misses; same group_fold min-id shape (dedup_by_key).
    Token rule and sort mirrored in SQL (list_sort == python sorted for
    the [a-z0-9]+ token alphabet)."""
    import hashlib

    from vyntr_ray.stages.dedup import dedup_by_key
    from vyntr_ray.stages.search_index import TEXT_TOKEN

    def bow_key(batch: pa.Table) -> pa.Array:
        keys = [hashlib.md5(" ".join(sorted(
            TEXT_TOKEN.findall((t or "").lower()))).encode("utf-8"))
            .hexdigest() for t in batch["text"].to_pylist()]
        return pa.array(keys, pa.string())

    return dedup_by_key(_read(sf_dir, "documents",
                              columns=["doc_id", "text"]),
                        bow_key, key_name="bow_md5")


def _q_token_diversity(sf_dir: str):
    """Simpson token diversity per source (r5): 1 - sum(p_i^2) over the
    source's token distribution, in exact floored micro units via
    cross-multiplication (1e6 - sum(cnt^2)*1e6 // total^2) - the
    lexical-diversity curation signal (a source stuck on one phrase
    scores near 0).  Per-source token counts via group_sum partials
    (data-scaled keys); sum(cnt^2) folds per source in pure-Python int
    (squares of corpus-scale counts pass 2^63)."""
    from vyntr_ray.stages.text_analysis import token_diversity

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return token_diversity(ds, "source")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- driver-checked window (first 50): the r5 rotation ---
        # oldest never-driver-checked exact-oracled entries lead
        # (r4-verdict item 2): S11 search family, TPC-H analog
        # cohort, chunk_upsert, knn_join &c.  Rows-only entries
        # are excluded from the window (they would spend slots on
        # the weaker rows-only check).
        "bm25_fielded": _q_bm25_fielded,
        "bm25_topk": _q_bm25_topk,
        "inverted_index": _q_inverted_index,
        "chunk_upsert": _q_chunk_upsert,
        "tfidf_keywords": _q_tfidf_keywords,
        "knn_join": _q_knn_join,
        "ntile_buckets": _q_ntile_buckets,
        "bigram_pmi": _q_bigram_pmi,
        "user_set_ops": _q_user_set_ops,
        "tpch_q2ish": _q_tpch_q2ish,
        "group_ranks": _q_group_ranks,
        "rollup_counts": _q_rollup_counts,
        "regex_extract": _q_regex_extract,
        "value_quantiles_cont": _q_value_quantiles_cont,
        "running_total": _q_running_total,
        "tpch_q7ish": _q_tpch_q7ish,
        "tpch_q16ish": _q_tpch_q16ish,
        "tpch_q21ish": _q_tpch_q21ish,
        "tpch_q20ish": _q_tpch_q20ish,
        "tpch_q15ish": _q_tpch_q15ish,
        "tpch_q12ish": _q_tpch_q12ish,
        "tpch_q11ish": _q_tpch_q11ish,
        "tpch_q9ish": _q_tpch_q9ish,
        "tpch_q8ish": _q_tpch_q8ish,
        "anti_join_bloom": _q_anti_join_bloom,
        "shuffle_export": _q_shuffle_export,
        "tpch_q22ish": _q_tpch_q22ish,
        "tpch_q19ish": _q_tpch_q19ish,
        "tpch_q17ish": _q_tpch_q17ish,
        "tpch_q14ish": _q_tpch_q14ish,
        "tpch_q10ish": _q_tpch_q10ish,
        "tpch_q6ish": _q_tpch_q6ish,
        "paragraph_dedup": _q_paragraph_dedup,
        "search_boolean": _q_search_boolean,
        "bm25_phrase": _q_bm25_phrase,
        "time_weighted_avg": _q_time_weighted_avg,
        "weighted_sample": _q_weighted_sample,
        "hits": _q_hits,
        "zonemap_export": _q_zonemap_export,
        "fuzzy_dup_pairs": _q_fuzzy_dup_pairs,
        "table_profile": _q_table_profile,
        "first_last": _q_first_last,
        "value_pivot": _q_value_pivot,
        "active_customers_bloom": _q_active_customers_bloom,
        "daily_reconcile": _q_daily_reconcile,
        "active_customers": _q_active_customers,
        "left_join_returns": _q_left_join_returns,
        "grouping_sets": _q_grouping_sets,
        "cube_counts": _q_cube_counts,
        "percentile_ranks": _q_percentile_ranks,
        # --- remaining never-driver-checked entries (strict-checker
        # evidence only; next rotation cohort) ---
        "bm25_tantivy": _q_bm25_tantivy,
        "butterfly_count": _q_butterfly_count,
        "kmv_distinct": _q_kmv_distinct,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "containment_dups": _q_containment_dups,
        "join_size_est": _q_join_size_est,
        "mutual_nn": _q_mutual_nn,
        "bow_dedup": _q_bow_dedup,
        "token_diversity": _q_token_diversity,
        "ks_drift": _q_ks_drift,
        "gini_index": _q_gini_index,
        "heatmap_bins": _q_heatmap_bins,
        "mwu_drift": _q_mwu_drift,
        "token_entropy": _q_token_entropy,
        "ohlc_bars": _q_ohlc_bars,
        "iqr_outliers": _q_iqr_outliers,
        "degree_histogram": _q_degree_histogram,
        "jaccard_rerank": _q_jaccard_rerank,
        "rolling_outliers": _q_rolling_outliers,
        "kcore": _q_kcore,
        "cdc_apply": _q_cdc_apply,
        "dedup_incremental": _q_dedup_incremental,
        "key_skew": _q_key_skew,
        "zorder_export": _q_zorder_export,
        "assoc_rules": _q_assoc_rules,
        "range_export": _q_range_export,
        "group_topk_ties": _q_group_topk_ties,
        "srp_partition": _q_srp_partition,
        "window_join": _q_window_join,
        "dataset_split": _q_dataset_split,
        "chi2_independence": _q_chi2_independence,
        "copartition_join": _q_copartition_join,
        "novelty_scores": _q_novelty_scores,
        "winsorized_stats": _q_winsorized_stats,
        "nearest_join": _q_nearest_join,
        "rolling_median": _q_rolling_median,
        "rolling_sum_time": _q_rolling_sum_time,
        "basket_pairs": _q_basket_pairs,
        "triangle_count": _q_triangle_count,
        "bfs_hops": _q_bfs_hops,
        "search_snippets": _q_search_snippets,
        "suggest_terms": _q_suggest_terms,
        "rfm_segments": _q_rfm_segments,
        "monthly_growth": _q_monthly_growth,
        "ab_ttest": _q_ab_ttest,
        "gaps_islands": _q_gaps_islands,
        "event_throttle": _q_event_throttle,
        "scd2_intervals": _q_scd2_intervals,
        "group_median": _q_group_median,
        "weekday_bitmap": _q_weekday_bitmap,
        "embedding_norms": _q_embedding_norms,
        "readability": _q_readability,
        "fk_check": _q_fk_check,
        "next_event_gap": _q_next_event_gap,
        "session_paths": _q_session_paths,
        "gap_fill_months": _q_gap_fill_months,
        "group_mad": _q_group_mad,
        "last_touch": _q_last_touch,
        "watermark_filter": _q_watermark_filter,
        "merge_intervals": _q_merge_intervals,
        "cumulative_distinct": _q_cumulative_distinct,
        "group_mode": _q_group_mode,
        "price_histogram": _q_price_histogram,
        "skyline_orders": _q_skyline_orders,
        "group_regression": _q_group_regression,
        "unpivot_measures": _q_unpivot_measures,
        "ivf_kmeans": _q_ivf_kmeans,
        "audio_windows": _q_audio_windows,
        # --- previously driver-green rows (r1-r4) ---
        "poisson_bootstrap": _q_poisson_bootstrap,
        "chunk_digests": _q_chunk_digests,
        "wilson_ranking": _q_wilson_ranking,
        "day_churn_jaccard": _q_day_churn_jaccard,
        "bitmap_lookup": _q_bitmap_lookup,
        "forecast_naive_error": _q_forecast_naive_error,
        "lateness_quantiles": _q_lateness_quantiles,
        "pretrain_pipeline": _q_pretrain_pipeline,
        "diversified_topk": _q_diversified_topk,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "markov_stationary": _q_markov_stationary,
        "lerp_fill": _q_lerp_fill,
        "schema_evolution_read": _q_schema_evolution_read,
        "autocorr_daily": _q_autocorr_daily,
        "mahalanobis2": _q_mahalanobis2,
        "path_topk": _q_path_topk,
        "pmi_pairs": _q_pmi_pairs,
        "benford_deviation": _q_benford_deviation,
        "group_moments": _q_group_moments,
        "clustering_coeff": _q_clustering_coeff,
        "minhash_accuracy": _q_minhash_accuracy,
        "bigram_logprob": _q_bigram_logprob,
        "bloom_probe": _q_bloom_probe,
        "tfidf_topk": _q_tfidf_topk,
        "fk_orphans": _q_fk_orphans,
        "json_field_stats": _q_json_field_stats,
        "embedding_covariance": _q_embedding_covariance,
        "rrf_fusion": _q_rrf_fusion,
        "psi_drift": _q_psi_drift,
        "snapshot_diff": _q_snapshot_diff,
        "zipf_fit": _q_zipf_fit,
        "funnel_windowed": _q_funnel_windowed,
        "adamic_adar": _q_adamic_adar,
        "compression_ratio": _q_compression_ratio,
        "event_markov": _q_event_markov,
        "interval_coverage": _q_interval_coverage,
        "window_distinct": _q_window_distinct,
        "cms_freq": _q_cms_freq,
        "sssp": _q_sssp,
        "systematic_sample": _q_systematic_sample,
        "lift_table": _q_lift_table,
        "locf_fill": _q_locf_fill,
        "itemsets3": _q_itemsets3,
        "hll_intersect": _q_hll_intersect,
        "degree_assortativity": _q_degree_assortativity,
        "trending_items": _q_trending_items,
        "distinctive_terms": _q_distinctive_terms,
        "conversion_lag": _q_conversion_lag,
        "monthly_share": _q_monthly_share,
        "lsh_lookup": _q_lsh_lookup,
        "crawl_flagship": _q_crawl_flagship,
        "tpch_q18ish": _q_tpch_q18ish,
        "lag_diff": _q_lag_diff,
        "blob_stats": _q_blob_stats,
        "tpch_q3ish": _q_tpch_q3ish,
        "tpch_q5ish": _q_tpch_q5ish,
        "qty_discount_corr": _q_qty_discount_corr,
        "frequent_tokens": _q_frequent_tokens,
        "event_transitions": _q_event_transitions,
        "funnel": _q_funnel,
        "retention": _q_retention,
        "tpch_q4ish": _q_tpch_q4ish,
        "tpch_q13ish": _q_tpch_q13ish,
        "lineitem_join": _q_lineitem_join,
        "tpch_q1ish": _q_tpch_q1,
        "region_customers": _q_region_customers,
        "sessionize": _q_sessionize,
        "rolling_sum": _q_rolling_sum,
        "asof_join": _q_asof_join,
        "asof_join_left": _q_asof_join_left,
        "range_join": _q_range_join,
        "value_quantiles": _q_value_quantiles,
        "group_zscores": _q_group_zscores,
        "distinct_users": _q_distinct_users,
        "distinct_users_hll": _q_distinct_users_hll,
        "value_quantiles_tdigest": _q_value_quantiles_tdigest,
        "scrub_pii": _q_scrub_pii,
        "components": _q_components,
        "pagerank": _q_pagerank,
        "stratified_sample": _q_stratified_sample,
        "keep_best_doc": _q_keep_best_doc,
        "filter_above_median": _q_filter_above_median,
        "mean_pool_embeddings": _q_mean_pool,
        "chunk_documents": _q_chunks,
        "chunk_embeddings": _q_chunk_embeddings,
        "ann_topk": _q_ann_topk,
        "ivf_ann": _q_ivf_ann,
        "index_prep": _q_index_prep,
        "autocomplete": _q_autocomplete,
        "query_counts": _q_query_counts,
        "query_counts_merge": _q_query_counts_merge,
        "event_json": _q_event_json,
        "events_window": _q_events_window,
        "sliding_window": _q_sliding_window,
        "orders_topk": _q_orders_topk,
        "relevant_text": _q_relevant_text,
        "inactive_customers": _q_inactive_customers,
        "nation_customers_agg": _q_nation_agg,
        "search_topk": _q_search_topk,
        "extract_text": _q_extract_text,
        "clean_content": _q_clean_content,
        "cleaning_stats": _q_cleaning_stats,
        "topk_largest": _q_topk_largest,
        "remove_largest": _q_remove_largest,
        "dedup_exact": _q_dedup_exact,
        "dedup_prefix": _q_dedup_prefix,
        "minhash_dups": _q_minhash_dups,
        "simhash_dups": _q_simhash_dups,
        "ngram_jaccard_dups": _q_ngram_jaccard,
        "embedding_dups": _q_embedding_dups,
        "token_totals": _q_token_totals,
        "quality_scores": _q_quality,
        "fingerprints": _q_fingerprints,
        "lang_id_counts": _q_lang_id,
        "decontaminate": _q_decontaminate,
        "repetition_scores": _q_repetition,
        "hash_sample": _q_hash_sample,
        "token_budget_sample": _q_token_budget,
        "weighted_mix": _q_weighted_mix,
        "ngram_counts": _q_ngram_counts,
        "point_lookup": _q_point_lookup,
        "token_budget_by_group": _q_token_budget_by_group,
        "pack_sequences": _q_pack_sequences,
        "unigram_logprob": _q_unigram_logprob,
        "normalize_text": _q_normalize_text,
        "dsir_weights": _q_dsir_weights,
        "curate": _q_curate,
        "dup_substrings": _q_dup_substrings,
        "dup_clusters": _q_dup_clusters,
        "group_topk": _q_group_topk,
        "event_pivot": _q_event_pivot,
        "multimodal_decode": _q_multimodal,
        "video_frames": _q_video_frames,
    }


def oracle_sql() -> dict[str, str]:
    import os
    fixture_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "fixtures")
    chunk_fix = os.path.join(fixture_dir, "chunk_embeddings.parquet")
    extract_fix = os.path.join(fixture_dir, "extract_text_golden.parquet")
    q = _qvec()
    qlit = "[" + ", ".join(f"{x!r}" for x in q.tolist()) + "]::DOUBLE[]"
    clean_sql = r"""
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            text,
            '[ \t　]+', ' ', 'g'),
            '<[^>]+>', '', 'g'),
            '(?i)&(?:[a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});', '', 'g'),
            '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
            '�', '', 'g'),
            '\[(.*?)\]\((.*?)\)', '\1', 'g'),
            '\?[^"''\s<>]+', '', 'g'),
            '\n{3,}', chr(10) || chr(10), 'g')
    """
    trim = lambda e: f"regexp_replace({e}, '^\\s+|\\s+$', '', 'g')"  # noqa: E731
    cleaned = trim(clean_sql)
    # kcore: unrolled 6-round synchronized peel — MATERIALIZED or DuckDB
    # inlines each level twice per round -> exponential blowup (the
    # pagerank CTE lesson); round r keeps nodes with degree >= 3 in
    # e{r-1} and filters e{r-1} to the survivors
    kcore_rounds = 6
    kcore_cte = ["li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i"
                 " FROM lineitem)",
                 "e0 AS MATERIALIZED (SELECT a.i AS u, b.i AS v"
                 " FROM li a JOIN li b ON a.g = b.g AND a.i < b.i"
                 " GROUP BY 1, 2)"]
    for r in range(1, kcore_rounds + 1):
        kcore_cte.append(
            f"n{r} AS MATERIALIZED (SELECT node FROM"
            f" (SELECT u AS node FROM e{r-1}"
            f"  UNION ALL SELECT v FROM e{r-1})"
            f" GROUP BY node HAVING count(*) >= 3)")
        kcore_cte.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{r-1} e"
            f" JOIN n{r} a ON e.u = a.node"
            f" JOIN n{r} b ON e.v = b.node)")
    R = kcore_rounds
    kcore_sql = (
        "WITH " + ",\n".join(kcore_cte) + f"""
        SELECT n.node, coalesce(d.degree, 0)::BIGINT AS degree
        FROM n{R} n LEFT JOIN
             (SELECT node, count(*)::BIGINT AS degree FROM
                  (SELECT u AS node FROM e{R}
                   UNION ALL SELECT v FROM e{R})
              GROUP BY 1) d ON n.node = d.node
        """)
    # hll_intersect: the distinct_users_hll register replica (p=12),
    # parameterized by WHERE clause and evaluated three times (A, B,
    # union) for the inclusion-exclusion overlap
    def _hll_est(where: str) -> str:
        return f"""(WITH h AS (
                SELECT DISTINCT md5_number_upper(user_id::VARCHAR) AS hv
                FROM events WHERE {where}),
            r AS (
                SELECT (hv >> 52)::BIGINT AS idx,
                       CASE WHEN (hv & ((1::UBIGINT << 52) - 1)) = 0
                            THEN 53
                            ELSE 52 - (SELECT max(b.b)
                                       FROM (SELECT unnest(
                                            generate_series(0, 51)) AS b) b
                                       WHERE ((hv & ((1::UBIGINT << 52)
                                                     - 1))
                                              >> b.b) & 1 = 1)
                       END AS rank
                FROM h),
            regs AS (SELECT idx, max(rank) AS reg FROM r GROUP BY idx),
            den AS (SELECT sum(power(2.0::DOUBLE, -reg))
                               + (4096 - count(*))::DOUBLE AS denom,
                           (4096 - count(*))::BIGINT AS zeros
                    FROM regs),
            est AS (SELECT (0.7213::DOUBLE / (1.0::DOUBLE
                                + 1.079::DOUBLE / 4096.0::DOUBLE))
                               * 4096.0::DOUBLE * 4096.0::DOUBLE / denom
                               AS raw,
                           zeros
                    FROM den)
            SELECT CAST(round(CASE WHEN raw <= 2.5::DOUBLE
                                        * 4096.0::DOUBLE
                                        AND zeros > 0
                                   THEN 4096.0::DOUBLE
                                        * ln(4096.0::DOUBLE / zeros)
                                   ELSE raw END) AS BIGINT)
            FROM est)"""

    # distinctive_terms: Dunning G² in integer micro-nats — L(x) =
    # floor(ln(x)·1e6) inlined per cell, CASE-guarded for O=0 cells
    def _Lm(x: str) -> str:
        return f"floor(ln({x}) * 1000000)::BIGINT"

    distinctive_sql = f"""
        WITH tok AS (SELECT lang,
                            unnest(regexp_extract_all(
                                lower(coalesce(text, '')),
                                '[a-z0-9]+')) AS token
                     FROM documents),
        tl AS (SELECT lang, token, count(*)::BIGINT AS a
               FROM tok GROUP BY 1, 2),
        lt AS (SELECT lang, sum(a)::BIGINT AS nl FROM tl GROUP BY 1),
        tt AS (SELECT token, sum(a)::BIGINT AS nt FROM tl GROUP BY 1),
        nn AS (SELECT sum(a)::BIGINT AS n FROM tl),
        cell AS (SELECT tl.lang, tl.token, tl.a, lt.nl, tt.nt, nn.n
                 FROM tl JOIN lt USING (lang) JOIN tt USING (token)
                      CROSS JOIN nn),
        g AS (SELECT lang, token, a,
              2 * (CASE WHEN a > 0
                        THEN a * ({_Lm('a')} + {_Lm('n')}
                                  - {_Lm('nt')} - {_Lm('nl')})
                        ELSE 0 END
                 + CASE WHEN nt - a > 0
                        THEN (nt - a) * ({_Lm('nt - a')} + {_Lm('n')}
                                         - {_Lm('nt')}
                                         - {_Lm('n - nl')})
                        ELSE 0 END
                 + CASE WHEN nl - a > 0
                        THEN (nl - a) * ({_Lm('nl - a')} + {_Lm('n')}
                                         - {_Lm('n - nt')}
                                         - {_Lm('nl')})
                        ELSE 0 END
                 + CASE WHEN n - nt - nl + a > 0
                        THEN (n - nt - nl + a)
                             * ({_Lm('n - nt - nl + a')} + {_Lm('n')}
                                - {_Lm('n - nt')} - {_Lm('n - nl')})
                        ELSE 0 END) AS llr_micro
              FROM cell)
        SELECT lang, token, a, llr_micro FROM g
        QUALIFY row_number() OVER (PARTITION BY lang
            ORDER BY llr_micro DESC, token) <= 10
    """
    hll_intersect_sql = f"""
        SELECT ea AS est_a, eb AS est_b, eu AS est_union,
               ea + eb - eu AS est_intersect
        FROM (SELECT {_hll_est("event_type = 'view'")} AS ea,
                     {_hll_est("event_type = 'purchase'")} AS eb,
                     {_hll_est("event_type IN ('view', 'purchase')")}
                         AS eu)
    """
    # sssp: unrolled 6-round Bellman-Ford relaxation (MATERIALIZED for
    # the same exponential-inlining reason as kcore/pagerank); round r
    # = min(d[r-1], d[r-1] + edge) over the doubled directed edge table
    sssp_cte = [
        "li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i"
        " FROM lineitem)",
        "p AS MATERIALIZED (SELECT a.i AS u, b.i AS v"
        " FROM li a JOIN li b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT u, v, (u + v) % 9 + 1 AS w FROM p"
        " UNION ALL SELECT v, u, (u + v) % 9 + 1 FROM p)",
        "d0 AS MATERIALIZED (SELECT min(u)::BIGINT AS node,"
        " 0::BIGINT AS dist FROM e)"]
    for r in range(1, 7):
        sssp_cte.append(
            f"d{r} AS MATERIALIZED (SELECT node, min(dist)::BIGINT AS dist"
            f" FROM (SELECT node, dist FROM d{r-1}"
            f"       UNION ALL SELECT e.v AS node, d.dist + e.w AS dist"
            f"       FROM d{r-1} d JOIN e ON e.u = d.node)"
            f" GROUP BY node)")
    sssp_sql = "WITH " + ",\n".join(sssp_cte) + \
        "\nSELECT node, dist FROM d6"
    from vyntr_ray.sources.zonemap import zorder_sql_expr
    zexpr = zorder_sql_expr("x", "y", bits=21)
    old_src = ", ".join(f"'{s}'" for s in _OLD_SNAPSHOT_SOURCES)
    # markov_stationary: unrolled 12-step power iteration (the
    # pagerank MATERIALIZED-chain family; see CLAUDE.md on inlining)
    markov_head = """
        WITH o AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM events),
        c AS (SELECT event_type AS src, nxt AS dst,
                     count(*)::BIGINT AS n
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
        rt AS (SELECT src, sum(n)::BIGINT AS t FROM c GROUP BY 1),
        st AS (SELECT DISTINCT src AS s FROM c),
        cf AS (SELECT c.src, c.dst, c.n FROM c
               JOIN st ON st.s = c.dst),
        pi0 AS (SELECT s, 1000000 // (SELECT count(*) FROM st) AS p
                FROM st)"""
    markov_steps = "".join(
        f""",
        pi{k + 1} AS MATERIALIZED (
            SELECT cf.dst AS s,
                   sum((p.p * cf.n) // rt.t)::BIGINT AS p
            FROM cf JOIN pi{k} p ON p.s = cf.src
                 JOIN rt ON rt.src = cf.src
            GROUP BY 1)"""
        for k in range(12))
    markov_sql = markov_head + markov_steps + """
        SELECT st.s AS event_type,
               coalesce(pi12.p, 0)::BIGINT AS pi_micro
        FROM st LEFT JOIN pi12 ON pi12.s = st.s
        ORDER BY event_type"""

    return {
        # Poisson(1) weights via integer thresholds on the md5
        # uniform — no float compare; shared swx/sw division
        "poisson_bootstrap": """
            WITH x AS (SELECT o_orderkey AS id,
                              round(o_totalprice * 100)::BIGINT AS v
                       FROM orders),
            bb AS (SELECT unnest(generate_series(0, 31)) AS b),
            h AS (SELECT bb.b, x.v,
                         md5_number_upper(bb.b::VARCHAR || ':'
                                          || x.id::VARCHAR) AS h
                  FROM x, bb),
            w AS (SELECT b, v,
                         CASE
                           WHEN h < 6786177901268885504::UBIGINT
                               THEN 0
                           WHEN h < 13572355802537771008::UBIGINT
                               THEN 1
                           WHEN h < 16965444753172213760::UBIGINT
                               THEN 2
                           WHEN h < 18096474403383695360::UBIGINT
                               THEN 3
                           WHEN h < 18379231815936565248::UBIGINT
                               THEN 4
                           ELSE 5
                         END AS w
                  FROM h),
            s AS (SELECT b, sum(w)::BIGINT AS sw,
                         sum(w * v)::BIGINT AS swx
                  FROM w GROUP BY b)
            SELECT b, sw, swx,
                   round(swx::DOUBLE / sw::DOUBLE, 6) AS mean_centi
            FROM s ORDER BY b
        """,
        # md5(VARCHAR) hashes the UTF-8 bytes on both engines
        "chunk_digests": """
            WITH c AS (SELECT doc_id, coalesce(text, '') AS t FROM
                           documents),
            g AS (SELECT doc_id, t,
                         unnest(generate_series(
                             1, greatest(length(t), 1), 256)) AS i
                  FROM c),
            s AS (SELECT doc_id, (i - 1) // 256 AS chunk_no,
                         substring(t, i, 256) AS piece
                  FROM g)
            SELECT doc_id, chunk_no::BIGINT AS chunk_no,
                   octet_length(piece::BLOB)::BIGINT AS n_bytes,
                   md5(piece) AS digest
            FROM s WHERE piece <> ''
            ORDER BY doc_id, chunk_no
        """,
        # all z terms spelled from the same 1.96 literal so both
        # engines build the identical doubles; ORDER BY the UNROUNDED
        # bound, round(…,6) only on the report
        "wilson_ranking": """
            WITH s AS (SELECT source, count(*)::BIGINT AS n,
                              count(*) FILTER (WHERE n_chars >= 500)
                                  ::BIGINT AS k
                       FROM documents GROUP BY 1),
            w AS (SELECT source, n, k,
                         ((k::DOUBLE / n::DOUBLE)
                          + 1.96 * 1.96 / (2.0 * n::DOUBLE)
                          - 1.96 * sqrt(((k::DOUBLE / n::DOUBLE)
                                         * (1.0 - (k::DOUBLE
                                                   / n::DOUBLE))
                                         + 1.96 * 1.96
                                           / (4.0 * n::DOUBLE))
                                        / n::DOUBLE))
                         / (1.0 + 1.96 * 1.96 / n::DOUBLE) AS wl
                  FROM s)
            SELECT source, n, k, round(wl, 6) AS wilson_lower
            FROM w ORDER BY wl DESC, source
        """,
        "day_churn_jaccard": """
            WITH du AS (SELECT DISTINCT
                            epoch_us(ts) // 86400000000 AS day,
                            user_id
                        FROM events),
            sz AS (SELECT day, count(*)::BIGINT AS n FROM du
                   GROUP BY 1),
            iv AS (SELECT a.day, count(*)::BIGINT AS inter
                   FROM du a JOIN du b
                       ON b.day = a.day + 1
                          AND b.user_id = a.user_id
                   GROUP BY 1)
            SELECT sa.day, sa.n AS n_today, sb.n AS n_next,
                   coalesce(iv.inter, 0)::BIGINT AS inter,
                   (coalesce(iv.inter, 0) * 1000000
                    // (sa.n + sb.n - coalesce(iv.inter, 0)))::BIGINT
                       AS jacc_micro
            FROM sz sa JOIN sz sb ON sb.day = sa.day + 1
            LEFT JOIN iv ON iv.day = sa.day
            ORDER BY sa.day
        """,
        "bitmap_lookup": """
            WITH m AS (SELECT doc_id FROM documents
                       WHERE lang = 'en' AND source = 'src7'),
            n AS (SELECT count(*)::BIGINT AS n_match FROM m)
            SELECT doc_id, n.n_match FROM m, n
            ORDER BY doc_id LIMIT 20
        """,
        # per-day floored APE summed then floored mean — both
        # divisions non-negative (trunc == floor)
        "forecast_naive_error": """
            WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000
                              AS day,
                              sum(round(o_totalprice * 100)::BIGINT)
                                  ::BIGINT AS rev
                       FROM orders GROUP BY 1),
            p AS (SELECT a.day, a.rev,
                         abs(a.rev - b.rev)::BIGINT AS err
                  FROM d a JOIN d b ON b.day = a.day - 7),
            s AS (SELECT count(*)::BIGINT AS n,
                         sum(err)::BIGINT AS sa,
                         sum(err * 1000000
                             // greatest(rev, 1))::BIGINT AS sm
                  FROM p)
            SELECT n AS n_days, sa AS sum_abs_err_centi,
                   (sm // greatest(n, 1))::BIGINT AS mape_micro
            FROM s
        """,
        "lateness_quantiles": """
            WITH o AS (SELECT event_id, epoch_us(ts) AS t FROM events),
            w AS (SELECT max(t) OVER (ORDER BY event_id
                          ROWS UNBOUNDED PRECEDING) - t AS late
                  FROM o)
            SELECT count(*)::BIGINT AS n,
                   quantile_disc(late, 0.5)::BIGINT AS p50_us,
                   quantile_disc(late, 0.9)::BIGINT AS p90_us,
                   quantile_disc(late, 0.99)::BIGINT AS p99_us,
                   max(late)::BIGINT AS max_us
            FROM w
        """,
        # the composed flagship chain: curate's normalize/gate/dedup +
        # exact-Jaccard>=0.6 closure (dup_clusters) + 3-gram
        # decontamination + budget — one recursive-CTE statement
        "pretrain_pipeline": """
            WITH RECURSIVE n AS (
                SELECT doc_id,
                       trim(regexp_replace(nfc_normalize(coalesce(text,
                            '')), '[ \t\n\r\f\v]+', ' ', 'g')) AS nt
                FROM documents),
            q AS (SELECT doc_id, nt FROM n
                  WHERE len(regexp_extract_all(nt, '\\S+')) >= 5
                    AND len(regexp_extract_all(nt, '[.,;:!?]')) * 1000000
                        // greatest(length(nt), 1) <= 200000),
            d AS (SELECT doc_id, nt FROM (
                    SELECT doc_id, nt,
                           min(doc_id) OVER (PARTITION BY md5(lower(nt)))
                               AS keeper
                    FROM q) WHERE doc_id = keeper),
            tk AS (SELECT doc_id, regexp_extract_all(nt, '\\S+') AS toks
                   FROM d),
            sh AS (SELECT doc_id,
                          CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                               WHEN len(toks) < 3
                                   THEN [array_to_string(toks, ' ')]
                               ELSE [array_to_string(toks[i:i+2], ' ')
                                     for i in generate_series(
                                         1, len(toks) - 2)]
                          END AS shs
                   FROM tk),
            shx AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
            sz AS (SELECT doc_id, count(*) AS nsh FROM shx
                   GROUP BY doc_id),
            ip AS (SELECT a.doc_id AS a, b.doc_id AS b,
                          count(*) AS inter
                   FROM shx a JOIN shx b
                       ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
            p AS (SELECT ip.a AS u, ip.b AS v
                  FROM ip JOIN sz sa ON ip.a = sa.doc_id
                          JOIN sz sb ON ip.b = sb.doc_id
                  WHERE (ip.inter * 1000000)
                        // (sa.nsh + sb.nsh - ip.inter) >= 600000),
            und AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM d
                UNION
                SELECT und.u, reach.r
                FROM und JOIN reach ON reach.node = und.v),
            keepn AS (SELECT node AS doc_id FROM reach
                      GROUP BY node HAVING node = min(r)),
            k AS (SELECT d.doc_id, d.nt FROM d
                  JOIN keepn USING (doc_id)),
            wb AS (SELECT regexp_extract_all(lower(text),
                              '[a-z0-9]+') AS words
                   FROM documents WHERE doc_id % 97 = 0),
            bg AS (SELECT DISTINCT
                          array_to_string(words[i:i+2], ' ') AS gram
                   FROM (SELECT words,
                                unnest(range(1, len(words) - 1)) AS i
                         FROM wb)),
            wc AS (SELECT doc_id, regexp_extract_all(lower(nt),
                              '[a-z0-9]+') AS words
                   FROM k WHERE doc_id % 97 <> 0),
            cg AS (SELECT doc_id,
                          array_to_string(words[i:i+2], ' ') AS gram
                   FROM (SELECT doc_id, words,
                                unnest(range(1, len(words) - 1)) AS i
                         FROM wc)),
            bad AS (SELECT DISTINCT cg.doc_id FROM cg
                    JOIN bg USING (gram)),
            cl AS (SELECT k.doc_id, k.nt FROM k
                   WHERE k.doc_id % 97 <> 0
                     AND k.doc_id NOT IN (SELECT doc_id FROM bad)),
            m AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h,
                         len(regexp_extract_all(nt, '\\S+')) AS tok
                  FROM cl),
            c AS (SELECT *, sum(tok) OVER (ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum FROM m)
            SELECT doc_id, tok::BIGINT AS tok FROM c WHERE cum <= 5000
            ORDER BY doc_id
        """,
        "diversified_topk": """
            WITH r AS (SELECT doc_id, lang, n_chars,
                              row_number() OVER (
                                  PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rl
                       FROM documents)
            SELECT doc_id, lang, n_chars FROM r WHERE rl <= 2
            ORDER BY n_chars DESC, doc_id LIMIT 10
        """,
        # zero-overlap pairs omitted on both sides (inner join)
        "source_vocab_overlap": """
            WITH w AS (SELECT source,
                              regexp_extract_all(lower(coalesce(text,
                                  '')), '[a-z0-9]+') AS ws
                       FROM documents),
            t AS (SELECT DISTINCT source, unnest(ws) AS token FROM w),
            sz AS (SELECT source, count(*)::BIGINT AS n FROM t
                   GROUP BY 1),
            pr AS (SELECT a.source AS src_a, b.source AS src_b,
                          count(*)::BIGINT AS inter
                   FROM t a JOIN t b
                       ON a.token = b.token AND a.source < b.source
                   GROUP BY 1, 2)
            SELECT pr.src_a, pr.src_b, za.n AS n_a, zb.n AS n_b,
                   pr.inter,
                   (pr.inter * 1000000
                    // (za.n + zb.n - pr.inter))::BIGINT AS jacc_micro
            FROM pr JOIN sz za ON za.source = pr.src_a
                 JOIN sz zb ON zb.source = pr.src_b
            ORDER BY pr.src_a, pr.src_b
        """,
        "markov_stationary": markov_sql,
        # anchors = locf's led rows; gap lerp in pure integers; prev/
        # next anchors via IGNORE NULLS frames both directions
        "lerp_fill": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS d,
                              ts, event_id,
                              round(value * 100)::BIGINT AS centi
                       FROM events),
            led AS (SELECT user_id, d, centi FROM e
                    QUALIFY row_number() OVER (
                        PARTITION BY user_id, d
                        ORDER BY ts DESC, event_id DESC) = 1),
            span AS (SELECT user_id, min(d) AS lo, max(d) AS hi
                     FROM led GROUP BY user_id),
            spine AS (SELECT user_id,
                             unnest(generate_series(lo, hi)) AS d
                      FROM span),
            j AS (SELECT sp.user_id, sp.d, l.centi,
                         CASE WHEN l.centi IS NULL
                              THEN NULL ELSE sp.d END AS ad
                  FROM spine sp LEFT JOIN led l
                       ON sp.user_id = l.user_id AND sp.d = l.d),
            w AS (SELECT user_id, d, centi,
                         last_value(centi IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS v0,
                         last_value(ad IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS d0,
                         first_value(centi IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY d
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS v1,
                         first_value(ad IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY d
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS d1
                  FROM j)
            SELECT user_id, d * 86400000000 AS day_us,
                   CASE WHEN centi IS NOT NULL THEN centi
                        ELSE (v0 * (d1 - d) + v1 * (d - d0))
                             // (d1 - d0)
                   END::BIGINT AS centi
            FROM w ORDER BY user_id, day_us
        """,
        # generation split replayed as orderkey parity; -1 = the
        # declared null default for the pre-price generation
        "schema_evolution_read": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 2 = 0 THEN -1
                        ELSE round(o_totalprice * 100)::BIGINT
                   END AS price_centi
            FROM orders ORDER BY o_orderkey
        """,
        # HUGEINT sums over consecutive-day pairs; the Pearson formula
        # mirrors qty_discount_corr term-for-term
        "autocorr_daily": """
            WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                              sum(round(o_totalprice * 100)::BIGINT)
                                  ::BIGINT AS rev
                       FROM orders GROUP BY 1),
            p AS (SELECT rev AS x,
                         lead(rev) OVER (ORDER BY day) AS y FROM d),
            q AS (SELECT x::HUGEINT AS x, y::HUGEINT AS y FROM p
                  WHERE y IS NOT NULL),
            s AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sxx, sum(y * y) AS syy
                  FROM q)
            SELECT n,
                   round((n::DOUBLE * sxy::DOUBLE
                          - sx::DOUBLE * sy::DOUBLE)
                         / sqrt((n::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)
                                * (n::DOUBLE * syy::DOUBLE
                                   - sy::DOUBLE * sy::DOUBLE)),
                         6) AS autocorr
            FROM s
        """,
        # exact HUGEINT sufficient stats; per-row distance evaluated
        # in the engine's operation order; selection by UNROUNDED md2
        # (IEEE order identical), round(…, 6) only on the report
        "mahalanobis2": """
            WITH b AS (SELECT l_orderkey, l_linenumber,
                              round(l_quantity * 100)::BIGINT AS x,
                              round(l_extendedprice * 100)::BIGINT AS y
                       FROM lineitem),
            s AS (SELECT count(*)::BIGINT AS n, sum(x::HUGEINT) AS sx,
                         sum(y::HUGEINT) AS sy,
                         sum(x::HUGEINT * x) AS sxx,
                         sum(y::HUGEINT * y) AS syy,
                         sum(x::HUGEINT * y) AS sxy
                  FROM b),
            m AS (SELECT sx::DOUBLE / n::DOUBLE AS mx,
                         sy::DOUBLE / n::DOUBLE AS my,
                         sxx::DOUBLE / n::DOUBLE
                             - (sx::DOUBLE / n::DOUBLE)
                               * (sx::DOUBLE / n::DOUBLE) AS vxx,
                         syy::DOUBLE / n::DOUBLE
                             - (sy::DOUBLE / n::DOUBLE)
                               * (sy::DOUBLE / n::DOUBLE) AS vyy,
                         sxy::DOUBLE / n::DOUBLE
                             - (sx::DOUBLE / n::DOUBLE)
                               * (sy::DOUBLE / n::DOUBLE) AS vxy
                  FROM s),
            d AS (SELECT b.l_orderkey, b.l_linenumber,
                         (m.vyy * ((b.x::DOUBLE - m.mx)
                                   * (b.x::DOUBLE - m.mx))
                          - 2.0 * m.vxy * ((b.x::DOUBLE - m.mx)
                                           * (b.y::DOUBLE - m.my))
                          + m.vxx * ((b.y::DOUBLE - m.my)
                                     * (b.y::DOUBLE - m.my)))
                         / (m.vxx * m.vyy - m.vxy * m.vxy) AS md2
                  FROM b, m)
            SELECT l_orderkey, l_linenumber, round(md2, 6) AS md2_r6
            FROM d ORDER BY md2 DESC, l_orderkey, l_linenumber
            LIMIT 10
        """,
        "path_topk": """
            WITH s AS (SELECT user_id, date_trunc('day', ts) AS day,
                              string_agg(event_type, '>'
                                  ORDER BY ts, event_id) AS path
                       FROM events GROUP BY 1, 2),
            c AS (SELECT path, count(*)::BIGINT AS n FROM s GROUP BY 1)
            SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20
        """,
        # pmi_micro = floor(ln((c_ab*N)/(c_a*c_b))*1e6): one double
        # division of exact int64 products (<2^53) + shared libm ln
        "pmi_pairs": """
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(coalesce(text,
                                  '')), '[a-z0-9]+') AS ws
                       FROM documents),
            toks AS (SELECT DISTINCT doc_id, unnest(ws) AS token FROM w),
            nn AS (SELECT count(*)::BIGINT AS n FROM documents),
            dfc AS (SELECT token, count(*)::BIGINT AS df FROM toks
                    GROUP BY 1),
            kept AS (SELECT token, df FROM dfc, nn WHERE df * 20 >= nn.n),
            kt AS (SELECT t.doc_id, t.token FROM toks t
                   JOIN kept USING (token)),
            cab AS (SELECT a.token AS ta, b.token AS tb,
                           count(*)::BIGINT AS c_ab
                    FROM kt a JOIN kt b
                        ON a.doc_id = b.doc_id AND a.token < b.token
                    GROUP BY 1, 2 HAVING count(*) >= 5),
            sc AS (SELECT ta, tb, c_ab,
                          floor(ln((c_ab * nn.n)::DOUBLE
                                   / (ka.df * kb.df)::DOUBLE)
                                * 1000000.0)::BIGINT AS pmi_micro
                   FROM cab JOIN kept ka ON ka.token = cab.ta
                            JOIN kept kb ON kb.token = cab.tb, nn)
            SELECT ta AS tok_a, tb AS tok_b, c_ab, pmi_micro FROM sc
            ORDER BY pmi_micro DESC, tok_a, tok_b LIMIT 20
        """,
        # leading digit by decimal-string head == the engine's integer
        # division loop; Benford expectation via shared-libm log10
        "benford_deviation": """
            WITH v AS (SELECT CAST(substr(
                           trunc(abs(o_totalprice))::BIGINT::VARCHAR,
                           1, 1) AS BIGINT) AS digit
                       FROM orders
                       WHERE trunc(abs(o_totalprice)) >= 1),
            c AS (SELECT digit, count(*)::BIGINT AS n FROM v
                  GROUP BY 1),
            d AS (SELECT unnest(generate_series(1, 9)) AS digit),
            t AS (SELECT sum(n)::BIGINT AS total FROM c)
            SELECT d.digit::BIGINT AS digit,
                   coalesce(c.n, 0)::BIGINT AS n,
                   (coalesce(c.n, 0) * 1000000
                    // greatest(t.total, 1))::BIGINT AS obs_micro,
                   floor(log10(1.0 + 1.0 / d.digit)
                         * 1000000.0)::BIGINT AS exp_micro,
                   abs((coalesce(c.n, 0) * 1000000
                        // greatest(t.total, 1))
                       - floor(log10(1.0 + 1.0 / d.digit)
                               * 1000000.0)::BIGINT)::BIGINT
                       AS dev_micro
            FROM d LEFT JOIN c USING (digit), t ORDER BY d.digit
        """,
        # HUGEINT power sums (x^4 wraps int64 at fact scale); the
        # double reduction mirrors the engine term-for-term, and
        # m2*sqrt(m2) replaces pow(m2,1.5) (sqrt is IEEE-exact)
        "group_moments": """
            WITH s AS (SELECT event_type, count(*)::BIGINT AS n,
                    sum((round(value * 100)::BIGINT)::HUGEINT) AS s1,
                    sum((round(value * 100)::BIGINT)::HUGEINT
                        * round(value * 100)::BIGINT) AS s2,
                    sum((round(value * 100)::BIGINT)::HUGEINT
                        * round(value * 100)::BIGINT
                        * round(value * 100)::BIGINT) AS s3,
                    sum((round(value * 100)::BIGINT)::HUGEINT
                        * round(value * 100)::BIGINT
                        * round(value * 100)::BIGINT
                        * round(value * 100)::BIGINT) AS s4
                FROM events GROUP BY 1),
            m AS (SELECT event_type, n,
                         s1::DOUBLE / n::DOUBLE AS mu,
                         s2::DOUBLE / n::DOUBLE AS e2,
                         s3::DOUBLE / n::DOUBLE AS e3,
                         s4::DOUBLE / n::DOUBLE AS e4
                  FROM s),
            c AS (SELECT event_type, n, mu,
                         e2 - mu * mu AS m2,
                         e3 - 3.0 * mu * e2
                            + 2.0 * mu * mu * mu AS m3,
                         e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2
                            - 3.0 * mu * mu * mu * mu AS m4
                  FROM m)
            SELECT event_type, n,
                   round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
                   round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
            FROM c ORDER BY event_type
        """,
        # min-vertex triangles (e1.u<e1.v<e2.v by id) credit all three
        # vertices; HAVING >=2 = pair_edges(min_count=2); floored
        # integer coefficient; deg>=2 nodes only
        "clustering_coeff": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            e AS (SELECT a.i AS u, b.i AS v
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2 HAVING count(*) >= 2),
            tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM e e1
                    JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
                    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
            tv AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
                       SELECT a AS node FROM tri
                       UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri) GROUP BY 1),
            adj AS (SELECT u AS node FROM e
                    UNION ALL SELECT v FROM e),
            deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj
                    GROUP BY 1)
            SELECT d.node, d.deg,
                   coalesce(tv.n_tri, 0)::BIGINT AS n_tri,
                   (2 * coalesce(tv.n_tri, 0) * 1000000
                    // (d.deg * (d.deg - 1)))::BIGINT AS coeff_micro
            FROM deg d LEFT JOIN tv USING (node)
            WHERE d.deg >= 2 ORDER BY d.node
        """,
        # one md5 per shingle (hv), 16 XOR-fold permutations with
        # md5-derived salts; Jaccard over the hashed shingle space on
        # BOTH sides, so every value matches by construction
        "minhash_accuracy": r"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(coalesce(text,
                                  '')), '[a-z0-9]+') AS ws
                       FROM documents),
            h AS (SELECT DISTINCT doc_id // 2 AS pair_id,
                         doc_id % 2 AS side,
                         md5_number_upper(
                             array_to_string(ws[i:i+1], ' ')) AS hv
                  FROM (SELECT doc_id, ws,
                               unnest(range(1, len(ws))) AS i FROM w)),
            ns AS (SELECT pair_id, side, count(*)::BIGINT AS n
                   FROM h GROUP BY 1, 2),
            ok AS (SELECT pair_id FROM ns GROUP BY 1
                   HAVING count(*) = 2),
            iv AS (SELECT pair_id, count(*)::BIGINT AS inter
                   FROM (SELECT pair_id, hv FROM h
                         GROUP BY pair_id, hv HAVING count(*) = 2)
                   GROUP BY 1),
            salts AS (SELECT p, md5_number_upper(
                                 'perm:' || p::VARCHAR) AS s
                      FROM (SELECT unnest(generate_series(0, 15))
                                AS p)),
            sig AS (SELECT pair_id, side, p, min(xor(hv, s)) AS mn
                    FROM h, salts GROUP BY 1, 2, 3),
            est AS (SELECT a.pair_id, count(*)::BIGINT AS m
                    FROM sig a JOIN sig b
                        ON a.pair_id = b.pair_id AND a.p = b.p
                           AND a.side = 0 AND b.side = 1
                           AND a.mn = b.mn
                    GROUP BY 1)
            SELECT ok.pair_id, na.n AS n_a, nb.n AS n_b,
                   (coalesce(est.m, 0) * 1000000 // 16)::BIGINT
                       AS est_micro,
                   (coalesce(iv.inter, 0) * 1000000
                    // (na.n + nb.n - coalesce(iv.inter, 0)))::BIGINT
                       AS jacc_micro
            FROM ok
            JOIN ns na ON na.pair_id = ok.pair_id AND na.side = 0
            JOIN ns nb ON nb.pair_id = ok.pair_id AND nb.side = 1
            LEFT JOIN iv ON iv.pair_id = ok.pair_id
            LEFT JOIN est ON est.pair_id = ok.pair_id
            ORDER BY ok.pair_id
        """,
        # MLE bigram LM (c12 >= 1 by construction); c1 = head count
        # over bigram positions so the conditional sums to 1; floored
        # shared-libm ln keeps both sides int64
        "bigram_logprob": r"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(coalesce(text,
                                  '')), '[a-z0-9]+') AS ws
                       FROM documents),
            bg AS (SELECT doc_id, ws[i] AS w1,
                          ws[i] || ' ' || ws[i+1] AS gram
                   FROM (SELECT doc_id, ws,
                                unnest(range(1, len(ws))) AS i FROM w)),
            dg AS (SELECT doc_id, w1, gram, count(*)::BIGINT AS cnt
                   FROM bg GROUP BY 1, 2, 3),
            c12 AS (SELECT gram, sum(cnt)::BIGINT AS c12 FROM dg
                    GROUP BY 1),
            c1 AS (SELECT w1, sum(cnt)::BIGINT AS c1 FROM dg
                   GROUP BY 1)
            SELECT dg.doc_id, sum(dg.cnt)::BIGINT AS n_bigrams,
                   sum(dg.cnt * floor(ln(c12.c12::DOUBLE
                                         / c1.c1::DOUBLE)
                                      * 1000000.0)::BIGINT)::BIGINT
                       AS logprob_micro
            FROM dg JOIN c12 USING (gram) JOIN c1 USING (w1)
            GROUP BY dg.doc_id
            ORDER BY dg.doc_id
        """,
        # m=8192/k=3 Bloom bitmap rebuilt bit-for-bit via
        # md5_number_upper (the cms_freq/hll pattern), so in_bloom
        # matches INCLUDING hash-collision false positives
        "bloom_probe": """
            WITH mem AS (SELECT DISTINCT l_partkey AS k FROM lineitem
                         WHERE l_quantity > 49),
            i AS (SELECT unnest(generate_series(0, 2)) AS i),
            bits AS (SELECT DISTINCT
                         (md5_number_upper(i.i::VARCHAR || ':'
                                           || mem.k::VARCHAR)
                          % 8192)::BIGINT AS b
                     FROM mem, i),
            pb AS (SELECT p.p_partkey, i.i,
                          (md5_number_upper(i.i::VARCHAR || ':'
                                            || p.p_partkey::VARCHAR)
                           % 8192)::BIGINT AS b
                   FROM part p, i)
            SELECT pb.p_partkey,
                   CASE WHEN count(*) FILTER (
                            WHERE pb.b IN (SELECT b FROM bits)) = 3
                        THEN 1 ELSE 0 END::BIGINT AS in_bloom,
                   CASE WHEN pb.p_partkey IN (SELECT k FROM mem)
                        THEN 1 ELSE 0 END::BIGINT AS is_member
            FROM pb GROUP BY pb.p_partkey
            ORDER BY pb.p_partkey
        """,
        # idf_micro = floor(ln(N/df)·1e6): same IEEE-double quotient +
        # libm log on both sides (the token_entropy trick), so
        # score_micro = tf·idf_micro is pure int64
        "tfidf_topk": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(text, '\\s+')) AS token
                FROM documents),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM toks WHERE token <> '' GROUP BY doc_id, token),
            df AS (SELECT token, count(*)::BIGINT AS df FROM tf
                   GROUP BY token),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            sc AS (SELECT tf.doc_id, tf.token,
                          tf.tf * floor(ln(n.n::DOUBLE / df.df::DOUBLE)
                                        * 1000000.0)::BIGINT
                              AS score_micro
                   FROM tf JOIN df USING (token), n)
            SELECT doc_id, token, score_micro FROM sc
            QUALIFY row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_micro DESC, token) <= 3
            ORDER BY doc_id, score_micro DESC, token
        """,
        "fk_orphans": """
            WITH u AS (
                SELECT 'customer.nation' AS fk_name, count(*) AS n_rows,
                       count(*) FILTER (WHERE c_nationkey IS NOT NULL
                           AND c_nationkey NOT IN
                               (SELECT n_nationkey FROM nation))
                           AS n_orphans,
                       count(*) FILTER (WHERE c_nationkey IS NULL)
                           AS n_nulls
                FROM customer
                UNION ALL
                SELECT 'lineitem.orders', count(*),
                       count(*) FILTER (WHERE l_orderkey IS NOT NULL
                           AND l_orderkey NOT IN
                               (SELECT o_orderkey FROM orders)),
                       count(*) FILTER (WHERE l_orderkey IS NULL)
                FROM lineitem
                UNION ALL
                SELECT 'lineitem.part', count(*),
                       count(*) FILTER (WHERE l_partkey IS NOT NULL
                           AND l_partkey NOT IN
                               (SELECT p_partkey FROM part)),
                       count(*) FILTER (WHERE l_partkey IS NULL)
                FROM lineitem
                UNION ALL
                SELECT 'lineitem.supplier', count(*),
                       count(*) FILTER (WHERE l_suppkey IS NOT NULL
                           AND l_suppkey NOT IN
                               (SELECT s_suppkey FROM supplier)),
                       count(*) FILTER (WHERE l_suppkey IS NULL)
                FROM lineitem
                UNION ALL
                SELECT 'nation.region', count(*),
                       count(*) FILTER (WHERE n_regionkey IS NOT NULL
                           AND n_regionkey NOT IN
                               (SELECT r_regionkey FROM region)),
                       count(*) FILTER (WHERE n_regionkey IS NULL)
                FROM nation
                UNION ALL
                SELECT 'orders.customer', count(*),
                       count(*) FILTER (WHERE o_custkey IS NOT NULL
                           AND o_custkey NOT IN
                               (SELECT c_custkey FROM customer)),
                       count(*) FILTER (WHERE o_custkey IS NULL)
                FROM orders)
            SELECT fk_name, n_rows::BIGINT AS n_rows,
                   n_orphans::BIGINT AS n_orphans,
                   n_nulls::BIGINT AS n_nulls
            FROM u ORDER BY fk_name
        """,
        # engine extracts the flat-int payload with one RE2 pass; the
        # oracle uses DuckDB's native json operator — independent
        # extraction paths, identical values on flat integer payloads
        "json_field_stats": """
            WITH v AS (SELECT event_type,
                              TRY_CAST(props->>'$.k' AS BIGINT) AS v
                       FROM events)
            SELECT event_type, count(*)::BIGINT AS n,
                   count(*) FILTER (WHERE v IS NULL)::BIGINT AS n_null,
                   coalesce(sum(v), 0)::BIGINT AS sum_v,
                   coalesce(min(v), 0)::BIGINT AS min_v,
                   coalesce(max(v), 0)::BIGINT AS max_v
            FROM v GROUP BY event_type ORDER BY event_type
        """,
        # per-value half-away ×1e4 scaling (embedding_norms
        # convention): every product and sum exact int64
        "embedding_covariance": """
            WITH p AS (
                SELECT a.i::BIGINT AS i, b.j::BIGINT AS j,
                       round(CAST(list_extract(e.embedding, a.i)
                                  AS DOUBLE) * 10000)::BIGINT AS x,
                       round(CAST(list_extract(e.embedding, b.j)
                                  AS DOUBLE) * 10000)::BIGINT AS y
                FROM embeddings e,
                     (SELECT unnest(generate_series(1, 16)) AS i) a,
                     (SELECT unnest(generate_series(1, 16)) AS j) b
                WHERE b.j >= a.i)
            SELECT i, j, count(*)::BIGINT AS n_vecs,
                   sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
                   sum(x * y)::BIGINT AS sum_xy
            FROM p GROUP BY i, j ORDER BY i, j
        """,
        # rrf_micro = Σ 1e6 // (60 + rank): integer floor division on
        # both sides; rank sentinel 0 = absent from that list
        "rrf_fusion": """
            WITH rb AS (
                SELECT c_custkey AS k,
                       row_number() OVER (
                           ORDER BY c_acctbal DESC, c_custkey) AS r
                FROM customer QUALIFY r <= 100),
            oc AS (SELECT o_custkey AS k, count(*)::BIGINT AS n
                   FROM orders GROUP BY 1),
            rc AS (SELECT k, row_number() OVER (ORDER BY n DESC, k) AS r
                   FROM oc QUALIFY r <= 100),
            f AS (SELECT coalesce(rb.k, rc.k) AS k,
                         coalesce(1000000 // (60 + rb.r), 0)
                             + coalesce(1000000 // (60 + rc.r), 0)
                             AS rrf_micro,
                         coalesce(rb.r, 0) AS rank_bal,
                         coalesce(rc.r, 0) AS rank_cnt
                  FROM rb FULL OUTER JOIN rc ON rb.k = rc.k)
            SELECT k AS c_custkey, rrf_micro::BIGINT AS rrf_micro,
                   rank_bal::BIGINT AS rank_bal,
                   rank_cnt::BIGINT AS rank_cnt
            FROM f ORDER BY rrf_micro DESC, c_custkey LIMIT 20
        """,
        # clip bounds are quantile_disc SELECTIONS (input values), so
        # the clipped sum is exact int64
        "winsorized_stats": """
            WITH q AS (SELECT lang,
                              quantile_disc(n_chars, 0.05)::BIGINT AS lo,
                              quantile_disc(n_chars, 0.95)::BIGINT AS hi
                       FROM documents GROUP BY 1)
            SELECT d.lang, q.lo, q.hi, count(*)::BIGINT AS n,
                   sum(CASE WHEN d.n_chars < q.lo OR d.n_chars > q.hi
                            THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
                   sum(greatest(q.lo, least(q.hi,
                                            d.n_chars)))::BIGINT AS wsum
            FROM documents d JOIN q USING (lang)
            GROUP BY 1, 2, 3
        """,
        # distinct per doc (a doc is one row), df via groupby, inner
        # join drops <n-token docs on both sides
        "novelty_scores": r"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(coalesce(text,
                                  '')), '[a-z0-9]+') AS ws
                       FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(ws[i:i+2], ' ') AS gram
                  FROM (SELECT doc_id, ws,
                               unnest(range(1, len(ws) - 1)) AS i
                        FROM w)),
            d AS (SELECT gram, count(*)::BIGINT AS df
                  FROM g GROUP BY 1),
            s AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                         sum(CASE WHEN d.df = 1 THEN 1
                                  ELSE 0 END)::BIGINT AS n_unique
                  FROM g JOIN d USING (gram) GROUP BY 1)
            SELECT doc_id, n_grams, n_unique,
                   (n_unique * 1000000) // n_grams AS novelty_micro
            FROM s
        """,
        "copartition_join": """
            SELECT c.c_custkey, c.c_nationkey, o.o_orderkey
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        """,
        # 0.8/0.9 of 2^32 as zero-padded hex (the hash_sample idiom)
        "dataset_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8)
                             < 'cccccccc' THEN 'train'
                        WHEN substr(md5(doc_id::VARCHAR), 1, 8)
                             < 'e6666666' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        # full grid (zero cells kept); HUGEINT before the square so
        # (O*N)^2*1e6 never wraps; floor-div then back to BIGINT
        "chi2_independence": """
            WITH ct AS (SELECT lang, source, count(*)::BIGINT AS o
                        FROM documents GROUP BY 1, 2),
            rt AS (SELECT lang, sum(o)::BIGINT AS rr FROM ct GROUP BY 1),
            cs AS (SELECT source, sum(o)::BIGINT AS cc
                   FROM ct GROUP BY 1),
            nt AS (SELECT sum(o)::BIGINT AS nn FROM ct)
            SELECT rt.lang, cs.source,
                   coalesce(ct.o, 0)::BIGINT AS o,
                   rt.rr AS r, cs.cc AS c, nt.nn AS n,
                   (((coalesce(ct.o, 0) * nt.nn
                      - rt.rr * cs.cc)::HUGEINT
                     * (coalesce(ct.o, 0) * nt.nn - rt.rr * cs.cc)
                     * 1000000)
                    // (nt.nn::HUGEINT * rt.rr * cs.cc))::BIGINT
                       AS contrib_micro
            FROM rt CROSS JOIN cs
            LEFT JOIN ct ON ct.lang = rt.lang AND ct.source = cs.source,
            nt
        """,
        "rolling_median": """
            SELECT event_id, user_id,
                   quantile_disc(round(value * 100)::BIGINT, 0.5)
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                       )::BIGINT AS med_centi
            FROM events
        """,
        "nearest_join": """
            WITH p AS (SELECT event_id, epoch_us(ts) AS us, user_id
                       FROM events WHERE event_type = 'purchase'),
            v AS (SELECT event_id, epoch_us(ts) AS us, user_id
                  FROM events WHERE event_type = 'view'),
            j AS (SELECT p.user_id, p.event_id AS left_id,
                         v.event_id AS right_id,
                         (p.us - v.us)::BIGINT AS gap_us,
                         row_number() OVER (PARTITION BY p.event_id
                             ORDER BY abs(p.us - v.us), v.us,
                                      v.event_id) AS rn
                  FROM p JOIN v ON p.user_id = v.user_id)
            SELECT user_id, left_id, right_id, gap_us
            FROM j WHERE rn = 1
        """,
        "window_join": """
            WITH p AS (SELECT event_id, epoch_us(ts) AS us, user_id
                       FROM events WHERE event_type = 'purchase'),
            v AS (SELECT event_id, epoch_us(ts) AS us, user_id
                  FROM events WHERE event_type = 'view')
            SELECT p.user_id, p.event_id AS left_id,
                   v.event_id AS right_id,
                   (p.us - v.us)::BIGINT AS gap_us
            FROM p JOIN v ON p.user_id = v.user_id
                         AND v.us BETWEEN p.us - 3600000000 AND p.us
        """,
        # SRP: per-dim int-scaling, md5-parity planes, order-free int
        # dots -> sign bits; the engine's srp_planes replayed in SQL
        "srp_partition": """
            WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                              generate_subscripts(embedding, 1) AS ds
                       FROM embeddings),
            v AS (SELECT vec_id, ds - 1 AS d,
                         round(x::DOUBLE * 1000000)::BIGINT AS vm
                  FROM e),
            p AS (SELECT t.p, s.d,
                         CASE WHEN (('0x' || substr(md5(t.p::VARCHAR
                                    || '_' || s.d::VARCHAR), 1, 1))::INT
                                    % 2) = 1
                              THEN 1 ELSE -1 END AS w
                  FROM generate_series(0, 15) t(p),
                       generate_series(0, 63) s(d)),
            dots AS (SELECT v.vec_id, p.p, sum(v.vm * p.w)::BIGINT AS dot
                     FROM v JOIN p ON v.d = p.d GROUP BY 1, 2)
            SELECT vec_id, sum(CASE WHEN dot >= 0 THEN 1::BIGINT << p
                                    ELSE 0 END)::BIGINT AS bucket
            FROM dots GROUP BY 1
        """,
        # top-50 pair cut mirrors basket_pairs' (n DESC, a, b) order;
        # all ratios floored micro-ints, lift cross-multiplied
        "assoc_rules": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            p AS (SELECT a.i AS item_a, b.i AS item_b,
                         count(*)::BIGINT AS n_ab
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2),
            t AS (SELECT * FROM p
                  ORDER BY n_ab DESC, item_a, item_b LIMIT 50),
            s AS (SELECT i, count(*)::BIGINT AS n_i FROM li GROUP BY 1),
            nb AS (SELECT count(DISTINCT g)::BIGINT AS n FROM li)
            SELECT t.item_a, t.item_b, t.n_ab,
                   sa.n_i AS n_a, sb.n_i AS n_b,
                   (t.n_ab * 1000000) // sa.n_i AS conf_ab_micro,
                   (t.n_ab * 1000000) // sb.n_i AS conf_ba_micro,
                   (t.n_ab * nb.n * 1000000) // (sa.n_i * sb.n_i)
                       AS lift_micro
            FROM t JOIN s sa ON t.item_a = sa.i
                   JOIN s sb ON t.item_b = sb.i, nb
        """,
        # splitters = quantile_disc(i/8) (the ceil(q*n)-1 selection the
        # engine computes as (i*n + B-1)//B - 1); bucket = #splitters<k
        "range_export": """
            WITH v AS (SELECT round(o_totalprice * 100)::BIGINT AS k
                       FROM orders),
            s AS (SELECT unnest(quantile_disc(k, [0.125, 0.25, 0.375,
                                                  0.5, 0.625, 0.75,
                                                  0.875])) AS sk
                  FROM v),
            b AS (SELECT k, (SELECT count(*) FROM s
                             WHERE s.sk < v.k)::BIGINT AS bucket
                  FROM v)
            SELECT bucket, min(k)::BIGINT AS min_key,
                   max(k)::BIGINT AS max_key, count(*)::BIGINT AS n
            FROM b GROUP BY 1
        """,
        "group_topk_ties": """
            SELECT lang, n_chars, doc_id,
                   rank() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC)::BIGINT AS rank
            FROM documents
            QUALIFY rank <= 5
        """,
        # same md5 normalization as the fingerprints oracle; NOT IN is
        # null-safe here (md5 of non-null text is never null)
        "dedup_incremental": f"""
            WITH f AS (SELECT doc_id, source,
                              md5(lower(regexp_replace(text, '\\s+', ' ',
                                                       'g')))
                                  AS fingerprint
                       FROM documents)
            SELECT fingerprint, doc_id, source FROM f
            WHERE fingerprint NOT IN
                  (SELECT fingerprint FROM f
                   WHERE source IN ({old_src}))
        """,
        "key_skew": """
            WITH c AS (SELECT user_id, count(*)::BIGINT AS cnt
                       FROM events GROUP BY 1),
            s AS (SELECT sum(cnt)::BIGINT AS n_rows,
                         count(*)::BIGINT AS n_keys,
                         max(cnt)::BIGINT AS max_cnt,
                         sum(cnt * cnt)::BIGINT AS sum_sq
                  FROM c)
            SELECT c.user_id, c.cnt, s.n_rows, s.n_keys, s.max_cnt,
                   s.sum_sq
            FROM c, s ORDER BY c.cnt DESC, c.user_id LIMIT 10
        """,
        # manifest replay: the identical Morton interleave (generated
        # 2x21-term bit arithmetic, sources/zonemap.py:zorder_sql_expr)
        "zorder_export": f"""
            WITH v AS (SELECT o_custkey AS x,
                              epoch_us(o_orderdate) // 86400000000 AS y
                       FROM orders),
            z AS (SELECT x, y, {zexpr} AS z FROM v)
            SELECT z // {1 << 20} AS bucket,
                   min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z,
                   min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
                   min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y,
                   count(*)::BIGINT AS n
            FROM z GROUP BY 1
        """,
        # trailing-50-row 3-sigma flags: integer variance inequality
        # (n*c - s)^2 > 9*(n*q - s^2) over the same ROWS frame
        "rolling_outliers": """
            WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
                              round(value * 100)::BIGINT AS c
                       FROM events),
            w AS (SELECT *,
                         sum(c) OVER win AS s,
                         sum(c * c) OVER win AS q,
                         count(*) OVER win AS n
                  FROM v
                  WINDOW win AS (PARTITION BY user_id
                                 ORDER BY tu, event_id
                                 ROWS BETWEEN 49 PRECEDING
                                 AND CURRENT ROW))
            SELECT event_id, user_id, c AS v_centi, n::BIGINT AS n_win
            FROM w
            WHERE (n*c - s)*(n*c - s) > 9*(n*q - s*s)
        """,
        "kcore": kcore_sql,
        "sssp": sssp_sql,
        "hll_intersect": hll_intersect_sql,
        "distinctive_terms": distinctive_sql,
        # CDC merge: last (orderdate, orderkey) change per customer wins,
        # status-F deletes; FULL JOIN keeps pure inserts AND untouched
        # base keys
        "cdc_apply": """
            WITH b AS (SELECT c_custkey AS k,
                              round(c_acctbal * 100)::BIGINT AS val
                       FROM customer),
            c AS (SELECT o_custkey AS k,
                         CASE WHEN o_orderstatus = 'F' THEN 'D'
                              ELSE 'U' END AS op,
                         round(o_totalprice * 100)::BIGINT AS val,
                         epoch_us(o_orderdate) AS seq_us,
                         o_orderkey AS seq_id
                  FROM orders),
            l AS (SELECT k, op, val FROM c
                  QUALIFY row_number() OVER (PARTITION BY k
                      ORDER BY seq_us DESC, seq_id DESC) = 1)
            SELECT coalesce(b.k, l.k) AS c_custkey,
                   coalesce(l.val, b.val) AS val_centi
            FROM b FULL JOIN l ON b.k = l.k
            WHERE coalesce(l.op, 'U') <> 'D'
        """,
        # integer micro-nat entropy: L(k)=floor(ln(k)*1e6) — math.log
        # and DuckDB ln share libm doubles (bigram_pmi precedent);
        # int64 sums are order-free so no IEEE-summation drift
        "token_entropy": r"""
            WITH w AS (SELECT doc_id,
                              unnest(regexp_extract_all(
                                  lower(coalesce(text, '')),
                                  '[a-z0-9]+')) AS tok
                       FROM documents),
            c AS (SELECT doc_id, tok, count(*)::BIGINT AS cnt
                  FROM w GROUP BY 1, 2),
            d AS (SELECT doc_id, sum(cnt)::BIGINT AS n,
                         sum(cnt * CAST(floor(ln(cnt) * 1000000)
                                        AS BIGINT))::BIGINT AS s
                  FROM c GROUP BY 1)
            SELECT doc.doc_id,
                   coalesce(d.n, 0)::BIGINT AS n_tokens,
                   coalesce(d.n * CAST(floor(ln(d.n) * 1000000)
                                       AS BIGINT) - d.s,
                            0)::BIGINT AS entropy_micro
            FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
        """,
        # open/close = value at min/max (ts, event_id) of the bucket
        # (row_number/cnt window), centi half-away like the engine
        "ohlc_bars": """
            WITH v AS (SELECT event_type,
                              epoch_us(ts) // 86400000000 AS bucket,
                              epoch_us(ts) AS tu, event_id,
                              round(value * 100)::BIGINT AS c
                       FROM events),
            w AS (SELECT *,
                         row_number() OVER (PARTITION BY event_type,
                             bucket ORDER BY tu, event_id) AS rn,
                         count(*) OVER (PARTITION BY event_type,
                             bucket) AS cnt
                  FROM v),
            a AS (SELECT event_type, bucket,
                         min(c)::BIGINT AS low_centi,
                         max(c)::BIGINT AS high_centi,
                         count(*)::BIGINT AS n,
                         sum(c)::BIGINT AS sum_centi
                  FROM v GROUP BY 1, 2)
            SELECT a.event_type, a.bucket,
                   o.c::BIGINT AS open_centi, a.high_centi, a.low_centi,
                   cl.c::BIGINT AS close_centi, a.n, a.sum_centi
            FROM a
            JOIN w o ON o.event_type = a.event_type
                    AND o.bucket = a.bucket AND o.rn = 1
            JOIN w cl ON cl.event_type = a.event_type
                     AND cl.bucket = a.bucket AND cl.rn = cl.cnt
        """,
        # cross-multiplied Tukey fence: 2v vs 5q1-3q3 / 5q3-3q1 — all
        # int64, quantile_disc = the group_quantiles selection rule
        "iqr_outliers": """
            WITH q AS (SELECT lang,
                              quantile_disc(n_chars, 0.25)::BIGINT AS q1,
                              quantile_disc(n_chars, 0.75)::BIGINT AS q3
                       FROM documents GROUP BY 1)
            SELECT d.lang,
                   5*q1 - 3*q3 AS lo2, 5*q3 - 3*q1 AS hi2,
                   count(*)::BIGINT AS n,
                   sum(CASE WHEN 2*d.n_chars < 5*q1 - 3*q3
                             OR 2*d.n_chars > 5*q3 - 3*q1
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM documents d JOIN q ON d.lang = q.lang
            GROUP BY 1, 2, 3
        """,
        # degree = endpoint count over the distinct a<b edge set
        "degree_histogram": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            e AS (SELECT a.i AS u, b.i AS v
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2),
            nn AS (SELECT u AS node FROM e
                   UNION ALL SELECT v FROM e),
            d AS (SELECT node, count(*)::BIGINT AS degree
                  FROM nn GROUP BY 1)
            SELECT degree, count(*)::BIGINT AS n_nodes
            FROM d GROUP BY 1
        """,
        # rerank: inter/union Jaccard as floored micro-ratio (BIGINT //),
        # OR-candidates, (score desc, doc_id) total order at the k cut
        "jaccard_rerank": """
            WITH toks AS (SELECT doc_id,
                                 unnest(list_distinct(regexp_extract_all(
                                     lower(coalesce(text, '')),
                                     '[a-z0-9]+'))) AS tok
                          FROM documents),
            nd AS (SELECT doc_id, count(*)::BIGINT AS n
                   FROM toks GROUP BY 1),
            i AS (SELECT doc_id, count(*)::BIGINT AS inter FROM toks
                  WHERE tok IN ('merge', 'window', 'spark', 'hash')
                  GROUP BY 1)
            SELECT i.doc_id, i.inter, nd.n + 4 - i.inter AS uni,
                   (i.inter * 1000000) // (nd.n + 4 - i.inter)
                       AS score_micro
            FROM i JOIN nd ON i.doc_id = nd.doc_id
            ORDER BY score_micro DESC, i.doc_id
            LIMIT 20
        """,
        # cross-artifact consistency oracle: the schedule log (written by
        # the driver loop) must reproduce the parse stage's analyses
        # projection, with partition recomputed from scratch as
        # md5(url)[0:2] — the query ran first and left both artifacts in
        # its fixed workdir
        "crawl_flagship": f"""
            SELECT url,
                   substring(md5(url), 1, 2) AS partition,
                   wave::INT AS wave,
                   position::INT AS pos
            FROM read_parquet(
                '{_FLAGSHIP_ORACLE_WD}/schedule/*.parquet',
                hive_partitioning = false)
            WHERE status = 'fetched'
        """,
        "clean_content": f"""
            SELECT doc_id, {cleaned} AS text
            FROM documents WHERE {cleaned} <> ''
        """,
        "topk_largest": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 100
        """,
        "remove_largest": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id NOT IN (
                SELECT doc_id FROM documents
                ORDER BY n_chars DESC, doc_id LIMIT 100)
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_prefix": r"""
            SELECT array_to_string((regexp_extract_all(text, '\S+'))[1:3], ' ')
                       AS key,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "token_totals": r"""
            SELECT lang,
                   sum(len(regexp_extract_all(text, '\S+')))::BIGINT
                       AS total_ws_tokens,
                   sum(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))::BIGINT
                       AS total_bpe_tokens
            FROM documents GROUP BY lang
        """,
        "quality_scores": r"""
            WITH t AS (
                SELECT doc_id,
                       length(text) AS n_chars_q,
                       len(regexp_extract_all(text, '\S+')) AS n_words,
                       length(array_to_string(
                           regexp_extract_all(text, '\S+'), '')) AS wlen,
                       len(regexp_extract_all(text, '[.,;:!?]')) AS np,
                       len(regexp_extract_all(text, '[A-Z]')) AS nu
                FROM documents)
            SELECT doc_id, n_chars_q::BIGINT AS n_chars_q,
                   n_words::BIGINT AS n_words,
                   (CASE WHEN n_words > 0
                         THEN (wlen * 1000000) // n_words ELSE 0 END)::BIGINT
                       AS mean_word_len_ppm,
                   ((np * 1000000) // greatest(n_chars_q, 1))::BIGINT
                       AS punct_ppm,
                   ((nu * 1000000) // greatest(n_chars_q, 1))::BIGINT
                       AS upper_ppm
            FROM t
        """,
        "fingerprints": r"""
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
                       AS fingerprint
            FROM documents
        """,
        "index_prep": r"""
            WITH t AS (SELECT doc_id,
                              regexp_replace(text, '^\s+|\s+$', '', 'g') AS tx,
                              lang, source
                       FROM documents)
            SELECT doc_id,
                   CASE WHEN length(tx) <= 500 THEN tx
                        ELSE substring(tx, 1, 500) || '...' END AS preview,
                   CASE WHEN lang IS NULL OR lang = '' THEN 'en'
                        ELSE lang END AS lang,
                   source IN ('src1', 'src7', 'src13') AS nsfw
            FROM t
        """,
        "mean_pool_embeddings": """
            WITH ex AS (
                SELECT label,
                       generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding)::DOUBLE AS v
                FROM embeddings)
            SELECT label, pos::BIGINT AS pos, round(avg(v), 6) AS mean_val
            FROM ex GROUP BY label, pos
        """,
        "chunk_documents": r"""
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\S+')) AS n
                FROM documents),
            c AS (
                SELECT doc_id, n,
                       CASE WHEN n <= 495 THEN 1
                            ELSE cast(ceil(n / 445.0) AS BIGINT) END AS nch
                FROM t WHERE n > 0)
            SELECT doc_id,
                   unnest(generate_series(0, nch - 1))::INT AS chunk_id,
                   least(495, n - unnest(generate_series(0, nch - 1)) * 445)::INT
                       AS n_tokens
            FROM c
        """,
        "ann_topk": f"""
            WITH s AS (
                SELECT vec_id,
                       round(list_cosine_similarity(
                           embedding::DOUBLE[], {qlit}), 4) AS score
                FROM embeddings)
            SELECT vec_id, score FROM s
            ORDER BY score DESC, vec_id LIMIT 10
        """,
        # batch k-NN join: round-4 scores ranked (score desc, id asc),
        # self-matches excluded — same order the engine selects by
        "knn_join": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding
                FROM embeddings WHERE vec_id % 50 = 0),
            s AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(
                           e.embedding::DOUBLE[],
                           q.embedding::DOUBLE[]), 4) AS score
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id),
            r AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, vec_id ASC) AS rn
                FROM s)
            SELECT query_id, vec_id, score FROM r WHERE rn <= 5
        """,
        # IVF probe: rank label-cells by centroid cosine (scale-invariant,
        # so the unnormalized q works), take top nprobe=2 (ties: label
        # desc, matching the python sort), then exact top-k within
        "ivf_ann": f"""
            WITH ex AS (
                SELECT label, generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding)::DOUBLE AS v
                FROM embeddings),
            cen AS (SELECT label, pos, avg(v) AS c
                    FROM ex GROUP BY label, pos),
            qv AS (SELECT generate_subscripts(arr, 1) AS pos,
                          unnest(arr) AS qv
                   FROM (SELECT {qlit} AS arr)),
            sim AS (SELECT label,
                           sum(c * qv) / (sqrt(sum(c * c))
                                          * sqrt(sum(qv * qv))) AS s
                    FROM cen JOIN qv USING (pos) GROUP BY label),
            probe AS (SELECT label FROM sim
                      ORDER BY s DESC, label DESC LIMIT 2)
            SELECT vec_id,
                   round(list_cosine_similarity(
                       embedding::DOUBLE[], {qlit}), 4) AS score
            FROM embeddings
            WHERE label IN (SELECT label FROM probe)
            ORDER BY score DESC, vec_id LIMIT 10
        """,
        "embedding_dups": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.3
        """,
        "autocomplete": """
            SELECT source, count(*)::BIGINT AS n FROM documents
            WHERE source LIKE 'src1%'
            GROUP BY source ORDER BY n DESC, source LIMIT 10
        """,
        "query_counts": """
            SELECT event_type, count(*)::BIGINT AS n
            FROM events GROUP BY event_type
        """,
        "query_counts_merge": """
            WITH base AS (
                SELECT event_type, count(*) AS n FROM events
                WHERE event_id % 2 = 0 GROUP BY event_type),
            inc AS (
                SELECT event_type, count(*) AS n FROM events
                WHERE event_id % 2 = 1 GROUP BY event_type),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM inc)
            SELECT event_type, sum(n)::BIGINT AS count
            FROM u GROUP BY event_type
        """,
        "event_json": """
            SELECT event_type,
                   sum(cast(json_extract(props, '$.k') AS INT))::BIGINT
                       AS sum_k,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY event_type
        """,
        "events_window": """
            SELECT user_id,
                   epoch_us(ts) // 3600000000 AS window_id,
                   count(*)::BIGINT AS n,
                   round(sum(value), 3) AS sum_value
            FROM events GROUP BY user_id, epoch_us(ts) // 3600000000
        """,
        "sliding_window": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
            w AS (SELECT user_id, value, us,
                         unnest(generate_series(
                             (us // 3600000000) * 3600000000 - 3600000000,
                             (us // 3600000000) * 3600000000,
                             3600000000)) AS ws_us
                  FROM e)
            SELECT user_id, ws_us // 1000000 AS window_start,
                   count(*)::BIGINT AS n, round(sum(value), 3) AS sum_value
            FROM w WHERE ws_us > us - 7200000000
            GROUP BY user_id, ws_us // 1000000
        """,
        # interval-union: window max-over-preceding mirrors the engine's
        # per-key running-max sweep; tied (s,e) rows are identical so the
        # in-frame order among ties cannot change island assignment
        "merge_intervals": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                               epoch_us(ts)
                               + round(abs(value) * 1000000)::BIGINT AS e
                        FROM events),
            m AS (SELECT user_id, s, e,
                         CASE WHEN max(e) OVER (PARTITION BY user_id
                                  ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) >= s
                              THEN 0 ELSE 1 END AS is_new
                  FROM iv),
            g AS (SELECT user_id, s, e,
                         sum(is_new) OVER (PARTITION BY user_id
                             ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
                  FROM m)
            SELECT user_id, min(s) AS start_us, max(e) AS end_us,
                   count(*)::BIGINT AS n_iv
            FROM g GROUP BY user_id, grp
        """,
        # LOCF daily spine: last event per (user, day) by (ts, id),
        # generate_series span, IGNORE NULLS running carry-forward
        "locf_fill": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS d,
                              ts, event_id,
                              round(value * 100)::BIGINT AS centi
                       FROM events),
            led AS (SELECT user_id, d, centi FROM e
                    QUALIFY row_number() OVER (
                        PARTITION BY user_id, d
                        ORDER BY ts DESC, event_id DESC) = 1),
            span AS (SELECT user_id, min(d) AS lo, max(d) AS hi
                     FROM led GROUP BY user_id),
            spine AS (SELECT user_id,
                             unnest(generate_series(lo, hi)) AS d
                      FROM span),
            j AS (SELECT sp.user_id, sp.d, l.centi
                  FROM spine sp LEFT JOIN led l
                       ON sp.user_id = l.user_id AND sp.d = l.d)
            SELECT user_id, d * 86400000000 AS day_us,
                   last_value(centi IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS centi
            FROM j
        """,
        # same island CTE as merge_intervals, then per-user aggregates
        "interval_coverage": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                               epoch_us(ts)
                               + round(abs(value) * 1000000)::BIGINT AS e
                        FROM events),
            m AS (SELECT user_id, s, e,
                         CASE WHEN max(e) OVER (PARTITION BY user_id
                                  ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) >= s
                              THEN 0 ELSE 1 END AS is_new
                  FROM iv),
            g AS (SELECT user_id, s, e,
                         sum(is_new) OVER (PARTITION BY user_id
                             ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
                  FROM m),
            isl AS (SELECT user_id, max(e) - min(s) AS len
                    FROM g GROUP BY user_id, grp)
            SELECT user_id, count(*)::BIGINT AS n_iv,
                   sum(len)::BIGINT AS covered_us,
                   max(len)::BIGINT AS max_iv_us
            FROM isl GROUP BY user_id
        """,
        # contribution expansion: each (user, day) pair counts toward
        # windows day..day+6; the engine mirrors the same expansion
        # (including the 6-day tail past the last data day)
        "window_distinct": """
            WITH p AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS d
                       FROM events),
            e AS (SELECT DISTINCT user_id, p.d + i.i AS day
                  FROM p, (SELECT unnest(generate_series(0, 6)) AS i) i)
            SELECT day * 86400000000 AS day_us,
                   count(*)::BIGINT AS n_keys
            FROM e GROUP BY day
        """,
        "cumulative_distinct": """
            WITH f AS (SELECT user_id,
                              min(epoch_us(ts) // 86400000000
                                  * 86400000000) AS day_us
                       FROM events GROUP BY user_id),
            c AS (SELECT day_us, count(*)::BIGINT AS new_keys
                  FROM f GROUP BY day_us)
            SELECT day_us, new_keys,
                   sum(new_keys) OVER (ORDER BY day_us
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_keys
            FROM c
        """,
        "group_mode": """
            WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
                       FROM documents GROUP BY lang, source)
            SELECT lang, source AS mode, n FROM c
            QUALIFY row_number() OVER (PARTITION BY lang
                                       ORDER BY n DESC, source) = 1
        """,
        "price_histogram": """
            WITH v AS (SELECT round(o_totalprice * 100)::BIGINT AS c
                       FROM orders)
            SELECT c // 2000000 AS bin,
                   (c // 2000000) * 2000000 AS bin_lo_centi,
                   count(*)::BIGINT AS n, sum(c)::BIGINT AS sum_centi
            FROM v GROUP BY 1
        """,
        # skyline: window formulation fuzz-verified equivalent to the
        # NOT EXISTS strict-dominance definition (maximize price,
        # minimize date); m = min date over strictly-higher prices
        "skyline_orders": """
            WITH p AS (SELECT round(o_totalprice * 100)::BIGINT
                                  AS price_centi,
                              epoch_us(o_orderdate) AS date_us
                       FROM orders),
            e AS (SELECT price_centi, date_us,
                         min(date_us) OVER (PARTITION BY price_centi)
                             AS e,
                         min(date_us) OVER (ORDER BY price_centi DESC
                             RANGE BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS m
                  FROM p)
            SELECT price_centi, date_us, count(*)::BIGINT AS n
            FROM e WHERE date_us = e AND (m IS NULL OR date_us < m)
            GROUP BY price_centi, date_us
        """,
        # same-IEEE-expression contract as qty_discount_corr: both sides
        # evaluate the identical double formula from identical int sums
        "group_regression": """
            WITH s AS (
                SELECT l_returnflag,
                       count(*)::BIGINT AS n,
                       sum(round(l_quantity)::BIGINT)::BIGINT AS sx,
                       sum(round(l_extendedprice * 100)::BIGINT)::BIGINT
                           AS sy,
                       sum(round(l_quantity)::BIGINT
                           * round(l_quantity)::BIGINT)::BIGINT AS sxx,
                       sum(round(l_quantity)::BIGINT
                           * round(l_extendedprice * 100)::BIGINT)::BIGINT
                           AS sxy
                FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                         6) AS slope_6,
                   round((sy::DOUBLE
                          - (n::DOUBLE * sxy::DOUBLE
                             - sx::DOUBLE * sy::DOUBLE)
                            / (n::DOUBLE * sxx::DOUBLE
                               - sx::DOUBLE * sx::DOUBLE)
                            * sx::DOUBLE)
                         / n::DOUBLE, 6) AS icept_6
            FROM s
        """,
        "unpivot_measures": """
            WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0)
            SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
                   'quantity' AS measure,
                   round(l_quantity * 100)::BIGINT AS val_centi FROM f
            UNION ALL
            SELECT l_orderkey, l_linenumber::BIGINT, 'extendedprice',
                   round(l_extendedprice * 100)::BIGINT FROM f
            UNION ALL
            SELECT l_orderkey, l_linenumber::BIGINT, 'discount',
                   round(l_discount * 100)::BIGINT FROM f
            UNION ALL
            SELECT l_orderkey, l_linenumber::BIGINT, 'tax',
                   round(l_tax * 100)::BIGINT FROM f
        """,
        # both sides: (rank_min-1)/(n-1) and rank_max/n as IEEE-double
        # divisions of identical int64 operands -> round(..,6) bit-exact
        "percentile_ranks": """
            SELECT event_id, user_id,
                   round(percent_rank() OVER (PARTITION BY user_id
                         ORDER BY value DESC), 6) AS pr_6,
                   round(cume_dist() OVER (PARTITION BY user_id
                         ORDER BY value DESC), 6) AS cd_6
            FROM events
        """,
        "cube_counts": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS total
            FROM documents GROUP BY CUBE(lang, source)
        """,
        "first_last": """
            WITH w AS (SELECT user_id, epoch_us(ts) AS us,
                              round(value * 100)::BIGINT AS vc,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_a,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                                  AS rn_d,
                              count(*) OVER (PARTITION BY user_id) AS cnt
                       FROM events)
            SELECT a.user_id, a.vc AS first_vc, d.vc AS last_vc,
                   a.us AS first_us, d.us AS last_us,
                   a.cnt::BIGINT AS n
            FROM (SELECT * FROM w WHERE rn_a = 1) a
            JOIN (SELECT * FROM w WHERE rn_d = 1) d USING (user_id)
        """,
        "value_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click'
                       THEN round(value * 100)::BIGINT ELSE 0
                       END)::BIGINT AS sum_click,
                   sum(CASE WHEN event_type = 'error'
                       THEN round(value * 100)::BIGINT ELSE 0
                       END)::BIGINT AS sum_error,
                   sum(CASE WHEN event_type = 'purchase'
                       THEN round(value * 100)::BIGINT ELSE 0
                       END)::BIGINT AS sum_purchase,
                   sum(CASE WHEN event_type = 'signup'
                       THEN round(value * 100)::BIGINT ELSE 0
                       END)::BIGINT AS sum_signup,
                   sum(CASE WHEN event_type = 'view'
                       THEN round(value * 100)::BIGINT ELSE 0
                       END)::BIGINT AS sum_view
            FROM events GROUP BY user_id
        """,
        "active_customers_bloom": """
            SELECT c_custkey, c_nationkey FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '1996-01-01'
                            AND o.o_orderdate < '1996-07-01')
        """,
        "daily_reconcile": """
            WITH e AS (SELECT epoch_us(ts) // 86400000000
                              * 86400000000 AS day_us,
                              count(*)::BIGINT AS n_events
                       FROM events GROUP BY 1),
            o AS (SELECT epoch_us(o_orderdate) // 86400000000
                         * 86400000000 AS day_us,
                         count(*)::BIGINT AS n_orders
                  FROM orders GROUP BY 1)
            SELECT coalesce(e.day_us, o.day_us) AS day_us,
                   coalesce(e.n_events, 0)::BIGINT AS n_events,
                   coalesce(o.n_orders, 0)::BIGINT AS n_orders
            FROM e FULL OUTER JOIN o ON e.day_us = o.day_us
        """,
        "active_customers": """
            SELECT c_custkey, c_nationkey FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '1996-01-01'
                            AND o.o_orderdate < '1996-07-01')
        """,
        "left_join_returns": """
            WITH r AS (SELECT l_orderkey,
                              sum(round(l_extendedprice
                                        * (1 - l_discount)
                                        * 10000)::BIGINT)::BIGINT AS ret
                       FROM lineitem WHERE l_returnflag = 'R'
                       GROUP BY l_orderkey)
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
                   sum(CASE WHEN coalesce(r.ret, 0) <> 0
                            THEN 1 ELSE 0 END)::BIGINT AS n_with_returns,
                   sum(coalesce(r.ret, 0))::BIGINT AS ret_dmilli
            FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey
            GROUP BY o_orderpriority
        """,
        "grouping_sets": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS total
            FROM documents GROUP BY GROUPING SETS ((lang), (source))
        """,
        "table_profile": """
            SELECT 'o_custkey' AS "column", count(*)::BIGINT AS n,
                   (count(*) - count(o_custkey))::BIGINT AS n_null,
                   count(DISTINCT o_custkey)::BIGINT AS n_distinct
            FROM orders
            UNION ALL SELECT 'o_orderdate', count(*),
                   count(*) - count(o_orderdate),
                   count(DISTINCT o_orderdate) FROM orders
            UNION ALL SELECT 'o_orderkey', count(*),
                   count(*) - count(o_orderkey),
                   count(DISTINCT o_orderkey) FROM orders
            UNION ALL SELECT 'o_orderpriority', count(*),
                   count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM orders
            UNION ALL SELECT 'o_orderstatus', count(*),
                   count(*) - count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM orders
            UNION ALL SELECT 'o_totalprice', count(*),
                   count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM orders
        """,
        # blocking (16-char prefix equality) is the operator's contract,
        # mirrored verbatim; banded Levenshtein == full Levenshtein for
        # every kept pair (d <= 8 is inside the band)
        "fuzzy_dup_pairs": """
            WITH d AS (SELECT doc_id, substr(text, 1, 16) AS b,
                              substr(text, 1, 64) AS p
                       FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   levenshtein(a.p, b.p)::BIGINT AS dist
            FROM d a JOIN d b ON a.b = b.b AND a.doc_id < b.doc_id
            WHERE levenshtein(a.p, b.p) <= 8
        """,
        "hits": _hits_sql(4),
        "bfs_hops": _bfs_sql(4),
        # gaps-and-islands: day-number arithmetic vs ROW_NUMBER delta;
        # DATE - DATE is BIGINT days in DuckDB (verified)
        "gaps_islands": """
            WITH d AS (SELECT DISTINCT user_id,
                    (CAST(ts AS DATE) - DATE '1970-01-01')::BIGINT AS day
                FROM events),
            r AS (SELECT user_id, day,
                    day - ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY day) AS grp
                  FROM d)
            SELECT user_id, min(day)::BIGINT AS start_day,
                   max(day)::BIGINT AS end_day,
                   count(*)::BIGINT AS n_days
            FROM r GROUP BY user_id, grp
        """,
        "event_throttle": """
            SELECT event_id, user_id, event_type FROM (
                SELECT event_id, user_id, event_type, ts,
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS pts
                FROM events)
            WHERE pts IS NULL
               OR epoch_us(ts) - epoch_us(pts) > 300000000
        """,
        # change points by LAG(type) over (ts, id), LEAD over the SAME
        # deterministic order; sentinel 9999-12-31 = asof-left convention
        "scd2_intervals": """
            WITH s AS (SELECT user_id, event_type, ts, event_id,
                    lag(event_type) OVER w AS ptype
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            c AS (SELECT user_id, event_type, ts, event_id FROM s
                  WHERE ptype IS NULL OR ptype <> event_type)
            SELECT user_id, event_type,
                   epoch_us(ts)::BIGINT AS valid_from_us,
                   coalesce(epoch_us(lead(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)),
                        253402300799000000)::BIGINT AS valid_to_us
            FROM c
        """,
        # quantile_disc = sorted index ceil(q*n)-1 (verified: n=4 -> 2,
        # n=5 -> 3) — the value_quantiles selection rule, per key
        "group_median": """
            SELECT user_id, count(*)::BIGINT AS n,
                   quantile_disc(round(value * 100)::BIGINT,
                                 0.5)::BIGINT AS median_centi
            FROM events GROUP BY user_id
        """,
        # dayofweek: 0=Sunday (1970-01-01 -> 4, verified); OR of distinct
        # one-hot bits == SUM DISTINCT
        "weekday_bitmap": """
            SELECT user_id,
                   sum(DISTINCT (1::BIGINT <<
                       dayofweek(CAST(ts AS DATE))))::BIGINT AS dow_mask,
                   count(DISTINCT
                       dayofweek(CAST(ts AS DATE)))::BIGINT AS n_dows
            FROM events GROUP BY user_id
        """,
        # RE2 on both sides (pc.count_substring_regex / regexp_extract_all),
        # grade = shared IEEE formula in identical term order
        "readability": """
            WITH c AS (SELECT doc_id,
                    length(regexp_extract_all(
                        text, '[A-Za-z]+'))::BIGINT AS n_words,
                    greatest(length(regexp_extract_all(
                        text, '[.!?]+')), 1)::BIGINT AS n_sents,
                    length(regexp_extract_all(
                        text, '[aeiouyAEIOUY]+'))::BIGINT AS n_syll
                FROM documents)
            SELECT doc_id, n_words, n_sents, n_syll,
                   round(0.39 * (n_words::DOUBLE / n_sents::DOUBLE)
                         + 11.8 * (n_syll::DOUBLE / n_words::DOUBLE)
                         - 15.59, 6) AS fk_grade
            FROM c WHERE n_words > 0
        """,
        "fk_check": """
            SELECT 'lineitem->orders' AS edge,
                   (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
                   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                      (SELECT 1 FROM orders o
                       WHERE o.o_orderkey = l.l_orderkey))::BIGINT
                       AS n_orphans
            UNION ALL
            SELECT 'orders->customer',
                   (SELECT count(*) FROM orders)::BIGINT,
                   (SELECT count(*) FROM orders o WHERE NOT EXISTS
                      (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey))::BIGINT
            UNION ALL
            SELECT 'lineitem->supplier',
                   (SELECT count(*) FROM lineitem)::BIGINT,
                   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                      (SELECT 1 FROM supplier s
                       WHERE s.s_suppkey = l.l_suppkey))::BIGINT
            UNION ALL
            SELECT 'customer->nation',
                   (SELECT count(*) FROM customer)::BIGINT,
                   (SELECT count(*) FROM customer c WHERE NOT EXISTS
                      (SELECT 1 FROM nation n
                       WHERE n.n_nationkey = c.c_nationkey))::BIGINT
        """,
        "next_event_gap": """
            SELECT event_id, user_id,
                   coalesce(lead(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                       - epoch_us(ts), -1)::BIGINT AS next_gap_us
            FROM events
        """,
        # sessionize rule (pause > 1800 s, (ts, id) tie-break), path =
        # first 3 event types; ORDER BY inside string_agg pins the order
        "session_paths": """
            WITH e AS (SELECT user_id, ts, event_id, event_type,
                    CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000
                         THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid FROM e),
            r AS (SELECT user_id, sid, event_type, ts, event_id,
                    row_number() OVER (PARTITION BY user_id, sid
                                       ORDER BY ts, event_id) AS rn
                  FROM s),
            p AS (SELECT user_id, sid,
                    string_agg(event_type, '>' ORDER BY rn) AS path
                  FROM r WHERE rn <= 3 GROUP BY user_id, sid)
            SELECT path, count(*)::BIGINT AS n_sessions
            FROM p GROUP BY path
            ORDER BY n_sessions DESC, path LIMIT 20
        """,
        "gap_fill_months": """
            WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS mn,
                              date_trunc('month', max(o_orderdate)) AS mx
                       FROM orders),
            spine AS (SELECT unnest(generate_series(mn, mx,
                          INTERVAL 1 MONTH))::DATE AS month FROM b),
            c AS (SELECT (year(o_orderdate) * 100
                          + month(o_orderdate))::BIGINT AS ym,
                         count(*)::BIGINT AS n
                  FROM orders GROUP BY 1)
            SELECT (year(spine.month) * 100
                    + month(spine.month))::BIGINT AS ym,
                   coalesce(c.n, 0)::BIGINT AS n_orders
            FROM spine LEFT JOIN c
              ON (year(spine.month) * 100 + month(spine.month)) = c.ym
        """,
        "group_mad": """
            WITH v AS (SELECT user_id, round(value * 100)::BIGINT AS vc
                       FROM events),
            m AS (SELECT user_id, count(*)::BIGINT AS n,
                    quantile_disc(vc, 0.5)::BIGINT AS median_centi
                  FROM v GROUP BY user_id)
            SELECT m.user_id, m.n, m.median_centi,
                   quantile_disc(abs(v.vc - m.median_centi),
                                 0.5)::BIGINT AS mad_centi
            FROM v JOIN m ON v.user_id = m.user_id
            GROUP BY m.user_id, m.n, m.median_centi
        """,
        "last_touch": """
            SELECT event_id AS target_id, user_id,
                   coalesce(lt, -1)::BIGINT AS touch_id
            FROM (
                SELECT event_id, user_id, event_type,
                       last_value(CASE WHEN event_type = 'click'
                                       THEN event_id END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS lt
                FROM events)
            WHERE event_type = 'purchase'
        """,
        # watermark = running max event-time over arrival order
        # (UNBOUNDED PRECEDING .. 1 PRECEDING); late iff ts < wm - 600 s
        "watermark_filter": """
            WITH w AS (SELECT event_id, event_type, epoch_us(ts) AS tus,
                    max(epoch_us(ts)) OVER (ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS wm
                FROM events)
            SELECT event_type,
                   sum(CASE WHEN wm IS NULL OR tus >= wm - 600000000
                            THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                   sum(CASE WHEN wm IS NOT NULL AND tus < wm - 600000000
                            THEN 1 ELSE 0 END)::BIGINT AS n_dropped
            FROM w GROUP BY event_type
        """,
        "embedding_norms": """
            WITH u AS (SELECT vec_id, unnest(embedding) AS x
                       FROM embeddings),
            n AS (SELECT vec_id, count(*)::BIGINT AS dim,
                    sum((round(CAST(x AS DOUBLE) * 10000)::BIGINT)
                        * (round(CAST(x AS DOUBLE)
                                 * 10000)::BIGINT))::BIGINT AS norm_sq
                  FROM u GROUP BY vec_id)
            SELECT vec_id, dim, norm_sq FROM n
            ORDER BY norm_sq DESC, vec_id LIMIT 20
        """,
        # Welch t from exact int sufficient stats; the double formula
        # is evaluated in the SAME operation order as the engine
        # (division before subtraction inside each var term)
        "ab_ttest": """
            WITH s AS (SELECT event_type AS variant,
                    count(*)::BIGINT AS n,
                    sum(round(value * 100)::BIGINT)::BIGINT AS s,
                    sum(round(value * 100)::BIGINT
                        * round(value * 100)::BIGINT)::BIGINT AS ss
                FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY 1),
            c AS (SELECT * FROM s WHERE variant = 'click'),
            p AS (SELECT * FROM s WHERE variant = 'purchase')
            SELECT c.n AS n_click, p.n AS n_purchase,
                   round(((c.s::DOUBLE / c.n::DOUBLE)
                          - (p.s::DOUBLE / p.n::DOUBLE))
                         / sqrt(((c.ss::DOUBLE - c.s::DOUBLE * c.s::DOUBLE
                                  / c.n::DOUBLE) / (c.n - 1)::DOUBLE)
                                / c.n::DOUBLE
                                + ((p.ss::DOUBLE
                                    - p.s::DOUBLE * p.s::DOUBLE
                                    / p.n::DOUBLE) / (p.n - 1)::DOUBLE)
                                / p.n::DOUBLE),
                         6) AS t_welch
            FROM c, p
        """,
        # calendar-aware month-over-month delta: self join on the
        # previous month-count (LAG by row would skip gap months);
        # sentinel = own value -> delta 0 when no prior month
        "monthly_growth": """
            WITH g AS (SELECT year(o_orderdate)::BIGINT * 12
                              + month(o_orderdate)::BIGINT - 1 AS mc,
                              sum(round(o_totalprice * 100)::BIGINT)
                                  ::BIGINT AS rev_centi
                       FROM orders GROUP BY 1)
            SELECT ((g.mc // 12) * 100 + g.mc % 12 + 1)::BIGINT AS ym,
                   g.rev_centi,
                   (g.rev_centi
                    - coalesce(p.rev_centi, g.rev_centi))::BIGINT
                       AS delta_centi
            FROM g LEFT JOIN g p ON p.mc = g.mc - 1
        """,
        # RFM quartiles: NTILE over (metric ASC, custkey) — the same
        # deterministic total order the engine's rank_select boundaries
        # use; per-row centi rounding before the monetary sum
        "rfm_segments": """
            WITH agg AS (SELECT o_custkey AS o_custkey,
                    max(epoch_us(o_orderdate))::BIGINT AS r_us,
                    count(*)::BIGINT AS f,
                    sum(round(o_totalprice * 100)::BIGINT)::BIGINT
                        AS m_centi
                FROM orders GROUP BY 1)
            SELECT o_custkey, r_us, r_us_tile, f, f_tile,
                   m_centi, m_centi_tile
            FROM (SELECT *,
                    ntile(4) OVER (ORDER BY r_us, o_custkey)::BIGINT
                        AS r_us_tile,
                    ntile(4) OVER (ORDER BY f, o_custkey)::BIGINT
                        AS f_tile,
                    ntile(4) OVER (ORDER BY m_centi,
                                   o_custkey)::BIGINT AS m_centi_tile
                  FROM agg)
        """,
        # spell suggestions: brute-force levenshtein over the vocab
        # (the oracle may be O(V x Q); the engine length-bands + DP);
        # tie-break (dist, freq DESC, term) mirrored exactly
        "suggest_terms": """
            WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            v AS (SELECT term, count(*)::BIGINT AS freq
                  FROM tok GROUP BY term),
            q(query) AS (VALUES ('mrege'), ('windwo'), ('custmer'),
                                ('qery')),
            c AS (SELECT q.query, v.term,
                         levenshtein(q.query, v.term)::BIGINT AS dist,
                         v.freq
                  FROM q CROSS JOIN v
                  WHERE levenshtein(q.query, v.term) <= 2)
            SELECT query, term, dist, freq FROM c
            QUALIFY row_number() OVER (
                PARTITION BY query
                ORDER BY dist, freq DESC, term) <= 5
        """,
        # snippet window: DuckDB list slice is 1-based INCLUSIVE both
        # ends, engine mirrors with 0-based [max(i-3,0) : i+4);
        # list_position = first occurrence, 1-based, 0 when absent
        "search_snippets": """
            WITH tok AS (SELECT doc_id,
                                regexp_extract_all(lower(text),
                                    '[a-z0-9]+') AS ws
                         FROM documents),
            m AS (SELECT doc_id, ws,
                         list_position(ws, 'merge') AS idx FROM tok)
            SELECT doc_id, idx::BIGINT AS idx,
                   array_to_string(ws[greatest(idx - 3, 1):idx + 3],
                                   ' ') AS snippet
            FROM m WHERE idx > 0
        """,
        # u = (hex52(md5) + 1) / 2^52 exactly as the engine builds it;
        # the E-S key pow(u, 1/w) is float64 on both sides — the OUTPUT
        # has no floats and adjacent order statistics sit far above
        # pow-ulp differences, so the selected set is stable
        "weighted_sample": """
            WITH d AS (SELECT doc_id, n_chars,
                (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 ::BIGINT + 1)::DOUBLE / 4503599627370496.0 AS u
                FROM documents)
            SELECT doc_id, n_chars FROM d
            QUALIFY row_number() OVER (
                ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id) <= 100
        """,
        "time_weighted_avg": """
            WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                              round(value * 100)::BIGINT AS vc,
                              lead(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nus
                       FROM events),
            s AS (SELECT user_id,
                         sum(vc * ((nus - us) // 1000))::BIGINT
                             AS num_centi_ms,
                         sum((nus - us) // 1000)::BIGINT AS den_ms
                  FROM o WHERE nus IS NOT NULL GROUP BY user_id)
            SELECT user_id, num_centi_ms, den_ms,
                   round(num_centi_ms::DOUBLE / den_ms::DOUBLE, 6)
                       AS twa_6
            FROM s WHERE den_ms > 0
        """,
        "zonemap_export": """
            SELECT o_orderkey // 1000 AS bucket,
                   min(o_orderkey)::BIGINT AS min_key,
                   max(o_orderkey)::BIGINT AS max_key,
                   count(*)::BIGINT AS n
            FROM orders GROUP BY 1
        """,
        "sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
            m AS (SELECT user_id, us, value,
                         CASE WHEN lag(us) OVER w IS NULL
                                   OR us - lag(us) OVER w > 1800000000
                              THEN 1 ELSE 0 END AS is_new
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            s AS (SELECT user_id, us, value,
                         sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                  FROM m)
            SELECT user_id, session_id,
                   count(*)::BIGINT AS n,
                   min(us) AS start_us, max(us) AS end_us,
                   sum(round(value * 100)::BIGINT)::BIGINT
                       AS sum_value_centi
            FROM s GROUP BY user_id, session_id
        """,
        # money sums are integer-scaled PER ROW on both sides (price and
        # discount are 2-decimal, so price·(1−disc)·10⁴ is exactly
        # integral) — float sums rounded post-hoc differ by 1 ulp between
        # engines at ~1e8 magnitude
        "lineitem_join": """
            SELECT o.o_orderpriority,
                   count(*)::BIGINT AS n_items,
                   sum(round(l.l_extendedprice * (1 - l.l_discount)
                             * 10000)::BIGINT)::BIGINT
                       AS total_revenue_dmilli
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty,
                   sum(round(l_extendedprice * 100)::BIGINT)::BIGINT
                       AS sum_base_price_centi,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT
                       AS sum_disc_price_dmilli,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "region_customers": """
            SELECT r.r_name,
                   count(*)::BIGINT AS n_customers,
                   sum(round(c.c_acctbal * 100)::BIGINT)::BIGINT
                       AS total_acctbal_centi
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "orders_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "relevant_text": r"""
            SELECT doc_id,
                   regexp_replace(
                       'Title: ' || chr(10) || 'Description: ' || chr(10)
                       || 'Content: ' || text,
                       '^\s+|\s+$', '', 'g') AS relevant_text
            FROM documents
        """,
        "inactive_customers": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
        """,
        "nation_customers_agg": """
            SELECT n.n_name,
                   string_agg(c.c_name, ' ' ORDER BY c.c_name) AS customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "search_topk": r"""
            SELECT doc_id,
                   (len(regexp_extract_all(text, 'crawl'))
                    + len(regexp_extract_all(text, 'index')))::BIGINT AS score
            FROM documents ORDER BY score DESC, doc_id LIMIT 10
        """,
        # chunk → encode → per-doc mean-pool.  Chunk texts are re-derived in
        # SQL (same window arithmetic as chunk_documents) and joined by md5
        # against the fixture of exact StubEncoder outputs — only the
        # hash-seeded encoder is fixture-pinned; chunking and pooling are
        # recomputed here.
        "chunk_embeddings": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '\\S+') AS toks
                       FROM documents),
            c AS (SELECT doc_id, toks, len(toks) AS n,
                         CASE WHEN len(toks) <= 495 THEN 1
                              ELSE cast(ceil(len(toks) / 445.0) AS BIGINT)
                         END AS nch
                  FROM t WHERE len(toks) > 0),
            w AS (SELECT doc_id, toks, n,
                         unnest(generate_series(0, nch - 1)) AS cid
                  FROM c),
            ct AS (SELECT doc_id,
                          md5(array_to_string(
                              toks[cid * 445 + 1:least(cid * 445 + 495, n)],
                              ' ')) AS chunk_md5
                   FROM w),
            j AS (SELECT ct.doc_id, f.pos, f.val
                  FROM ct JOIN read_parquet('{chunk_fix}') f
                    ON f.chunk_md5 = ct.chunk_md5)
            SELECT doc_id, pos::BIGINT AS pos, round(avg(val), 6) AS mean_val
            FROM j GROUP BY doc_id, pos
        """,
        # golden regression pin of the html parser output (parse_html is
        # separately pinned byte-exact by tests/test_extract.py fixtures)
        "extract_text": f"""
            SELECT url, language, title, content_text, partition
            FROM read_parquet('{extract_fix}')
        """,
        # cumulative per-pattern byte reductions of the cleaner chain
        # (pattern i applies to the output of i-1, exactly as clean_text)
        "cleaning_stats": r"""
            WITH s0 AS (SELECT '<p> x' || chr(9) || ' y</p>' || chr(1) ||
                               '�&amp; [link](url) ' || text ||
                               ' ?track=1' || repeat(chr(10), 4) || ' end'
                               AS t0
                        FROM documents),
            s1 AS (SELECT t0, regexp_replace(t0, '[ \t　]+', ' ', 'g') AS t1
                   FROM s0),
            s2 AS (SELECT *, regexp_replace(t1, '<[^>]+>', '', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT *, regexp_replace(t2,
                       '(?i)&(?:[a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});',
                       '', 'g') AS t3 FROM s2),
            s4 AS (SELECT *, regexp_replace(t3,
                       '[\x00-\x08\x0B-\x1F\x7F]', '', 'g') AS t4 FROM s3),
            s5 AS (SELECT *, regexp_replace(t4, '�', '', 'g') AS t5 FROM s4),
            s6 AS (SELECT *, regexp_replace(t5,
                       '\[(.*?)\]\((.*?)\)', '\1', 'g') AS t6 FROM s5),
            s7 AS (SELECT *, regexp_replace(t6,
                       '\?[^"''\s<>]+', '', 'g') AS t7 FROM s6),
            s8 AS (SELECT *, regexp_replace(t7, '\n{3,}',
                       chr(10) || chr(10), 'g') AS t8 FROM s7)
            SELECT sum(length(t0) - length(t1))::BIGINT AS "red_spaces",
                   sum(length(t1) - length(t2))::BIGINT AS "red_tags",
                   sum(length(t2) - length(t3))::BIGINT AS "red_entities",
                   sum(length(t3) - length(t4))::BIGINT AS "red_controlChars",
                   sum(length(t4) - length(t5))::BIGINT
                       AS "red_unicodeReplacement",
                   sum(length(t5) - length(t6))::BIGINT AS "red_markdown",
                   sum(length(t6) - length(t7))::BIGINT AS "red_urls",
                   sum(length(t7) - length(t8))::BIGINT
                       AS "red_extraLineBreaks"
            FROM s8
        """,
        # the LangId heuristic verbatim: CJK density check, marker-word
        # scores, argmax with alphabetical tiebreak (de<en<es<fr), und on 0
        "lang_id_counts": """
            WITH w AS (
                SELECT text,
                       list_transform(
                           regexp_extract_all(text,
                               '[a-zA-Zäöüéèêáíóúñç]+'),
                           x -> lower(x)) AS words
                FROM documents),
            s AS (
                SELECT text, words,
                       len(list_filter(words, x -> list_contains(
                           ['der','die','das','und','ist','nicht','ein',
                            'mit','für'], x))) AS s_de,
                       len(list_filter(words, x -> list_contains(
                           ['the','and','of','to','in','is','that','it',
                            'for','with'], x))) AS s_en,
                       len(list_filter(words, x -> list_contains(
                           ['el','la','los','y','es','no','una','para',
                            'con','que'], x))) AS s_es,
                       len(list_filter(words, x -> list_contains(
                           ['le','la','les','et','est','pas','une','pour',
                            'dans'], x))) AS s_fr
                FROM w),
            p AS (
                SELECT CASE
                    WHEN text IS NULL OR text = '' THEN 'und'
                    WHEN len(regexp_extract_all(text, '[一-鿿぀-ヿ]')) * 3
                         > length(text) THEN 'zh'
                    WHEN len(words) = 0 THEN 'und'
                    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                         THEN 'de'
                    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang
                FROM s)
            SELECT pred_lang, count(*)::BIGINT AS n
            FROM p GROUP BY pred_lang
        """,
        # DuckDB's native ASOF JOIN = the engine's groupby+merge_asof
        # (inner semantics: clicks with no prior view drop out)
        "asof_join": """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 v AS (SELECT event_id AS view_id, user_id, ts FROM events
                       WHERE event_type = 'view')
            SELECT c.event_id, c.user_id, v.view_id
            FROM c ASOF JOIN v
              ON c.user_id = v.user_id AND v.ts <= c.ts
        """,
        "asof_join_left": """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 v AS (SELECT event_id AS view_id, user_id, ts FROM events
                       WHERE event_type = 'view')
            SELECT c.event_id, c.user_id,
                   coalesce(v.view_id, -1)::BIGINT AS view_id
            FROM c ASOF LEFT JOIN v
              ON c.user_id = v.user_id AND v.ts <= c.ts
        """,
        # transitive closure via recursive CTE; component = min reachable
        # node, matching the engine's min-label propagation fixpoint
        "components": """
            WITH RECURSIVE e AS (
                SELECT a.doc_id AS u, b.doc_id AS v
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id * 2 AND a.doc_id > 0
                UNION ALL
                SELECT a.doc_id, b.doc_id
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id * 3 AND a.doc_id > 0),
            und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
            nodes AS (SELECT DISTINCT u AS node FROM und),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT und.u, reach.r
                FROM und JOIN reach ON reach.node = und.v)
            SELECT node, min(r)::BIGINT AS component
            FROM reach GROUP BY node
        """,
        "pagerank": _pagerank_sql(),
        # same planted suffix, same RE2 patterns applied in the same
        # order (email -> ip -> phone)
        "scrub_pii": r"""
            WITH planted AS (
                SELECT doc_id,
                       coalesce(text, '') || ' contact user' || doc_id ||
                       '@example.com or 10.0.' || (doc_id % 256) || '.' ||
                       ((doc_id * 7) % 256) || ' tel +1-555-0100' AS t
                FROM documents),
            s AS (
                SELECT doc_id, t,
                       len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                           ))::BIGINT AS n_email,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM planted),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                           ))::BIGINT AS n_ip,
                       regexp_replace(t1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS t2
                FROM s),
            s3 AS (
                SELECT doc_id, n_email, n_ip,
                       len(regexp_extract_all(t2,
                           '\+?\d[\d\- ]{7,}\d'))::BIGINT AS n_phone,
                       regexp_replace(t2, '\+?\d[\d\- ]{7,}\d',
                                      '<PHONE>', 'g') AS text
                FROM s2)
            SELECT doc_id, text, n_email, n_ip, n_phone FROM s3
        """,
        # same explicit sample-variance formula as the engine (NOT the
        # builtin stddev kernel, whose Welford path drifts differently)
        "group_zscores": """
            WITH m AS (
                SELECT event_type,
                       count(*)::DOUBLE AS n,
                       sum(value)::DOUBLE AS s,
                       sum(value * value)::DOUBLE AS s2
                FROM events GROUP BY event_type),
            mm AS (
                SELECT event_type, s / n AS mean,
                       CASE WHEN n > 1 AND (s2 - s * s / n) / (n - 1) > 0
                            THEN sqrt((s2 - s * s / n) / (n - 1))
                            ELSE 0.0 END AS std
                FROM m)
            SELECT e.event_id, e.event_type,
                   CAST(round(CASE WHEN mm.std > 0
                                   THEN (e.value - mm.mean) / mm.std
                                   ELSE 0.0 END * 1000) AS BIGINT)
                       AS z_milli
            FROM events e JOIN mm USING (event_type)
        """,
        "distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type
        """,
        # exact SQL replica of the p=12 HLL sketch: md5_number_upper ==
        # int.from_bytes(md5[:8],'little') (the engine's _hash64);
        # register index = top 12 bits, rank = leading zeros of the low
        # 52 bits + 1 (pure integer bit tests, no float log); then the
        # same alpha_m estimator and small-range correction
        "distinct_users_hll": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       md5_number_upper(user_id::VARCHAR) AS hv
                FROM events),
            r AS (
                SELECT event_type,
                       (hv >> 52)::BIGINT AS idx,
                       CASE WHEN (hv & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
                            ELSE 52 - (SELECT max(b.b)
                                       FROM (SELECT unnest(
                                            generate_series(0, 51)) AS b) b
                                       WHERE ((hv & ((1::UBIGINT << 52) - 1))
                                              >> b.b) & 1 = 1)
                       END AS rank
                FROM h),
            regs AS (SELECT event_type, idx, max(rank) AS reg
                     FROM r GROUP BY event_type, idx),
            den AS (SELECT event_type,
                           sum(power(2.0::DOUBLE, -reg))
                               + (4096 - count(*))::DOUBLE AS denom,
                           (4096 - count(*))::BIGINT AS zeros
                    FROM regs GROUP BY event_type),
            est AS (SELECT event_type,
                           (0.7213::DOUBLE / (1.0::DOUBLE
                                + 1.079::DOUBLE / 4096.0::DOUBLE))
                               * 4096.0::DOUBLE * 4096.0::DOUBLE / denom
                               AS raw,
                           zeros
                    FROM den)
            SELECT event_type,
                   CAST(round(CASE WHEN raw <= 2.5::DOUBLE * 4096.0::DOUBLE
                                        AND zeros > 0
                                   THEN 4096.0::DOUBLE
                                        * ln(4096.0::DOUBLE / zeros)
                                   ELSE raw END) AS BIGINT)
                       AS approx_distinct
            FROM est
        """,
        # ROWS-frame moving sum; per-row centi scaling -> exact int64
        "rolling_sum": """
            SELECT event_id, user_id,
                   sum(round(value * 100)::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   )::BIGINT AS roll_centi
            FROM events
        """,
        # market-basket pair counts; deterministic top-100 tie-break
        # (n DESC, item_a, item_b) on both sides
        # 7x24 zero-shuffle 2-D histogram, exact centi sums
        "heatmap_bins": """
            SELECT dayofweek(CAST(ts AS DATE))::BIGINT AS dow,
                   hour(ts)::BIGINT AS hour,
                   count(*)::BIGINT AS n,
                   sum(round(value * 100)::BIGINT)::BIGINT AS sum_centi
            FROM events GROUP BY 1, 2
        """,
        # exact integer KS: cumulative counts cross-multiplied, max
        # over pooled values — no float on either side
        "ks_drift": """
            WITH v AS (SELECT round(value * 100)::BIGINT AS x,
                              CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END AS isa
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            c AS (SELECT x, sum(isa)::BIGINT AS a,
                         sum(1 - isa)::BIGINT AS b
                  FROM v GROUP BY x),
            t AS (SELECT sum(a)::BIGINT AS n, sum(b)::BIGINT AS m
                  FROM c),
            cum AS (SELECT x,
                           sum(a) OVER (ORDER BY x)::BIGINT AS ca,
                           sum(b) OVER (ORDER BY x)::BIGINT AS cb
                    FROM c)
            SELECT t.n, t.m,
                   max(abs(ca * t.m - cb * t.n))::BIGINT AS d_num,
                   (t.n * t.m)::BIGINT AS d_den
            FROM cum, t GROUP BY t.n, t.m
        """,
        # doubled Mann-Whitney U: ties count 1, strict wins 2 — exact
        "mwu_drift": """
            WITH v AS (SELECT round(value * 100)::BIGINT AS x,
                              CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END AS isa
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            c AS (SELECT x, sum(isa)::BIGINT AS a,
                         sum(1 - isa)::BIGINT AS b
                  FROM v GROUP BY x),
            cum AS (SELECT x, a, b,
                           (sum(b) OVER (ORDER BY x)
                            - b)::BIGINT AS cumb
                    FROM c)
            SELECT sum(a)::BIGINT AS n, sum(b)::BIGINT AS m,
                   sum(a * (2 * cumb + b))::BIGINT AS u2
            FROM cum
        """,
        # PSI in exact integer micro-nats: psi_num = Σ (ca·m − cb·n)
        # · (L(ca·m) − L(cb·n)) with L(x)=floor(ln(x)·1e6) shared-libm
        # both sides; zero-count bins excluded (standard PSI clamp);
        # one shared HUGEINT→DOUBLE division, round(…, 6)
        "psi_drift": """
            WITH v AS (SELECT round(value * 100)::BIGINT AS c,
                              CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END AS isa
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            b AS (SELECT c // 2000 AS bin, sum(isa)::BIGINT AS ca,
                         sum(1 - isa)::BIGINT AS cb
                  FROM v GROUP BY 1),
            t AS (SELECT sum(ca)::HUGEINT AS n, sum(cb)::HUGEINT AS m
                  FROM b)
            SELECT t.n::BIGINT AS n, t.m::BIGINT AS m,
                   sum(CASE WHEN ca > 0 AND cb > 0
                            THEN 1 ELSE 0 END)::BIGINT AS n_bins,
                   round(sum(CASE WHEN ca > 0 AND cb > 0 THEN
                       (ca::HUGEINT * t.m - cb::HUGEINT * t.n)
                       * (floor(ln((ca::HUGEINT * t.m)::DOUBLE)
                                * 1000000)::HUGEINT
                          - floor(ln((cb::HUGEINT * t.n)::DOUBLE)
                                  * 1000000)::HUGEINT)
                     ELSE 0 END)::DOUBLE
                     / ((t.n * t.m * 1000000)::HUGEINT)::DOUBLE, 6)
                     AS psi
            FROM b, t GROUP BY t.n, t.m
        """,
        # snapshot_diff: per-key FULL-OUTER compare of two windowed
        # aggregates folded in ONE pass (absent side = genuine zeros);
        # identical keys drop — the output is the change set
        "snapshot_diff": """
            WITH w AS (SELECT o_custkey,
                sum(CASE WHEN o_orderdate >= DATE '1995-01-01'
                          AND o_orderdate < DATE '1996-01-01'
                         THEN 1 ELSE 0 END)::BIGINT AS a_n,
                sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
                          AND o_orderdate < DATE '1997-01-01'
                         THEN 1 ELSE 0 END)::BIGINT AS b_n,
                sum(CASE WHEN o_orderdate >= DATE '1995-01-01'
                          AND o_orderdate < DATE '1996-01-01'
                         THEN round(o_totalprice * 100)::BIGINT
                         ELSE 0 END)::BIGINT AS a_centi,
                sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
                          AND o_orderdate < DATE '1997-01-01'
                         THEN round(o_totalprice * 100)::BIGINT
                         ELSE 0 END)::BIGINT AS b_centi
                FROM orders
                WHERE o_orderdate >= DATE '1995-01-01'
                  AND o_orderdate < DATE '1997-01-01'
                GROUP BY 1)
            SELECT o_custkey,
                   CASE WHEN a_n = 0 THEN 'added'
                        WHEN b_n = 0 THEN 'removed'
                        ELSE 'changed' END AS status,
                   a_n, b_n, a_centi, b_centi
            FROM w WHERE NOT (a_n = b_n AND a_centi = b_centi)
            ORDER BY o_custkey
        """,
        # zipf_fit: OLS on micro-nat (L(rank), L(count)) pairs over the
        # top-100 tokens; exact HUGEINT sufficient stats, the slope and
        # intercept are the only divisions (shared IEEE both sides)
        "zipf_fit": """
            WITH w AS (SELECT unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS tok FROM documents),
            c AS (SELECT tok, count(*)::BIGINT AS cnt FROM w
                  GROUP BY tok),
            r AS (SELECT cnt,
                         row_number() OVER (ORDER BY cnt DESC, tok)
                             AS i
                  FROM c QUALIFY i <= 100),
            l AS (SELECT floor(ln(i::DOUBLE) * 1000000)::BIGINT AS x,
                         floor(ln(cnt::DOUBLE) * 1000000)::BIGINT AS y
                  FROM r),
            s AS (SELECT count(*)::HUGEINT AS k,
                         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                         sum(x::HUGEINT * y)::HUGEINT AS sxy,
                         sum(x::HUGEINT * x)::HUGEINT AS sxx
                  FROM l)
            SELECT k::BIGINT AS k,
                   round((k * sxy - sx * sy)::DOUBLE
                         / (k * sxx - sx * sx)::DOUBLE, 6) AS slope,
                   round((sy * (k * sxx - sx * sx)
                          - (k * sxy - sx * sy) * sx)::DOUBLE
                         / (k * (k * sxx - sx * sx))::DOUBLE, 6)
                       AS intercept_micro
            FROM s
        """,
        # windowed funnel: each step's earliest completion must land
        # within 72 h of the previous step's (greedy-anchor chain —
        # the engine's per-partition sweep replays exactly this)
        "funnel_windowed": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'signup' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 72 HOUR
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s2.t2 + INTERVAL 72 HOUR
                   GROUP BY 1)
            SELECT 1::BIGINT AS step, 'view' AS event_type,
                   (SELECT count(*) FROM s1)::BIGINT AS users
            UNION ALL
            SELECT 2, 'signup', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT count(*) FROM s3)
            ORDER BY step
        """,
        # exact HUGEINT Gini numerator/denominator, one shared division
        "gini_index": """
            WITH v AS (SELECT round(o_totalprice * 100)::BIGINT AS x
                       FROM orders),
            r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM v),
            s AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
                         sum(i::HUGEINT * x::HUGEINT)::HUGEINT AS s1
                  FROM r)
            SELECT n::BIGINT AS n,
                   round((2 * s1 - (n + 1) * sx)::DOUBLE
                         / (n * sx)::DOUBLE, 6) AS gini
            FROM s
        """,
        # funnel step lag percentiles; quantile_disc = the engine's
        # ceil(q*n)-1 selection, values are exact int64 microseconds
        "conversion_lag": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s1.t1
                   GROUP BY 1),
            l AS (SELECT epoch_us(s2.t2) - epoch_us(s1.t1) AS lag_us
                  FROM s2 JOIN s1 USING (user_id))
            SELECT count(*)::BIGINT AS n,
                   quantile_disc(lag_us, 0.25)::BIGINT AS q25,
                   quantile_disc(lag_us, 0.50)::BIGINT AS q50,
                   quantile_disc(lag_us, 0.75)::BIGINT AS q75,
                   quantile_disc(lag_us, 0.90)::BIGINT AS q90
            FROM l
        """,
        # exact floored micro share of monthly revenue per priority
        "monthly_share": """
            WITH c AS (SELECT year(o_orderdate) * 100
                              + month(o_orderdate) AS ym,
                              o_orderpriority AS pri,
                              count(*)::BIGINT AS n,
                              sum(round(o_totalprice * 100)::BIGINT)
                                  ::BIGINT AS rev
                       FROM orders GROUP BY 1, 2)
            SELECT ym::BIGINT AS ym, pri, n, rev,
                   (rev * 1000000
                    // sum(rev) OVER (PARTITION BY ym))::BIGINT
                       AS share_micro
            FROM c
        """,
        # day-over-day growth leaderboard; missing previous day = 0
        "trending_items": """
            WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                              coalesce(json_extract(props,
                                  '$.k')::BIGINT, 0) AS k
                       FROM events),
            c AS (SELECT d, k, count(*)::BIGINT AS n FROM e
                  GROUP BY 1, 2),
            g AS (SELECT c.d, c.k, c.n,
                         coalesce(p.n, 0)::BIGINT AS n_prev,
                         (c.n - coalesce(p.n, 0))::BIGINT AS growth
                  FROM c LEFT JOIN c p
                       ON p.k = c.k AND p.d = c.d - 1)
            SELECT d * 86400000000 AS day_us, k, n, n_prev, growth
            FROM g
            QUALIFY row_number() OVER (PARTITION BY d
                ORDER BY growth DESC, k) <= 5
        """,
        # exact HUGEINT numerator/denominator (int64 wraps on s1*s1 at
        # scale — the chi2_independence lesson), ONE shared division
        "degree_assortativity": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            p AS (SELECT a.i AS u, b.i AS v
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2),
            deg AS (SELECT node, count(*)::BIGINT AS d
                    FROM (SELECT u AS node FROM p
                          UNION ALL SELECT v FROM p) GROUP BY 1),
            e AS (SELECT da.d AS du, db.d AS dv
                  FROM p JOIN deg da ON p.u = da.node
                       JOIN deg db ON p.v = db.node),
            s AS (SELECT count(*)::HUGEINT AS m,
                         sum(du + dv)::HUGEINT AS s1,
                         sum(du * du + dv * dv)::HUGEINT AS s2,
                         sum(du * dv)::HUGEINT AS sxy
                  FROM e)
            SELECT (2 * m)::BIGINT AS m2,
                   round((2 * m * 2 * sxy - s1 * s1)::DOUBLE
                         / (2 * m * s2 - s1 * s1)::DOUBLE,
                         6) AS assortativity
            FROM s
        """,
        "itemsets3": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem)
            SELECT a.i AS item_a, b.i AS item_b, c.i AS item_c,
                   count(*)::BIGINT AS n
            FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                 JOIN li c ON b.g = c.g AND b.i < c.i
            GROUP BY 1, 2, 3
            ORDER BY n DESC, item_a, item_b, item_c
            LIMIT 50
        """,
        "basket_pairs": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem)
            SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n
            FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2
            ORDER BY n DESC, item_a, item_b
            LIMIT 100
        """,
        # triangles of the co-purchase graph: e1=(u,v) e2=(u,w)
        # e3=(v,w) with u<v<w — each triangle matched exactly once
        "triangle_count": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            e AS (SELECT a.i AS u, b.i AS v
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT count(*)::BIGINT AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        # Adamic–Adar in exact integer micro-units: per-center weight
        # 10^12 // floor(ln(deg)·1e6) (truncating // both sides, deg≥2
        # at any wedge center), summed over common neighbors; existing
        # edges excluded; ties (score DESC, a, b)
        "adamic_adar": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            e AS (SELECT a.i AS u, b.i AS v
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2 HAVING count(*) >= 2),
            adj AS (SELECT u AS z, v AS nb FROM e
                    UNION ALL SELECT v, u FROM e),
            deg AS (SELECT z, count(*)::BIGINT AS d FROM adj
                    GROUP BY z),
            w AS (SELECT z, 1000000000000
                           // floor(ln(d::DOUBLE) * 1000000)::BIGINT
                             AS wz
                  FROM deg WHERE d >= 2),
            wedge AS (SELECT a.nb AS b, bb.nb AS c, w.wz
                      FROM adj a
                      JOIN adj bb ON a.z = bb.z AND a.nb < bb.nb
                      JOIN w ON w.z = a.z),
            sc AS (SELECT b, c, sum(wz)::BIGINT AS aa_micro
                   FROM wedge GROUP BY 1, 2),
            ne AS (SELECT sc.b, sc.c, sc.aa_micro
                   FROM sc LEFT JOIN e ON e.u = sc.b AND e.v = sc.c
                   WHERE e.u IS NULL)
            SELECT b AS item_a, c AS item_b, aa_micro
            FROM ne ORDER BY aa_micro DESC, item_a, item_b LIMIT 10
        """,
        # time-RANGE frame: the window is [ts-1h, ts] INCLUSIVE of
        # equal-ts peers (SQL RANGE CURRENT ROW = end of peer group)
        "rolling_sum_time": """
            SELECT event_id, user_id,
                   sum(round(value * 100)::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW
                   )::BIGINT AS win_sum_centi
            FROM events
        """,
        # LAG window; sentinel 0 on each key's first row (no NULLs in
        # the value hash), per-row centi scaling -> exact int64
        "lag_diff": """
            SELECT event_id, user_id,
                   coalesce(round(value * 100)::BIGINT
                            - lag(round(value * 100)::BIGINT) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id),
                            0)::BIGINT AS diff_centi
            FROM events
        """,
        # binary payload column: md5(VARCHAR) hashes the UTF-8 bytes,
        # which are exactly the engine's payload bytes
        "blob_stats": """
            SELECT doc_id,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   md5(text) AS digest
            FROM documents
        """,
        "tpch_q3ish": """
            SELECT l_orderkey,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT AS revenue_dmilli
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey
            ORDER BY revenue_dmilli DESC, l_orderkey LIMIT 10
        """,
        # Q5 analog: local-supplier revenue per ASIA nation, one year
        "tpch_q5ish": """
            SELECT n_name,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT AS revenue_dmilli
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND s_nationkey = c_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue_dmilli DESC, n_name
        """,
        # Q6 analog: scan-filter-sum; discount band compared in centi ints
        "tpch_q6ish": """
            SELECT sum(round(l_extendedprice * l_discount
                             * 10000)::BIGINT)::BIGINT AS revenue_dmilli,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        # Q10 analog: returned-item revenue, top-20 customers
        "tpch_q10ish": """
            SELECT c_custkey, c_name, n_name,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT AS revenue_dmilli
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-07-01'
              AND l_returnflag = 'R'
            GROUP BY 1, 2, 3
            ORDER BY revenue_dmilli DESC, c_custkey LIMIT 20
        """,
        # Q14 analog: promo revenue split — two exact int sums, no ratio
        "tpch_q14ish": """
            SELECT sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0
                       END)::BIGINT AS promo_dmilli,
                   sum(r)::BIGINT AS total_dmilli
            FROM (SELECT round(l_extendedprice * (1 - l_discount)
                               * 10000)::BIGINT AS r, l_partkey
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate <  TIMESTAMP '1997-01-01')
            JOIN part ON l_partkey = p_partkey
        """,
        # Q17 analog: qty < 0.2*avg(qty) cross-multiplied into exact ints
        "tpch_q17ish": """
            WITH a AS (
                SELECT l_partkey,
                       sum(round(l_quantity * 100)::BIGINT)::BIGINT AS sq,
                       count(*)::BIGINT AS cnt
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#23' GROUP BY l_partkey)
            SELECT sum(round(l_extendedprice * 100)::BIGINT)::BIGINT
                       AS price_sum_centi,
                   count(*)::BIGINT AS n_rows
            FROM lineitem JOIN a USING (l_partkey)
            WHERE round(l_quantity * 100)::BIGINT * cnt * 5 < sq
        """,
        # Q19 analog: three-arm disjunction over part attrs + quantity
        "tpch_q19ish": """
            SELECT sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT AS revenue_dmilli,
                   count(*)::BIGINT AS n_rows
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size <= 15
                   AND round(l_quantity)::BIGINT BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size <= 25
                   AND round(l_quantity)::BIGINT BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size <= 35
                   AND round(l_quantity)::BIGINT BETWEEN 20 AND 30)
        """,
        # Q22 analog: above-average balance + NOT EXISTS orders-in-window
        "tpch_q22ish": """
            WITH b AS (
                SELECT c_custkey, round(c_acctbal * 100)::BIGINT AS bal_centi,
                       c_nationkey
                FROM customer),
            avg_b AS (
                SELECT sum(bal_centi)::BIGINT AS s, count(*)::BIGINT AS n
                FROM b WHERE bal_centi > 0)
            SELECT n_name, count(*)::BIGINT AS numcust,
                   sum(bal_centi)::BIGINT AS totacctbal_centi
            FROM b JOIN nation ON c_nationkey = n_nationkey, avg_b
            WHERE bal_centi * n > s
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1996-01-01'
                    AND o_orderdate <  TIMESTAMP '1996-07-01')
            GROUP BY n_name ORDER BY n_name
        """,
        # Q8 analog: ASIA-supplier share of STANDARD-part volume sold to
        # ASIA customers, two exact int sums per year
        "tpch_q8ish": """
            WITH v AS (
                SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
                       round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT AS vol,
                       sn.n_regionkey AS s_reg
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation sn ON s_nationkey = sn.n_nationkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region cr ON cn.n_regionkey = cr.r_regionkey
                WHERE cr.r_name = 'ASIA' AND p_type = 'STANDARD'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1998-01-01')
            SELECT o_year,
                   sum(CASE WHEN s_reg = (SELECT r_regionkey FROM region
                                          WHERE r_name = 'ASIA')
                            THEN vol ELSE 0 END)::BIGINT AS nation_dmilli,
                   sum(vol)::BIGINT AS total_dmilli
            FROM v GROUP BY 1 ORDER BY 1
        """,
        # Q9 analog: widget-part profit by supplier nation x order year
        "tpch_q9ish": """
            SELECT n_name,
                   EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
                   sum(round(l_extendedprice * (1 - l_discount)
                             * 10000)::BIGINT)::BIGINT AS profit_dmilli
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Q11 analog: per-part shipped value from ASIA suppliers, HAVING
        # value > 2x the mean part value cross-multiplied into ints
        "tpch_q11ish": """
            WITH f AS (
                SELECT l_partkey,
                       round(l_extendedprice * 100)::BIGINT AS v
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'),
            g AS (SELECT l_partkey, sum(v)::BIGINT AS value_centi
                  FROM f GROUP BY 1),
            tot AS (SELECT sum(value_centi)::BIGINT AS s,
                           count(*)::BIGINT AS np FROM g)
            SELECT l_partkey, value_centi FROM g, tot
            WHERE value_centi * np > 2 * s
            ORDER BY value_centi DESC, l_partkey
        """,
        # Q12 analog: ship-lag buckets (lag+120)//30 over [-120,120),
        # high = urgent/high order priority
        "tpch_q12ish": """
            SELECT ((date_diff('day', o_orderdate, l_shipdate) + 120)
                    // 30)::BIGINT AS lag_bucket,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE date_diff('day', o_orderdate, l_shipdate) >= -120
              AND date_diff('day', o_orderdate, l_shipdate) <  120
            GROUP BY 1 ORDER BY 1
        """,
        # Q15 analog: supplier(s) achieving max half-year revenue
        "tpch_q15ish": """
            WITH r AS (
                SELECT l_suppkey,
                       sum(round(l_extendedprice * (1 - l_discount)
                                 * 10000)::BIGINT)::BIGINT
                           AS total_revenue_dmilli
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-07-01'
                GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue_dmilli
            FROM r JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue_dmilli =
                  (SELECT max(total_revenue_dmilli) FROM r)
            ORDER BY s_suppkey
        """,
        # Q20 analog: ASIA/EUROPE suppliers with a heavy one-year
        # (supp, part) widget shipment group
        "tpch_q20ish": """
            WITH g AS (
                SELECT l_suppkey, l_partkey,
                       sum(round(l_quantity * 100)::BIGINT)::BIGINT AS sq
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE '%widget%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY 1, 2)
            SELECT s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA', 'EUROPE')
              AND EXISTS (SELECT 1 FROM g
                          WHERE l_suppkey = s_suppkey AND sq > 5000)
            ORDER BY s_name
        """,
        # Q21 analog: sole-late supplier on multi-supplier finalized
        # orders, late = shipped >60 days after the order date
        "tpch_q21ish": """
            WITH j AS (
                SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'),
            late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM j
                     WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
            supps AS (SELECT l_orderkey,
                             count(DISTINCT l_suppkey) AS ns
                      FROM j GROUP BY 1),
            lcnt AS (SELECT l_orderkey, count(*) AS nl
                     FROM late GROUP BY 1)
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM late
            JOIN supps USING (l_orderkey)
            JOIN lcnt USING (l_orderkey)
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE ns >= 2 AND nl = 1
            GROUP BY 1 ORDER BY 2 DESC, 1
        """,
        # CCNet-style paragraph dedup over deterministic 20-word segments:
        # a segment survives iff its (doc_id, i) is the minimal occurrence
        # of its md5 corpus-wide; docs whose every segment is a dup drop out
        "paragraph_dedup": r"""
            WITH w AS (
                SELECT doc_id, regexp_extract_all(text, '\S+') AS words
                FROM documents),
            seg AS (
                SELECT doc_id, i,
                       array_to_string(words[(i-1)*20+1 : i*20], ' ') AS seg
                FROM w, unnest(generate_series(
                    1, (len(words)+19)//20)) AS t(i)),
            k AS (
                SELECT doc_id, i, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, i) AS rn
                FROM seg)
            SELECT doc_id, count(*)::BIGINT AS n_segs,
                   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                   string_agg(CASE WHEN rn = 1 THEN seg END,
                              ' ' ORDER BY i) AS kept_text
            FROM k GROUP BY doc_id HAVING n_kept > 0 ORDER BY doc_id
        """,
        # Pearson corr from exact int sufficient stats; the final double
        # expression mirrors the engine's formula term-for-term so the
        # IEEE result (and its round to 6) is bit-identical
        "qty_discount_corr": """
            WITH s AS (
                SELECT l_returnflag,
                       count(*)::BIGINT AS n,
                       sum(round(l_quantity)::BIGINT)::BIGINT AS sx,
                       sum(round(l_discount * 100)::BIGINT)::BIGINT AS sy,
                       sum(round(l_quantity)::BIGINT
                           * round(l_quantity)::BIGINT)::BIGINT AS sxx,
                       sum(round(l_discount * 100)::BIGINT
                           * round(l_discount * 100)::BIGINT)::BIGINT
                           AS syy,
                       sum(round(l_quantity)::BIGINT
                           * round(l_discount * 100)::BIGINT)::BIGINT
                           AS sxy
                FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / sqrt((n::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)
                                * (n::DOUBLE * syy::DOUBLE
                                   - sy::DOUBLE * sy::DOUBLE)),
                         6) AS corr_qd
            FROM s ORDER BY l_returnflag
        """,
        # exact heavy hitters: integer support predicate on both sides
        # SQL replica of the d=4 x w=1024 count-min sketch: bucket =
        # md5_number_upper('r:token') % 1024 (the engine's _hash64),
        # bucket sums = the sketch row, estimate = min over rows —
        # identical arithmetic, so collisions overestimate identically
        "cms_freq": """
            WITH toks AS (
                SELECT unnest(string_split_regex(text, '\\s+')) AS token
                FROM documents),
            t AS (SELECT token, count(*)::BIGINT AS cnt FROM toks
                  WHERE token <> '' GROUP BY token),
            probes AS (SELECT token FROM t WHERE length(token) >= 4
                       ORDER BY token LIMIT 24),
            r AS (SELECT unnest(generate_series(0, 3)) AS r),
            b AS (SELECT r.r,
                         (md5_number_upper(r.r::VARCHAR || ':' || t.token)
                          % 1024)::BIGINT AS b,
                         t.cnt
                  FROM t, r),
            bs AS (SELECT r, b, sum(cnt)::BIGINT AS s
                   FROM b GROUP BY r, b),
            pb AS (SELECT p.token, r.r,
                          (md5_number_upper(r.r::VARCHAR || ':'
                                            || p.token)
                           % 1024)::BIGINT AS b
                   FROM probes p, r)
            SELECT pb.token,
                   min(bs.s)::BIGINT AS est_cnt,
                   min(t.cnt)::BIGINT AS true_cnt
            FROM pb JOIN bs ON bs.r = pb.r AND bs.b = pb.b
                 JOIN t ON t.token = pb.token
            GROUP BY pb.token
        """,
        "frequent_tokens": """
            WITH toks AS (
                SELECT unnest(string_split_regex(text, '\\s+')) AS token
                FROM documents),
            t AS (
                SELECT token, count(*)::BIGINT AS cnt FROM toks
                WHERE token <> '' GROUP BY token),
            tot AS (SELECT sum(cnt)::BIGINT AS n FROM t)
            SELECT token, cnt FROM t, tot WHERE cnt * 50 > n
            ORDER BY cnt DESC, token
        """,
        # consecutive-event bigrams per user (ts, id order)
        "event_transitions": """
            WITH o AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events)
            SELECT event_type AS src, nxt AS dst, count(*)::BIGINT AS n
            FROM o WHERE nxt IS NOT NULL
            GROUP BY src, dst
        """,
        # floored integer micro probabilities; // floors on positive
        # BIGINTs exactly like pandas int64 //
        "event_markov": """
            WITH o AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events),
            c AS (SELECT event_type AS src, nxt AS dst,
                         count(*)::BIGINT AS n
                  FROM o WHERE nxt IS NOT NULL
                  GROUP BY src, dst)
            SELECT src, dst, n,
                   sum(n) OVER (PARTITION BY src)::BIGINT AS row_total,
                   (n * 1000000)
                       // sum(n) OVER (PARTITION BY src)::BIGINT
                       AS prob_micro
            FROM c
        """,
        "ntile_buckets": """
            SELECT event_id, event_type,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id)::BIGINT AS tile
            FROM events
        """,
        # funnel: step i = earliest event strictly after step i-1's time
        "funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t
                        FROM events e JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'signup' AND e.ts > s1.t
                        GROUP BY e.user_id),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t
                        FROM events e JOIN s2 ON e.user_id = s2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts > s2.t
                        GROUP BY e.user_id)
            SELECT * FROM (
                SELECT 1::BIGINT AS step, 'view' AS event_type,
                       count(*)::BIGINT AS users FROM s1
                UNION ALL
                SELECT 2::BIGINT, 'signup', count(*)::BIGINT FROM s2
                UNION ALL
                SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s3)
            ORDER BY step
        """,
        "tpch_q4ish": """
            SELECT o_orderpriority, count(*)::BIGINT AS n
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "tpch_q13ish": """
            WITH per_cust AS (
                SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM per_cust GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q16ish": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q7ish": """
            SELECT supp_nation, cust_nation, l_year,
                   sum(rev_dmilli)::BIGINT AS revenue_dmilli
            FROM (SELECT ns.n_name AS supp_nation,
                         nc.n_name AS cust_nation,
                         year(l_shipdate)::BIGINT AS l_year,
                         round(l_extendedprice * (1 - l_discount)
                               * 10000)::BIGINT AS rev_dmilli
                  FROM lineitem
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation nc ON nc.n_nationkey = c_nationkey
                  JOIN nation ns ON ns.n_nationkey = s_nationkey
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate <  TIMESTAMP '1998-01-01'
                    AND ((ns.n_name = 'NATION_3'
                          AND nc.n_name = 'NATION_8')
                      OR (ns.n_name = 'NATION_8'
                          AND nc.n_name = 'NATION_3')))
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "rollup_counts": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*)::BIGINT AS n,
                   sum(n_chars)::BIGINT AS total
            FROM documents
            GROUP BY ROLLUP(lang, source)
        """,
        "user_set_ops": """
            SELECT 'both' AS op, user_id FROM
                (SELECT user_id FROM events WHERE event_type = 'purchase'
                 INTERSECT
                 SELECT user_id FROM events WHERE event_type = 'signup')
            UNION ALL
            SELECT 'purchase_only' AS op, user_id FROM
                (SELECT user_id FROM events WHERE event_type = 'purchase'
                 EXCEPT
                 SELECT user_id FROM events WHERE event_type = 'signup')
        """,
        "tpch_q2ish": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
                        FROM lineitem),
            j AS (SELECT ps.l_partkey AS p_partkey, s_name,
                         round(s_acctbal * 100)::BIGINT AS acctbal_centi
                  FROM ps
                  JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  WHERE p_type = 'STANDARD')
            SELECT p_partkey, s_name, acctbal_centi
            FROM j
            QUALIFY acctbal_centi =
                min(acctbal_centi) OVER (PARTITION BY p_partkey)
        """,
        "group_ranks": """
            SELECT event_id, user_id,
                   rank() OVER (PARTITION BY user_id
                                ORDER BY value DESC)::BIGINT AS rnk,
                   dense_rank() OVER (PARTITION BY user_id
                                      ORDER BY value DESC)::BIGINT AS drnk
            FROM events
        """,
        "running_total": """
            SELECT event_id, user_id,
                   sum(round(value * 100)::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS run_centi
            FROM events
        """,
        "value_quantiles_cont": """
            WITH s AS (
                SELECT event_type, round(value * 100)::BIGINT AS vc,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY value) - 1 AS r,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events),
            g AS (
                SELECT event_type, n,
                       max(CASE WHEN r = (25 * (n - 1)) // 100
                                THEN vc END) AS lo25,
                       max(CASE WHEN r = least((25 * (n - 1)) // 100 + 1,
                                               n - 1) THEN vc END) AS hi25,
                       max(CASE WHEN r = (50 * (n - 1)) // 100
                                THEN vc END) AS lo50,
                       max(CASE WHEN r = least((50 * (n - 1)) // 100 + 1,
                                               n - 1) THEN vc END) AS hi50,
                       max(CASE WHEN r = (95 * (n - 1)) // 100
                                THEN vc END) AS lo95,
                       max(CASE WHEN r = least((95 * (n - 1)) // 100 + 1,
                                               n - 1) THEN vc END) AS hi95
                FROM s GROUP BY event_type, n)
            SELECT event_type,
                   (lo25 * 100 + ((25 * (n - 1)) % 100)
                        * (hi25 - lo25))::BIGINT AS q25_e4,
                   (lo50 * 100 + ((50 * (n - 1)) % 100)
                        * (hi50 - lo50))::BIGINT AS q50_e4,
                   (lo95 * 100 + ((95 * (n - 1)) % 100)
                        * (hi95 - lo95))::BIGINT AS q95_e4
            FROM g
        """,
        "regex_extract": r"""
            SELECT doc_id, m AS term, count(*)::BIGINT AS n
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(
                             text, '\b[st][a-z]{3,}\b')) AS m
                  FROM documents)
            GROUP BY doc_id, m
        """,
        # retention: distinct (user, day) pairs -> cohort = min day
        "retention": """
            WITH up AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // 86400000000 AS p
                        FROM events),
                 f AS (SELECT user_id, min(p) AS cohort
                       FROM up GROUP BY user_id)
            SELECT f.cohort::BIGINT AS cohort,
                   (up.p - f.cohort)::BIGINT AS age,
                   count(*)::BIGINT AS users
            FROM up JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY cohort, age
        """,
        "tpch_q18ish": """
            WITH q AS (
                SELECT l_orderkey,
                       sum(CAST(round(l_quantity * 100) AS BIGINT))
                           AS sum_qty_centi
                FROM lineitem GROUP BY l_orderkey
                HAVING sum_qty_centi > 15000)
            SELECT c_name, o_custkey, o_orderkey, o_orderdate,
                   sum_qty_centi
            FROM q
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY sum_qty_centi DESC, o_orderkey
            LIMIT 100
        """,
        # pivot = conditional counts per key (fixed category schema)
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')::BIGINT
                       AS n_click,
                   count(*) FILTER (event_type = 'error')::BIGINT
                       AS n_error,
                   count(*) FILTER (event_type = 'purchase')::BIGINT
                       AS n_purchase,
                   count(*) FILTER (event_type = 'signup')::BIGINT
                       AS n_signup,
                   count(*) FILTER (event_type = 'view')::BIGINT
                       AS n_view
            FROM events GROUP BY user_id
        """,
        # grouped top-k by (value desc, id asc); values are set elements
        "group_topk": """
            SELECT event_type, event_id, value FROM (
                SELECT event_type, event_id, value,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id ASC) AS rn
                FROM events) WHERE rn <= 3
        """,
        # md5-hex string order on both sides — see hash_sample
        "stratified_sample": """
            SELECT event_id, user_id, event_type FROM (
                SELECT event_id, user_id, event_type,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY md5(event_id::VARCHAR) ASC,
                                    event_id ASC) AS rn
                FROM events) WHERE rn <= 40
        """,
        "keep_best_doc": """
            SELECT doc_id, lang, source, n_chars FROM (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (PARTITION BY lang, source
                           ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents) WHERE rn = 1
        """,
        "filter_above_median": """
            SELECT e.event_id, e.event_type, e.value
            FROM events e JOIN (
                SELECT event_type, quantile_disc(value, 0.5) AS m
                FROM events GROUP BY event_type) q
              ON e.event_type = q.event_type
            WHERE e.value > q.m
        """,
        # quantile_disc = exact set-element selection (index ceil(q*n)-1
        # on both sides), so float equality is exact
        "value_quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.25) AS q25,
                   quantile_disc(value, 0.5) AS q50,
                   quantile_disc(value, 0.95) AS q95
            FROM events GROUP BY event_type
        """,
        # interval join as a correlated range count (inclusive both ends,
        # same as the engine's two-searchsorted sweep)
        "range_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT p.event_id, p.user_id,
                   (SELECT count(*) FROM c
                     WHERE c.user_id = p.user_id
                       AND c.ts >= p.ts - INTERVAL 5 MINUTE
                       AND c.ts <= p.ts)::BIGINT AS n_clicks
            FROM p
        """,
        # Bloom-prefiltered anti-join == plain NOT EXISTS (the bitmap is
        # a prefilter with exact re-check, never a semantics change)
        "anti_join_bloom": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1996-07-01')
        """,
        # export-manifest replica: shard = first-8-hex of md5 as int
        # mod 16 (DuckDB's '0x'||hex BIGINT cast == python int(h,16));
        # n_tokens = the shared \S+ whitespace-token rule
        "shuffle_export": r"""
            SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 16 AS shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(regexp_extract_all(coalesce(text, ''),
                                                   '\S+'))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        """,
        # hash-threshold sampling: 300000 ppm -> int(0.3 * 2^32) = hex
        # 4ccccccc; lowercase-hex string compare == numeric compare
        # NTILE(10) over (price DESC, key) — identical tie handling via
        # the orderkey tiebreak; exact centi-int revenue per decile
        "lift_table": """
            WITH o AS (SELECT o_orderkey,
                              round(o_totalprice * 100)::BIGINT AS centi,
                              CASE WHEN o_orderpriority = '1-URGENT'
                                   THEN 1 ELSE 0 END AS urgent
                       FROM orders),
            t AS (SELECT *, ntile(10) OVER (
                      ORDER BY centi DESC, o_orderkey) AS tile
                  FROM o)
            SELECT tile::BIGINT AS tile, count(*)::BIGINT AS n,
                   sum(centi)::BIGINT AS sum_value,
                   sum(urgent)::BIGINT AS n_flag
            FROM t GROUP BY tile
        """,
        # fixed-interval selection in md5 order; (h, doc_id) tiebreak
        # on both sides (md5 collisions are the only tie source)
        "systematic_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            QUALIFY (row_number() OVER (
                ORDER BY md5(doc_id::VARCHAR), doc_id) - 1) % 10 = 0
        """,
        "hash_sample": """
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc'
        """,
        # per-source thresholds: 1.0 -> 'g' (every hex char < 'g', keeps
        # all), 0.5 -> '80000000', 0.25 -> '40000000', default 0.1 ->
        # '19999999'
        "weighted_mix": """
            SELECT doc_id, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                  CASE source WHEN 'src0' THEN 'g'
                              WHEN 'src1' THEN '80000000'
                              WHEN 'src2' THEN '40000000'
                              ELSE '19999999' END
        """,
        # docs in md5-hash order while the running ws-token sum stays
        # <= 2000 (same inclusive-cumsum rule as token_budget_sample)
        "token_budget_sample": r"""
            WITH m AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       len(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS tok
                FROM documents),
            c AS (
                SELECT *, sum(tok) OVER (ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
                FROM m)
            SELECT doc_id, tok::BIGINT AS tok FROM c WHERE cum <= 2000
        """,
        # PMI formula written TERM-FOR-TERM as the engine computes it
        # (left-to-right adds of ln terms, floor to micro units) so the
        # IEEE doubles match bit-for-bit — the qty_discount_corr precedent
        "bigram_pmi": r"""
            WITH w AS (SELECT regexp_extract_all(lower(text),
                              '[a-z0-9]+') AS ws
                       FROM documents),
            uc AS (SELECT tok, count(*)::BIGINT AS c
                   FROM (SELECT unnest(ws) AS tok FROM w) GROUP BY tok),
            nu AS (SELECT sum(c)::BIGINT AS n FROM uc),
            bc AS (SELECT x, y, count(*)::BIGINT AS c
                   FROM (SELECT ws[i] AS x, ws[i+1] AS y
                         FROM (SELECT ws, unnest(range(1, len(ws))) AS i
                               FROM w))
                   GROUP BY x, y),
            nb AS (SELECT sum(c)::BIGINT AS n FROM bc),
            cand AS (SELECT x, y, c FROM bc WHERE c >= 5
                     QUALIFY row_number()
                         OVER (ORDER BY c DESC, x || ' ' || y) <= 2000)
            SELECT cand.x || ' ' || cand.y AS gram, cand.c AS cnt,
                   CAST(floor((ln(cand.c) - ln(nb.n) - ln(ux.c) + ln(nu.n)
                               - ln(uy.c) + ln(nu.n)) * 1000000) AS BIGINT)
                       AS pmi_micro
            FROM cand, nb, nu
            JOIN uc ux ON ux.tok = cand.x
            JOIN uc uy ON uy.tok = cand.y
            ORDER BY pmi_micro DESC, gram LIMIT 100
        """,
        "ngram_counts": r"""
            WITH w AS (SELECT regexp_extract_all(lower(text),
                              '[a-z0-9]+') AS ws
                       FROM documents),
            g AS (SELECT array_to_string(ws[i:i+2], ' ') AS gram
                  FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i
                        FROM w)),
            c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
            SELECT gram, cnt::BIGINT AS cnt FROM c
            ORDER BY cnt DESC, gram LIMIT 100
        """,
        "point_lookup": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id IN (3, 17, 42, 97, 123, 250, 444)
        """,
        # per-group budgets: same hash order, window partitioned by lang
        "token_budget_by_group": r"""
            WITH m AS (
                SELECT doc_id, lang,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       len(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS tok
                FROM documents),
            c AS (
                SELECT *, sum(tok) OVER (PARTITION BY lang
                    ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
                FROM m)
            SELECT doc_id, lang, tok::BIGINT AS tok FROM c
            WHERE cum <= CASE lang WHEN 'en' THEN 3000
                                   WHEN 'de' THEN 1000 ELSE 500 END
        """,
        # same hash order / ws-token count as token_budget_sample; the
        # engine's bucketed prefix-sum must equal the flat window scan
        "pack_sequences": r"""
            WITH m AS (
                SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       len(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS tok
                FROM documents),
            o AS (
                SELECT doc_id, tok,
                       coalesce(sum(tok) OVER (ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS off
                FROM m)
            SELECT doc_id, tok::BIGINT AS tok, off::BIGINT AS "offset",
                   (off // 2048)::BIGINT AS seq_id
            FROM o
        """,
        # unigram LM fit on the corpus itself: same [a-z0-9]+ tokens,
        # top-4096 vocab by (count desc, token asc), ln(count/total)
        # summed over in-vocab tokens, milli-scaled on both sides
        "unigram_logprob": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                           AS t
                FROM documents),
            cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
            tot AS (SELECT sum(c)::DOUBLE AS n FROM cnt),
            vocab AS (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 4096)
            SELECT tok.doc_id,
                   count(*)::BIGINT AS n_tok,
                   (count(*) FILTER (WHERE v.t IS NULL))::BIGINT AS n_oov,
                   CAST(round(coalesce(
                       sum(ln(v.c / (SELECT n FROM tot)))
                           FILTER (WHERE v.t IS NOT NULL), 0) * 1000)
                       AS BIGINT) AS logprob_milli
            FROM tok LEFT JOIN vocab v ON tok.t = v.t
            GROUP BY tok.doc_id
        """,
        # the four curation stages chained as SQL CTEs, each mirroring
        # its operator exactly (NFC+collapse, ppm gates, min-id-per-
        # fingerprint window, hash-order prefix-sum cut)
        "curate": r"""
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(nfc_normalize(coalesce(text,
                            '')), '[ \t\n\r\f\v]+', ' ', 'g')) AS nt
                FROM documents),
            q AS (SELECT doc_id, nt FROM n
                  WHERE len(regexp_extract_all(nt, '\S+')) >= 5
                    AND len(regexp_extract_all(nt, '[.,;:!?]')) * 1000000
                        // greatest(length(nt), 1) <= 200000),
            d AS (SELECT doc_id, nt FROM (
                    SELECT doc_id, nt,
                           min(doc_id) OVER (PARTITION BY md5(lower(nt)))
                               AS keeper
                    FROM q) WHERE doc_id = keeper),
            m AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h,
                         len(regexp_extract_all(nt, '\S+')) AS tok
                  FROM d),
            c AS (SELECT *, sum(tok) OVER (ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum FROM m)
            SELECT doc_id, tok::BIGINT AS tok FROM c WHERE cum <= 5000
        """,
        # hashed unigram+bigram buckets via md5_number_upper %% 8192 (==
        # the engine's md5[:8]-little-endian hash); add-one smoothed
        # ln-ratio of target (doc_id%97=0) vs raw models, milli-scaled
        "dsir_weights": r"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS ws
                       FROM documents),
            uni AS (SELECT doc_id, unnest(ws) AS f FROM w),
            bi AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS f
                   FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
                         FROM w)),
            feats AS (SELECT doc_id, f FROM uni
                      UNION ALL SELECT doc_id, f FROM bi),
            fb AS (SELECT doc_id,
                          (md5_number_upper(f) % 8192)::BIGINT AS bucket
                   FROM feats),
            cnt AS (SELECT bucket,
                           count(*) FILTER (WHERE doc_id % 97 = 0) AS tc,
                           count(*) FILTER (WHERE doc_id % 97 <> 0) AS rc
                    FROM fb GROUP BY bucket),
            tot AS (SELECT sum(tc) AS tt, sum(rc) AS rr FROM cnt),
            sc AS (SELECT fb.doc_id,
                          count(*) AS n_feat,
                          sum(ln((cnt.tc + 1.0)
                                 / ((SELECT tt FROM tot) + 8192))
                              - ln((cnt.rc + 1.0)
                                   / ((SELECT rr FROM tot) + 8192)))
                              AS wsum
                   FROM fb JOIN cnt USING (bucket)
                   WHERE fb.doc_id % 97 <> 0
                   GROUP BY fb.doc_id)
            SELECT doc_id, n_feat::BIGINT AS n_feat,
                   CAST(round(wsum * 1000) AS BIGINT) AS weight_milli
            FROM sc
        """,
        # explicit ASCII whitespace class (Python re and RE2 disagree on
        # unicode \s); trim strips the single residual edge space
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(nfc_normalize(coalesce(text, '')),
                        '[ \t\n\r\f\v]+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        # 64-char windows at stride 16 (1-based generate_series mirrors
        # the engine's 0-based range; substr/length are char-based on
        # both sides); duplicated = same string in >= 2 distinct docs
        "dup_substrings": f"""
            WITH {_DUP_CORPUS_SQL},
            d AS (SELECT doc_id, coalesce(text, '') AS t FROM dup_corpus
                  WHERE length(coalesce(text, '')) >= 64),
            w AS (SELECT doc_id, substr(t, i, 64) AS w
                  FROM d, LATERAL (SELECT unnest(generate_series(
                       1, length(t) - 63, 16)) AS i) g),
            dw AS (SELECT DISTINCT doc_id, w FROM w),
            gc AS (SELECT w, count(DISTINCT doc_id) AS nd
                   FROM dw GROUP BY w)
            SELECT dw.doc_id,
                   count(*)::BIGINT AS n_windows,
                   sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_dup_windows
            FROM dw JOIN gc USING (w)
            GROUP BY dw.doc_id
        """,
        # exact-Jaccard pairs >= 0.6 on the planted-dup corpus ->
        # transitive closure -> min-id canonical per cluster
        "dup_clusters": f"""
            WITH RECURSIVE {_DUP_CORPUS_SQL}, {_SHINGLE_SQL},
            p AS (
                SELECT i.a AS u, i.b AS v
                FROM ipair i
                JOIN sz sa ON i.a = sa.doc_id
                JOIN sz sb ON i.b = sb.doc_id
                WHERE (i.inter * 1000000) // (sa.n + sb.n - i.inter)
                      >= 600000),
            und AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
            nodes AS (SELECT doc_id AS node FROM dup_corpus),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT und.u, reach.r
                FROM und JOIN reach ON reach.node = und.v)
            SELECT node AS doc_id, min(r)::BIGINT AS cluster,
                   (node = min(r))::BIGINT AS keep
            FROM reach GROUP BY node
        """,
        # Gopher-style repetition signals; same line/gram definitions as
        # repetition_batch (non-empty newline-split lines; [a-z0-9]+ word
        # 2-grams; top gram = max count, ties to smallest gram)
        "repetition_scores": r"""
            WITH l AS (
                SELECT doc_id, text,
                       list_filter(string_split(text, chr(10)),
                                   x -> x <> '') AS lines
                FROM documents),
            lf AS (SELECT doc_id, unnest(lines) AS line FROM l),
            lc AS (SELECT doc_id, line, count(*) AS cnt,
                          length(line) AS len
                   FROM lf GROUP BY doc_id, line),
            ls AS (SELECT doc_id,
                          sum(cnt) AS n_lines,
                          sum(cnt) - count(*) AS dup_lines,
                          sum((cnt - 1) * len) AS dup_chars,
                          sum(cnt * len) AS line_chars
                   FROM lc GROUP BY doc_id),
            w AS (SELECT doc_id, text,
                         regexp_extract_all(lower(text), '[a-z0-9]+')
                             AS words
                  FROM documents),
            wi AS (SELECT doc_id, words,
                          unnest(range(1, len(words))) AS i
                   FROM w),
            g AS (SELECT doc_id,
                         array_to_string(words[i:i+1], ' ') AS gram
                  FROM wi),
            gc AS (SELECT doc_id, gram, count(*) AS cnt
                   FROM g GROUP BY doc_id, gram),
            gt AS (SELECT doc_id, cnt, gram FROM (
                       SELECT doc_id, gram, cnt,
                              row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram ASC) AS rn
                       FROM gc) WHERE rn = 1)
            SELECT d.doc_id,
                   coalesce(ls.n_lines, 0)::BIGINT AS n_lines,
                   CASE WHEN coalesce(ls.n_lines, 0) > 0
                        THEN ls.dup_lines * 1000000 // ls.n_lines
                        ELSE 0 END::BIGINT AS dup_line_ppm,
                   CASE WHEN coalesce(ls.line_chars, 0) > 0
                        THEN ls.dup_chars * 1000000 // ls.line_chars
                        ELSE 0 END::BIGINT AS dup_line_char_ppm,
                   CASE WHEN gt.cnt IS NOT NULL
                        THEN gt.cnt * length(gt.gram) * 1000000
                             // greatest(length(d.text), 1)
                        ELSE 0 END::BIGINT AS top2gram_ppm
            FROM documents d
            LEFT JOIN ls USING (doc_id)
            LEFT JOIN gt USING (doc_id)
        """,
        # word-3-gram instances of the corpus split joined against the
        # DISTINCT grams of the benchmark split (doc_id % 97 == 0); list
        # slice words[i:i+2] is 1-based inclusive = 3 words
        "decontaminate": r"""
            WITH w AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS words
                FROM documents),
            wi AS (
                SELECT doc_id, words,
                       unnest(range(1, len(words) - 1)) AS i
                FROM w),
            b AS (
                SELECT DISTINCT array_to_string(words[i:i+2], ' ') AS gram
                FROM wi WHERE doc_id % 97 = 0),
            c AS (
                SELECT doc_id, array_to_string(words[i:i+2], ' ') AS gram
                FROM wi WHERE doc_id % 97 <> 0)
            SELECT c.doc_id, count(*)::BIGINT AS n_matched
            FROM c JOIN b USING (gram)
            GROUP BY c.doc_id
        """,
        # ON CONFLICT (doc_id, chunk_id) DO UPDATE: batch2 wins on
        # collisions, batch1 survivors pass through
        "chunk_upsert": """
            WITH b1 AS (
                SELECT doc_id, unnest([0, 1]) AS chunk_id
                FROM documents WHERE doc_id % 2 = 0),
            b1v AS (SELECT doc_id, chunk_id,
                           doc_id * 100 + chunk_id AS val FROM b1),
            b2 AS (SELECT doc_id, 0 AS chunk_id, doc_id * 1000 + 7 AS val
                   FROM documents WHERE doc_id % 3 = 0)
            SELECT doc_id, chunk_id::BIGINT AS chunk_id, val::BIGINT AS val
            FROM b1v
            WHERE (doc_id, chunk_id) NOT IN
                  (SELECT (doc_id, chunk_id) FROM b2)
            UNION ALL
            SELECT doc_id, chunk_id::BIGINT, val::BIGINT FROM b2
        """,
        "tfidf_keywords": r"""
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM tok GROUP BY doc_id, term),
            dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
            sc AS (SELECT tf.doc_id, tf.term, tf.tf,
                          tf.tf * CAST(round(ln((SELECT n FROM nd)
                                               / dfx.df) * 1000000)
                                       AS BIGINT) AS score_micro
                   FROM tf JOIN dfx USING (term)),
            rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY score_micro DESC, term) AS rn
                   FROM sc)
            SELECT doc_id, term, tf::BIGINT AS tf, score_micro
            FROM rk WHERE rn <= 5
        """,
        "inverted_index": r"""
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM tok GROUP BY doc_id, term)
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf
            FROM tf GROUP BY term
        """,
        # phrase = position self-join on adjacent token indices; idf_micro
        # mirrors the engine's integer surrogate (ln on the identical
        # exact (N, df) ints -> identical double -> one identical round)
        "bm25_phrase": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                           '[a-z0-9]+')) AS tok,
                       generate_subscripts(regexp_extract_all(lower(text),
                           '[a-z0-9]+'), 1) AS pos
                FROM documents),
            nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks),
            ph AS (SELECT a.doc_id, count(*)::BIGINT AS tf
                   FROM toks a JOIN toks b
                     ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                   WHERE a.tok = 'data' AND b.tok = 'line'
                   GROUP BY a.doc_id),
            phidf AS (SELECT CAST(round(ln(((SELECT n FROM nd)
                              - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
                              * 1000000) AS BIGINT) AS idf FROM ph)
            SELECT doc_id, (tf * (SELECT idf FROM phidf))::BIGINT
                       AS score_micro
            FROM ph
            ORDER BY score_micro DESC, doc_id
            LIMIT 50
        """,
        # (merge AND join AND NOT spark) OR "batch batch"; score =
        # tf·idf_micro over the DISTINCT positive nodes present in the
        # doc regardless of which group matched — the engine contract
        "search_boolean": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                           '[a-z0-9]+')) AS tok,
                       generate_subscripts(regexp_extract_all(lower(text),
                           '[a-z0-9]+'), 1) AS pos
                FROM documents),
            nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks),
            tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
                   FROM toks WHERE tok IN ('merge', 'join', 'spark')
                   GROUP BY doc_id, tok),
            ph AS (SELECT a.doc_id, count(*)::BIGINT AS tf
                   FROM toks a JOIN toks b
                     ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                   WHERE a.tok = 'batch' AND b.tok = 'batch'
                   GROUP BY a.doc_id),
            idfs AS (SELECT
                CAST(round(ln(((SELECT n FROM nd) - (SELECT count(*)
                    FROM tf WHERE tok = 'merge') + 0.5)
                    / ((SELECT count(*) FROM tf WHERE tok = 'merge')
                       + 0.5) + 1.0) * 1000000) AS BIGINT) AS im,
                CAST(round(ln(((SELECT n FROM nd) - (SELECT count(*)
                    FROM tf WHERE tok = 'join') + 0.5)
                    / ((SELECT count(*) FROM tf WHERE tok = 'join')
                       + 0.5) + 1.0) * 1000000) AS BIGINT) AS ij,
                CAST(round(ln(((SELECT n FROM nd) - (SELECT count(*)
                    FROM ph) + 0.5) / ((SELECT count(*) FROM ph)
                       + 0.5) + 1.0) * 1000000) AS BIGINT) AS ip),
            m AS (SELECT d.doc_id, tm.tf AS tfm, tj.tf AS tfj,
                         ts.tf AS tfs, p.tf AS tfp
                  FROM (SELECT DISTINCT doc_id FROM toks) d
                  LEFT JOIN (SELECT doc_id, tf FROM tf
                             WHERE tok = 'merge') tm USING (doc_id)
                  LEFT JOIN (SELECT doc_id, tf FROM tf
                             WHERE tok = 'join') tj USING (doc_id)
                  LEFT JOIN (SELECT doc_id, tf FROM tf
                             WHERE tok = 'spark') ts USING (doc_id)
                  LEFT JOIN ph p USING (doc_id))
            SELECT doc_id,
                   (coalesce(tfm, 0) * idfs.im + coalesce(tfj, 0) * idfs.ij
                    + coalesce(tfp, 0) * idfs.ip)::BIGINT AS score_micro
            FROM m, idfs
            WHERE (tfm IS NOT NULL AND tfj IS NOT NULL AND tfs IS NULL)
               OR tfp IS NOT NULL
            ORDER BY score_micro DESC, doc_id
            LIMIT 50
        """,
        # Lucene-variant BM25 (k1=1.2, b=0.75) over whole-corpus stats
        "bm25_topk": r"""
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n_docs,
                             avg(dl)::DOUBLE AS avgdl FROM dl),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                   WHERE term IN ('data', 'scan', 'merge')
                   GROUP BY doc_id, term),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            sc AS (SELECT tf.doc_id,
                          sum(ln((stats.n_docs - dfq.df + 0.5)
                                 / (dfq.df + 0.5) + 1.0)
                              * tf.tf * 2.2
                              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                                / stats.avgdl))) AS s
                   FROM tf
                   JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id
                   CROSS JOIN stats
                   GROUP BY tf.doc_id)
            SELECT doc_id, round(s, 4) AS score
            FROM sc ORDER BY score DESC, doc_id LIMIT 10
        """,
        # Tantivy parameterization: identical to bm25_topk except the
        # per-doc length is byte-fieldnorm-quantized (keep top 4
        # significant bits, floor — stages/fieldnorm.py) while avgdl
        # stays the exact mean; quantization replayed in pure SQL
        "bm25_tantivy": r"""
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            dlq AS (SELECT doc_id, dl,
                           CASE WHEN dl < 16 THEN dl
                                ELSE (dl >> (length(printf('%b', dl)) - 4))
                                     << (length(printf('%b', dl)) - 4)
                           END AS dlq
                    FROM dl),
            stats AS (SELECT count(*)::DOUBLE AS n_docs,
                             avg(dl)::DOUBLE AS avgdl FROM dl),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                   WHERE term IN ('data', 'scan', 'merge')
                   GROUP BY doc_id, term),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            sc AS (SELECT tf.doc_id,
                          sum(ln((stats.n_docs - dfq.df + 0.5)
                                 / (dfq.df + 0.5) + 1.0)
                              * tf.tf * 2.2
                              / (tf.tf + 1.2 * (0.25 + 0.75 * dlq.dlq
                                                / stats.avgdl))) AS s
                   FROM tf
                   JOIN dfq USING (term)
                   JOIN dlq ON tf.doc_id = dlq.doc_id
                   CROSS JOIN stats
                   GROUP BY tf.doc_id)
            SELECT doc_id, round(s, 4) AS score
            FROM sc ORDER BY score DESC, doc_id LIMIT 10
        """,
        # bipartite 4-cycles: Σ C(co-occurrence, 2) over the distinct
        # pair projection — exact int, coalesce(0) for an empty sum
        "butterfly_count": """
            WITH li AS (SELECT DISTINCT l_orderkey AS g,
                                        l_partkey AS i FROM lineitem),
            e AS (SELECT a.i AS u, b.i AS v, count(*) AS n
                  FROM li a JOIN li b ON a.g = b.g AND a.i < b.i
                  GROUP BY 1, 2)
            SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT
                   AS n_butterflies FROM e
        """,
        # KMV bottom-k sketch rebuilt hash-for-hash: same md5 upper-64,
        # same (k-1)·2^64 // h_(k) floor (HUGEINT — 255·2^64 overflows
        # BIGINT); < k distinct hashes ⇒ the sketch is exact
        "kmv_distinct": """
            WITH h AS (SELECT DISTINCT
                              md5_number_upper(user_id::VARCHAR) AS hv
                       FROM events),
            o AS (SELECT hv, row_number() OVER (ORDER BY hv) AS r FROM h),
            n AS (SELECT count(*)::BIGINT AS n_exact FROM h),
            kth AS (SELECT hv FROM o WHERE r = 256)
            SELECT 256::BIGINT AS k, n.n_exact,
                   CASE WHEN n.n_exact < 256 THEN n.n_exact
                        ELSE CAST((255::HUGEINT *
                                   18446744073709551616::HUGEINT)
                                  // kth.hv::HUGEINT AS BIGINT)
                   END AS kmv_est
            FROM n LEFT JOIN kth ON TRUE
        """,
        # per-source exact-dup rate: dup ⇔ identical text with a smaller
        # doc_id anywhere (min-id window), floored micro rate
        "dup_rate_by_source": """
            WITH f AS (SELECT doc_id, source, md5(text) AS fp
                       FROM documents),
            m AS (SELECT source,
                         CASE WHEN doc_id > min(doc_id)
                                           OVER (PARTITION BY fp)
                              THEN 1 ELSE 0 END AS d
                  FROM f)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(d)::BIGINT AS n_dups,
                   (sum(d) * 1000000 // count(*))::BIGINT
                   AS dup_rate_micro
            FROM m GROUP BY source ORDER BY source
        """,
        # order-invariant dedup: md5 of the sorted token bag (list_sort
        # == python sorted on the [a-z0-9]+ alphabet)
        "bow_dedup": r"""
            SELECT md5(array_to_string(list_sort(
                       regexp_extract_all(lower(text), '[a-z0-9]+')), ' '))
                       AS bow_md5,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        # Simpson diversity 1 − Σp² per source, cross-multiplied to
        # exact floored micro units (HUGEINT: Σcnt² · 1e6 over total²)
        "token_diversity": r"""
            WITH tok AS (SELECT source,
                                unnest(regexp_extract_all(lower(text),
                                    '[a-z0-9]+')) AS term
                         FROM documents),
            c AS (SELECT source, term, count(*)::BIGINT AS cnt
                  FROM tok GROUP BY 1, 2),
            agg AS (SELECT source,
                           sum(cnt)::HUGEINT AS total,
                           sum(cnt::HUGEINT * cnt::HUGEINT) AS sq
                    FROM c GROUP BY source)
            SELECT source, CAST(total AS BIGINT) AS n_tokens,
                   CAST(1000000 - (sq * 1000000) // (total * total)
                        AS BIGINT) AS diversity_micro
            FROM agg ORDER BY source
        """,
        # reciprocal best match: per-vector top-1 by (round(cos,4) DESC,
        # id ASC) — rounding BEFORE selection matches the engine's
        # partial-then-merge order exactly
        "mutual_nn": """
            WITH s AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
                              round(list_cosine_similarity(
                                  a.embedding::DOUBLE[],
                                  b.embedding::DOUBLE[]), 4) AS score
                       FROM embeddings a JOIN embeddings b
                       ON a.vec_id <> b.vec_id),
            r AS (SELECT qa, qb, score,
                         row_number() OVER (PARTITION BY qa
                             ORDER BY score DESC, qb ASC) AS rn
                  FROM s),
            nn AS (SELECT qa, qb, score FROM r WHERE rn = 1)
            SELECT x.qa AS a, x.qb AS b, x.score
            FROM nn x JOIN nn y ON x.qb = y.qa AND y.qb = x.qa
            WHERE x.qa < x.qb ORDER BY a
        """,
        # containment |A∩B|/min over shingle sets; intersections over
        # shingles with global df <= 16 (the engine's hot-shingle cap,
        # mirrored), sizes exact; planted truncated copies hit 1.0
        "containment_dups": _CONTAINMENT_SQL,
        # CMS inner-product join-size estimate: both d×w sketches rebuilt
        # hash-for-hash (md5_number_upper % 1024, shared row salts),
        # est = min_r Σ_j A_r[j]·B_r[j] — equality INCLUDING collisions
        "join_size_est": """
            WITH a AS (SELECT user_id::VARCHAR AS k, count(*)::BIGINT AS c
                       FROM events GROUP BY 1),
            b AS (SELECT o_custkey::VARCHAR AS k, count(*)::BIGINT AS c
                  FROM orders GROUP BY 1),
            r AS (SELECT unnest(generate_series(0, 3)) AS r),
            sa AS (SELECT r.r,
                          (md5_number_upper(r.r::VARCHAR || ':' || a.k)
                           % 1024)::BIGINT AS bkt,
                          sum(a.c)::HUGEINT AS s
                   FROM a, r GROUP BY 1, 2),
            sb AS (SELECT r.r,
                          (md5_number_upper(r.r::VARCHAR || ':' || b.k)
                           % 1024)::BIGINT AS bkt,
                          sum(b.c)::HUGEINT AS s
                   FROM b, r GROUP BY 1, 2),
            prod AS (SELECT sa.r, sum(sa.s * sb.s) AS p
                     FROM sa JOIN sb ON sa.r = sb.r AND sa.bkt = sb.bkt
                     GROUP BY sa.r),
            tru AS (SELECT count(*)::BIGINT AS t
                    FROM events e JOIN orders o
                    ON e.user_id = o.o_custkey)
            SELECT CAST((SELECT min(p) FROM prod) AS BIGINT) AS est_rows,
                   tru.t AS true_rows
            FROM tru
        """,
        # per-field BM25 (own df/dl/avgdl per field), boosted sum, doc
        # filters lang='en' AND NOT nsfw — mirrors bm25_fielded_topk
        "bm25_fielded": r"""
            WITH tokc AS (SELECT doc_id,
                                 unnest(regexp_extract_all(lower(text),
                                     '[a-z0-9]+')) AS term
                          FROM documents),
            tokt AS (SELECT doc_id,
                            unnest(list_slice(regexp_extract_all(
                                lower(text), '[a-z0-9]+'), 1, 8)) AS term
                     FROM documents),
            tokm AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(source),
                                '[a-z0-9]+')) AS term
                     FROM documents),
            dlc AS (SELECT doc_id, count(*) AS dl FROM tokc GROUP BY doc_id),
            dlt AS (SELECT doc_id, count(*) AS dl FROM tokt GROUP BY doc_id),
            dlm AS (SELECT doc_id, count(*) AS dl FROM tokm GROUP BY doc_id),
            stc AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
                    FROM dlc),
            stt AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
                    FROM dlt),
            stm AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
                    FROM dlm),
            tfc AS (SELECT doc_id, term, count(*) AS tf FROM tokc
                    WHERE term IN ('data', 'scan', 'merge')
                    GROUP BY doc_id, term),
            tft AS (SELECT doc_id, term, count(*) AS tf FROM tokt
                    WHERE term IN ('data', 'scan', 'merge')
                    GROUP BY doc_id, term),
            tfm AS (SELECT doc_id, term, count(*) AS tf FROM tokm
                    WHERE term IN ('data', 'scan', 'merge')
                    GROUP BY doc_id, term),
            dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
            dft AS (SELECT term, count(*) AS df FROM tft GROUP BY term),
            dfm AS (SELECT term, count(*) AS df FROM tfm GROUP BY term),
            scc AS (SELECT tfc.doc_id,
                           sum(1.0 * ln((stc.n - dfc.df + 0.5)
                                        / (dfc.df + 0.5) + 1.0)
                               * tfc.tf * 2.2
                               / (tfc.tf + 1.2 * (0.25 + 0.75 * dlc.dl
                                                  / stc.avgdl))) AS partial
                    FROM tfc JOIN dfc USING (term)
                    JOIN dlc ON tfc.doc_id = dlc.doc_id
                    CROSS JOIN stc GROUP BY tfc.doc_id),
            sct AS (SELECT tft.doc_id,
                           sum(2.0 * ln((stt.n - dft.df + 0.5)
                                        / (dft.df + 0.5) + 1.0)
                               * tft.tf * 2.2
                               / (tft.tf + 1.2 * (0.25 + 0.75 * dlt.dl
                                                  / stt.avgdl))) AS partial
                    FROM tft JOIN dft USING (term)
                    JOIN dlt ON tft.doc_id = dlt.doc_id
                    CROSS JOIN stt GROUP BY tft.doc_id),
            scm AS (SELECT tfm.doc_id,
                           sum(1.5 * ln((stm.n - dfm.df + 0.5)
                                        / (dfm.df + 0.5) + 1.0)
                               * tfm.tf * 2.2
                               / (tfm.tf + 1.2 * (0.25 + 0.75 * dlm.dl
                                                  / stm.avgdl))) AS partial
                    FROM tfm JOIN dfm USING (term)
                    JOIN dlm ON tfm.doc_id = dlm.doc_id
                    CROSS JOIN stm GROUP BY tfm.doc_id),
            allsc AS (SELECT * FROM scc UNION ALL SELECT * FROM sct
                      UNION ALL SELECT * FROM scm),
            tot AS (SELECT doc_id, sum(partial) AS s FROM allsc
                    GROUP BY doc_id)
            SELECT t.doc_id, round(t.s, 4) AS score
            FROM tot t JOIN documents d USING (doc_id)
            WHERE d.lang = 'en'
              AND d.source NOT IN ('src1', 'src7', 'src13')
            ORDER BY score DESC, t.doc_id LIMIT 10
        """,
        # exact O(n²) ground truth for the LSH-pruned pipelines: with
        # rows=2 banding the candidate step has recall ≈ 1 at J ≥ threshold
        # (miss prob ≤ (1-J²)^64), so LSH output == exact pairs
        "minhash_dups": _jaccard_pairs_sql(600_000),
        # exact shingle Jaccard vs doc 0 over the planted-dup corpus
        # (ipair in _SHINGLE_SQL is an unreferenced CTE — not executed)
        "lsh_lookup": f"""
            WITH {_DUP_CORPUS_SQL}, {_SHINGLE_SQL},
            q AS (SELECT s FROM shx WHERE doc_id = 0),
            qn AS (SELECT count(*)::BIGINT AS n FROM q),
            it AS (SELECT x.doc_id, count(*)::BIGINT AS i
                   FROM shx x JOIN q USING (s) GROUP BY 1)
            SELECT it.doc_id,
                   (i * 1000000) // (sz.n + qn.n - i) AS jaccard_ppm
            FROM it JOIN sz USING (doc_id) CROSS JOIN qn
            WHERE (i * 1000000) // (sz.n + qn.n - i) >= 600000
        """,
        "ngram_jaccard_dups": _jaccard_pairs_sql(500_000),
        # exact SimHash (pigeonhole banding is complete for hamming ≤ 3);
        # md5_number_upper == int.from_bytes(md5(s)[:8], 'little')
        "simhash_dups": f"""
            WITH {_DUP_CORPUS_SQL},
            tk AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
                   FROM dup_corpus),
            h AS (SELECT doc_id, md5_number_upper(t) AS hv FROM tk),
            bits AS (SELECT doc_id, bb.b AS b,
                            sum(CASE WHEN (hv >> bb.b) & 1 = 1
                                     THEN 1 ELSE -1 END) AS vote
                     FROM h, (SELECT unnest(generate_series(0, 63)) AS b) bb
                     GROUP BY doc_id, bb.b),
            fp AS (SELECT doc_id,
                          sum(CASE WHEN vote > 0
                                   THEN 1::UBIGINT << b ELSE 0 END)::UBIGINT
                              AS fp
                   FROM bits GROUP BY doc_id)
            SELECT x.doc_id AS a, y.doc_id AS b,
                   bit_count(xor(x.fp, y.fp))::BIGINT AS hamming
            FROM fp x JOIN fp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.fp, y.fp)) <= 3
        """,
    }
