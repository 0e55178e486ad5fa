"""Brute-force / parity tests for the r4c5 second-batch operators:
Bloom membership probe, TF-IDF top-k, FK-orphan audit, flat-JSON field
stats, embedding covariance sufficient stats, reciprocal-rank fusion.

Adversarial shapes: injected orphans + null keys (both fk_orphans
paths), bloom false positives verified against a hand-built bitmap,
partition-count invariance, docs with no tokens, JSON payloads checked
against json.loads ground truth.
"""

import hashlib
import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _md5_64(s: str) -> int:
    # matches state/filters._hash64 (== DuckDB md5_number_upper)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


@pytest.mark.usefixtures("ray_session")
def test_bloom_probe_matches_hand_bitmap():
    import ray.data as rd

    from vyntr_ray.stages.sketches import bloom_probe

    rng = np.random.Generator(np.random.PCG64(3))
    members = rng.choice(np.arange(1000), 120, replace=False).astype("int64")
    probes = np.arange(1000, dtype="int64")
    m_bits, k = 512, 3  # small bitmap => guaranteed false positives

    mem_ds = rd.from_pandas(pd.DataFrame({"mk": members})).repartition(5)
    probe_ds = rd.from_pandas(pd.DataFrame({"pk": probes})).repartition(4)
    got = (bloom_probe(mem_ds, probe_ds, "mk", "pk",
                       m_bits=m_bits, k=k).to_pandas())

    bitmap = np.zeros(m_bits, bool)
    for v in members:
        for j in range(k):
            bitmap[_md5_64(f"{j}:{v}") % m_bits] = True
    want_in = np.array([all(bitmap[_md5_64(f"{j}:{v}") % m_bits]
                            for j in range(k)) for v in probes], np.int64)
    want_mem = np.isin(probes, members).astype(np.int64)

    assert list(got.columns) == ["pk", "in_bloom", "is_member"]
    got = got.sort_values("pk", ignore_index=True)
    assert (got["in_bloom"].to_numpy() == want_in).all()
    assert (got["is_member"].to_numpy() == want_mem).all()
    # no false negatives; and this sizing must actually produce FPs
    assert (got["in_bloom"] >= got["is_member"]).all()
    assert ((got["in_bloom"] == 1) & (got["is_member"] == 0)).any()


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.text_analysis import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["apple banana apple", "banana cherry",
                 "apple cherry cherry dates", "", "dates"]})
    got = (tfidf_topk(rd.from_pandas(docs).repartition(3), k=2)
           .to_pandas())

    n_docs = len(docs)
    tf: dict = {}
    for _, r in docs.iterrows():
        for t in r["text"].split():
            tf[(r["doc_id"], t)] = tf.get((r["doc_id"], t), 0) + 1
    df: dict = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    rows = [(d, t, c * math.floor(math.log(n_docs / df[t]) * 1e6))
            for (d, t), c in tf.items()]
    want = (pd.DataFrame(rows, columns=["doc_id", "token", "score_micro"])
            .sort_values(["doc_id", "score_micro", "token"],
                         ascending=[True, False, True])
            .groupby("doc_id").head(2).reset_index(drop=True))
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"score_micro": "int64"}),
        want.astype({"score_micro": "int64"}))
    assert 4 not in set(got["doc_id"])  # tokenless doc drops out


@pytest.mark.usefixtures("ray_session")
def test_fk_orphans_counts_injected_orphans_and_nulls():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import fk_orphans

    parent = pd.DataFrame({"pk": pd.array([1, 2, 3], dtype="int64")})
    child = pd.DataFrame({
        "fk": pd.array([1, 2, 2, 99, 98, None, 3, None], dtype="Int64")})
    for mode in ("broadcast", "shuffle"):
        out = fk_orphans([
            ("t.fk", rd.from_pandas(child.copy()).repartition(3), "fk",
             rd.from_pandas(parent.copy()).repartition(2), "pk", mode)])
        assert out.loc[0, "fk_name"] == "t.fk"
        assert int(out.loc[0, "n_rows"]) == 8
        assert int(out.loc[0, "n_orphans"]) == 2, mode
        assert int(out.loc[0, "n_nulls"]) == 2, mode


@pytest.mark.usefixtures("ray_session")
def test_json_field_stats_matches_json_loads():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import json_field_stats

    rng = np.random.Generator(np.random.PCG64(7))
    types = rng.choice(["a", "b"], 200)
    ks = rng.integers(-50, 150, 200)
    props = [json.dumps({"k": int(v)}) for v in ks]
    # some rows without the field, and one with extra whitespace
    props[0] = json.dumps({"other": 1})
    props[1] = '{"k":   42}'
    ks_eff = ks.copy()
    df = pd.DataFrame({"event_type": types, "props": props})
    got = json_field_stats(rd.from_pandas(df).repartition(4),
                           "event_type", "props", "k")

    ref_rows = []
    for g in sorted(set(types)):
        sub = df[df["event_type"] == g]
        vals = []
        n_null = 0
        for p in sub["props"]:
            d = json.loads(p)
            if "k" in d:
                vals.append(d["k"])
            else:
                n_null += 1
        ref_rows.append((g, len(sub), n_null, sum(vals),
                         min(vals), max(vals)))
    ref = pd.DataFrame(ref_rows, columns=["event_type", "n", "n_null",
                                          "sum_v", "min_v", "max_v"])
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns[1:]}),
        ref.astype({c: "int64" for c in ref.columns[1:]}))
    assert ks_eff is not None


@pytest.mark.usefixtures("ray_session")
def test_embedding_covariance_matches_numpy():
    import ray.data as rd

    from vyntr_ray.rounding import round_half_away
    from vyntr_ray.stages.embed import embedding_covariance

    rng = np.random.Generator(np.random.PCG64(11))
    n, dim, dims = 40, 8, 5
    vecs = rng.normal(0, 1, (n, dim)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(
        [v.tolist() for v in vecs], pa.list_(pa.float32()))})
    got = embedding_covariance(rd.from_arrow(tbl).repartition(4),
                               dims=dims, scale=100)

    x = round_half_away(vecs[:, :dims].astype(np.float64)
                        * 100.0).astype(np.int64)
    s = x.sum(axis=0)
    p = x.T @ x
    assert len(got) == dims * (dims + 1) // 2
    for _, r in got.iterrows():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert int(r["n_vecs"]) == n
        assert int(r["sum_x"]) == s[i]
        assert int(r["sum_y"]) == s[j]
        assert int(r["sum_xy"]) == p[i, j]


@pytest.mark.usefixtures("ray_session")
def test_rrf_fusion_registry_matches_duckdb():
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    got = em.queries()["rrf_fusion"](sf).reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ref = con.sql(em.oracle_sql()["rrf_fusion"]).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_minhash_accuracy_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.sketches import minhash_accuracy

    rng = np.random.Generator(np.random.PCG64(5))
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for d in range(12):
        if d == 5:
            texts.append("")                      # tokenless doc
        elif d % 2 == 1 and d > 1:
            # near-dup of its partner with a small edit
            texts.append(texts[d - 1] + " extraword")
        else:
            texts.append(" ".join(rng.choice(vocab, 30)))
    df = pd.DataFrame({"doc_id": pd.array(range(12), dtype="int64"),
                       "text": texts})
    got = (minhash_accuracy(rd.from_pandas(df).repartition(5),
                            n_perm=16, n_parts=4).to_pandas())

    import re
    pat = re.compile(r"[a-z0-9]+")
    salts = np.array([_md5_64(f"perm:{p}") for p in range(16)],
                     dtype=np.uint64)

    def hset(txt):
        ws = pat.findall(txt.lower())
        gs = set(" ".join(ws[j:j + 2]) for j in range(len(ws) - 1))
        return np.array(sorted(_md5_64(g) for g in gs), dtype=np.uint64)

    want = []
    for m in range(6):
        a, b = hset(texts[2 * m]), hset(texts[2 * m + 1])
        if len(a) == 0 or len(b) == 0:
            continue
        inter = len(np.intersect1d(a, b))
        union = len(a) + len(b) - inter
        siga = (a[:, None] ^ salts[None, :]).min(axis=0)
        sigb = (b[:, None] ^ salts[None, :]).min(axis=0)
        est = int((siga == sigb).sum())
        want.append((m, len(a), len(b), est * 1_000_000 // 16,
                     inter * 1_000_000 // union))
    ref = pd.DataFrame(want, columns=["pair_id", "n_a", "n_b",
                                      "est_micro", "jacc_micro"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  ref.astype("int64"))
    # near-dup pairs must score high on BOTH estimate and truth
    nd = ref[ref["jacc_micro"] > 800_000]
    assert len(nd) >= 1 and (nd["est_micro"] >= 500_000).all()
    assert 2 not in set(ref["pair_id"])          # pair with empty doc


@pytest.mark.usefixtures("ray_session")
def test_bigram_logprob_matches_bruteforce():
    import math
    import re

    import ray.data as rd

    from vyntr_ray.stages.text_analysis import bigram_logprob

    texts = ["the cat sat on the mat", "the cat ran", "x", "",
             "the mat sat"]
    df = pd.DataFrame({"doc_id": pd.array(range(5), dtype="int64"),
                       "text": texts})
    got = (bigram_logprob(rd.from_pandas(df).repartition(3))
           .to_pandas().reset_index(drop=True))

    pat = re.compile(r"[a-z0-9]+")
    c12: dict = {}
    c1: dict = {}
    doc_bgs: dict = {}
    for d, t in enumerate(texts):
        ws = pat.findall(t.lower())
        for j in range(len(ws) - 1):
            g = (ws[j], ws[j + 1])
            c12[g] = c12.get(g, 0) + 1
            c1[ws[j]] = c1.get(ws[j], 0) + 1
            doc_bgs.setdefault(d, []).append(g)
    want = []
    for d in sorted(doc_bgs):
        lp = sum(math.floor(math.log(c12[g] / c1[g[0]]) * 1e6)
                 for g in doc_bgs[d])
        want.append((d, len(doc_bgs[d]), lp))
    ref = pd.DataFrame(want, columns=["doc_id", "n_bigrams",
                                      "logprob_micro"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  ref.astype("int64"))
    assert set(got["doc_id"]) == {0, 1, 4}   # <2-token docs drop


@pytest.mark.usefixtures("ray_session")
def test_clustering_coefficients_matches_bruteforce():
    import itertools

    import ray.data as rd

    from vyntr_ray.stages.graph import clustering_coefficients

    rng = np.random.Generator(np.random.PCG64(9))
    nodes = 30
    edges = set()
    # a clique (coeff 1) outside the random range, a star, background
    for a, b in itertools.combinations([100, 101, 102, 103], 2):
        edges.add((a, b))
    for leaf in (110, 111, 112, 113):
        edges.add((105, leaf))
    while len(edges) < 60:
        a, b = rng.integers(0, nodes, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    ed = pd.DataFrame(sorted(edges), columns=["u", "v"]).astype("int64")
    got = (clustering_coefficients(
        rd.from_pandas(ed).repartition(4), n_parts=5).to_pandas())

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    for v in sorted(adj):
        d = len(adj[v])
        if d < 2:
            continue
        tri = sum(1 for x, y in itertools.combinations(sorted(adj[v]), 2)
                  if (min(x, y), max(x, y)) in edges)
        want.append((v, d, tri, 2 * tri * 1_000_000 // (d * (d - 1))))
    ref = pd.DataFrame(want, columns=["node", "deg", "n_tri",
                                      "coeff_micro"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  ref.astype("int64"))
    idx = ref.set_index("node")
    assert idx.loc[100, "coeff_micro"] == 1_000_000   # clique member
    assert idx.loc[105, "coeff_micro"] == 0           # star center
    # r5: degree orientation is a pure enumeration-order change — the
    # per-node triangle credits are invariant (orient="id" parity)
    got_id = (clustering_coefficients(
        rd.from_pandas(ed).repartition(4), n_parts=5,
        orient="id").to_pandas())
    pd.testing.assert_frame_equal(got_id.astype("int64"),
                                  ref.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_path_topk_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import path_topk

    rng = np.random.Generator(np.random.PCG64(13))
    n = 300
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 5 * 86400, n), unit="s")
    df = pd.DataFrame({
        "event_id": pd.array(range(n), dtype="int64"),
        "ts": ts,
        "user_id": pd.array(rng.integers(0, 12, n), dtype="int64"),
        "event_type": rng.choice(["view", "click", "buy"], n)})
    got = (path_topk(rd.from_pandas(df).repartition(5), k=10,
                     n_parts=4).to_pandas())

    ref = df.sort_values(["user_id", "ts", "event_id"],
                         kind="mergesort").copy()
    ref["day"] = ref["ts"].dt.floor("D")
    paths = (ref.groupby(["user_id", "day"], sort=False)["event_type"]
             .agg(">".join))
    cnt = paths.value_counts()
    want = (pd.DataFrame({"path": cnt.index, "n": cnt.values})
            .sort_values(["n", "path"], ascending=[False, True],
                         kind="mergesort").head(10)
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n": "int64"}),
        want.astype({"n": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_pmi_pairs_matches_bruteforce():
    import itertools
    import math
    import re

    import ray.data as rd

    from vyntr_ray.stages.text_analysis import pmi_pairs

    rng = np.random.Generator(np.random.PCG64(17))
    # "data science" forced collocation + common singles + noise
    docs = []
    for d in range(60):
        words = list(rng.choice(["alpha", "beta", "gamma", "rare%d" % d],
                                4))
        if d % 2 == 0:
            words += ["data", "science"]
        docs.append(" ".join(words))
    df = pd.DataFrame({"doc_id": pd.array(range(60), dtype="int64"),
                       "text": docs})
    got = (pmi_pairs(rd.from_pandas(df).repartition(4), k=10,
                     min_pair=3, df_frac=20))

    pat = re.compile(r"[a-z0-9]+")
    n_docs = len(df)
    tok_sets = [set(pat.findall(t.lower())) for t in docs]
    dfc: dict = {}
    for s in tok_sets:
        for w in s:
            dfc[w] = dfc.get(w, 0) + 1
    kept = {w for w, c in dfc.items() if c * 20 >= n_docs}
    cab: dict = {}
    for s in tok_sets:
        for a, b in itertools.combinations(sorted(s & kept), 2):
            cab[(a, b)] = cab.get((a, b), 0) + 1
    rows = [(a, b, c,
             math.floor(math.log((c * n_docs) / (dfc[a] * dfc[b])) * 1e6))
            for (a, b), c in cab.items() if c >= 3]
    rows.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = pd.DataFrame(rows[:10], columns=["tok_a", "tok_b", "c_ab",
                                            "pmi_micro"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"c_ab": "int64",
                                           "pmi_micro": "int64"}),
        want.astype({"c_ab": "int64", "pmi_micro": "int64"}))
    assert tuple(want.iloc[0][["tok_a", "tok_b"]]) == ("data", "science")


@pytest.mark.usefixtures("ray_session")
def test_benford_deviation_matches_bruteforce():
    import math

    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import benford_deviation

    rng = np.random.Generator(np.random.PCG64(19))
    # log-uniform => roughly Benford; include <1 values (dropped)
    v = np.concatenate([10 ** rng.uniform(0, 4, 500),
                        rng.uniform(0, 0.99, 20)])
    got = benford_deviation(
        rd.from_pandas(pd.DataFrame({"x": v})).repartition(4), "x")

    digits = [int(str(int(abs(x)))[0]) for x in v if abs(x) >= 1]
    total = len(digits)
    for d in range(1, 10):
        row = got[got["digit"] == d].iloc[0]
        nd = digits.count(d)
        assert int(row["n"]) == nd
        assert int(row["obs_micro"]) == nd * 1_000_000 // total
        assert int(row["exp_micro"]) == math.floor(
            math.log10(1.0 + 1.0 / d) * 1e6)
    assert int(got["n"].sum()) == total


@pytest.mark.usefixtures("ray_session")
def test_group_moments_matches_bruteforce():
    import math

    import ray.data as rd

    from vyntr_ray.rounding import round_half_away
    from vyntr_ray.stages.dataset_tools import group_moments

    rng = np.random.Generator(np.random.PCG64(23))
    g = rng.choice(["a", "b"], 400)
    # skewed values so skewness is materially nonzero
    v = np.where(g == "a", rng.exponential(50, 400),
                 rng.normal(100, 10, 400))
    df = pd.DataFrame({"g": g, "v": v})
    got = group_moments(rd.from_pandas(df).repartition(6), "g", "v",
                        scale=100)

    for grp in ("a", "b"):
        x = round_half_away(
            df.loc[df["g"] == grp, "v"].to_numpy(np.float64)
            * 100.0).astype(np.int64)
        n = len(x)
        s1, s2 = int(x.sum()), int((x * x).sum())
        s3 = int(((x * x) * x).astype(object).sum())
        s4 = int(((x * x) * (x * x)).astype(object).sum())
        nd = float(n)
        mu = float(s1) / nd
        m2 = float(s2) / nd - mu * mu
        m3 = (float(s3) / nd - 3.0 * mu * (float(s2) / nd)
              + 2.0 * mu * mu * mu)
        m4 = (float(s4) / nd - 4.0 * mu * (float(s3) / nd)
              + 6.0 * mu * mu * (float(s2) / nd)
              - 3.0 * mu * mu * mu * mu)
        row = got[got["g"] == grp].iloc[0]
        assert int(row["n"]) == n
        assert row["skewness"] == round(m3 / (m2 * math.sqrt(m2)), 6)
        assert row["kurtosis_excess"] == round(m4 / (m2 * m2) - 3.0, 6)
    a_skew = float(got[got["g"] == "a"]["skewness"].iloc[0])
    assert a_skew > 1.0          # exponential is right-skewed


@pytest.mark.usefixtures("ray_session")
def test_autocorr_and_mahalanobis_match_duckdb():
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    got_a = em.queries()["autocorr_daily"](sf).reset_index(drop=True)
    ref_a = con.sql(em.oracle_sql()["autocorr_daily"]).df()
    assert int(got_a.loc[0, "n"]) == int(ref_a.iloc[0, 0])
    assert float(got_a.loc[0, "autocorr"]) == float(ref_a.iloc[0, 1])

    got_m = em.queries()["mahalanobis2"](sf).reset_index(drop=True)
    ref_m = con.sql(em.oracle_sql()["mahalanobis2"]).df()
    pd.testing.assert_frame_equal(
        got_m.astype({"l_orderkey": "int64", "l_linenumber": "int64"}),
        ref_m.astype({"l_orderkey": "int64", "l_linenumber": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_mahalanobis_flags_joint_outlier():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import mahalanobis_outliers

    rng = np.random.Generator(np.random.PCG64(29))
    n = 400
    x = rng.normal(100, 10, n)
    y = 3 * x + rng.normal(0, 2, n)      # strongly correlated
    # row 0: normal on each margin, way off the joint line
    x[0], y[0] = 80.0, 360.0
    df = pd.DataFrame({"rid": pd.array(range(n), dtype="int64"),
                       "x": x, "y": y})
    got = mahalanobis_outliers(rd.from_pandas(df).repartition(4),
                               "x", "y", ["rid"], k=3)
    assert int(got.iloc[0]["rid"]) == 0
    assert got.iloc[0]["md2_r6"] > got.iloc[2]["md2_r6"]


@pytest.mark.usefixtures("ray_session")
def test_read_union_by_name_aligns_and_defaults(tmp_path):
    import pyarrow.parquet as pq

    from vyntr_ray.sources.evolve import read_union_by_name

    g1 = tmp_path / "g1"
    g2 = tmp_path / "g2"
    g1.mkdir()
    g2.mkdir()
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64()),
                             "a": pa.array([10, 20], pa.int64())}),
                   g1 / "part.parquet")
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "a": pa.array([30], pa.int64()),
                             "b": pa.array([7.5], pa.float64())}),
                   g2 / "part.parquet")
    out = read_union_by_name(
        [str(g1), str(g2)],
        schema={"id": pa.int64(), "a": pa.int64(), "b": pa.float64()},
        defaults={"b": None}).to_pandas().sort_values(
            "id", ignore_index=True)
    assert list(out.columns) == ["id", "a", "b"]
    assert out["b"].isna().tolist() == [True, True, False]
    assert out.loc[2, "b"] == 7.5
    # undeclared missing column must raise loudly
    with pytest.raises(ValueError):
        read_union_by_name([str(g1)], schema={"id": pa.int64(),
                                              "c": pa.int64()},
                           defaults={})


@pytest.mark.usefixtures("ray_session")
def test_lerp_fill_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import lerp_fill

    day = 86_400_000_000
    ts = pd.to_datetime(
        np.array([0, 0, 4 * day, 10 * day, 2 * day], dtype="int64"),
        unit="us")
    df = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "ts": ts,
        "user_id": pd.array([7, 7, 7, 7, 9], dtype="int64"),
        "value": [1.0, 2.0, 10.0, 4.0, 5.0]})
    got = (lerp_fill(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values(["user_id", "day_us"],
                                    ignore_index=True))
    u7 = got[got["user_id"] == 7].reset_index(drop=True)
    # anchors: d0=200 (latest of the two ts-tied rows = id 2),
    # d4=1000, d10=400; lerped between
    assert list(u7["centi"]) == [
        200,                       # anchor day 0
        (200 * 3 + 1000 * 1) // 4,  # day 1
        (200 * 2 + 1000 * 2) // 4,  # day 2
        (200 * 1 + 1000 * 3) // 4,  # day 3
        1000,                      # anchor day 4
        (1000 * 5 + 400 * 1) // 6,  # day 5
        (1000 * 4 + 400 * 2) // 6,
        (1000 * 3 + 400 * 3) // 6,
        (1000 * 2 + 400 * 4) // 6,
        (1000 * 1 + 400 * 5) // 6,
        400]                       # anchor day 10
    u9 = got[got["user_id"] == 9]
    assert len(u9) == 1 and int(u9.iloc[0]["centi"]) == 500


@pytest.mark.usefixtures("ray_session")
def test_final_batch_match_duckdb():
    """diversified_topk / source_vocab_overlap / markov_stationary
    engine-vs-oracle equality at sf0.001 (driver-bar exact values)."""
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, sqls = em.queries(), em.oracle_sql()
    for name in ("diversified_topk", "source_vocab_overlap",
                 "markov_stationary"):
        got = qs[name](sf)
        got = (got.to_pandas() if hasattr(got, "to_pandas")
               else got).reset_index(drop=True)
        ref = con.sql(sqls[name]).df()
        got = got.sort_values(list(got.columns), ignore_index=True)
        ref = ref.sort_values(list(ref.columns), ignore_index=True)
        assert list(got.columns) == list(ref.columns), name
        for c in got.columns:
            assert (got[c].to_numpy()
                    == ref[c].to_numpy().astype(
                        got[c].to_numpy().dtype)).all(), (name, c)


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_sums_near_one():
    import __ray_entry__ as em

    out = em.queries()["markov_stationary"]("/root/testdata/sf0.001")
    total = int(out["pi_micro"].sum())
    # floored integer division leaks at most |edges| micro per step
    assert 900_000 < total <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_pretrain_pipeline_matches_oracle_and_tightens_curate():
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = em.queries()["pretrain_pipeline"](sf).to_pandas()
    ref = con.sql(em.oracle_sql()["pretrain_pipeline"]).df()
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  ref.astype("int64"))
    # the two extra stages must actually bite: bench docs are gone,
    # and the selection differs from curate's (docs dropped before
    # the budget cut free room for later md5-order docs)
    curate_ids = set(em.queries()["curate"](sf).to_pandas()["doc_id"])
    assert (got["doc_id"] % 97 != 0).all()
    assert len(got) > 0 and set(got["doc_id"]) != curate_ids


@pytest.mark.usefixtures("ray_session")
def test_lateness_quantiles_matches_bruteforce():
    import math

    import ray.data as rd

    from vyntr_ray.stages.windows import lateness_quantiles

    rng = np.random.Generator(np.random.PCG64(31))
    n = 500
    # event times shuffled vs arrival order => real lateness
    ev_us = np.cumsum(rng.integers(1, 1000, n)).astype("int64") * 1000
    arrival = rng.permutation(n)
    df = pd.DataFrame({
        "event_id": pd.array(np.argsort(arrival), dtype="int64"),
        "ts": pd.to_datetime(ev_us, unit="us")})
    got = lateness_quantiles(rd.from_pandas(df).repartition(6),
                             n_buckets=8).iloc[0]

    order = df.sort_values("event_id")
    us = order["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    late = np.sort(np.maximum.accumulate(us) - us)
    assert int(got["n"]) == n
    for q, col in ((0.5, "p50_us"), (0.9, "p90_us"), (0.99, "p99_us")):
        assert int(got[col]) == int(late[math.ceil(q * n) - 1])
    assert int(got["max_us"]) == int(late[-1])
    assert int(got["max_us"]) > 0


@pytest.mark.usefixtures("ray_session")
def test_bitmap_index_matches_scan():
    import ray.data as rd

    from vyntr_ray.stages.bitmap_index import (bitmap_and_count,
                                               bitmap_build)

    rng = np.random.Generator(np.random.PCG64(37))
    n = 9000                              # spans 3 chunks of 4096
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n)
    df = pd.DataFrame({"doc_id": pd.array(range(n), dtype="int64"),
                       "a": a, "b": b})
    ds = rd.from_pandas(df).repartition(5)
    ia = bitmap_build(ds, "a", chunk_rows=4096)
    ib = bitmap_build(ds, "b", chunk_rows=4096)
    got = bitmap_and_count(ia, ib, "y", "q", chunk_rows=4096, k_ids=20)

    want = df[(df["a"] == "y") & (df["b"] == "q")]["doc_id"]
    assert int(got["n_match"].iloc[0]) == len(want)
    assert list(got["doc_id"]) == sorted(want)[:20]


@pytest.mark.usefixtures("ray_session")
def test_wilson_and_bootstrap_sanity():
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    w = em.queries()["wilson_ranking"](sf)
    # bound is a valid probability strictly below the raw rate
    rate = w["k"] / w["n"]
    assert ((w["wilson_lower"] >= 0) & (w["wilson_lower"] <= 1)).all()
    assert (w["wilson_lower"] <= rate + 1e-12).all()
    # descending by bound
    assert (w["wilson_lower"].to_numpy()[:-1]
            >= w["wilson_lower"].to_numpy()[1:] - 1e-12).all()

    bs = em.queries()["poisson_bootstrap"](sf)
    assert len(bs) == 32
    # resample means scatter around the true mean within a few sds
    import duckdb
    con = duckdb.connect()
    true_mean = con.sql(
        f"SELECT avg(round(o_totalprice * 100)::BIGINT) FROM "
        f"read_parquet('{sf}/orders.parquet')").fetchone()[0]
    assert abs(bs["mean_centi"].mean() - true_mean) < 0.05 * true_mean
    assert bs["mean_centi"].std() > 0      # real resampling variation


@pytest.mark.usefixtures("ray_session")
def test_chunk_digests_matches_duckdb():
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    got = em.queries()["chunk_digests"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ref = con.sql(em.oracle_sql()["chunk_digests"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref.astype({"doc_id": "int64", "chunk_no": "int64",
                    "n_bytes": "int64"}))
    # multi-chunk docs exist and chunk 0 differs from chunk 1
    multi = got[got["chunk_no"] > 0]
    assert len(multi) > 0
