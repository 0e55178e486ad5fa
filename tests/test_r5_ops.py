"""Round-5 operator tests: butterfly_count, kmv_distinct,
dup_rate_by_group — randomized brute-force parity (the repo's standard
evidence next to each op's DuckDB oracle)."""
from __future__ import annotations

import hashlib
import itertools
from collections import Counter

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_butterfly_count_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.baskets import pair_edges
    from vyntr_ray.stages.graph import butterfly_count

    rng = np.random.Generator(np.random.PCG64(11))
    rows = pd.DataFrame({
        "g": rng.integers(0, 40, 500),
        "i": rng.integers(0, 25, 500)}).drop_duplicates()
    edges = pair_edges(rd.from_pandas(rows).repartition(4), "g", "i",
                       min_count=1)
    got = int(butterfly_count(edges)["n_butterflies"][0])

    # brute force: count 2x2 bicliques (pairs of groups x pairs of items)
    members = rows.groupby("g")["i"].apply(set).to_dict()
    want = 0
    for ga, gb in itertools.combinations(sorted(members), 2):
        c = len(members[ga] & members[gb])
        want += c * (c - 1) // 2
    assert got == want and want > 0


@pytest.mark.usefixtures("ray_session")
def test_kmv_distinct_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.sketches import kmv_distinct

    rng = np.random.Generator(np.random.PCG64(3))
    vals = rng.integers(0, 5000, 20_000)     # ~4.9k distinct, > k
    ds = rd.from_arrow(pa.table({"user_id": pa.array(vals, pa.int64())}))
    k = 256
    got = kmv_distinct(ds.repartition(6), "user_id", k=k)

    hs = sorted({int.from_bytes(
        hashlib.md5(str(v).encode()).digest()[:8], "little")
        for v in set(vals.tolist())})
    want_est = (k - 1) * (1 << 64) // hs[k - 1]
    n_true = len(set(vals.tolist()))
    assert int(got["n_exact"][0]) == n_true
    assert int(got["kmv_est"][0]) == want_est
    # the estimator is actually in the right ballpark (±15% at k=256)
    assert abs(want_est - n_true) / n_true < 0.15

    # fewer distinct values than k ⇒ the sketch IS exact
    small = rd.from_arrow(pa.table({"user_id": pa.array([1, 2, 3] * 50,
                                                        pa.int64())}))
    gs = kmv_distinct(small, "user_id", k=k)
    assert int(gs["kmv_est"][0]) == 3 == int(gs["n_exact"][0])


@pytest.mark.usefixtures("ray_session")
def test_dup_rate_by_group_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.dedup import dup_rate_by_group

    rng = np.random.Generator(np.random.PCG64(5))
    n = 400
    texts = [f"text body {int(i)}" for i in rng.integers(0, 120, n)]
    src = [f"s{int(i)}" for i in rng.integers(0, 5, n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts, "source": src})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = dup_rate_by_group(ds.repartition(5), "source")

    ref = df.sort_values("doc_id").copy()
    ref["d"] = ref.duplicated("text", keep="first").astype("int64")
    want = (ref.groupby("source", as_index=False)
            .agg(n_docs=("d", "size"), n_dups=("d", "sum")))
    want["dup_rate_micro"] = (want["n_dups"] * 1_000_000
                              // want["n_docs"]).astype("int64")
    want = want.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64", "n_dups": "int64"}), want)
    assert (want["n_dups"] > 0).any()


@pytest.mark.usefixtures("ray_session")
def test_containment_pairs_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.dedup import (containment_pairs, word_shingles,
                                        _stable_hash64)

    rng = np.random.Generator(np.random.PCG64(17))
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(rng.choice(vocab, rng.integers(6, 25)))
    # planted subset dups: doc 100+i = doc i minus its last word
    for i in range(5):
        docs[100 + i] = docs[i].rsplit(" ", 1)[0]
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = containment_pairs(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(4), df_cap=16, thr_ppm=700_000).to_pandas()

    # brute force with the SAME df cap on intersections
    sets = {i: set(_stable_hash64(word_shingles(t)).tolist())
            for i, t in docs.items()}
    dfc = Counter(s for v in sets.values() for s in v)
    kept = {i: {s for s in v if dfc[s] <= 16} for i, v in sets.items()}
    want = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            inter = len(kept[a] & kept[b])
            ppm = inter * 1_000_000 // min(len(sets[a]), len(sets[b]))
            if ppm >= 700_000:
                want.append((a, b, ppm))
    wdf = pd.DataFrame(want, columns=["a", "b", "containment_ppm"])
    pd.testing.assert_frame_equal(
        got.sort_values(["a", "b"]).reset_index(drop=True).astype("int64"),
        wdf.astype("int64"))
    # every planted subset pair surfaces at containment 1.0
    planted = got[(got["b"] >= 100)]
    assert len(planted) >= 5
    assert (planted[planted["b"] - 100 == planted["a"]]
            ["containment_ppm"] == 1_000_000).all()


@pytest.mark.usefixtures("ray_session")
def test_join_size_est_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.sketches import join_size_est
    from vyntr_ray.state.filters import _hash64

    rng = np.random.Generator(np.random.PCG64(23))
    a = rng.integers(0, 60, 3000).astype(np.int64)
    b = rng.integers(30, 90, 2000).astype(np.int64)   # partial overlap
    dsa = rd.from_arrow(pa.table({"x": pa.array(a)})).repartition(5)
    dsb = rd.from_arrow(pa.table({"y": pa.array(b)})).repartition(3)
    got = join_size_est(dsa, dsb, "x", "y", d=4, w=64)  # small w → collisions

    ca, cb = Counter(a.tolist()), Counter(b.tolist())
    true = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert int(got["true_rows"][0]) == true

    est_rows = []
    for r in range(4):
        sa, sb = np.zeros(64, object), np.zeros(64, object)
        for k, c in ca.items():
            sa[int(_hash64([f"{r}:{k}"])[0] % np.uint64(64))] += c
        for k, c in cb.items():
            sb[int(_hash64([f"{r}:{k}"])[0] % np.uint64(64))] += c
        est_rows.append(int((sa * sb).sum()))
    assert int(got["est_rows"][0]) == min(est_rows)
    assert int(got["est_rows"][0]) >= true     # CMS overestimates


@pytest.mark.usefixtures("ray_session")
def test_mutual_nn_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.similarity import mutual_nn

    rng = np.random.Generator(np.random.PCG64(29))
    n, d = 60, 8
    mat = rng.standard_normal((n, d))
    # plant two exact-duplicate pairs (guaranteed mutual at cos 1.0)
    mat[50] = mat[10]
    mat[51] = mat[20]
    tab = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array([r.tolist() for r in mat],
                                          pa.list_(pa.float32()))})
    got = mutual_nn(rd.from_arrow(tab).repartition(4))

    m32 = np.stack(tab["embedding"].to_pylist()).astype(np.float64)
    norm = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 4)
    np.fill_diagonal(sims, -np.inf)
    nn = {}
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-sims[i, j], j))
        nn[i] = order[0]
    want = sorted((a, b) for a, b in nn.items()
                  if a < b and nn[b] == a)
    assert list(zip(got["a"], got["b"])) == want
    pairs = dict(zip(got["a"], got["b"]))
    assert pairs.get(10) == 50 and pairs.get(20) == 51
    sc = dict(zip(zip(got["a"], got["b"]), got["score"]))
    assert sc[(10, 50)] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_bow_dedup_order_invariance(sf_dir="/root/testdata/sf0.001"):
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.dedup import dedup_by_key
    import re

    tok = re.compile(r"[a-z0-9]+")

    def bow_key(batch: pa.Table) -> pa.Array:
        return pa.array([hashlib.md5(" ".join(sorted(
            tok.findall((t or "").lower()))).encode()).hexdigest()
            for t in batch["text"].to_pylist()], pa.string())

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["alpha beta gamma", "gamma Alpha beta",   # shuffled dup
                 "alpha beta", "delta"]})
    got = (dedup_by_key(rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)), bow_key,
        key_name="bow_md5").to_pandas()
        .sort_values("keep_id").reset_index(drop=True))
    # docs 1 and 2 collapse (order + case invariant); 3 and 4 survive
    assert got["keep_id"].tolist() == [1, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_token_diversity_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd
    import re

    from vyntr_ray.stages.text_analysis import token_diversity

    rng = np.random.Generator(np.random.PCG64(31))
    vocab = [f"tk{i}" for i in range(30)]
    rows = []
    for i in range(200):
        src = f"s{int(rng.integers(0, 4))}"
        rows.append((src, " ".join(rng.choice(vocab, rng.integers(3, 20)))))
    rows.append(("mono", "same same same same"))      # near-zero diversity
    df = pd.DataFrame(rows, columns=["source", "text"])
    got = token_diversity(rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(5))

    tok = re.compile(r"[a-z0-9]+")
    want = []
    for src, sub in df.groupby("source"):
        cnt = Counter(t for x in sub["text"] for t in tok.findall(x.lower()))
        n = sum(cnt.values())
        sq = sum(c * c for c in cnt.values())
        want.append((src, n, 1_000_000 - sq * 1_000_000 // (n * n)))
    wdf = (pd.DataFrame(want, columns=["source", "n_tokens",
                                       "diversity_micro"])
           .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, wdf.astype({"n_tokens": "int64", "diversity_micro": "int64"}))
    mono = got.set_index("source").loc["mono", "diversity_micro"]
    assert mono == 0          # single repeated token ⇒ zero diversity
