"""Randomized (seeded) brute-force parity for the round-4c operators:
token entropy, OHLC bars, IQR outlier audit, degree histogram,
Jaccard rerank.

The DuckDB oracle rows run over the generated tables; these tests hit
adversarial shapes — empty/None texts, ts ties forcing the id
tie-break, negative values, singleton groups — against row-at-a-time
references.
"""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

VOCAB = ["merge", "window", "spark", "hash", "sort", "join", "scan",
         "batch", "row", "key"]


def _texts(rng, n):
    out = []
    for i in range(n):
        if i % 17 == 0:
            out.append("")
        elif i % 23 == 0:
            out.append(None)
        else:
            k = int(rng.integers(1, 40))
            out.append(" ".join(rng.choice(VOCAB, k)))
    return out


@pytest.mark.usefixtures("ray_session")
def test_token_entropy_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.text_analysis import _GRAM_TOKEN, token_entropy

    rng = np.random.Generator(np.random.PCG64(11))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": _texts(rng, 200)})

    got = (token_entropy(rd.from_pandas(df.copy()))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def ref(t):
        ws = _GRAM_TOKEN.findall((t or "").lower())
        n = len(ws)
        if n == 0:
            return 0, 0
        L = lambda k: math.floor(math.log(k) * 1_000_000)  # noqa: E731
        return n, n * L(n) - sum(c * L(c) for c in Counter(ws).values())

    exp = pd.DataFrame([(i, *ref(t)) for i, t in zip(df["doc_id"],
                                                     df["text"])],
                       columns=["doc_id", "n_tokens", "entropy_micro"])
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 9])
def test_ohlc_bars_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import ohlc_bars

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    # coarse ts grid -> many exact-ts ties exercising the id tie-break;
    # values signed to exercise half-away rounding on negatives
    ts = pd.to_datetime(
        rng.integers(0, 5 * 86_400, n) * 1_000_000, unit="us")
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype("int64"),
        "ts": ts,
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.normal(0, 50, n), 2),
    })

    got = (ohlc_bars(rd.from_pandas(df.copy()), key_col="event_type")
           .to_pandas().sort_values(["event_type", "bucket"])
           .reset_index(drop=True))

    b = df.copy()
    b["us"] = b["ts"].astype("datetime64[us]").astype("int64")
    b["bucket"] = b["us"] // 86_400_000_000
    b["vc"] = np.round(b["value"] * 100).astype("int64")  # .5 never hit
    b = b.sort_values(["us", "event_id"], kind="mergesort")
    exp = (b.groupby(["event_type", "bucket"], sort=True)
           .agg(open_centi=("vc", "first"), high_centi=("vc", "max"),
                low_centi=("vc", "min"), close_centi=("vc", "last"),
                n=("vc", "size"), sum_centi=("vc", "sum"))
           .reset_index())
    exp = exp[["event_type", "bucket", "open_centi", "high_centi",
               "low_centi", "close_centi", "n", "sum_centi"]]
    for c in exp.columns.drop("event_type"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_iqr_outliers_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import iqr_outliers

    rng = np.random.Generator(np.random.PCG64(5))
    n = 900
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr", "xx"],
                           n, p=[0.5, 0.3, 0.198, 0.002]),
        "n_chars": rng.integers(0, 10_000, n).astype("int64"),
    })

    got = (iqr_outliers(rd.from_pandas(df.copy()), "lang", "n_chars")
           .to_pandas().sort_values("lang").reset_index(drop=True))

    rows = []
    for k, g in df.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        m = len(v)
        q1 = int(v[min(m - 1, max(0, math.ceil(0.25 * m) - 1))])
        q3 = int(v[min(m - 1, max(0, math.ceil(0.75 * m) - 1))])
        lo2, hi2 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
        v2 = 2 * g["n_chars"].to_numpy()
        rows.append((k, lo2, hi2, m, int(((v2 < lo2) | (v2 > hi2)).sum())))
    exp = pd.DataFrame(rows, columns=["lang", "lo2", "hi2", "n",
                                      "n_outliers"])
    for c in exp.columns.drop("lang"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_degree_histogram_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.graph import degree_histogram

    rng = np.random.Generator(np.random.PCG64(13))
    e = {(int(a), int(b)) for a, b in rng.integers(0, 60, (500, 2))
         if a < b}
    df = pd.DataFrame(sorted(e), columns=["u", "v"]).astype("int64")

    got = (degree_histogram(rd.from_pandas(df.copy()))
           .to_pandas().sort_values("degree").reset_index(drop=True))

    deg = Counter()
    for a, b in e:
        deg[a] += 1
        deg[b] += 1
    hist = Counter(deg.values())
    exp = pd.DataFrame(sorted(hist.items()),
                       columns=["degree", "n_nodes"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_jaccard_rerank_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.search_query import jaccard_rerank

    rng = np.random.Generator(np.random.PCG64(21))
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": _texts(rng, 300)})
    terms = ["merge", "window", "hash"]

    got = (jaccard_rerank(rd.from_pandas(df.copy()), terms, k=15)
           .to_pandas().sort_values(["doc_id"]).reset_index(drop=True))

    qset = set(terms)
    cand = []
    for i, t in zip(df["doc_id"], df["text"]):
        toks = set((t or "").lower().split())
        inter = len(qset & toks)
        if inter:
            uni = len(toks) + len(qset) - inter
            cand.append((int(i), inter, uni, inter * 1_000_000 // uni))
    cand.sort(key=lambda r: (-r[3], r[0]))
    exp = (pd.DataFrame(cand[:15], columns=["doc_id", "inter", "uni",
                                            "score_micro"])
           .sort_values("doc_id").reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_rolling_outliers_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import rolling_outliers

    rng = np.random.Generator(np.random.PCG64(17))
    n = 800
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 3000, n) * 1_000_000,
                             unit="us"),
        "user_id": rng.integers(0, 12, n).astype("int64"),
        # mostly flat with injected spikes so outliers actually exist
        "value": np.where(rng.random(n) < 0.03,
                          rng.normal(0, 500, n),
                          rng.normal(10, 1, n)).round(2),
    })
    k = 20

    got = (rolling_outliers(rd.from_pandas(df.copy()), k=k, z=3,
                            n_parts=5)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    b = df.copy()
    b["us"] = b["ts"].astype("datetime64[us]").astype("int64")
    b["c"] = np.round(b["value"] * 100).astype("int64")
    rows = []
    for uid, g in b.groupby("user_id"):
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        c = g["c"].to_numpy()
        for i in range(len(c)):
            w = c[max(0, i - k + 1):i + 1]
            nw, s, q = len(w), int(w.sum()), int((w * w).sum())
            if (nw * int(c[i]) - s) ** 2 > 9 * (nw * q - s * s):
                rows.append((int(g["event_id"].iloc[i]), int(uid),
                             int(c[i]), nw))
    exp = (pd.DataFrame(rows, columns=["event_id", "user_id", "v_centi",
                                       "n_win"])
           .sort_values("event_id").reset_index(drop=True).astype("int64"))
    assert len(exp) > 0            # the spikes must produce flags
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k,seed", [(2, 29), (3, 31)])
def test_kcore_matches_bruteforce(k, seed):
    import ray.data as rd

    from vyntr_ray.stages.graph import kcore_nodes

    rng = np.random.Generator(np.random.PCG64(seed))
    e = {(int(a), int(b)) for a, b in rng.integers(0, 80, (400, 2))
         if a < b}
    df = pd.DataFrame(sorted(e), columns=["u", "v"]).astype("int64")

    stats = {}
    got = (kcore_nodes(rd.from_pandas(df.copy()), k=k, n_rounds=30,
                       _stats=stats)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # reference: peel to the true fixpoint
    edges = set(e)
    while True:
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        bad = {x for x in deg if deg[x] < k}
        if not bad:
            break
        edges = {(a, b) for a, b in edges
                 if a not in bad and b not in bad}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    exp = (pd.DataFrame(sorted(deg.items()), columns=["node", "degree"])
           .astype("int64"))
    assert stats["rounds"] < 30    # converged inside the round budget
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_cdc_apply_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.joins import cdc_apply

    rng = np.random.Generator(np.random.PCG64(41))
    base = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "val": rng.integers(0, 1000, 50).astype("int64")})
    nc = 300
    chg = pd.DataFrame({
        # keys 40..69: 40-49 update/delete base rows, 50-69 are inserts
        "k": rng.integers(40, 70, nc).astype("int64"),
        "val": rng.integers(1000, 2000, nc).astype("int64"),
        "op": rng.choice(["U", "D"], nc),
        "seq_us": rng.integers(0, 40, nc).astype("int64"),  # many ties
        "seq_id": np.arange(nc, dtype=np.int64),
    })

    got = (cdc_apply(rd.from_pandas(base.copy()),
                     rd.from_pandas(chg.copy()),
                     key_col="k", val_col="val", n_parts=7)
           .to_pandas().sort_values("k").reset_index(drop=True))

    state = dict(zip(base["k"], base["val"]))
    for _, r in chg.sort_values(["seq_us", "seq_id"]).iterrows():
        if r["op"] == "D":
            state.pop(int(r["k"]), None)
        else:
            state[int(r["k"])] = int(r["val"])
    exp = pd.DataFrame(sorted(state.items()),
                       columns=["k", "val"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_zorder_export_roundtrip_and_pruning(tmp_path):
    import ray.data as rd

    from vyntr_ray.sources.zonemap import (_interleave_bits, zorder_export,
                                           zorder_lookup)

    rng = np.random.Generator(np.random.PCG64(47))
    n = 4000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 1 << 10, n).astype("int64"),
        "y": rng.integers(0, 1 << 10, n).astype("int64"),
    })
    out = str(tmp_path / "zorder")
    man = zorder_export(rd.from_pandas(df.copy()), out, "x", "y",
                        bits=10, width=1 << 8)

    # manifest is exact: per-bucket min/max of z and both dims
    z = _interleave_bits(df["x"].to_numpy(), df["y"].to_numpy(), 10)
    b = df.assign(z=z, bucket=z // (1 << 8))
    exp = (b.groupby("bucket").agg(min_z=("z", "min"), max_z=("z", "max"),
                                   min_x=("x", "min"), max_x=("x", "max"),
                                   min_y=("y", "min"), max_y=("y", "max"),
                                   n=("z", "size"))
           .reset_index().astype("int64"))
    pd.testing.assert_frame_equal(
        man.sort_values("bucket").reset_index(drop=True), exp)

    # rectangle probe: correct rows AND actually pruned files
    stats = {}
    got = (zorder_lookup(out, "x", "y", (100, 160), (300, 360),
                         _stats=stats)
           .sort_values("rid").reset_index(drop=True))
    ref = (df[(df["x"].between(100, 160)) & (df["y"].between(300, 360))]
           .sort_values("rid").reset_index(drop=True))
    assert list(got["rid"]) == list(ref["rid"])
    assert stats["files_read"] < stats["files_total"] * 0.5, stats


@pytest.mark.usefixtures("ray_session")
def test_key_skew_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import key_skew

    rng = np.random.Generator(np.random.PCG64(53))
    # zipf-ish skew so the top-k is meaningful; ties at the cut
    keys = np.concatenate([
        np.repeat(np.arange(5), 80),
        rng.integers(5, 200, 1500),
    ]).astype("int64")
    df = pd.DataFrame({"k": rng.permutation(keys)})

    got = (key_skew(rd.from_pandas(df.copy()), "k", topk=10)
           .to_pandas().reset_index(drop=True))

    c = df["k"].value_counts()
    top = sorted(((int(cnt), int(k)) for k, cnt in c.items()),
                 key=lambda t: (-t[0], t[1]))[:10]
    assert list(got["k"]) == [k for _, k in top]
    assert list(got["cnt"]) == [cnt for cnt, _ in top]
    assert got["n_rows"].iloc[0] == len(df)
    assert got["n_keys"].iloc[0] == c.size
    assert got["max_cnt"].iloc[0] == int(c.max())
    assert got["sum_sq"].iloc[0] == int((c.to_numpy() ** 2).sum())


@pytest.mark.usefixtures("ray_session")
def test_dedup_incremental_drops_snapshot_matches():
    import ray.data as rd

    from vyntr_ray.stages.joins import anti_join
    from vyntr_ray.stages.text_analysis import fingerprint_batch

    import pyarrow as pa

    # new crawl re-fetches 30 old docs (same content, new ids) + 20 new
    old = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                        "text": [f"old doc {i}  spaced" for i in range(30)]})
    new = pd.DataFrame({
        "doc_id": np.arange(100, 150, dtype=np.int64),
        "text": ([f"old DOC {i}  spaced" for i in range(30)]  # case/ws dup
                 + [f"fresh doc {i}" for i in range(20)]),
    })
    fp = lambda d: rd.from_pandas(d).map_batches(  # noqa: E731
        fingerprint_batch, batch_format="pyarrow")
    got = (anti_join(fp(new.copy()), fp(old.copy()),
                     key_col="fingerprint", left_payload=["doc_id"],
                     types={"fingerprint": pa.string(),
                            "doc_id": pa.int64()})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == list(range(130, 150))


@pytest.mark.usefixtures("ray_session")
def test_bfs_hops_block_tasks_parity():
    import ray.data as rd

    from vyntr_ray.stages.graph import bfs_hops

    rng = np.random.Generator(np.random.PCG64(61))
    e = pd.DataFrame({"u": rng.integers(0, 80, 300),
                      "v": rng.integers(0, 80, 300)}).drop_duplicates()
    seeds = pd.DataFrame({"node": np.array([3, 7, 500], dtype="int64"),
                          "hop": np.array([0, 0, 0], dtype="int64")})
    a = (bfs_hops(rd.from_pandas(e.copy(), override_num_blocks=4),
                  rd.from_pandas(seeds.copy()), k=3, block_tasks=True)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (bfs_hops(rd.from_pandas(e.copy(), override_num_blocks=4),
                  rd.from_pandas(seeds.copy()), k=3, block_tasks=False)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))
    assert 500 in set(a["node"])   # isolated seed survives both paths


@pytest.mark.usefixtures("ray_session")
def test_group_topk_ties_includes_boundary_ties():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import group_topk_ties

    rng = np.random.Generator(np.random.PCG64(71))
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        # tiny value domain -> massive ties, incl. at the k boundary
        "v": rng.integers(0, 6, n).astype("int64"),
        "i": np.arange(n, dtype=np.int64),
    })
    k = 3
    got = (group_topk_ties(rd.from_pandas(df.copy()), "g", "v", "i", k=k)
           .to_pandas().sort_values(["g", "i"]).reset_index(drop=True))

    keep = []
    for g, sub in df.groupby("g"):
        r = sub["v"].rank(method="min", ascending=False)
        s = sub[r <= k].copy()
        s["rank"] = r[r <= k].astype("int64")
        keep.append(s)
    exp = (pd.concat(keep).sort_values(["g", "i"])
           .reset_index(drop=True)[["g", "v", "i", "rank"]])
    assert len(exp) > 3 * k          # ties actually exceeded k rows
    pd.testing.assert_frame_equal(
        got[["g", "v", "i", "rank"]].astype({"v": "int64", "i": "int64",
                                             "rank": "int64"}), exp)


@pytest.mark.usefixtures("ray_session")
def test_range_export_balanced_under_skew(tmp_path):
    import ray.data as rd

    from vyntr_ray.sources.zonemap import range_export

    rng = np.random.Generator(np.random.PCG64(73))
    # pathological skew: 70% of keys inside one narrow band — fixed
    # width bucketing would put them all in one file
    k = np.concatenate([
        rng.integers(1000, 1010, 7000),
        rng.integers(0, 100_000, 3000)]).astype("int64")
    df = pd.DataFrame({"rid": np.arange(len(k), dtype=np.int64), "k": k})
    out = str(tmp_path / "range")
    man = range_export(rd.from_pandas(df.copy()), out, "k", n_buckets=8)

    assert len(man) == 8
    # ties can pool at a splitter; still no bucket beyond tie mass
    assert man["n"].max() <= int((df["k"].value_counts().max())
                                 + len(df) / 8 + 1)
    assert man["n"].sum() == len(df)
    # round-trip: buckets are disjoint, sorted, cover everything
    import pyarrow.parquet as pq
    allk = []
    prev_max = None
    for _, r in man.iterrows():
        t = pq.read_table(out + f"/rbucket={int(r['bucket']):08d}.parquet")
        kk = t["k"].to_numpy()
        assert kk.min() == r["min_key"] and kk.max() == r["max_key"]
        if prev_max is not None:
            assert kk.min() >= prev_max
        prev_max = kk.max()
        allk.append(kk)
    assert sorted(np.concatenate(allk)) == sorted(df["k"])


@pytest.mark.usefixtures("ray_session")
def test_assoc_rules_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.baskets import assoc_rules

    rng = np.random.Generator(np.random.PCG64(79))
    n = 1200
    df = pd.DataFrame({"g": rng.integers(0, 150, n).astype("int64"),
                       "i": rng.integers(0, 25, n).astype("int64")})

    got = (assoc_rules(rd.from_pandas(df.copy()), "g", "i", k=20)
           .to_pandas().reset_index(drop=True))

    d = df.drop_duplicates()
    N = d["g"].nunique()
    supp = d.groupby("i").size().to_dict()
    pairs = Counter()
    for _, basket in d.groupby("g"):
        items = sorted(basket["i"])
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                if items[x] != items[y]:
                    pairs[(items[x], items[y])] += 1
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp = pd.DataFrame([
        {"item_a": a, "item_b": b, "n_ab": c,
         "n_a": supp[a], "n_b": supp[b],
         "conf_ab_micro": c * 1_000_000 // supp[a],
         "conf_ba_micro": c * 1_000_000 // supp[b],
         "lift_micro": c * N * 1_000_000 // (supp[a] * supp[b])}
        for (a, b), c in top]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_srp_partition_matches_bruteforce_and_collides_similar():
    import ray.data as rd

    from vyntr_ray.stages.similarity import srp_partition, srp_planes

    rng = np.random.Generator(np.random.PCG64(83))
    n, dim, planes = 120, 16, 8
    base = rng.normal(0, 1, (n, dim)).astype(np.float32)
    # rows 2i+1 are tiny perturbations of rows 2i -> should mostly collide
    base[1::2] = base[0::2] + rng.normal(0, 1e-4, (n // 2, dim)) \
        .astype(np.float32)
    import pyarrow as pa
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(base.reshape(-1), pa.float32()), dim).cast(
                pa.list_(pa.float32())),
    })

    got = (srp_partition(rd.from_arrow(tbl), n_planes=planes,
                         dim=dim)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    w = srp_planes(planes, dim)
    from vyntr_ray.rounding import round_half_away
    vm = round_half_away(base.astype(np.float64) * 1e6).astype(np.int64)
    dots = vm @ w
    exp_bucket = ((dots >= 0).astype(np.int64)
                  * (1 << np.arange(planes))).sum(axis=1)
    assert list(got["bucket"]) == list(exp_bucket)

    # near-duplicates land together almost always
    same = (exp_bucket[0::2] == exp_bucket[1::2]).mean()
    assert same > 0.9, same


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [5, 11])
def test_window_join_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.joins import window_join

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 400
    mk = lambda off: pd.DataFrame({  # noqa: E731
        "event_id": np.arange(off, off + n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 500, n) * 1_000_000,
                             unit="us"),
        "user_id": rng.integers(0, 15, n).astype("int64"),
    })
    left, right = mk(0), mk(10_000)
    win = 60

    got = (window_join(rd.from_pandas(left.copy()),
                       rd.from_pandas(right.copy()),
                       key_col="user_id", ts_col="ts",
                       id_col="event_id", window_s=win, n_parts=6)
           .to_pandas().sort_values(["left_id", "right_id"])
           .reset_index(drop=True))

    lu = left.assign(us=left["ts"].astype("datetime64[us]")
                     .astype("int64"))
    ru = right.assign(us=right["ts"].astype("datetime64[us]")
                      .astype("int64"))
    rows = []
    for _, lr in lu.iterrows():
        m = ru[(ru["user_id"] == lr["user_id"])
               & (ru["us"] >= lr["us"] - win * 1_000_000)
               & (ru["us"] <= lr["us"])]
        for _, rr in m.iterrows():
            rows.append((int(lr["user_id"]), int(lr["event_id"]),
                         int(rr["event_id"]),
                         int(lr["us"] - rr["us"])))
    exp = (pd.DataFrame(rows, columns=["user_id", "left_id", "right_id",
                                       "gap_us"])
           .sort_values(["left_id", "right_id"])
           .reset_index(drop=True).astype("int64"))
    assert len(exp) > 100          # dense ts grid -> real pair volume
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_dataset_split_stable_under_corpus_growth():
    import ray.data as rd

    from vyntr_ray.stages.sampling import dataset_split

    small = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    big = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    a = (dataset_split(rd.from_pandas(small)).to_pandas()
         .set_index("doc_id")["split"])
    b = (dataset_split(rd.from_pandas(big)).to_pandas()
         .set_index("doc_id")["split"])
    # growth never reassigns an existing key (the leakage guarantee)
    pd.testing.assert_series_equal(a, b.loc[a.index])
    frac = (b == "train").mean()
    assert 0.7 < frac < 0.9, frac
    assert set(b.unique()) == {"train", "val", "test"}


@pytest.mark.usefixtures("ray_session")
def test_chi2_independence_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import chi2_independence

    rng = np.random.Generator(np.random.PCG64(89))
    n = 800
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n, p=[0.6, 0.3, 0.1]),
        # dependence + a combo that never occurs (zero cell)
        "b": rng.choice(["p", "q"], n),
    })
    df.loc[(df["a"] == "z") & (df["b"] == "q"), "b"] = "p"  # zero cell

    got = (chi2_independence(rd.from_pandas(df.copy()), "a", "b")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    ct = df.groupby(["a", "b"]).size()
    rt = df.groupby("a").size()
    cs = df.groupby("b").size()
    N = len(df)
    rows = []
    for a in sorted(rt.index):
        for b in sorted(cs.index):
            o = int(ct.get((a, b), 0))
            rr, cc = int(rt[a]), int(cs[b])
            rows.append((a, b, o, rr, cc, N,
                         (o * N - rr * cc) ** 2 * 1_000_000
                         // (N * rr * cc)))
    exp = pd.DataFrame(rows, columns=["a", "b", "o", "r", "c", "n",
                                      "contrib_micro"])
    assert (exp["o"] == 0).any()       # the zero cell is in the grid
    for c in ["o", "r", "c", "n", "contrib_micro"]:
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_copartition_join_matches_pandas(tmp_path):
    import ray.data as rd

    from vyntr_ray.sources.zonemap import (copartition_join,
                                           export_splitters, range_export)

    rng = np.random.Generator(np.random.PCG64(97))
    dim = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "attr": rng.integers(0, 9, 100).astype("int64")})
    fact = pd.DataFrame({
        "fid": np.arange(1500, dtype=np.int64),
        "k": rng.integers(0, 120, 1500).astype("int64"),  # some miss
    })
    da, db = str(tmp_path / "dim"), str(tmp_path / "fact")
    splits = export_splitters(rd.from_pandas(dim.copy()), "k",
                              n_buckets=5)
    range_export(rd.from_pandas(dim.copy()), da, "k", splits=splits)
    range_export(rd.from_pandas(fact.copy()), db, "k", splits=splits)

    stats = {}
    got = (copartition_join(da, db, "k", _stats=stats)
           .to_pandas().sort_values(["fid"]).reset_index(drop=True))
    exp = (dim.merge(fact, on="k").sort_values(["fid"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "attr", "fid"]].astype("int64"),
        exp[["k", "attr", "fid"]].astype("int64"))
    assert stats["bucket_pairs"] <= 5     # one task per aligned bucket


@pytest.mark.usefixtures("ray_session")
def test_novelty_scores_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.text_analysis import novelty_scores

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "a b c d e",          # shares 'a b c'/'b c d' with doc 1
            "a b c d x",
            "p q r s t",          # fully novel
            "a b",                # too short for trigrams -> dropped
            "",                   # empty -> dropped
            "a b c a b c a b",    # repeated grams count once per doc
        ],
    })
    got = (novelty_scores(rd.from_pandas(docs.copy()), n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    tri = lambda t: {" ".join(t.split()[i:i + 3])  # noqa: E731
                     for i in range(len(t.split()) - 2)}
    sets = {i: tri(t) for i, t in zip(docs["doc_id"], docs["text"])
            if tri(t)}
    from collections import Counter
    dfc = Counter(g for s in sets.values() for g in s)
    rows = [(i, len(s), sum(dfc[g] == 1 for g in s),
             sum(dfc[g] == 1 for g in s) * 1_000_000 // len(s))
            for i, s in sorted(sets.items())]
    exp = pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_unique",
                                      "novelty_micro"]).astype("int64")
    assert 3 not in set(got["doc_id"]) and 4 not in set(got["doc_id"])
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 19])
def test_nearest_join_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.joins import nearest_join

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 350
    mk = lambda off: pd.DataFrame({  # noqa: E731
        # coarse grid -> exact-equal ts, equidistant ties, dup right ts
        "event_id": np.arange(off, off + n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 60, n) * 1_000_000,
                             unit="us"),
        "user_id": rng.integers(0, 10, n).astype("int64"),
    })
    left, right = mk(0), mk(10_000)

    got = (nearest_join(rd.from_pandas(left.copy()),
                        rd.from_pandas(right.copy()),
                        key_col="user_id", ts_col="ts",
                        id_col="event_id", n_parts=5)
           .to_pandas().sort_values("left_id").reset_index(drop=True))

    lu = left.assign(us=left["ts"].astype("datetime64[us]")
                     .astype("int64"))
    ru = right.assign(us=right["ts"].astype("datetime64[us]")
                      .astype("int64"))
    rows = []
    for _, lr in lu.iterrows():
        m = ru[ru["user_id"] == lr["user_id"]]
        if not len(m):
            continue
        best = min(m.itertuples(),
                   key=lambda rr: (abs(int(lr["us"]) - rr.us), rr.us,
                                   rr.event_id))
        rows.append((int(lr["user_id"]), int(lr["event_id"]),
                     int(best.event_id), int(lr["us"]) - int(best.us)))
    exp = (pd.DataFrame(rows, columns=["user_id", "left_id", "right_id",
                                       "gap_us"])
           .sort_values("left_id").reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_winsorized_stats_matches_bruteforce():
    import math

    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import winsorized_stats

    rng = np.random.Generator(np.random.PCG64(101))
    n = 700
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(-1000, 100_000, n).astype("int64"),
    })
    got = (winsorized_stats(rd.from_pandas(df.copy()), "g", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))

    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        m = len(v)
        sel = lambda q: int(v[min(m - 1, max(0, math.ceil(q * m) - 1))])  # noqa: E731
        lo, hi = sel(0.05), sel(0.95)
        w = np.clip(sub["v"].to_numpy(), lo, hi)
        rows.append((g, lo, hi, m, int((w != sub["v"].to_numpy()).sum()),
                     int(w.sum())))
    exp = pd.DataFrame(rows, columns=["g", "lo", "hi", "n", "n_clipped",
                                      "wsum"])
    for c in exp.columns.drop("g"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_rolling_median_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import rolling_median

    rng = np.random.Generator(np.random.PCG64(103))
    n = 600
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 2000, n) * 1_000_000,
                             unit="us"),
        "user_id": rng.integers(0, 9, n).astype("int64"),
        "value": np.round(rng.normal(0, 40, n), 2),
    })
    k = 4          # even window -> lower-median selection exercised

    got = (rolling_median(rd.from_pandas(df.copy()), k=k, n_parts=5)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    b = df.copy()
    b["us"] = b["ts"].astype("datetime64[us]").astype("int64")
    b["vc"] = np.round(b["value"] * 100).astype("int64")
    rows = []
    for uid, g in b.groupby("user_id"):
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        vc = g["vc"].to_numpy()
        for i in range(len(vc)):
            w = np.sort(vc[max(0, i - k + 1):i + 1])
            m = len(w)
            rows.append((int(g["event_id"].iloc[i]), int(uid),
                         int(w[-(-m // 2) - 1])))   # ceil(m/2)-1
    exp = (pd.DataFrame(rows, columns=["event_id", "user_id",
                                       "med_centi"])
           .sort_values("event_id").reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
