"""Randomized (seeded) brute-force parity for the round-4c4 operators:
interval coverage, rolling-window distinct counts.

Adversarial shapes: dense starts (many ties), zero-length spans,
singleton keys, multi-day gaps — against row-at-a-time references.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 7])
def test_interval_coverage_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import interval_coverage

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 17, n),
        "s_us": rng.integers(0, 50, n).astype("int64"),
    })
    df["e_us"] = df["s_us"] + rng.integers(0, 9, n).astype("int64")

    got = (interval_coverage(rd.from_pandas(df.copy()), key_col="k",
                             n_parts=5)
           .to_pandas().sort_values("k").reset_index(drop=True))

    rows = []
    for k, g in df.groupby("k"):
        ivs = sorted(zip(g["s_us"], g["e_us"]))
        islands = []
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
        islands.append((cur_s, cur_e))
        lens = [e - s for s, e in islands]
        rows.append((k, len(islands), sum(lens), max(lens)))
    exp = (pd.DataFrame(rows, columns=["k", "n_iv", "covered_us",
                                       "max_iv_us"])
           .astype("int64").sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_window_distinct_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import window_distinct

    rng = np.random.Generator(np.random.PCG64(3))
    n = 500
    day = 86_400_000_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(
            rng.integers(0, 20 * day, n), unit="us"),
    })

    got = window_distinct(rd.from_pandas(df.copy()), key_col="user_id",
                          ts_col="ts", n_periods=7)

    us = df["ts"].astype("int64") // 1000  # ns -> us
    d = us // day
    exp_rows = {}
    pairs = set(zip(df["user_id"], d))
    all_days = sorted({dd + i for _, dd in pairs for i in range(7)})
    for day_i in all_days:
        exp_rows[day_i] = len({u for u, dd in pairs
                               if day_i - 6 <= dd <= day_i})
    exp = pd.DataFrame({
        "day_us": np.array(all_days, dtype="int64") * day,
        "n_keys": np.array([exp_rows[x] for x in all_days],
                           dtype="int64")})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_cms_estimates_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.state.filters import _hash64
    from vyntr_ray.stages.sketches import cms_estimates

    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"tok{i:03d}" for i in range(120)] + ["a", "xy"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(300)] + ["", None]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(7)

    d, w = 3, 64                       # tiny w -> force collisions
    got = cms_estimates(ds, d=d, w=w, n_probes=16, min_len=4)

    from collections import Counter
    cnt = Counter()
    for t in texts:
        cnt.update((t or "").split())
    sketch = np.zeros((d, w), np.int64)
    for tok, c in cnt.items():
        for r in range(d):
            b = int(_hash64([f"{r}:{tok}"])[0] % np.uint64(w))
            sketch[r][b] += c
    probes = sorted(t for t in cnt if len(t) >= 4)[:16]
    exp = pd.DataFrame({
        "token": probes,
        "est_cnt": pd.array(
            [min(int(sketch[r][int(_hash64([f'{r}:{t}'])[0]
                                   % np.uint64(w))])
                 for r in range(d)) for t in probes], dtype="int64"),
        "true_cnt": pd.array([cnt[t] for t in probes], dtype="int64")})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    assert (got["est_cnt"] >= got["true_cnt"]).all()
    assert (got["est_cnt"] > got["true_cnt"]).any()   # collisions seen


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 5])
def test_sssp_rounds_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.graph import sssp_rounds

    rng = np.random.Generator(np.random.PCG64(seed))
    n_edges, n_nodes = 400, 60
    df = pd.DataFrame({
        "u": rng.integers(0, n_nodes, n_edges).astype("int64"),
        "v": rng.integers(0, n_nodes, n_edges).astype("int64"),
        "w": rng.integers(1, 10, n_edges).astype("int64"),
    })
    df = df[df["u"] != df["v"]].reset_index(drop=True)

    got = (sssp_rounds(rd.from_pandas(df.copy()).repartition(5), k=6)
           .to_pandas().sort_values("node").reset_index(drop=True))

    INF = 1 << 62
    nodes = sorted(set(df["u"]) | set(df["v"]))
    dist = {x: INF for x in nodes}
    dist[min(nodes)] = 0
    for _ in range(6):                      # synchronized rounds
        snap = dict(dist)
        for u, v, w in df.itertuples(index=False):
            if snap[u] < INF:
                dist[v] = min(dist[v], snap[u] + w)
            if snap[v] < INF:
                dist[u] = min(dist[u], snap[v] + w)
    exp = pd.DataFrame(
        [(x, d) for x, d in sorted(dist.items()) if d < INF],
        columns=["node", "dist"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_systematic_sample_parallelism_invariant():
    import hashlib

    import ray.data as rd

    from vyntr_ray.stages.sampling import systematic_sample

    n, k = 517, 10
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "x": np.arange(n, dtype="int64") * 3})

    outs = []
    for parts in (1, 7):
        got = (systematic_sample(rd.from_pandas(df.copy())
                                 .repartition(parts), k=k)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    order = sorted(df["doc_id"],
                   key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(),
                                  v))
    exp = sorted(order[::k])
    assert outs[0]["doc_id"].tolist() == exp
    assert len(outs[0]) == (n + k - 1) // k


@pytest.mark.usefixtures("ray_session")
def test_lift_table_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import lift_table

    rng = np.random.Generator(np.random.PCG64(21))
    n, q = 503, 10                      # non-divisible -> uneven tiles
    df = pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 40, n).astype("int64"),   # heavy ties
        "f": rng.integers(0, 2, n).astype("int64"),
    })

    got = lift_table(rd.from_pandas(df.copy()).repartition(7),
                     value_col="v", flag_col="f", key_col="k", q=q)

    o = df.sort_values(["v", "k"], ascending=[False, True]) \
        .reset_index(drop=True)
    base, rem = divmod(n, q)
    tiles = np.concatenate([np.full(base + (1 if i < rem else 0), i + 1)
                            for i in range(q)])
    o["tile"] = tiles
    exp = (o.groupby("tile", as_index=False)
           .agg(n=("v", "size"), sum_value=("v", "sum"),
                n_flag=("f", "sum")))
    for c in exp.columns:
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [2, 9])
def test_locf_fill_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import locf_fill

    rng = np.random.Generator(np.random.PCG64(seed))
    n, day = 400, 86_400_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 25, n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 15 * day, n), unit="us"),
        "value": rng.normal(0, 3, n),
    })
    # ts ties forcing the id tie-break
    df.loc[1, "ts"] = df.loc[0, "ts"]
    df.loc[1, "user_id"] = df.loc[0, "user_id"]

    got = (locf_fill(rd.from_pandas(df.copy()).repartition(6),
                     n_parts=5)
           .to_pandas().sort_values(["user_id", "day_us"])
           .reset_index(drop=True))

    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64") // 1000
        d = (us // day).to_numpy()
        centi = np.array([round(abs(v) * 100) * (1 if v >= 0 else -1)
                          for v in g["value"]], dtype="int64")
        last = {}
        for dd, vc in zip(d, centi):
            last[dd] = vc                      # (ts, id)-last wins
        cur = None
        for dd in range(d.min(), d.max() + 1):
            if dd in last:
                cur = last[dd]
            rows.append((u, dd * day, cur))
    exp = (pd.DataFrame(rows, columns=["user_id", "day_us", "centi"])
           .astype("int64").sort_values(["user_id", "day_us"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_itemsets3_matches_bruteforce():
    from collections import Counter
    from itertools import combinations

    import ray.data as rd

    from vyntr_ray.stages.baskets import itemsets3

    rng = np.random.Generator(np.random.PCG64(13))
    n = 800
    df = pd.DataFrame({
        "g": rng.integers(0, 120, n).astype("int64"),
        "i": rng.integers(0, 30, n).astype("int64"),
    })

    got = itemsets3(rd.from_pandas(df.copy()).repartition(6),
                    "g", "i", min_count=1, k=40)

    cnt = Counter()
    for _, grp in df.groupby("g"):
        for tri in combinations(sorted(set(grp["i"])), 3):
            cnt[tri] += 1
    rows = sorted(((n_, a, b, c) for (a, b, c), n_ in cnt.items()),
                  key=lambda t: (-t[0], t[1], t[2], t[3]))[:40]
    exp = pd.DataFrame({
        "item_a": pd.array([r[1] for r in rows], dtype="int64"),
        "item_b": pd.array([r[2] for r in rows], dtype="int64"),
        "item_c": pd.array([r[3] for r in rows], dtype="int64"),
        "n": pd.array([r[0] for r in rows], dtype="int64")})
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@pytest.mark.usefixtures("ray_session")
def test_hll_intersect_accuracy_and_invariance():
    import ray.data as rd

    from vyntr_ray.stages.sketches import hll_intersect

    rng = np.random.Generator(np.random.PCG64(4))
    # A = 0..2999, B = 2000..4999 -> true intersection 1000
    a = rng.permutation(np.arange(3000))
    b = rng.permutation(np.arange(2000, 5000))
    df = pd.DataFrame({
        "t": ["A"] * len(a) + ["B"] * len(b),
        "v": np.concatenate([a, b]).astype("int64")})

    outs = []
    for parts in (1, 9):
        outs.append(hll_intersect(
            rd.from_pandas(df.copy()).repartition(parts),
            "t", "v", ga="A", gb="B"))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # blocking-invariant

    r = outs[0].iloc[0]
    assert abs(r["est_a"] - 3000) < 3000 * 0.06
    assert abs(r["est_b"] - 3000) < 3000 * 0.06
    assert abs(r["est_union"] - 5000) < 5000 * 0.06
    assert r["est_intersect"] == r["est_a"] + r["est_b"] - r["est_union"]


@pytest.mark.usefixtures("ray_session")
def test_degree_assortativity_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.graph import degree_assortativity

    rng = np.random.Generator(np.random.PCG64(8))
    n_nodes = 40
    pairs = set()
    while len(pairs) < 150:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    df = pd.DataFrame(sorted(pairs), columns=["u", "v"]).astype("int64")

    got = degree_assortativity(rd.from_pandas(df.copy()).repartition(5))

    from collections import Counter
    deg = Counter(df["u"].tolist()) + Counter(df["v"].tolist())
    xs, ys = [], []
    for u, v in pairs:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    xs, ys = np.array(xs, dtype=np.float64), np.array(ys, np.float64)
    exp = np.corrcoef(xs, ys)[0, 1]
    assert got["m2"].iloc[0] == 2 * len(pairs)
    assert abs(got["assortativity"].iloc[0] - exp) < 1e-6
    # r5: the broadcast-degree (default) and distributed-join tiers
    # fold the identical integer sufficient stats — exact parity
    got_join = degree_assortativity(rd.from_pandas(df.copy())
                                    .repartition(5), broadcast_deg=False)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got_join.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_lsh_index_lookup_roundtrip(tmp_path):
    import ray.data as rd

    from vyntr_ray.stages.dedup import lsh_export, lsh_lookup

    rng = np.random.Generator(np.random.PCG64(6))
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(80)]
    texts.append(" ".join(texts[7].split()[:-2]))   # near-dup of 7
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    out = str(tmp_path / "idx")
    man = lsh_export(rd.from_pandas(df.copy()).repartition(5), out,
                     n_files=8)
    assert man["n_rows"].sum() == len(texts) * 32   # 32 band rows/doc

    hits = lsh_lookup(out, texts[7], threshold=0.5, n_files=8)
    got = set(hits["doc_id"].tolist())
    assert 7 in got and 80 in got                    # self + planted
    assert hits.loc[hits["doc_id"] == 7,
                    "jaccard_ppm"].iloc[0] == 1_000_000
    # random 30-token docs over a 400-word vocab share almost nothing
    assert got == {7, 80}


@pytest.mark.usefixtures("ray_session")
def test_ks_statistic_matches_scipy_free_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import ks_statistic

    rng = np.random.Generator(np.random.PCG64(17))
    a = rng.integers(0, 50, 300)                    # heavy ties
    b = rng.integers(10, 60, 200)
    df = pd.DataFrame({
        "g": ["A"] * len(a) + ["B"] * len(b) + ["other"] * 5,
        "x": np.concatenate([a, b, [0, 1, 2, 3, 4]]).astype("int64")})

    got = ks_statistic(rd.from_pandas(df.copy()).repartition(7),
                       "g", "x", ga="A", gb="B").iloc[0]

    pooled = np.unique(np.concatenate([a, b]))
    n, m = len(a), len(b)
    d = max(abs(int((a <= v).sum()) * m - int((b <= v).sum()) * n)
            for v in pooled)
    assert (got["n"], got["m"]) == (n, m)
    assert got["d_num"] == d and got["d_den"] == n * m


@pytest.mark.usefixtures("ray_session")
def test_gini_index_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import gini_index

    rng = np.random.Generator(np.random.PCG64(19))
    x = rng.integers(1, 10_000, 700).astype("int64")
    df = pd.DataFrame({"centi": x})

    got = gini_index(rd.from_pandas(df.copy()).repartition(6), "centi")

    xs = np.sort(x)
    n = len(xs)
    i = np.arange(1, n + 1, dtype="int64")
    num = 2 * int((i * xs).sum()) - (n + 1) * int(xs.sum())
    den = n * int(xs.sum())
    assert got["n"].iloc[0] == n
    assert abs(got["gini"].iloc[0] - num / den) <= 5e-7  # round(…, 6)


@pytest.mark.usefixtures("ray_session")
def test_mwu_statistic_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import mwu_statistic

    rng = np.random.Generator(np.random.PCG64(23))
    a = rng.integers(0, 30, 250)                    # heavy ties
    b = rng.integers(5, 35, 180)
    df = pd.DataFrame({
        "g": ["A"] * len(a) + ["B"] * len(b),
        "x": np.concatenate([a, b]).astype("int64")})

    got = mwu_statistic(rd.from_pandas(df.copy()).repartition(7),
                        "g", "x", ga="A", gb="B").iloc[0]

    u2 = sum(2 * int((b < av).sum()) + int((b == av).sum()) for av in a)
    assert (got["n"], got["m"], got["u2"]) == (len(a), len(b), u2)
