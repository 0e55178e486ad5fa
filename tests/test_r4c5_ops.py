"""Randomized (seeded) brute-force parity for the round-4c5 operators:
PSI drift, keyed snapshot diff, windowed funnel, Zipf fit.

Adversarial shapes: empty-on-one-side bins (the PSI zero-bin clamp),
heavy ties, keys present on only one side, equal-but-reordered rows
(must NOT appear in the change set), partition-count invariance,
funnel windows that time out mid-chain.
"""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 11])
def test_psi_statistic_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import psi_statistic

    rng = np.random.Generator(np.random.PCG64(seed))
    # disjoint tails force empty-on-one-side bins (the ln clamp)
    a = rng.integers(0, 80, 400)
    b = rng.integers(40, 140, 300)
    df = pd.DataFrame({
        "g": ["A"] * len(a) + ["B"] * len(b) + ["other"] * 7,
        "x": np.concatenate([a, b, np.full(7, 5)]).astype("int64")})
    width = 10

    got = psi_statistic(rd.from_pandas(df.copy()).repartition(7),
                        "g", "x", ga="A", gb="B", width=width).iloc[0]

    n, m = len(a), len(b)
    bins = np.union1d(a // width, b // width)
    psi_num = 0
    n_bins = 0
    for bn in bins:
        ca = int((a // width == bn).sum())
        cb = int((b // width == bn).sum())
        if ca > 0 and cb > 0:
            n_bins += 1
            la = math.floor(math.log(float(ca * m)) * 1_000_000.0)
            lb = math.floor(math.log(float(cb * n)) * 1_000_000.0)
            psi_num += (ca * m - cb * n) * (la - lb)
    assert (got["n"], got["m"], got["n_bins"]) == (n, m, n_bins)
    # the integer micro-nat sum approximates the float PSI to ~1e-5
    ref = psi_num / (n * m * 1_000_000)
    assert abs(got["psi"] - ref) <= 5e-7          # round(…, 6)
    float_psi = 0.0
    for bn in bins:
        ca = int((a // width == bn).sum())
        cb = int((b // width == bn).sum())
        if ca > 0 and cb > 0:
            pa_, pb_ = ca / n, cb / m
            float_psi += (pa_ - pb_) * math.log(pa_ / pb_)
    assert abs(got["psi"] - float_psi) <= 1e-4


@pytest.mark.usefixtures("ray_session")
def test_psi_statistic_empty_and_degenerate():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import psi_statistic

    # no rows from either population
    df = pd.DataFrame({"g": ["x", "y"], "x": np.array([1, 2], "int64")})
    got = psi_statistic(rd.from_pandas(df), "g", "x",
                        ga="A", gb="B", width=10).iloc[0]
    assert (got["n"], got["m"], got["n_bins"], got["psi"]) == (0, 0, 0, 0.0)

    # identical distributions -> psi exactly 0 (every term cancels)
    df2 = pd.DataFrame({
        "g": ["A"] * 50 + ["B"] * 50,
        "x": np.concatenate([np.arange(50)] * 2).astype("int64")})
    got2 = psi_statistic(rd.from_pandas(df2).repartition(5), "g", "x",
                         ga="A", gb="B", width=7).iloc[0]
    assert got2["psi"] == 0.0 and got2["n_bins"] == 8


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_parts", [1, 5])
def test_snapshot_diff_matches_bruteforce(n_parts):
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import snapshot_diff

    rng = np.random.Generator(np.random.PCG64(31))
    ka = rng.integers(0, 40, 300)
    kb = rng.integers(20, 60, 280)                 # partial key overlap
    va = rng.integers(1, 100, 300)
    vb = rng.integers(1, 100, 280)
    # plant an exactly-equal key on both sides (must NOT be emitted):
    # key 1000 gets the same multiset of values in different row order
    eq_a = pd.DataFrame({"k": [1000] * 3, "v": [7, 9, 11]})
    eq_b = pd.DataFrame({"k": [1000] * 3, "v": [11, 7, 9]})
    da = pd.concat([pd.DataFrame({"k": ka, "v": va}), eq_a],
                   ignore_index=True).astype("int64")
    db = pd.concat([pd.DataFrame({"k": kb, "v": vb}), eq_b],
                   ignore_index=True).astype("int64")

    got = (snapshot_diff(rd.from_pandas(da.copy()).repartition(6),
                         rd.from_pandas(db.copy()).repartition(4),
                         "k", ["v"], n_parts=n_parts)
           .to_pandas().sort_values("k").reset_index(drop=True))

    ga = da.groupby("k").agg(a_n=("v", "size"), a_v=("v", "sum"))
    gb = db.groupby("k").agg(b_n=("v", "size"), b_v=("v", "sum"))
    ref = ga.join(gb, how="outer").fillna(0).astype("int64")
    ref["status"] = np.where(ref["a_n"] == 0, "added",
                             np.where(ref["b_n"] == 0, "removed",
                                      "changed"))
    ref = (ref[~((ref["a_n"] == ref["b_n"]) & (ref["a_v"] == ref["b_v"]))]
           .reset_index())

    assert 1000 not in set(got["k"])               # equal key dropped
    assert set(got["status"]) == {"added", "removed", "changed"}
    assert len(got) == len(ref)
    merged = got.merge(ref, on="k", suffixes=("", "_ref"))
    assert len(merged) == len(ref)
    assert (merged["status"] == merged["status_ref"]).all()
    assert (merged["a_n"] == merged["a_n_ref"]).all()
    assert (merged["b_n"] == merged["b_n_ref"]).all()
    assert (merged["a_v"] == merged["a_v_ref"]).all()
    assert (merged["b_v"] == merged["b_v_ref"]).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,gap_us", [(3, 50_000_000), (13, 5_000_000)])
def test_funnel_windowed_matches_bruteforce(seed, gap_us):
    import ray.data as rd

    from vyntr_ray.stages.windows import funnel

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 900
    steps = ["a", "b", "c"]
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime(
            rng.integers(0, 200_000_000, n), unit="us"),
        "event_type": rng.choice(steps + ["x"], n)})

    got = (funnel(rd.from_pandas(df.copy()).repartition(7), steps,
                  max_gap_us=gap_us)
           .to_pandas().sort_values("step").reset_index(drop=True))

    # row-at-a-time greedy reference
    users = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        prev = None
        for i, s in enumerate(steps):
            cand = g[(g["event_type"] == s)]
            if i > 0:
                cand = cand[(cand["ts"] > prev)
                            & (cand["ts"] <= prev
                               + pd.Timedelta(gap_us, unit="us"))]
            if cand.empty:
                break
            prev = cand["ts"].min()
            users[i] += 1
    assert got["users"].tolist() == users
    # the windowed funnel is never larger than the unwindowed one
    base = (funnel(rd.from_pandas(df.copy()).repartition(7), steps)
            .to_pandas().sort_values("step"))
    assert (got["users"].to_numpy() <= base["users"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_zipf_fit_matches_bruteforce():
    import math

    import ray.data as rd

    from vyntr_ray.stages.text_analysis import zipf_fit

    rng = np.random.Generator(np.random.PCG64(41))
    # Zipfian corpus over a 300-word vocab
    vocab = [f"w{i}" for i in range(300)]
    p = 1.0 / np.arange(1, 301)
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, 80, p=p)) for _ in range(120)]
    df = pd.DataFrame({"text": docs})

    got = zipf_fit(rd.from_pandas(df.copy()).repartition(5),
                   k=50).iloc[0]

    from collections import Counter
    c = Counter()
    for d in docs:
        c.update(d.split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = [math.floor(math.log(float(i)) * 1e6)
          for i in range(1, len(top) + 1)]
    ys = [math.floor(math.log(float(cnt)) * 1e6) for _, cnt in top]
    kk = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = kk * sxy - sx * sy, kk * sxx - sx * sx
    assert got["k"] == kk
    assert abs(got["slope"] - num / den) <= 5e-7
    # a Zipfian corpus should fit near slope -1
    assert -1.4 < got["slope"] < -0.6


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [5, 29])
def test_adamic_adar_matches_bruteforce(seed):
    import math

    import ray.data as rd

    from vyntr_ray.stages.graph import adamic_adar

    rng = np.random.Generator(np.random.PCG64(seed))
    n_nodes = 40
    pairs = set()
    while len(pairs) < 130:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = pd.DataFrame(sorted(pairs), columns=["u", "v"]).astype("int64")

    got = adamic_adar(rd.from_pandas(edges.copy()).repartition(5),
                      k=15, n_parts=7)

    # row-at-a-time reference
    nbrs: dict = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    scores = {}
    for b in nbrs:
        for c in nbrs:
            if b < c and (b, c) not in pairs:
                common = nbrs[b] & nbrs[c]
                s = sum(10**12 // math.floor(
                    math.log(float(len(nbrs[z]))) * 1e6)
                    for z in common if len(nbrs[z]) >= 2)
                if s > 0:
                    scores[(b, c)] = s
    ref = sorted(scores.items(),
                 key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(got["node_a"], got["node_b"])) == [p for p, _ in ref]
    assert got["aa_micro"].tolist() == [s for _, s in ref]


@pytest.mark.usefixtures("ray_session")
def test_compression_ratio_bounds_and_determinism():
    import zlib

    import ray.data as rd

    from vyntr_ray.stages.text_analysis import compression_ratio

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["a" * 1000,                       # highly compressible
                 " ".join(f"w{i}" for i in range(300)),
                 "",                               # empty -> zeros
                 None]})                           # null -> zeros
    got = (compression_ratio(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert got.loc[2, ["n_bytes", "c_bytes", "ratio_micro"]].tolist() \
        == [0, 0, 0]
    assert got.loc[3, ["n_bytes", "c_bytes", "ratio_micro"]].tolist() \
        == [0, 0, 0]
    # repeated char compresses far below 5%; exact value pinned to
    # this zlib build
    assert got.loc[0, "ratio_micro"] < 50_000
    assert got.loc[0, "c_bytes"] == len(zlib.compress(b"a" * 1000, 6))
    assert got.loc[1, "ratio_micro"] > 200_000
    assert (got["ratio_micro"]
            == got["c_bytes"] * 1_000_000 // got["n_bytes"].clip(lower=1)
            ).loc[got["n_bytes"] > 0].all()
