"""Randomized (seeded) brute-force parity for the round-4c5 operators:
PSI drift, keyed snapshot diff.

Adversarial shapes: empty-on-one-side bins (the PSI zero-bin clamp),
heavy ties, keys present on only one side, equal-but-reordered rows
(must NOT appear in the change set), partition-count invariance.
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
