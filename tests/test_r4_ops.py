"""Randomized (seeded) brute-force parity for the round-4b operators:
interval union, cumulative distinct, skyline, mode, fixed histogram.

The DuckDB oracle rows for these run over the generated tables only;
these tests hit adversarial shapes — touching/nested/duplicate
intervals, many-tie mode races, anticorrelated skyline data — against
row-at-a-time references.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_merge_intervals_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import merge_intervals

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 17, n),
        # dense starts -> many ties, zero-length and long spans mixed
        "s_us": rng.integers(0, 50, n).astype("int64"),
    })
    df["e_us"] = df["s_us"] + rng.integers(0, 9, n).astype("int64")

    got = (merge_intervals(rd.from_pandas(df.copy()), key_col="k",
                           n_parts=5)
           .to_pandas().sort_values(["k", "start_us"])
           .reset_index(drop=True))

    rows = []
    for k, g in df.groupby("k"):
        ivs = sorted(zip(g["s_us"], g["e_us"]))
        cur_s, cur_e, cnt = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:                       # touching merges
                cur_e = max(cur_e, e)
                cnt += 1
            else:
                rows.append((k, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = s, e, 1
        rows.append((k, cur_s, cur_e, cnt))
    exp = (pd.DataFrame(rows, columns=["k", "start_us", "end_us", "n_iv"])
           .astype("int64").sort_values(["k", "start_us"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_cumulative_distinct_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import cumulative_distinct

    rng = np.random.Generator(np.random.PCG64(7))
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 120, n),
        "ts": pd.to_datetime(
            rng.integers(0, 40 * 86_400, n), unit="s"),
    })
    got = cumulative_distinct(rd.from_pandas(df.copy()), key_col="k",
                              ts_col="ts", n_parts=5)

    day_us = ((df["ts"].astype("datetime64[us]").astype("int64")
               // 86_400_000_000) * 86_400_000_000)
    first = (pd.DataFrame({"k": df["k"], "d": day_us})
             .groupby("k")["d"].min())
    exp = (first.value_counts().sort_index().rename("new_keys")
           .reset_index().rename(columns={"d": "day_us"}))
    exp["cum_keys"] = exp["new_keys"].cumsum()
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_names=False)
    # the curve ends at the total distinct-key count
    assert got["cum_keys"].iloc[-1] == df["k"].nunique()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2])
def test_skyline_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import skyline

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    # anticorrelated band (big fronts) + duplicates
    x = rng.integers(0, 40, n).astype("int64")
    y = (40 - x + rng.integers(-6, 7, n)).astype("int64")
    df = pd.DataFrame({"x": x, "y": y})

    got = (skyline(rd.from_pandas(df.copy())
                   .repartition(6), "x", "y")
           .sort_values(["x", "y"]).reset_index(drop=True))

    keep = []
    for i in range(n):
        dom = ((x >= x[i]) & (y <= y[i])
               & ((x > x[i]) | (y < y[i]))).any()
        if not dom:
            keep.append(i)
    exp = (df.iloc[keep].groupby(["x", "y"], as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_group_mode_tiebreak_smallest():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import group_mode

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": ["z", "m", "z", "m",        # tie 2-2 -> 'm' (smallest)
              "q", "q", "r"],            # clear winner 'q'
    })
    got = (group_mode(rd.from_pandas(df).repartition(3), "g", "v")
           .sort_values("g").reset_index(drop=True))
    exp = pd.DataFrame({"g": ["a", "b"], "mode": ["m", "q"],
                        "n": np.array([2, 2], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_histogram_fixed_counts_and_sums():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import histogram_fixed

    rng = np.random.Generator(np.random.PCG64(3))
    v = np.round(rng.uniform(0, 100, 500), 2)
    df = pd.DataFrame({"v": v})
    got = histogram_fixed(rd.from_pandas(df).repartition(4), "v",
                          width_centi=1000)
    cv = np.round(v * 100).astype("int64")
    exp = (pd.DataFrame({"bin": cv // 1000, "v": cv})
           .groupby("bin", as_index=False)
           .agg(n=("v", "size"), sum_centi=("v", "sum")))
    exp.insert(1, "bin_lo_centi", exp["bin"] * 1000)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
    assert got["n"].sum() == 500
