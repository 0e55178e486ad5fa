"""Randomized (seeded) brute-force parity for the temporal joins.

The hash-partition rewrites must equal a row-at-a-time reference on
adversarial shapes: duplicate timestamps on both sides, keys missing a
side entirely, and single-row keys.  Complements the DuckDB oracle
tests, which only see the events-table distribution.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mkdata(seed: int, n_left: int = 400, n_right: int = 500,
            n_keys: int = 23, ts_range: int = 40):
    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.integers(0, ts_range, n_left),   # dense -> many ties
        "lid": np.arange(n_left, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys + 4, n_right),  # some right-only keys
        "ts": rng.integers(0, ts_range, n_right),
        "rid": np.arange(n_right, dtype="int64") + 10_000,
    })
    # drop a few keys from the right side entirely (left-only keys)
    right = right[right["k"] % 7 != 3].reset_index(drop=True)
    return left, right


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_join_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.joins import asof_join

    left, right = _mkdata(seed)
    got = asof_join(
        rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
        key_col="k", ts_col="ts", left_payload=["lid"],
        right_payload=["rid"], n_parts=5,
    ).to_pandas().sort_values(["k", "ts", "lid"]).reset_index(drop=True)

    rows = []
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["ts"] <= lr["ts"])]
        if cand.empty:
            continue
        # documented tie rule: the right row latest in (ts, payload) order
        pick = cand.sort_values(["ts", "rid"], kind="mergesort").iloc[-1]
        rows.append({"k": lr["k"], "ts": lr["ts"], "lid": lr["lid"],
                     "r_ts": pick["ts"], "r_rid": pick["rid"]})
    exp = (pd.DataFrame(rows).astype("int64")
           .sort_values(["k", "ts", "lid"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [4, 5])
def test_range_count_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.joins import range_count_join

    left, right = _mkdata(seed)
    w = 6
    got = range_count_join(
        rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
        key_col="k", ts_col="ts", left_payload=["lid"], window_us=w,
        count_name="n", n_parts=5,
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    exp_n = []
    for _, lr in left.sort_values("lid").iterrows():
        exp_n.append(int(((right["k"] == lr["k"])
                          & (right["ts"] >= lr["ts"] - w)
                          & (right["ts"] <= lr["ts"])).sum()))
    assert got["n"].tolist() == exp_n
    assert len(got) == len(left)          # every left row survives


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [6, 7])
def test_sessionize_and_rolling_match_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import rolling_sum, sessionize

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 500
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 17, n),
        "ts": pd.to_datetime(
            rng.integers(0, 3600, n), unit="s", utc=False),
        "event_id": np.arange(n, dtype="int64"),
        "value": np.round(rng.uniform(0, 9, n), 2),
    })

    got = (sessionize(rd.from_pandas(ev.copy()), gap_s=120)
           .to_pandas().sort_values(["user_id", "session_id"])
           .reset_index(drop=True))
    rows = []
    for k, g in ev.groupby("user_id"):
        g = g.sort_values("ts", kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()
        new = np.r_[True, (us[1:] - us[:-1]) > 120 * 1_000_000]
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            sel = sid == s
            rows.append({
                "user_id": k, "session_id": int(s),
                "n": int(sel.sum()),
                "start_us": int(us[sel].min()),
                "end_us": int(us[sel].max()),
                "sum_value_centi": int(round(
                    float(g["value"].to_numpy()[sel].sum()) * 100)),
            })
    exp = (pd.DataFrame(rows).sort_values(["user_id", "session_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns].astype("int64"),
                                  exp.astype("int64"))

    got_r = (rolling_sum(rd.from_pandas(ev.copy()), k=3)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp_r = []
    for _, r in ev.sort_values("event_id").iterrows():
        g = ev[ev["user_id"] == r["user_id"]].sort_values(
            ["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        i = g.index[g["event_id"] == r["event_id"]][0]
        window = g.iloc[max(0, i - 2):i + 1]
        exp_r.append(int(np.round(window["value"].to_numpy() * 100)
                         .astype("int64").sum()))
    assert got_r["roll_centi"].tolist() == exp_r


@pytest.mark.parametrize("seed", [3, 11])
def test_lag_diff_matches_bruteforce(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.windows import lag_diff

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 400
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 13, n),
        "ts": pd.to_datetime(rng.integers(0, 3600, n), unit="s", utc=False),
        "event_id": np.arange(n, dtype="int64"),
        "value": np.round(rng.uniform(0, 9, n), 2),
    })
    got = (lag_diff(rd.from_pandas(ev.copy()))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = []
    for _, r in ev.sort_values("event_id").iterrows():
        g = ev[ev["user_id"] == r["user_id"]].sort_values(
            ["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        i = g.index[g["event_id"] == r["event_id"]][0]
        if i == 0:
            exp.append(0)
        else:
            vc = np.round(g["value"].to_numpy() * 100).astype("int64")
            exp.append(int(vc[i] - vc[i - 1]))
    assert got["diff_centi"].tolist() == exp


@pytest.mark.parametrize("seed", [3, 17])
def test_retention_matches_bruteforce(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.windows import retention

    rng = np.random.Generator(np.random.PCG64(seed))
    n, period = 800, 50
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 37, n),
        "ts": pd.to_datetime(rng.integers(0, 1000, n), unit="s", utc=False),
    })
    got = retention(rd.from_pandas(ev.copy()), period_s=period).to_pandas()

    # brute force: distinct (user, period); cohort = min period per user
    exp: dict[tuple[int, int], int] = {}
    p = ev["ts"].astype("int64") // (period * 10**9)
    for uid, g in p.groupby(ev["user_id"]):
        days = sorted(set(g))
        for d in days:
            k = (days[0], d - days[0])
            exp[k] = exp.get(k, 0) + 1
    got_map = {(r.cohort, r.age): r.users for r in got.itertuples()}
    assert got_map == exp
    # output is sorted and age-0 rows equal cohort sizes
    assert got[["cohort", "age"]].values.tolist() == sorted(
        got[["cohort", "age"]].values.tolist())


@pytest.mark.parametrize("seed", [5, 23])
def test_funnel_matches_bruteforce(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.windows import funnel

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 500
    steps = ["a", "b", "c"]
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 29, n),
        "ts": pd.to_datetime(rng.integers(0, 2000, n), unit="s", utc=False),
        "event_type": rng.choice(["a", "b", "c", "x"], n),
    })
    got = funnel(rd.from_pandas(ev.copy()), steps).to_pandas()

    # brute force: per user walk the ordered log, step i strictly after
    # the EARLIEST completion time of step i-1
    users = np.zeros(len(steps), dtype=np.int64)
    for uid, g in ev.groupby("user_id"):
        prev = None
        for i, s in enumerate(steps):
            m = g[g["event_type"] == s]
            if i > 0:
                m = m[m["ts"] > prev]
            if len(m) == 0:
                break
            prev = m["ts"].min()
            users[i] += 1
    assert got["step"].tolist() == [1, 2, 3]
    assert got["event_type"].tolist() == steps
    assert got["users"].tolist() == users.tolist()


@pytest.mark.parametrize("seed", [8, 31])
def test_running_total_matches_bruteforce(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.windows import running_total

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 13, n),
        # dense ts range -> duplicate timestamps inside a key; the
        # (ts, event_id) order must break the tie deterministically
        "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s", utc=False),
        "event_id": np.arange(n, dtype="int64"),
        "value": np.round(rng.uniform(-5, 9, n), 2),
    })
    got = (running_total(rd.from_pandas(ev.copy()))
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    exp = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    centi = np.round(exp["value"].to_numpy() * 100).astype("int64")
    exp = exp.assign(run_centi=pd.Series(centi, index=exp.index)
                     .groupby(exp["user_id"]).cumsum())
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert got["run_centi"].tolist() == exp["run_centi"].tolist()
    assert len(got) == n


@pytest.mark.parametrize("seed", [9, 40])
def test_group_quantiles_cont_matches_numpy(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import group_quantiles_cont

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 400
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        # includes a single-element group edge case below
        "value": np.round(rng.uniform(0, 99, n), 2),
    })
    df = pd.concat([df, pd.DataFrame({"g": ["solo"], "value": [3.14]})],
                   ignore_index=True)
    got = (group_quantiles_cont(rd.from_pandas(df.copy()), "g", "value")
           .to_pandas().sort_values("g").reset_index(drop=True))

    for _, row in got.iterrows():
        v = np.round(df[df["g"] == row["g"]]["value"].to_numpy() * 100
                     ).astype("int64")
        for p in (25, 50, 95):
            # numpy 'linear' is the same q*(n-1) convention; the engine
            # result is x1e4 integer, exact because rem/100 is rational
            expect = np.quantile(np.sort(v), p / 100,
                                 method="linear") * 100
            assert abs(row[f"q{p}_e4"] - expect) < 1e-6, (row["g"], p)


@pytest.mark.parametrize("seed", [10, 47])
def test_hash_join_matches_pandas(seed, ray_session):
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300),
        "lv": rng.integers(0, 1000, 300).astype("int64"),
    })
    # selective right side: many hash partitions end up right-empty —
    # the exact shape that crashes Ray's native JoinOperator
    right = pd.DataFrame({
        "rk": rng.integers(0, 40, 12),
        "rv": rng.integers(0, 1000, 12).astype("int64"),
    })
    got = hash_join(
        rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
        key_col="k", left_payload=["lv"], right_payload=["rv"],
        right_key_col="rk", n_parts=16,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)

    exp = (left.merge(right, left_on="k", right_on="rk", how="inner")
           [["k", "lv", "rv"]]
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_hash_join_empty_right(ray_session):
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": pd.Series(dtype="int64"),
                          "rv": pd.Series(dtype="int64")})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="k", left_payload=["lv"],
                    right_payload=["rv"], right_key_col="rk",
                    n_parts=4).to_pandas()
    assert len(out) == 0


def test_hash_join_skewed_hot_key(ray_session):
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    # one hot key carries half of all left rows; right has multiple
    # matches for it (fan-out) — partition-level merge must not lose or
    # duplicate pairs
    rng = np.random.Generator(np.random.PCG64(99))
    n = 400
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 50, n))
    left = pd.DataFrame({"k": k.astype("int64"),
                         "lv": np.arange(n, dtype="int64")})
    right = pd.DataFrame({"rk": np.array([7, 7, 7, 1, 2], dtype="int64"),
                          "rv": np.arange(5, dtype="int64")})
    got = hash_join(
        rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
        key_col="k", left_payload=["lv"], right_payload=["rv"],
        right_key_col="rk", n_parts=8,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    exp = (left.merge(right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert (got["k"] == 7).sum() == 3 * (left["k"] == 7).sum()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2])
def test_anti_join_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.joins import anti_join

    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300).astype("int64"),
        "v": np.arange(300, dtype="int64")})
    # right keys overlap partially; some keys exist ONLY on the right
    right = pd.DataFrame({
        "rk": rng.integers(20, 60, 200).astype("int64")})
    # null keys: dropped on the left, ignored on the right (NOT EXISTS)
    left.loc[::50, "k"] = None
    right.loc[::40, "rk"] = None

    got = anti_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        key_col="k", left_payload=["v"], right_key_col="rk",
        n_parts=7).to_pandas().sort_values("v").reset_index(drop=True)

    rset = set(right["rk"].dropna().astype("int64"))
    exp = left.dropna(subset=["k"])
    exp = exp[~exp["k"].astype("int64").isin(rset)]
    exp = exp.astype({"k": "int64", "v": "int64"}).sort_values(
        "v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v"]].astype({"k": "int64", "v": "int64"}), exp)


@pytest.mark.usefixtures("ray_session")
def test_anti_join_empty_right():
    import ray.data as rd

    from vyntr_ray.stages.joins import anti_join

    left = pd.DataFrame({"k": np.arange(10, dtype="int64"),
                         "v": np.arange(10, dtype="int64")})
    right = pd.DataFrame({"rk": pd.array([], dtype="int64")})
    got = anti_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="k", left_payload=["v"], right_key_col="rk",
                    n_parts=4).to_pandas()
    assert sorted(got["k"]) == list(range(10))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,m_bits", [(1, 64), (2, 64), (3, 1 << 16)])
def test_bloom_anti_join_matches_anti_join(seed, m_bits):
    # m_bits=64 over ~40 distinct right keys saturates the bitmap --
    # nearly every left key is a Bloom "maybe", so the exact re-check
    # path carries the result and exactness must hold regardless
    import ray.data as rd

    from vyntr_ray.stages.joins import bloom_anti_join

    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300).astype("int64"),
        "v": np.arange(300, dtype="int64")})
    right = pd.DataFrame({
        "rk": rng.integers(20, 60, 200).astype("int64")})
    left.loc[::50, "k"] = None
    right.loc[::40, "rk"] = None

    got = bloom_anti_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(4),
        key_col="k", left_payload=["v"], right_key_col="rk",
        n_parts=7, m_bits=m_bits, k=4,
        types={"k": pa.int64(), "rk": pa.int64(), "v": pa.int64()}
        ).to_pandas().sort_values("v").reset_index(drop=True)

    rset = set(right["rk"].dropna().astype("int64"))
    exp = left.dropna(subset=["k"])
    exp = exp[~exp["k"].astype("int64").isin(rset)]
    exp = exp.astype({"k": "int64", "v": "int64"}).sort_values(
        "v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v"]].astype({"k": "int64", "v": "int64"}), exp)


@pytest.mark.usefixtures("ray_session")
def test_bloom_anti_join_string_keys_and_empty_right():
    import ray.data as rd

    from vyntr_ray.stages.joins import bloom_anti_join

    left = pd.DataFrame({"k": [f"u{i}" for i in range(20)],
                         "v": np.arange(20, dtype="int64")})
    right = pd.DataFrame({"rk": pd.array([], dtype="string")})
    got = bloom_anti_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key_col="k", left_payload=["v"], right_key_col="rk", n_parts=4,
        m_bits=256,
        types={"k": pa.string(), "rk": pa.string(), "v": pa.int64()}
        ).to_pandas()
    assert sorted(got["k"]) == sorted(f"u{i}" for i in range(20))

    right2 = pd.DataFrame({"rk": [f"u{i}" for i in range(0, 20, 2)]})
    got2 = bloom_anti_join(
        rd.from_pandas(left), rd.from_pandas(right2).repartition(3),
        key_col="k", left_payload=["v"], right_key_col="rk", n_parts=4,
        m_bits=256,
        types={"k": pa.string(), "rk": pa.string(), "v": pa.int64()}
        ).to_pandas()
    assert sorted(got2["k"]) == sorted(f"u{i}" for i in range(1, 20, 2))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [5, 13])
def test_rolling_sum_time_matches_bruteforce(seed):
    """RANGE-frame semantics: ties on ts share one frame (peers of the
    CURRENT ROW bound are in frame even when the id tie-break orders
    them later) — a dense ts range forces many such peer groups."""
    import ray.data as rd

    from vyntr_ray.stages.windows import rolling_sum_time

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 13, n),
        "ts": pd.to_datetime(
            rng.integers(0, 900, n), unit="s", utc=False),  # many ties
        "event_id": np.arange(n, dtype="int64"),
        "value": np.round(rng.uniform(-5, 9, n), 2),
    })
    w_s = 120

    got = (rolling_sum_time(rd.from_pandas(ev.copy(),
                                           override_num_blocks=5),
                            window_s=w_s)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    exp = []
    us_all = ev["ts"].astype("int64").to_numpy() // 1000  # ns -> us
    vc_all = np.round(ev["value"].to_numpy() * 100).astype("int64")
    for i in range(n):
        sel = ((ev["user_id"].to_numpy() == ev["user_id"].iloc[i])
               & (us_all >= us_all[i] - w_s * 1_000_000)
               & (us_all <= us_all[i]))
        exp.append(int(vc_all[sel].sum()))
    assert got["win_sum_centi"].tolist() == exp
