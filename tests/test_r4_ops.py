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


def _lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


@pytest.mark.parametrize("seed", [1, 2])
def test_lev_band_matches_full(seed):
    from vyntr_ray.stages.dedup import _lev_band

    rng = np.random.Generator(np.random.PCG64(seed))
    alpha = "abcd"
    for _ in range(200):
        la, lb = rng.integers(0, 20, 2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        for md in (0, 1, 3, 8):
            full = _lev_full(a, b)
            got = _lev_band(a, b, md)
            assert got == (full if full <= md else md + 1), (a, b, md)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_dup_pairs_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dedup import fuzzy_dup_pairs

    rng = np.random.Generator(np.random.PCG64(11))
    base = ["the quick brown fox jumps over the lazy dog again",
            "a completely different sentence about ray data engines",
            "the quick brown fox jumps over the lazy cat again"]
    texts, ids = [], []
    for i in range(120):
        t = base[i % 3]
        if rng.random() < 0.5:  # small edit beyond char 16
            pos = int(rng.integers(20, len(t)))
            t = t[:pos] + "x" + t[pos + 1:]
        texts.append(t)
        ids.append(i)
    df = pd.DataFrame({"doc_id": ids, "text": texts})

    got = (fuzzy_dup_pairs(rd.from_pandas(df).repartition(4),
                           block_chars=16, probe_chars=64, max_dist=8,
                           n_parts=3)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))

    rows = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            a, b = texts[i], texts[j]
            if a[:16] != b[:16]:
                continue
            d = _lev_full(a[:64], b[:64])
            if d <= 8:
                rows.append((i, j, d))
    exp = (pd.DataFrame(rows, columns=["id_a", "id_b", "dist"])
           .astype("int64").sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_percentile_ranks_ties_and_singletons():
    import ray.data as rd

    from vyntr_ray.stages.windows import percentile_ranks

    df = pd.DataFrame({
        "event_id": range(7),
        "user_id": [1, 1, 1, 1, 2, 2, 3],     # user 3 = single row
        "value": [5.0, 5.0, 3.0, 1.0, 2.0, 2.0, 9.0],  # ties everywhere
    })
    got = (percentile_ranks(rd.from_pandas(df).repartition(3), n_parts=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # user 1: values desc [5,5,3,1] -> rank_min [1,1,3,4], rank_max
    # [2,2,3,4], n=4 -> pr = [0,0,2/3,1], cd = [.5,.5,.75,1]
    exp_pr = [0.0, 0.0, round(2 / 3, 6), 1.0, 0.0, 0.0, 0.0]
    exp_cd = [0.5, 0.5, 0.75, 1.0, 1.0, 1.0, 1.0]
    assert got["pr_6"].tolist() == pytest.approx(exp_pr, abs=1e-9)
    assert got["cd_6"].tolist() == pytest.approx(exp_cd, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_zonemap_export_lookup_roundtrip(tmp_path):
    import ray.data as rd

    from vyntr_ray.sources.zonemap import zonemap_export, zonemap_lookup

    rng = np.random.Generator(np.random.PCG64(5))
    keys = rng.permutation(np.arange(1000, dtype="int64"))
    df = pd.DataFrame({"k": keys, "v": keys * 2})
    out = str(tmp_path / "zm")
    man = zonemap_export(rd.from_pandas(df).repartition(5), out, "k",
                         width=100)
    assert man["n"].sum() == 1000
    assert (man["min_key"] >= man["bucket"] * 100).all()
    assert (man["max_key"] < (man["bucket"] + 1) * 100).all()
    # lookup touches only covering buckets and returns exact rows
    hit = zonemap_lookup(out, "k", [7, 503, 999])
    assert hit["k"].tolist() == [7, 503, 999]
    assert hit["v"].tolist() == [14, 1006, 1998]
    # rerun is idempotent (atomic rename overwrites cleanly)
    man2 = zonemap_export(rd.from_pandas(df).repartition(3), out, "k",
                          width=100)
    pd.testing.assert_frame_equal(man, man2)


@pytest.mark.usefixtures("ray_session")
def test_cube_counts_margins_consistent():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import cube_counts

    rng = np.random.Generator(np.random.PCG64(9))
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 300),
        "b": rng.choice(["p", "q"], 300),
        "v": rng.integers(0, 10, 300),
    })
    got = cube_counts(rd.from_pandas(df).repartition(4), "a", "b", "v")
    fine = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    assert got[(got["a"] == "ALL") & (got["b"] == "ALL")]["n"].iloc[0] == 300
    for b, g in fine.groupby("b"):
        m = got[(got["a"] == "ALL") & (got["b"] == b)]
        assert m["n"].iloc[0] == g["n"].sum()
        assert m["total"].iloc[0] == g["total"].sum()
    for a, g in fine.groupby("a"):
        m = got[(got["a"] == a) & (got["b"] == "ALL")]
        assert m["n"].iloc[0] == g["n"].sum()


@pytest.mark.usefixtures("ray_session")
def test_table_profile_counts():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import table_profile

    df = pd.DataFrame({
        "i": pd.array([1, 2, 2, None, 4], dtype="Int64"),
        "s": ["a", "a", None, "b", "c"],
        "f": [1.5, 1.5, 2.5, 2.5, None],
    })
    got = table_profile(rd.from_pandas(df).repartition(3),
                        ["i", "s", "f"], n_parts=3)
    exp = pd.DataFrame({
        "column": ["f", "i", "s"],
        "n": np.array([5, 5, 5], dtype="int64"),
        "n_null": np.array([1, 1, 1], dtype="int64"),
        "n_distinct": np.array([2, 3, 3], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_hits_counts_matches_dense():
    import ray.data as rd

    from vyntr_ray.stages.graph import hits_counts

    rng = np.random.Generator(np.random.PCG64(13))
    n_nodes, n_edges = 40, 150
    u = rng.integers(0, n_nodes, n_edges).astype("int64")
    v = rng.integers(0, n_nodes, n_edges).astype("int64")
    got = (hits_counts(rd.from_pandas(pd.DataFrame({"u": u, "v": v}))
                       .repartition(4), n_iter=3)
           .to_pandas().sort_values("node").reset_index(drop=True))

    nodes = np.unique(np.concatenate([u, v]))
    idx = {int(x): i for i, x in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype="int64")
    for a, b in zip(u, v):
        A[idx[int(a)], idx[int(b)]] += 1   # multi-edges count
    h = np.ones(len(nodes), dtype="int64")
    for _ in range(3):
        a = A.T @ h
        h = A @ a
    exp = pd.DataFrame({"node": nodes, "hub": h, "auth": a})
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_deterministic_and_weighted():
    import hashlib

    import ray.data as rd

    from vyntr_ray.stages.sampling import weighted_sample

    rng = np.random.Generator(np.random.PCG64(17))
    n = 2000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "n_chars": rng.integers(1, 500, n).astype("int64")})
    got4 = weighted_sample(rd.from_pandas(df).repartition(4), k=50)
    got9 = weighted_sample(rd.from_pandas(df).repartition(9), k=50)
    # parallelism-invariant selection
    pd.testing.assert_frame_equal(got4, got9)
    # matches the single-process E-S computation exactly
    hs = [hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]]
    u = (np.array([int(h[:13], 16) for h in hs], np.float64) + 1) / (1 << 52)
    es = np.power(u, 1.0 / df["n_chars"].to_numpy(np.float64))
    order = np.lexsort((df["doc_id"].to_numpy(), -es))[:50]
    exp = (df.iloc[order].reset_index(drop=True))
    pd.testing.assert_frame_equal(got4, exp)
    # heavier docs overrepresented vs uniform
    assert got4["n_chars"].mean() > df["n_chars"].mean()


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_avg_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import time_weighted_avg

    rng = np.random.Generator(np.random.PCG64(23))
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 30, n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": np.round(rng.uniform(-5, 5, n), 2),
    })
    got = (time_weighted_avg(rd.from_pandas(df).repartition(4), n_parts=5)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vc = np.round(g["value"].to_numpy() * 100).astype("int64")
        dt = (us[1:] - us[:-1]) // 1000
        num, den = int((vc[:-1] * dt).sum()), int(dt.sum())
        if den > 0:
            rows.append((uid, num, den, round(num / den, 6)))
    exp = pd.DataFrame(rows, columns=["user_id", "num_centi_ms",
                                      "den_ms", "twa_6"])
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_read_csv_tolerant_skips_bad_lines(tmp_path):
    from vyntr_ray.sources.csvs import read_csv_tolerant

    p = tmp_path / "t.csv"
    p.write_text(
        "doc_id,score,name\n"
        "1,2.5,alpha\n"
        "2,notafloat,beta\n"          # bad typed field -> skipped
        "3,4.0\n"                      # wrong column count -> skipped
        "4,,gamma\n"                   # empty typed field -> null
        '5,1.5,"q, uoted"\n'           # RFC-4180 quoted comma
        "garbage line\n"
        "6,0.5,delta\n")
    got = (read_csv_tolerant(str(tmp_path),
                             {"doc_id": "int64", "score": "double",
                              "name": "string"})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 4, 5, 6]
    assert got["name"].tolist() == ["alpha", "gamma", "q, uoted", "delta"]
    assert pd.isna(got["score"].iloc[1])


@pytest.mark.usefixtures("ray_session")
def test_grouping_sets_matches_per_set_groupbys():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import grouping_sets

    rng = np.random.Generator(np.random.PCG64(31))
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 200),
        "b": rng.choice(["p", "q", "r"], 200),
        "v": rng.integers(0, 9, 200),
    })
    got = grouping_sets(rd.from_pandas(df).repartition(3), "a", "b", "v",
                        sets=((0, 1), (1,), ()))
    fine = got[(got["a"] != "ALL") & (got["b"] != "ALL")]
    assert len(fine) == df.groupby(["a", "b"]).ngroups
    by_b = got[(got["a"] == "ALL") & (got["b"] != "ALL")]
    exp_b = df.groupby("b")["v"].agg(["size", "sum"])
    for _, r in by_b.iterrows():
        assert r["n"] == exp_b.loc[r["b"], "size"]
        assert r["total"] == exp_b.loc[r["b"], "sum"]
    tot = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
    assert len(tot) == 1 and tot["n"].iloc[0] == 200


@pytest.mark.usefixtures("ray_session")
def test_skyline_front_cap_guard():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import skyline

    # maximize x / minimize y with y rising in x: every point is on
    # the front (higher x always costs higher y)
    n = 300
    df = pd.DataFrame({"x": np.arange(n, dtype="int64"),
                       "y": np.arange(n, dtype="int64")})
    with pytest.raises(ValueError, match="front_cap"):
        skyline(rd.from_pandas(df).repartition(3), "x", "y",
                front_cap=100)


@pytest.mark.usefixtures("ray_session")
def test_hash_join_left_matches_pandas():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    rng = np.random.Generator(np.random.PCG64(41))
    left = pd.DataFrame({"k": rng.integers(0, 50, 300).astype("int64"),
                         "lv": np.arange(300, dtype="int64")})
    # right covers only some keys; some keys have multiple rows
    right = pd.DataFrame({"k": rng.integers(0, 25, 60).astype("int64"),
                          "rv": rng.integers(1, 9, 60).astype("int64")})
    got = (hash_join(rd.from_pandas(left).repartition(4),
                     rd.from_pandas(right).repartition(3),
                     key_col="k", left_payload=["lv"],
                     right_payload=["rv"], n_parts=5, how="left",
                     fill={"rv": -1},
                     types={"k": pa.int64(), "lv": pa.int64(),
                            "rv": pa.int64()})
           .to_pandas().sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    exp = left.merge(right, on="k", how="left")
    exp["rv"] = exp["rv"].fillna(-1).astype("int64")
    exp = exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["rv"] == -1).any()          # unmatched rows survived


@pytest.mark.usefixtures("ray_session")
def test_hash_join_left_requires_fill():
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    df = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="fill"):
        hash_join(rd.from_pandas(df), rd.from_pandas(df),
                  key_col="k", left_payload=["v"], right_payload=[],
                  how="left")


@pytest.mark.usefixtures("ray_session")
def test_semi_join_matches_pandas_exists():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.joins import anti_join, semi_join

    rng = np.random.Generator(np.random.PCG64(43))
    left = pd.DataFrame({"k": rng.integers(0, 40, 200).astype("int64"),
                         "v": np.arange(200, dtype="int64")})
    right = pd.DataFrame({"k": rng.integers(0, 20, 70).astype("int64")})
    kw = dict(key_col="k", left_payload=["v"], n_parts=4,
              types={"k": pa.int64(), "v": pa.int64()})
    semi = (semi_join(rd.from_pandas(left).repartition(3),
                      rd.from_pandas(right).repartition(2), **kw)
            .to_pandas().sort_values("v").reset_index(drop=True))
    anti = (anti_join(rd.from_pandas(left).repartition(3),
                      rd.from_pandas(right).repartition(2), **kw)
            .to_pandas().sort_values("v").reset_index(drop=True))
    exp = (left[left["k"].isin(set(right["k"]))]
           .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(semi, exp)
    # semi + anti partition the left exactly (no dup, no loss)
    assert len(semi) + len(anti) == len(left)
    assert len(semi) == left["k"].isin(set(right["k"])).sum()


@pytest.mark.usefixtures("ray_session")
def test_hash_join_full_matches_pandas():
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.joins import hash_join

    rng = np.random.Generator(np.random.PCG64(47))
    left = pd.DataFrame({"k": rng.integers(0, 30, 80).astype("int64"),
                         "lv": np.arange(80, dtype="int64")})
    right = pd.DataFrame({"k": rng.integers(20, 50, 60).astype("int64"),
                          "rv": np.arange(60, dtype="int64")})
    got = (hash_join(rd.from_pandas(left).repartition(3),
                     rd.from_pandas(right).repartition(2),
                     key_col="k", left_payload=["lv"],
                     right_payload=["rv"], n_parts=4, how="full",
                     fill={"lv": -1, "rv": -1},
                     types={"k": pa.int64(), "lv": pa.int64(),
                            "rv": pa.int64()})
           .to_pandas().sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    exp = left.merge(right, on="k", how="outer")
    exp["lv"] = exp["lv"].fillna(-1).astype("int64")
    exp["rv"] = exp["rv"].fillna(-1).astype("int64")
    exp = exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["lv"] == -1).any() and (got["rv"] == -1).any()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("m_bits", [64, 1 << 16])
def test_bloom_semi_join_identical_to_semi(m_bits):
    # m_bits=64 saturates the bitmap (every row "maybe") — the exact
    # re-check must still produce byte-identical output
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.stages.joins import bloom_semi_join, semi_join

    rng = np.random.Generator(np.random.PCG64(53))
    left = pd.DataFrame({"k": rng.integers(0, 500, 400).astype("int64"),
                         "v": np.arange(400, dtype="int64")})
    right = pd.DataFrame({"k": rng.integers(0, 50, 40).astype("int64")})
    kw = dict(key_col="k", left_payload=["v"], n_parts=4,
              types={"k": pa.int64(), "v": pa.int64()})
    got = (bloom_semi_join(rd.from_pandas(left).repartition(3),
                           rd.from_pandas(right).repartition(2),
                           m_bits=m_bits, **kw)
           .to_pandas().sort_values("v").reset_index(drop=True))
    exp = (semi_join(rd.from_pandas(left).repartition(3),
                     rd.from_pandas(right).repartition(2), **kw)
           .to_pandas().sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == left["k"].isin(set(right["k"])).sum()


@pytest.mark.usefixtures("ray_session")
def test_first_last_tie_determinism():
    import ray.data as rd

    from vyntr_ray.stages.windows import first_last

    # ts ties at both ends: the event_id tie-break decides
    df = pd.DataFrame({
        "event_id": [3, 1, 2, 10, 11],
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([100, 100, 200, 50, 50], unit="s"),
        "value": [9.0, 7.0, 5.0, 1.0, 2.0],
    })
    got = (first_last(rd.from_pandas(df).repartition(2), n_parts=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # user 1: first = (ts=100, id=1) -> 700; last = (ts=200, id=2) -> 500
    # user 2: first = id 10 -> 100; last = id 11 -> 200
    assert got["first_vc"].tolist() == [700, 100]
    assert got["last_vc"].tolist() == [500, 200]
    assert got["n"].tolist() == [3, 2]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 21])
def test_basket_pairs_and_triangles_match_bruteforce(seed):
    """Pair counts against an itertools reference; triangle count
    against the numpy adjacency-matrix trace formula."""
    import itertools

    import ray.data as rd

    from vyntr_ray.stages.baskets import basket_pairs, pair_edges
    from vyntr_ray.stages.graph import triangle_count

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 800
    df = pd.DataFrame({
        "g": rng.integers(0, 120, n),          # ~7 items per basket
        "i": rng.integers(0, 40, n),           # dense -> many repeats
    })

    # brute-force pair counts (dedup within basket)
    cnt = {}
    for _, grp in df.groupby("g"):
        for a, b in itertools.combinations(sorted(set(grp["i"])), 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]

    got = basket_pairs(rd.from_pandas(df.copy(), override_num_blocks=4),
                       "g", "i", k=50)
    assert [((r.item_a, r.item_b), r.n)
            for r in got.itertuples()] == exp

    # triangles over the support>=2 edge set, vs the adjacency cube
    edges = pair_edges(rd.from_pandas(df.copy(), override_num_blocks=4),
                       "g", "i", min_count=2)
    got_t = triangle_count(edges, u_col="item_a", v_col="item_b")
    adj = np.zeros((40, 40), dtype=np.int64)
    for (a, b), c in cnt.items():
        if c >= 2:
            adj[a, b] = adj[b, a] = 1
    exp_t = int(np.trace(adj @ adj @ adj) // 6)
    assert got_t["n_triangles"].tolist() == [exp_t]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [2, 9])
def test_bfs_hops_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.graph import bfs_hops

    rng = np.random.Generator(np.random.PCG64(seed))
    n_nodes, n_edges = 60, 150
    e = pd.DataFrame({
        "u": rng.integers(0, n_nodes, n_edges),
        "v": rng.integers(0, n_nodes, n_edges)}).drop_duplicates()
    seeds = pd.DataFrame({"node": np.array([0, 1], dtype="int64"),
                          "hop": np.array([0, 0], dtype="int64")})
    k = 3
    got = (bfs_hops(rd.from_pandas(e.copy(), override_num_blocks=4),
                    rd.from_pandas(seeds), k=k)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # reference BFS (directed, min hop <= k)
    adj = {}
    for r in e.itertuples():
        adj.setdefault(int(r.u), []).append(int(r.v))
    dist = {0: 0, 1: 0}
    frontier = [0, 1]
    for h in range(1, k + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    exp = (pd.DataFrame(sorted(dist.items()), columns=["node", "hop"])
           .astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_search_snippets_edges():
    """Term at token position 0, term only as a substring (excluded),
    term near end of doc (window clipped)."""
    import ray.data as rd

    from vyntr_ray.stages.text_analysis import search_snippets

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype="int64"),
        "text": [
            "merge a b c d",                 # pos 1, right-clipped ok
            "x y z merged things",           # substring only -> excluded
            "a b c d e f merge",             # window left of end
            "no hit here",                   # absent
            "one two three merge five six seven eight",  # interior
        ]})
    got = (search_snippets(rd.from_pandas(docs, override_num_blocks=2),
                           "merge")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 2, 4]
    assert got["idx"].tolist() == [1, 7, 4]
    assert got["snippet"].tolist() == [
        "merge a b c",
        "d e f merge",
        "one two three merge five six seven",
    ]


@pytest.mark.usefixtures("ray_session")
def test_suggest_terms_ranking():
    """dist ASC beats freq DESC; freq DESC breaks dist ties; term ASC
    breaks exact (dist, freq) ties."""
    import ray.data as rd

    from vyntr_ray.stages.search_index import suggest_terms

    docs = pd.DataFrame({"text": [
        " ".join(["cat"] * 10 + ["cart"] * 50 + ["car"] * 5
                 + ["bat"] * 5 + ["hat"] * 5)]})
    got = suggest_terms(rd.from_pandas(docs), ["cst"], max_dist=2, k=4)
    # dist1: cat(10); dist2: cart(50), car(5), bat... bst? "bat"->cst=2
    rows = list(zip(got["term"], got["dist"], got["freq"]))
    assert rows[0] == ("cat", 1, 10)
    assert rows[1] == ("cart", 2, 50)
    # car/bat/hat all dist 2 freq 5 -> term ASC: bat, car
    assert rows[2] == ("bat", 2, 5)
    assert rows[3] == ("car", 2, 5)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [4, 17])
def test_rank_select_and_ntile_match_numpy(seed):
    """rank_select vs a lexsort reference — heavy value ties force the
    key tie-break; also pins Dataset.sort -> to_arrow_refs block order."""
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import (_ntile_cut_ranks,
                                                rank_select)

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    df = pd.DataFrame({
        "v": rng.integers(0, 20, n),            # many ties
        "k": rng.permutation(n).astype("int64"),
    })
    order = np.lexsort((df["k"].to_numpy(), df["v"].to_numpy()))
    ranks = [0, 1, n // 3, n // 2, n - 2, n - 1, n // 2]  # dup rank ok
    got = rank_select(rd.from_pandas(df, override_num_blocks=6),
                      ["v", "k"], ranks)
    for r, row in zip(ranks, got):
        i = order[r]
        assert (row["v"], row["k"]) == (df["v"].iloc[i], df["k"].iloc[i])

    # NTILE cut ranks: sizes ceil-then-floor, sum to n
    for q in (2, 3, 4, 7):
        cuts = _ntile_cut_ranks(n, q)
        assert len(cuts) == q - 1
        base, rem = divmod(n, q)
        expect = np.cumsum([base + (1 if i < rem else 0)
                            for i in range(q)])[:q - 1] - 1
        assert cuts == [int(x) for x in expect]


@pytest.mark.usefixtures("ray_session")
def test_monthly_growth_gap_month(tmp_path):
    """Delta is calendar-aware: a month following a GAP gets sentinel
    delta 0 (no prior month), not the delta vs the last nonempty row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    orders = pa.table({
        "o_orderdate": pa.array(
            pd.to_datetime(["2024-01-15", "2024-01-20",
                            "2024-02-01",
                            "2024-04-09"]),   # March missing
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.005, 20.0, 50.0, 5.0]),
    })
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = em._q_monthly_growth(str(tmp_path))
    assert got["ym"].tolist() == [202401, 202402, 202404]
    # 10.005 rounds half-AWAY to 1001 centi
    assert got["rev_centi"].tolist() == [3001, 5000, 500]
    assert got["delta_centi"].tolist() == [0, 1999, 0]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [11, 12])
def test_gaps_islands_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import gaps_islands

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 800
    day = rng.integers(19700, 19760, n).astype("int64")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 23, n).astype("int64"),
        "ts": pd.to_datetime(day * 86_400_000_000
                             + rng.integers(0, 86_400_000_000, n),
                             unit="us"),
    })
    got = (gaps_islands(rd.from_pandas(df.copy()), n_parts=5)
           .to_pandas().sort_values(["user_id", "start_day"])
           .reset_index(drop=True))

    rows = []
    for u, g in df.groupby("user_id"):
        ds = sorted(set((g["ts"].astype("int64") // (86_400 * 10**9))
                        .tolist()))
        s = e = ds[0]
        for d in ds[1:]:
            if d == e + 1:
                e = d
            else:
                rows.append((u, s, e, e - s + 1))
                s = e = d
        rows.append((u, s, e, e - s + 1))
    exp = (pd.DataFrame(rows,
                        columns=["user_id", "start_day", "end_day",
                                 "n_days"])
           .astype("int64").sort_values(["user_id", "start_day"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_event_throttle_gap_semantics():
    import ray.data as rd

    from vyntr_ray.stages.windows import event_throttle

    # one user/type stream with gaps straddling the threshold; a second
    # type interleaved to prove grouping is per (user, type)
    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, 10, "a", base),                                   # keep (first)
        (2, 10, "a", base + pd.Timedelta(seconds=100)),       # drop (<=300)
        (3, 10, "a", base + pd.Timedelta(seconds=400)),       # drop (gap == 300 exactly, NOT > 300)
        (4, 10, "a", base + pd.Timedelta(seconds=700, microseconds=1)),  # keep (gap > 300 from LAG row #3)
        (5, 10, "b", base + pd.Timedelta(seconds=150)),       # keep (first of b)
        (6, 11, "a", base + pd.Timedelta(seconds=150)),       # keep (other user)
        (7, 10, "a", base + pd.Timedelta(seconds=1000, microseconds=1)),  # drop (gap == 300 exactly from #4)
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    got = (event_throttle(rd.from_pandas(df), gap_s=300, n_parts=3)
           .to_pandas())
    assert sorted(got["event_id"].tolist()) == [1, 4, 5, 6]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [21, 22])
def test_scd2_intervals_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import scd2_intervals

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    SENT = 253_402_300_799_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 19, n).astype("int64"),
        "event_type": rng.choice(list("xyz"), n),
        # coarse ts -> deliberate ties exercised through the id tie-break
        "ts": pd.to_datetime(rng.integers(0, 40, n) * 10**6, unit="us"),
    })
    got = (scd2_intervals(rd.from_pandas(df.copy()), n_parts=5)
           .to_pandas()
           .sort_values(["user_id", "valid_from_us", "event_type"])
           .reset_index(drop=True))

    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        runs = []
        for t, ty in zip(g["ts"].astype("int64") // 1000, g["event_type"]):
            if not runs or runs[-1][1] != ty:
                runs.append([t, ty])
        for i, (t, ty) in enumerate(runs):
            vt = runs[i + 1][0] if i + 1 < len(runs) else SENT
            rows.append((u, ty, t, vt))
    exp = (pd.DataFrame(rows, columns=["user_id", "event_type",
                                       "valid_from_us", "valid_to_us"])
           .sort_values(["user_id", "valid_from_us", "event_type"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.astype({"user_id": "int64", "valid_from_us": "int64",
                         "valid_to_us": "int64"}))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [31, 32])
def test_group_median_matches_quantile_disc(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import group_median

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    df = pd.DataFrame({
        "user_id": rng.integers(0, 29, n).astype("int64"),
        # .005 boundaries land exactly -> rounding ties exercised
        "value": rng.integers(-400, 400, n) / 200.0,
    })
    got = (group_median(rd.from_pandas(df.copy()), n_parts=5)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    from vyntr_ray.rounding import round_half_away
    rows = []
    for u, g in df.groupby("user_id"):
        v = np.sort(round_half_away(
            g["value"].to_numpy() * 100).astype("int64"))
        idx = int(np.ceil(0.5 * len(v))) - 1
        rows.append((u, len(v), v[idx]))
    exp = (pd.DataFrame(rows, columns=["user_id", "n", "median_centi"])
           .astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_embedding_norms_exact():
    import ray.data as rd

    from vyntr_ray.stages.embed import embedding_norms

    rng = np.random.Generator(np.random.PCG64(5))
    vecs = [rng.normal(size=8).astype("float32") for _ in range(40)]
    df = pd.DataFrame({"vec_id": np.arange(40, dtype="int64"),
                       "embedding": [v.tolist() for v in vecs]})
    got = embedding_norms(rd.from_pandas(df), k=10).to_pandas()

    from vyntr_ray.rounding import round_half_away
    norm = np.array([
        (round_half_away(np.asarray(v, np.float64) * 1e4)
         .astype("int64") ** 2).sum()
        for v in vecs])
    order = np.lexsort((np.arange(40), -norm))[:10]
    assert got["vec_id"].tolist() == [int(i) for i in order]
    assert got["norm_sq"].tolist() == [int(norm[i]) for i in order]
    assert got["dim"].tolist() == [8] * 10


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [41, 42])
def test_group_mad_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.rounding import round_half_away
    from vyntr_ray.stages.windows import group_mad

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 21, n).astype("int64"),
        "value": rng.integers(-300, 300, n) / 200.0,  # .005 ties
    })
    got = (group_mad(rd.from_pandas(df.copy()), n_parts=5)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    def disc_med(a):
        a = np.sort(a)
        return a[int(np.ceil(0.5 * len(a))) - 1]

    rows = []
    for u, g in df.groupby("user_id"):
        v = round_half_away(g["value"].to_numpy() * 100).astype("int64")
        med = disc_med(v)
        rows.append((u, len(v), med, disc_med(np.abs(v - med))))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "median_centi",
                                      "mad_centi"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [51, 52])
def test_last_touch_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import last_touch

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 13, n).astype("int64"),
        "event_type": rng.choice(["click", "purchase", "view"], n),
        # coarse ts -> ties resolved by the event_id tie-break
        "ts": pd.to_datetime(rng.integers(0, 60, n) * 10**6, unit="us"),
    })
    got = (last_touch(rd.from_pandas(df.copy()), n_parts=4)
           .to_pandas().sort_values("target_id").reset_index(drop=True))

    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last_click = -1
        for eid, ty in zip(g["event_id"], g["event_type"]):
            if ty == "purchase":
                rows.append((eid, u, last_click))
            if ty == "click":
                last_click = eid
    exp = (pd.DataFrame(rows, columns=["target_id", "user_id", "touch_id"])
           .astype("int64").sort_values("target_id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [61, 62])
def test_watermark_filter_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import watermark_filter

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    # sparse, shuffled arrival ids + heavily out-of-order event times
    ids = np.sort(rng.choice(10 * n, n, replace=False)).astype("int64")
    df = pd.DataFrame({
        "event_id": ids,
        "ts": pd.to_datetime(rng.integers(0, 3600, n) * 10**6, unit="us"),
    })
    got = (watermark_filter(rd.from_pandas(df.copy()), allowed_s=600,
                            n_buckets=7)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    g = df.sort_values("event_id")
    tus = g["ts"].astype("int64").to_numpy() // 1000
    wm = np.r_[np.int64(-2**62), np.maximum.accumulate(tus)[:-1]]
    exp_kept = tus >= wm - 600 * 10**6
    assert got["kept"].to_numpy().tolist() == exp_kept.tolist()
    assert (~exp_kept).sum() > 0          # the shape actually drops rows


@pytest.mark.usefixtures("ray_session")
def test_readability_counts_and_edges():
    import re

    import ray.data as rd

    from vyntr_ray.stages.text_analysis import readability

    docs = ["Hello world. How are you?! Fine",
            "a b c",          # no sentence punctuation -> n_sents floors at 1
            "12345 --- !!!",   # zero words -> dropped
            "Rhythm myth"]     # y-only vowels
    df = pd.DataFrame({"doc_id": np.arange(4, dtype="int64"),
                       "text": docs})
    got = (readability(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 3]
    for _, r in got.iterrows():
        t = docs[int(r["doc_id"])]
        assert r["n_words"] == len(re.findall(r"[A-Za-z]+", t))
        assert r["n_syll"] == len(re.findall(r"[aeiouyAEIOUY]+", t))
        assert r["n_sents"] == max(len(re.findall(r"[.!?]+", t)), 1)
        w, s, sy = float(r["n_words"]), float(r["n_sents"]), float(r["n_syll"])
        assert abs(r["fk_grade"]
                   - (0.39 * (w / s) + 11.8 * (sy / w) - 15.59)) < 1e-6


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [71, 72])
def test_next_event_gap_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import next_event_gap

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 17, n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 50, n) * 10**6, unit="us"),
    })
    got = (next_event_gap(rd.from_pandas(df.copy()), n_parts=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    exp = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        tus = (g["ts"].astype("int64") // 1000).to_numpy()
        for i, eid in enumerate(g["event_id"]):
            gap = tus[i + 1] - tus[i] if i + 1 < len(tus) else -1
            exp.append((eid, u, gap))
    expd = (pd.DataFrame(exp, columns=["event_id", "user_id",
                                       "next_gap_us"])
            .astype("int64").sort_values("event_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), expd)


@pytest.mark.usefixtures("ray_session")
def test_session_paths_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.windows import session_path_partials

    rng = np.random.Generator(np.random.PCG64(9))
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 11, n).astype("int64"),
        "event_type": rng.choice(list("abc"), n),
        "ts": pd.to_datetime(rng.integers(0, 400, n) * 10**6, unit="us"),
    })
    parts = (session_path_partials(rd.from_pandas(df.copy()), gap_s=60,
                                   k_steps=3, n_parts=4)
             .to_pandas())
    got = (parts.groupby("path", as_index=False)["n"].sum()
           .sort_values("path").reset_index(drop=True))

    from collections import Counter
    c = Counter()
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        tus = (g["ts"].astype("int64") // 1000).to_numpy()
        sessions, cur = [], []
        for i, et in enumerate(g["event_type"]):
            if cur and tus[i] - tus[i - 1] > 60 * 10**6:
                sessions.append(cur)
                cur = []
            cur.append(et)
        sessions.append(cur)
        for s in sessions:
            c[">".join(s[:3])] += 1
    exp = (pd.DataFrame(sorted(c.items()), columns=["path", "n"])
           .astype({"n": "int64"}))
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_gap_fill_months_zero_rows(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    orders = pa.table({
        "o_orderdate": pa.array(
            pd.to_datetime(["2023-11-02", "2024-02-20", "2024-02-21"]),
            pa.timestamp("us")),
    })
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = em._q_gap_fill_months(str(tmp_path))
    assert got["ym"].tolist() == [202311, 202312, 202401, 202402]
    assert got["n_orders"].tolist() == [1, 0, 0, 2]


@pytest.mark.usefixtures("ray_session")
def test_fk_check_counts_orphans(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 9, 9, 9], pa.int64()),
        "l_suppkey": pa.array([100, 100, 101, 100, 555, 101], pa.int64()),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 11, 77], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_nationkey": pa.array([0, 6], pa.int32()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101], pa.int64()),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
    }), tmp_path / "nation.parquet")

    got = em._q_fk_check(str(tmp_path)).set_index("edge")
    assert got.loc["lineitem->orders"].tolist() == [6, 3]   # 9,9,9 orphan
    assert got.loc["orders->customer"].tolist() == [3, 1]   # custkey 77
    assert got.loc["lineitem->supplier"].tolist() == [6, 1]  # 555
    assert got.loc["customer->nation"].tolist() == [2, 1]   # nationkey 6
