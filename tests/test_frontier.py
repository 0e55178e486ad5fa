"""BucketedFrontier: equivalence with the flat frame + spill correctness."""

import numpy as np
import pandas as pd
import pytest

from vyntr_ray.state.frontier import BucketedFrontier
from vyntr_ray.state.politeness import PolitenessPolicy


def _mk(entries, start_seq=0):
    return pd.DataFrame({
        "seq": range(start_seq, start_seq + len(entries)),
        "url": [f"https://{d}/p/{start_seq + i}"
                for i, d in enumerate(entries)],
        "domain": entries,
    })


def _drain_flat(df, cap=5):
    """Oracle: the original single-frame implementation."""
    pol = PolitenessPolicy(max_per_domain=cap)
    waves = []
    while len(df):
        got, df = pol.select(df)
        if not len(got):
            break
        waves.append(got["url"].tolist())
    return waves


def _drain_bucketed(df, cap=5, **kw):
    f = BucketedFrontier(cap_hint=cap, **kw)
    f.add(df)
    pol = PolitenessPolicy(max_per_domain=cap)
    waves = []
    while len(f):
        got = f.select(pol)
        if not len(got):
            break
        waves.append(got["url"].tolist())
    return waves


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_equivalence_with_flat_frame(seed):
    rng = np.random.default_rng(seed)
    domains = [f"h{int(i)}.ex" for i in rng.integers(0, 12, size=400)]
    df = _mk(domains)
    assert _drain_bucketed(df.copy(), n_buckets=4) == _drain_flat(df.copy())


@pytest.mark.parametrize("seed", [3, 4])
def test_equivalence_with_spill_forced(seed, tmp_path):
    rng = np.random.default_rng(seed)
    domains = [f"h{int(i)}.ex" for i in rng.integers(0, 6, size=900)]
    df = _mk(domains)
    got = _drain_bucketed(df.copy(), n_buckets=2,
                          spill_dir=str(tmp_path / "spill"),
                          mem_rows=60, head_per_domain=12)
    assert got == _drain_flat(df.copy())


def _mk_prio(entries, start_seq=0, mod=13):
    df = _mk(entries, start_seq)
    df["priority"] = (df["seq"] * 7) % mod * 1.0
    return df


def _drain_prio(frontier_or_df, cap=4, bucketed=False, **kw):
    pol = PolitenessPolicy(max_per_domain=cap)
    waves = []
    if bucketed:
        f = BucketedFrontier(cap_hint=cap, **kw)
        f.add(frontier_or_df)
        while len(f):
            got = f.select(pol)
            if not len(got):
                break
            waves.append(got["url"].tolist())
    else:
        df = frontier_or_df
        while len(df):
            got, df = pol.select(df)
            if not len(got):
                break
            waves.append(got["url"].tolist())
    return waves


@pytest.mark.parametrize("seed", [5, 6])
def test_priority_spill_equivalence(seed, tmp_path):
    # priority mode with forced spilling must match the flat priority drain
    rng = np.random.default_rng(seed)
    domains = [f"h{int(i)}.ex" for i in rng.integers(0, 6, size=700)]
    df = _mk_prio(domains)
    flat = _drain_prio(df.copy(), cap=4)
    buck = _drain_prio(df.copy(), cap=4, bucketed=True, n_buckets=2,
                       spill_dir=str(tmp_path / "psp"), mem_rows=80,
                       head_per_domain=16)
    assert buck == flat


def test_incremental_add_between_waves(tmp_path):
    rng = np.random.default_rng(9)
    pol = PolitenessPolicy(max_per_domain=3)
    flat = pd.DataFrame(columns=["seq", "url", "domain"])
    buck = BucketedFrontier(n_buckets=3, spill_dir=str(tmp_path / "s"),
                            mem_rows=40, head_per_domain=10, cap_hint=3)
    seq = 0
    flat_waves, buck_waves = [], []
    for _round in range(12):
        add = _mk([f"h{int(i)}.ex" for i in rng.integers(0, 5, size=30)],
                  start_seq=seq)
        seq += len(add)
        flat = pd.concat([flat, add], ignore_index=True)
        buck.add(add)
        got_f, flat = PolitenessPolicy.select(pol, flat)
        got_b = buck.select(pol)
        flat_waves.append(got_f["url"].tolist())
        buck_waves.append(got_b["url"].tolist())
    assert buck_waves == flat_waves


@pytest.mark.usefixtures("ray_session")
def test_select_distributed_equivalence(tmp_path):
    # the Ray-task per-bucket selection path must match driver-side select
    rng = np.random.default_rng(7)
    domains = [f"h{int(i)}.ex" for i in rng.integers(0, 10, size=500)]
    df = _mk(domains)
    pol = PolitenessPolicy(max_per_domain=5)
    pol_b = PolitenessPolicy(max_per_domain=5)
    a = BucketedFrontier(n_buckets=4)
    b = BucketedFrontier(n_buckets=4)
    a.add(df.copy())
    b.add(df.copy())
    waves_a, waves_b = [], []
    while len(a):
        waves_a.append(a.select(pol)["url"].tolist())
        waves_b.append(b.select_distributed(pol_b)["url"].tolist())
        if not waves_a[-1]:
            break
    assert waves_a == waves_b
    assert len(b) == 0


@pytest.mark.usefixtures("ray_session")
def test_select_distributed_stateful_equivalence(tmp_path):
    # token balances ride with the bucket tasks — throttled selection must
    # match the driver-side stateful path wave for wave
    rng = np.random.default_rng(8)
    domains = [f"h{int(i)}.ex" for i in rng.integers(0, 6, size=400)]
    df = _mk(domains)
    pol_a = PolitenessPolicy(max_per_domain=5, refill=2.0)
    pol_b = PolitenessPolicy(max_per_domain=5, refill=2.0)
    a = BucketedFrontier(n_buckets=4)
    b = BucketedFrontier(n_buckets=4)
    a.add(df.copy())
    b.add(df.copy())
    waves_a, waves_b = [], []
    while len(a):
        waves_a.append(a.select(pol_a)["url"].tolist())
        waves_b.append(b.select_distributed(pol_b)["url"].tolist())
        if not waves_a[-1]:
            break
    assert waves_a == waves_b
    assert pol_a._tokens == pol_b._tokens
    assert len(b) == 0


def test_hot_domain_split_spill_equivalence(tmp_path):
    # one mega-host + small hosts, spill forced, hot threshold tiny: the
    # mega-host's tail goes to its own host-* generations and selection is
    # STILL identical to the in-memory frontier, wave for wave
    rng = np.random.default_rng(13)
    doms = ["mega.ex"] * 3000 + [f"s{int(i)}.ex"
                                 for i in rng.integers(0, 20, size=300)]
    rng.shuffle(doms)
    df = _mk(list(doms))
    flat = _drain_flat(df.copy())
    f = BucketedFrontier(n_buckets=2, spill_dir=str(tmp_path / "sp"),
                         mem_rows=150, head_per_domain=12, cap_hint=5,
                         hot_rows=60)
    f.add(df.copy())
    assert f._dom_gen, "mega-host tail must spill into its own generations"
    # host-salted files exist on disk
    import glob as g
    assert g.glob(str(tmp_path / "sp" / "bucket=*" / "host-*" / "*.parquet"))
    pol = PolitenessPolicy(max_per_domain=5)
    waves = []
    while len(f):
        got = f.select(pol)
        if not len(got):
            break
        waves.append(got["url"].tolist())
    assert waves == flat
    assert len(f.to_frame()) == 0


def test_hot_domain_split_to_frame_complete(tmp_path):
    # checkpointing must see rows living in per-domain generations
    df = _mk(["mega.ex"] * 1000 + ["small.ex"] * 10)
    f = BucketedFrontier(n_buckets=1, spill_dir=str(tmp_path / "sp"),
                         mem_rows=100, head_per_domain=10, cap_hint=5,
                         hot_rows=50)
    f.add(df)
    assert f._dom_gen
    assert len(f.to_frame()) == 1010


def test_spill_bounds_memory(tmp_path):
    f = BucketedFrontier(n_buckets=1, spill_dir=str(tmp_path / "sp"),
                         mem_rows=100, head_per_domain=10, cap_hint=5)
    f.add(_mk(["only.ex"] * 5000))
    resident = sum(len(x) for x in f.buckets.values())
    assert resident <= 110          # head only; 4990 rows on disk
    assert len(f) == 5000
    assert len(f.to_frame()) == 5000


def test_checkpoint_roundtrip_with_spill(tmp_path):
    df = _mk([f"h{i % 4}.ex" for i in range(500)])
    f = BucketedFrontier(n_buckets=2, spill_dir=str(tmp_path / "sp"),
                         mem_rows=50, head_per_domain=12, cap_hint=5)
    f.add(df)
    frame = f.to_frame()
    assert len(frame) == 500
    g = BucketedFrontier.from_frame(frame, n_buckets=4)
    pol = PolitenessPolicy(max_per_domain=5)
    assert g.select(pol)["url"].tolist() == \
        BucketedFrontier.from_frame(df, n_buckets=1).select(pol)["url"].tolist()
