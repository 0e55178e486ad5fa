"""Tie-boundary rounding parity: engine half-away-from-zero vs DuckDB.

The driver's round-3 ``tpch_q18ish`` hash red was a rounding-mode
divergence (pyarrow/numpy half-to-even vs DuckDB half-away) invisible on
the local testdata (all money/qty columns integral at their scaling
grid).  These tests inject EXACT float64 ties (halves for quantities,
eighths — ``x.125`` — for centi-scaled columns) and re-run the
tie-sensitive oracled queries at the driver bar: exact value equality,
floats included.
"""

import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import __ray_entry__ as entry_mod
from make_tie_sf import make_tie_sf

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the queries whose scaling sites can see a tie on adversarial data
TIE_QUERIES = [
    "tpch_q1ish", "tpch_q3ish", "tpch_q18ish", "qty_discount_corr",
    "lag_diff", "rolling_sum", "running_total", "sessionize",
    "value_quantiles", "value_quantiles_cont", "ntile_buckets",
    "region_customers",
    # r4 analogs: every one scales money/qty per row
    "tpch_q6ish", "tpch_q10ish", "tpch_q14ish", "tpch_q17ish",
    "tpch_q19ish", "tpch_q22ish",
    "tpch_q8ish", "tpch_q9ish", "tpch_q11ish", "tpch_q15ish",
    "tpch_q20ish",
]


def test_round_half_away_matches_duckdb():
    # values go through a TABLE (the driver's data path) — a ::DOUBLE
    # literal takes DuckDB's decimal-literal binding, which rounds
    # 1000000000000000.5 differently from the double column kernel
    from vyntr_ray.rounding import iround_half_away, round_half_away
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.array([-2.5, -1.5, -0.5, -0.49999999999999994, 0.0,
                  0.49999999999999994, 0.5, 1.5, 2.5, 15010.5, -15010.5,
                  12.5, 112.5, 1e15 + 0.5, -1e15 - 0.5]),
        rng.normal(0, 1000, 500),
        np.floor(rng.uniform(-100, 100, 200)) + 0.5,
        np.floor(rng.uniform(-100, 100, 200))
        + rng.choice([0.125, 0.375, 0.625, 0.875], 200),
    ])
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    for nd in (0, 2, 4, 6):
        got = round_half_away(vals, nd)
        exp = np.array([r[0] for r in con.execute(
            f"SELECT round(v, {nd}) FROM t").fetchall()])
        bad = got != exp
        assert not bad.any(), (nd, vals[bad][:5], got[bad][:5], exp[bad][:5])
    for v in (-2.5, 2.5, 0.5, -0.49999999999999994, 15010.5):
        assert iround_half_away(v) == int(round_half_away(np.array([v]))[0])


@pytest.fixture(scope="module")
def tie_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("tie_sf"))
    return make_tie_sf("/root/testdata/sf0.001", dst)


@pytest.fixture(scope="module")
def tie_con(tie_sf):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{tie_sf}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", TIE_QUERIES)
def test_tie_query_matches_oracle_exactly(name, tie_sf, tie_con):
    if name not in entry_mod.oracle_sql():
        pytest.skip(f"{name} has no oracle")
    res = entry_mod.queries()[name](tie_sf)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    exp = _canon(tie_con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} != {len(exp)} rows"
    for c in got.columns:
        g = got[c].to_numpy()
        e = exp[c].to_numpy()
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            # driver bar: EXACT equality, floats included
            same = np.array([(pd.isna(a) and pd.isna(b)) or a == b
                             for a, b in zip(g, e)])
            assert same.all(), \
                f"{name}.{c}: {int((~same).sum())} exact-float mismatches " \
                f"e.g. {g[~same][:3]} vs {e[~same][:3]}"
        else:
            assert (pd.Series(g).astype(str)
                    == pd.Series(e).astype(str)).all(), f"{name}.{c}"
