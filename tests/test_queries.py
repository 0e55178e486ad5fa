"""Oracle-equivalence tests: every queries() entry vs its DuckDB SQL.

Mirrors the driver harness: run the Ray pipeline and the oracle SQL on the
same parquet tables, compare row count + column names + order-insensitive
values (sorted by all columns).  Runs at sf0.001 for speed; the driver
repeats at sf0.01.
"""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SQL_KEYS = sorted(entry_mod.oracle_sql().keys())
NOSQL_KEYS = sorted(set(entry_mod.queries()) - set(SQL_KEYS))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(name, con):
    got = _canon(_to_df(entry_mod.queries()[name](SF_DIR)))
    exp = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), \
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            ok = all(
                (pd.isna(a) and pd.isna(b)) or math.isclose(
                    float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
                for a, b in zip(g, e))
            assert ok, f"{name}: float col {c} differs"
        else:
            pd.testing.assert_series_equal(
                g, e.astype(g.dtype) if g.dtype != e.dtype else e,
                check_names=False, check_dtype=False,
                obj=f"{name}.{c}")


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NOSQL_KEYS)
def test_nosql_query_runs(name):
    df = _to_df(entry_mod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
    # deterministic: run-to-run stability is covered by fixed seeds; here we
    # at least require a well-formed non-degenerate result
    if name not in ("minhash_dups", "simhash_dups", "embedding_dups"):
        assert len(df) > 0, f"{name} returned no rows"


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    df = _to_df(entry_mod.entry())
    assert len(df) > 0
    assert {"url", "content_text", "partition", "wave", "pos"} <= set(df.columns)
