"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare oracle-backed ones against DuckDB exactly the way the driver does
(row count + schema + order-insensitive value comparison)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, con, ray_session):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ours = _normalize(_to_df(q(SF_DIR)))
    oracle = _normalize(con.sql(sql).df())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: columns {list(ours.columns)} != {list(oracle.columns)}")
    assert len(ours) == len(oracle), f"{name}: {len(ours)} != {len(oracle)} rows"
    for col in ours.columns:
        a = ours[col].reset_index(drop=True)
        b = oracle[col].reset_index(drop=True)
        try:
            b = b.astype(a.dtype)
        except (TypeError, ValueError):
            pass
        pd.testing.assert_series_equal(a, b, check_names=False,
                                       check_dtype=False, obj=f"{name}.{col}")


ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(name, ray_session):
    q = entrymod.queries()[name]
    df = _to_df(q(SF_DIR))
    assert df is not None
    # every rows-only query must produce rows at sf0.01 — the testdata has
    # planted near-duplicates, so even the sketch pair queries are
    # non-vacuous (r1 verdict: a 0==0 check proves nothing)
    assert len(df) > 0, name


def test_entry_smoke(ray_session):
    result = entrymod.entry()
    df = _to_df(result)
    assert len(df) >= 0
    assert {"url", "status", "extracted_md"} <= set(df.columns)
    assert (df["status"] == "ok").mean() > 0.9
