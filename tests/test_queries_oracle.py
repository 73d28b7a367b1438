"""Driver-gate rehearsal: every queries() entry with an oracle_sql() entry
is compared against DuckDB at sf0.001 (the driver does the same at sf0.01).
Row count + schema + order-insensitive values, column names matched.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        ray_df.columns, sql_df.columns
    )
    assert len(ray_df) == len(sql_df), (len(ray_df), len(sql_df))
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.allclose(av.astype(float), bv.astype(float), atol=1e-9), c
        else:
            mismatch = av != bv
            assert not mismatch.any(), (c, av[mismatch][:5], bv[mismatch][:5])


def _entry_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _entry_module()


def _sql_checked_names():
    mod = _entry_module()
    return sorted(mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _sql_checked_names())
def test_query_matches_oracle(entry_mod, name):
    ray_res = _to_pandas(entry_mod.queries()[name](SF_DIR))
    sql_res = _duck(entry_mod.oracle_sql()[name])
    _compare(ray_res, sql_res)


def test_rows_only_queries_run(entry_mod):
    """Queries without SQL oracles must at least run and return rows."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        if name == "clips_near_dedup":
            continue                     # covered by test_entry_smoke
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) > 0, name


def test_entry_smoke(entry_mod):
    """The driver's smoke check: entry() runs and yields rows."""
    df = _to_pandas(entry_mod.entry())
    assert len(df) > 0
    assert {"clip_id", "cluster_id", "is_canonical", "action"} <= set(df.columns)
