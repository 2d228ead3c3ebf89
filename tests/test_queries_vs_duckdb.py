"""Mimics the driver's correctness gate: every queries() entry that has
an oracle_sql() entry is run at sf0.001 and compared against DuckDB on
the same parquet (row count, schema-by-name, exact values after each
side's own rounding). Rows-only entries are smoke-checked for shape.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
# corpus-reading oracles (media_feature_stats) must point at the SAME
# sf tier this harness queries (the driver gate uses its sf0.01 default)
os.environ["GRAFT_ORACLE_SF_DIR"] = SF_DIR

import __ray_entry__ as entrymod  # noqa: E402
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
_CHECKED = sorted(_ORACLES)
_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", _CHECKED)
def test_query_matches_oracle(name):
    ray_df = _QUERIES[name](SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    duck_df = _duck(_ORACLES[name])
    assert len(ray_df) == len(duck_df), f"{name}: row count"
    assert sorted(ray_df.columns) == sorted(duck_df.columns), f"{name}: schema"
    a, b = _canon(ray_df), _canon(duck_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            mism = ~(np.isclose(a[c], b[c], rtol=0, atol=0, equal_nan=True))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, first: "
                f"{a[c][mism].head(3).tolist()} vs {b[c][mism].head(3).tolist()}")
        else:
            pd.testing.assert_series_equal(a[c], b[c], check_names=False,
                                           obj=f"{name}.{c}")


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(name):
    out = _QUERIES[name](SF_DIR)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out.shape[1] > 0
    assert len(out) >= 0
