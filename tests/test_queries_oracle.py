"""Mirror of the driver's correctness gate: run every queries() entry and
its oracle_sql() through DuckDB on the same parquet and compare
(row-count + column names + order-insensitive values)."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from feature_extraction_ray.pipelines.queries import QUERIES, ORACLE_SQL

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="stable",
                          na_position="first").reset_index(drop=True)


def _compare(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if np.issubdtype(gv.dtype, np.floating) or \
                np.issubdtype(ev.dtype, np.floating):
            np.testing.assert_allclose(
                gv.to_numpy(dtype=float), ev.to_numpy(dtype=float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
                err_msg=f"{name}.{c}")
        else:
            assert gv.astype(str).tolist() == ev.astype(str).tolist(), \
                f"{name}.{c} values differ"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name):
    res = QUERIES[name](SF_DIR)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    if name not in ORACLE_SQL:
        # rows-only entries: every one has separate goldens for VALUES;
        # here pin non-emptiness so a query that regresses to an empty
        # frame fails pytest, not just the sweep tool (round-4 verdict
        # item 4 — all current rows-only results are invariantly
        # non-empty on the test tables)
        assert len(got) > 0, f"{name}: rows-only query returned 0 rows"
        return
    exp = _duck(ORACLE_SQL[name])
    _compare(got, exp, name)
