"""Driver-gate rehearsal: every oracled query in ``__ray_entry__`` must
match its DuckDB oracle on the same parquet tables (row count + sorted-column
values), exactly the comparison the driver performs at sf0.01.
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


ORACLED = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, ray_session, sf_dir, oracle_con):
    ray_df = _canon(_to_df(E.queries()[name](sf_dir)))
    oracle_df = _canon(oracle_con.sql(E.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(oracle_df.columns)
    assert len(ray_df) == len(oracle_df)
    pd.testing.assert_frame_equal(ray_df, oracle_df, check_dtype=False)


def test_all_queries_have_callables():
    qs = E.queries()
    for name in ORACLED:
        assert name in qs, f"oracle {name} has no queries() entry"


def test_entry_smoke(ray_session):
    res = E.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
