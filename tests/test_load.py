"""Star-schema load: enrichment joins + partitioned parquet write
(reference ``load_to_processed``, with the partitioned path actually on)."""

import os

import duckdb
import pytest

from etl_sql_duckdb_parquet__ray.pipelines.load import load_star_schema


def test_load_star_schema(ray_session, sf_dir, tmp_path):
    import ray

    out = load_star_schema(sf_dir, str(tmp_path))
    assert set(out) == {"dim_customer", "fact_orders", "fact_lineitem"}

    # hive partition dirs exist for the partitioned fact
    parts = [d for d in os.listdir(out["fact_lineitem"]) if d.startswith("l_returnflag=")]
    assert len(parts) >= 2

    con = duckdb.connect()
    # enrichment happened and row counts survive the round trip
    n_orders = con.sql(
        f"select count(*) from read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    fact = ray.data.read_parquet(out["fact_orders"])
    assert fact.count() == n_orders
    assert "c_mktsegment" in fact.schema().names

    n_li = con.sql(
        f"select count(*) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    li = ray.data.read_parquet(out["fact_lineitem"])
    assert li.count() == n_li

    dim = ray.data.read_parquet(out["dim_customer"])
    assert "n_name" in dim.schema().names
