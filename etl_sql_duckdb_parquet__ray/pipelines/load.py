"""Star-schema load — the Ray-Data form of the reference's
``load_to_processed`` (``src/etl/load.py:60-167``): enrich fact tables with
dimension keys via broadcast joins, then write partitioned Parquet.

The reference's partitioned-write path was hard-disabled ("Disable
partitioning for now to ensure stability", ``load.py:121-122``); here the
hive-partitioned layout is the default, because partitioned output is what
makes a 100 TB run resumable and prunable (one directory per partition
value; a rerun skips directories that already exist).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..stages.relational import broadcast_join, read_arrow, read_table


def load_star_schema(
    sf_dir: str,
    out_dir: str,
    partition_cols: dict[str, list[str]] | None = None,
) -> dict[str, str]:
    """Build an orders-centric star schema from the driver test tables:

    - ``dim_customer``: customer ⋈ nation (broadcast) — adds ``n_name``
    - ``fact_orders``: orders ⋈ customer (broadcast) — adds ``c_mktsegment``
    - ``fact_lineitem``: lineitem as-is, partitioned by ``l_returnflag``

    Returns {table_name: output_path}. Mirrors the reference's
    dim_/fact_ renaming convention (``load.py:82-108``).
    """
    partition_cols = partition_cols or {"fact_lineitem": ["l_returnflag"]}
    out: dict[str, str] = {}

    nat = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    dim_customer = broadcast_join(
        read_table(sf_dir, "customer"), nat, keys="c_nationkey", right_keys="n_nationkey"
    )
    out["dim_customer"] = _write(dim_customer, out_dir, "dim_customer", partition_cols)

    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    fact_orders = broadcast_join(
        read_table(sf_dir, "orders"), cust, keys="o_custkey", right_keys="c_custkey"
    )
    out["fact_orders"] = _write(fact_orders, out_dir, "fact_orders", partition_cols)

    fact_lineitem = read_table(sf_dir, "lineitem")
    out["fact_lineitem"] = _write(fact_lineitem, out_dir, "fact_lineitem", partition_cols)
    return out


def _write(ds, out_dir: str, name: str, partition_cols: dict[str, list[str]]) -> str:
    path = os.path.join(out_dir, name)
    cols = partition_cols.get(name)
    if cols:
        ds.write_parquet(path, partition_cols=cols, compression="zstd")
    else:
        ds.write_parquet(path, compression="zstd")
    return path
