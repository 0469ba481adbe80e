"""CSV ingest with sniffing + audit stamping (reference S1/S2/M6/M7) and
outlier flagging (V11)."""

import numpy as np
import pandas as pd
import pytest

from etl_sql_duckdb_parquet__ray.sources.ingest import (
    add_audit_columns,
    detect_separator,
    ingest_file,
)
from etl_sql_duckdb_parquet__ray.stages.profile import (
    flag_outliers_iqr,
    flag_outliers_zscore,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "samples.csv"
    p.write_text("Sample_ID ,platform\n s1 ,ILLUMINA\ns2,NANOPORE\n")
    return str(p)


@pytest.fixture()
def tsv_file(tmp_path):
    p = tmp_path / "runs.tsv"
    p.write_text("run_id\tsample_id\nr1\ts1\nr2\ts2\n")
    return str(p)


def test_detect_separator(csv_file, tsv_file):
    assert detect_separator(csv_file) == ","
    assert detect_separator(tsv_file) == "\t"


def test_ingest_file_stamps_and_normalizes(ray_session, csv_file):
    df = ingest_file(csv_file, ingested_at="2026-08-17T00:00:00").to_pandas()
    assert list(df.columns) == [
        "sample_id ", "platform", "ingested_at", "source_file", "row_hash",
    ] or "sample_id" in df.columns[0]
    assert (df["source_file"] == "samples.csv").all()
    assert (df["ingested_at"] == "2026-08-17T00:00:00").all()
    assert df["row_hash"].str.len().eq(16).all()
    # deterministic: same file, same hashes
    df2 = ingest_file(csv_file, ingested_at="2026-08-17T00:00:00").to_pandas()
    assert list(df["row_hash"]) == list(df2["row_hash"])


def test_ingest_tsv_all_string(ray_session, tsv_file):
    df = ingest_file(tsv_file, ingested_at="t").to_pandas()
    assert list(df["run_id"]) == ["r1", "r2"]
    assert df["sample_id"].dtype == object


def test_outlier_flagging(ray_session):
    import ray

    rng = np.random.default_rng(0)
    vals = np.round(rng.normal(50, 5, 2000), 2)
    vals[:3] = [200.0, -100.0, 199.99]  # planted outliers
    ds = ray.data.from_pandas(pd.DataFrame({"id": np.arange(2000), "value": vals}))
    z = flag_outliers_zscore(ds, "value", threshold=3.0).to_pandas()
    assert {0, 1, 2} <= set(z["id"])
    assert len(z) < 50
    iqr = flag_outliers_iqr(ds, "value", k=1.5).to_pandas()
    assert {0, 1, 2} <= set(iqr["id"])
