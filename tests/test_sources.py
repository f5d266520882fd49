"""Source negotiation: parquet path in the sandbox, informative error for
the Iceberg path when the runtime is absent."""

import pytest

from qfspark.sources import iceberg_available, read_table

from .conftest import SF_DIR


def test_read_table_parquet(spark):
    df = read_table(spark, f"{SF_DIR}/documents.parquet")
    assert df.count() > 0
    assert "doc_id" in df.columns


def test_read_table_auto_picks_parquet_for_paths(spark):
    df = read_table(spark, f"{SF_DIR}/events.parquet", fmt="auto")
    assert df.count() > 0


def test_iceberg_errors_informatively_when_missing(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, "warehouse.db.web_pages", fmt="iceberg")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_table(spark, "x.parquet", fmt="orc2")
