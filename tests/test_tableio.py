"""TableIO abstraction: parquet backend round-trips; iceberg
identifiers resolve to the Iceberg backend (jar unavailable in the
sandbox, so only resolution + parquet behavior are exercised here)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from biosample_enricher_spark.sources import resolve_table_io
from biosample_enricher_spark.sources.tableio import IcebergTableIO, ParquetTableIO

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def test_parquet_roundtrip_append_overwrite(spark, tmp_path):
    io = resolve_table_io(spark, str(tmp_path / "t"), schema=SCHEMA)
    assert isinstance(io, ParquetTableIO)
    assert not io.exists()
    # empty read with schema → typed empty frame
    assert io.read().count() == 0
    df = spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    io.append(df)
    assert io.exists() and io.read().count() == 2
    io.append(df)
    assert io.read().count() == 4
    io.overwrite(df)
    assert io.read().count() == 2


def test_missing_parquet_without_schema_raises(spark, tmp_path):
    io = resolve_table_io(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        io.read()


def test_iceberg_identifier_resolution(spark):
    io = resolve_table_io(spark, "iceberg:cat.db.checkpoint")
    assert isinstance(io, IcebergTableIO)
    assert io.table == "cat.db.checkpoint"
