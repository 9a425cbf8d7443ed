"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated large-×-large equi-join
(documents × per-doc enrichments, documents × violation history) is
the shuffle of both sides on every run. Writing both tables bucketed
on the join key removes it permanently: Spark's bucketing guarantees
rows with equal key hashes land in the same bucket file index, so a
SortMergeJoin of two tables with compatible bucketing reads matching
buckets directly — the physical plan has NO Exchange on either side
(asserted in tests/test_plans.py::test_bucketed_join_has_no_shuffle).

This is the batch analog of the Iceberg ``bucket(N, doc_id)``
partition transform the north_star's table would use; the writer here
targets the session catalog (external parquet tables with explicit
paths), which is what the sandbox has. The same ``bucketBy`` calls work
against a real metastore unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as an external parquet table bucketed (and
    optionally sorted) on ``bucket_col``. Sorting within buckets lets
    the join skip its per-task sort too."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
