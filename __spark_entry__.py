"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: loads the sf0.001 documents parquet, lifts
it into the engine's interleaved span shape, unions it with a seeded
synthetic media corpus, and runs the full constraint suite (span
integrity + uniqueness + referential) → violation rows.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 (see biosample_enricher_spark/queries.py);
DuckDB-verifiable entries carry oracle SQL, engine-specific ops
(LSH banding, SRP sketches, HLL) are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from biosample_enricher_spark.constraints import ConstraintSuite
    from biosample_enricher_spark.synth import (
        GenParams,
        gen_asset_catalog,
        gen_documents,
    )

    raw = spark.read.parquet(f"{SF001}/documents.parquet")
    # lift the flat driver table into the interleaved span shape:
    # one text span per document
    real_docs = raw.select(
        F.format_string("real-%012d", F.col("doc_id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    params = GenParams(seed=42, n_assets=1000)
    synth_docs = gen_documents(spark, 2000, params)
    docs = synth_docs.unionByName(real_docs)
    suite = ConstraintSuite()
    result = suite.run(docs, gen_asset_catalog(spark, params))
    return result.violations


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from biosample_enricher_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    from biosample_enricher_spark.queries import ORACLES

    return dict(ORACLES)
