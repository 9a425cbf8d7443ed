"""Skew model + skew-hardening evidence (north_rule: skewed
kind/media_ref distributions, explicit salting, AQE skew handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biosample_enricher_spark.synth import GenParams, gen_documents

P = GenParams(seed=42, n_assets=5_000)


def test_generator_produces_hot_keys(spark):
    """The skew the engine must survive is real: one asset takes ~30%
    of all media references and 'text' dominates kinds (~75%)."""
    docs = gen_documents(spark, 3_000, P)
    refs = (
        docs.select(F.explode(F.col("spans.media_ref")).alias("media_ref"))
        .where(F.col("media_ref").isNotNull())
        .groupBy("media_ref")
        .count()
        .orderBy(F.col("count").desc())
    )
    top = refs.first()
    total = refs.agg(F.sum("count")).first()[0]
    assert top["media_ref"] == "asset-00000000"
    assert 0.2 < top["count"] / total < 0.4

    kinds = (
        docs.select(F.explode(F.col("spans.kind")).alias("k"))
        .groupBy("k")
        .count()
        .collect()
    )
    share = {r.k: r["count"] for r in kinds}
    assert share["text"] / sum(share.values()) > 0.6


def test_salted_two_stage_agg_is_exact_under_skew(spark):
    """The salted two-stage pattern must give byte-identical counts to
    a naive groupBy on the hot-key distribution (stage 1 pre-aggregates
    per physical partition, bounding any reducer's input)."""
    docs = gen_documents(spark, 3_000, P)
    refs = docs.select(F.explode(F.col("spans.media_ref")).alias("media_ref")).where(
        F.col("media_ref").isNotNull()
    )
    naive = {
        r.media_ref: r.n
        for r in refs.groupBy("media_ref").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = (
        refs.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(64)))
        .groupBy("_salt", "media_ref")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy("media_ref")
        .agg(F.sum("_partial").alias("n"))
    )
    got = {r.media_ref: r.n for r in salted.collect()}
    assert got == naive
