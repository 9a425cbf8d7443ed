"""Pure-DataFrame Bloom filter (operators/bloom.py): the
no-false-negative guarantee, a measured false-positive rate against
the theoretical bound, exact equality of the referential tier with the
plain anti-join, and the definite/verified split invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.bloom import (
    bloom_referential_violations,
    build_bloom,
    might_contain,
)


def _probe(spark, catalog_ids, probe_ids, m_bits, k):
    cat = spark.createDataFrame([(i,) for i in catalog_ids], "key long")
    probes = spark.createDataFrame([(i,) for i in probe_ids], "key long")
    bloom = build_bloom(cat, "key", m_bits=m_bits, k=k)
    return probes.crossJoin(F.broadcast(bloom)).select(
        "key", might_contain(F.col("key"), F.col("words"), m_bits, k).alias("hit")
    )


def test_no_false_negatives(spark):
    cat = list(range(1, 2001))
    got = _probe(spark, cat, cat, m_bits=1 << 16, k=5).collect()
    assert all(r.hit for r in got)


def test_false_positive_rate_near_theoretical(spark):
    # deliberately undersized filter so FPs actually occur:
    # n=1000, m=4096, k=3 → p = (1 - e^{-kn/m})^3 ≈ 0.14
    n, m, k = 1000, 4096, 3
    cat = list(range(1, n + 1))
    absent = list(range(10**6, 10**6 + 5000))
    hits = (
        _probe(spark, cat, absent, m_bits=m, k=k)
        .where(F.col("hit"))
        .count()
    )
    fpr = hits / len(absent)
    theo = (1.0 - math.exp(-k * n / m)) ** k
    assert 0.5 * theo < fpr < 2.0 * theo, (fpr, theo)


def test_filter_is_dense_and_sized(spark):
    cat = spark.createDataFrame([(i,) for i in range(100)], "key long")
    row = build_bloom(cat, "key", m_bits=1 << 12, k=4).collect()[0]
    assert len(row.words) == (1 << 12) // 64
    assert row.m_bits == 1 << 12 and row.k == 4
    with pytest.raises(ValueError):
        build_bloom(cat, "key", m_bits=100)  # not a multiple of 64


def test_referential_tier_equals_exact_antijoin(spark):
    # dirty ingest: 30% of fact keys reference nothing
    facts = spark.createDataFrame(
        [(i, i % 1000 if i % 10 < 7 else 10**7 + i) for i in range(5000)],
        "row_id long, key long",
    )
    catalog = spark.createDataFrame(
        [(i,) for i in range(1000)], "ckey long"
    )
    got = bloom_referential_violations(
        facts, "key", catalog, "ckey", m_bits=1 << 14, k=5
    )
    exact = facts.join(
        catalog.select(F.col("ckey").alias("key")), "key", "left_anti"
    )
    assert sorted((r.row_id, r.key) for r in got.collect()) == sorted(
        (r.row_id, r.key) for r in exact.collect()
    )


def test_definite_split_is_shuffle_free_fast_path(spark):
    """Bloom-failing rows are definite violations found before any
    join: every bloom-miss key must be absent from the catalog."""
    n, m, k = 500, 1 << 13, 5
    catalog = spark.createDataFrame([(i,) for i in range(n)], "ckey long")
    facts = spark.createDataFrame(
        [(i,) for i in range(2 * n)], "key long"
    )
    bloom = build_bloom(catalog, "ckey", m_bits=m, k=k)
    probed = facts.crossJoin(F.broadcast(bloom)).select(
        "key", might_contain(F.col("key"), F.col("words"), m, k).alias("hit")
    )
    misses = {r.key for r in probed.where(~F.col("hit")).collect()}
    assert misses and all(key >= n for key in misses)


def test_referential_tier_survives_key_dtype_mismatch(spark):
    """xxhash64 is type-sensitive where join equality coerces: an INT
    fact key probed against a BIGINT-built filter must still equal the
    exact anti-join (the operator normalizes the probe to the catalog
    key's dtype)."""
    facts = spark.createDataFrame(
        [(i, i % 100 if i % 5 else 10**6 + i) for i in range(500)],
        "row_id int, key int",
    )
    catalog = spark.createDataFrame([(i,) for i in range(100)], "ckey long")
    got = bloom_referential_violations(
        facts, "key", catalog, "ckey", m_bits=1 << 13, k=4
    )
    exact = facts.join(
        catalog.select(F.col("ckey").cast("int").alias("key")),
        "key",
        "left_anti",
    )
    assert sorted((r.row_id, r.key) for r in got.collect()) == sorted(
        (r.row_id, r.key) for r in exact.collect()
    )


def test_referential_tier_tolerates_fact_column_named_words(spark):
    """Fact columns named words/k/m_bits must survive — the filter row
    rides under the reserved _bloom_ prefix."""
    facts = spark.createDataFrame(
        [(i, f"w{i}", i % 50 if i % 3 else 999_999) for i in range(200)],
        "k long, words string, key long",
    )
    catalog = spark.createDataFrame([(i,) for i in range(50)], "ckey long")
    got = bloom_referential_violations(facts, "key", catalog, "ckey")
    assert set(got.columns) == {"k", "words", "key"}
    exact = facts.join(
        catalog.select(F.col("ckey").alias("key")), "key", "left_anti"
    )
    assert got.count() == exact.count()
    import pytest as _pytest

    bad = facts.withColumnRenamed("words", "_bloom_words")
    with _pytest.raises(ValueError, match="_bloom_"):
        bloom_referential_violations(bad, "key", catalog, "ckey")
