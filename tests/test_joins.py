"""salted_join (operators/joins.py): exact equality to the plain join
under planted skew, join-type semantics, and the reserved-column
guard. The j10 driver query's DuckDB oracle is the external twin of
the equality tests here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.joins import SALT_COL, salted_join


def _skewed_fact(spark, n=20_000, hot_share=10):
    """n rows; every hot_share-th key collapses onto hot key 0."""
    return spark.range(n).select(
        F.when(F.col("id") % hot_share == 0, F.lit(0).cast("long"))
        .otherwise(F.col("id") % 500)
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") * 3 % 97).alias("val"),
    )


def _dim(spark, n_keys=500):
    return spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp-"), (F.col("id") % 7).cast("string")).alias("grp"),
    )


def _agg(df):
    return {
        (r.grp): (r.n, r.s)
        for r in df.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def test_salted_inner_join_equals_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = _agg(fact.join(dim, "k"))
    for n_salts in (1, 8):
        salted = _agg(
            salted_join(fact, dim, "k", salt_on=["row_id"], n_salts=n_salts)
        )
        assert salted == plain


def test_salted_left_join_preserves_unmatched_fact_rows(spark):
    fact = _skewed_fact(spark, n=2_000)
    dim = _dim(spark, n_keys=100)  # keys 100..499 unmatched
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", salt_on=["row_id"], how="left")
    assert salted.count() == plain.count()
    assert (
        salted.where(F.col("grp").isNull()).count()
        == plain.where(F.col("grp").isNull()).count()
    )
    # row-level equality (keys are unique per fact row via row_id)
    p = {(r.row_id): r.grp for r in plain.select("row_id", "grp").collect()}
    s = {(r.row_id): r.grp for r in salted.select("row_id", "grp").collect()}
    assert s == p


def test_salted_join_row_level_multiset(spark):
    """Not just aggregates: the joined row multiset is identical."""
    fact, dim = _skewed_fact(spark, n=5_000), _dim(spark)
    cols = ["k", "row_id", "val", "grp"]
    plain = sorted(map(tuple, fact.join(dim, "k").select(cols).collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(fact, dim, "k", salt_on=["row_id"])
            .select(cols)
            .collect(),
        )
    )
    assert salted == plain


def test_salt_column_reserved_guard(spark):
    fact = _skewed_fact(spark).withColumn(SALT_COL, F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        salted_join(fact, _dim(spark), "k", salt_on=["row_id"])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(
            _skewed_fact(spark), _dim(spark), "k", salt_on=["row_id"], how="full"
        )
    # n_salts=0 would be REMAINDER_BY_ZERO mid-job (ANSI) or a silent
    # NULL-salt empty join (non-ANSI) — must fail at call time instead
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(
            _skewed_fact(spark), _dim(spark), "k", salt_on=["row_id"], n_salts=0
        )


def test_salted_plan_joins_on_salt_and_spreads_hot_key(spark):
    """The physical plan must join on (k, salt) — the salt is IN the
    partitioning key, which is the whole mechanism — and the hot
    key's rows must actually spread across multiple shuffle
    partitions."""
    fact, dim = _skewed_fact(spark), _dim(spark)
    j = salted_join(fact, dim, "k", salt_on=["row_id"], n_salts=8)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert SALT_COL in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # hot key 0 routes to 8 distinct salt shards (deterministic hash)
    shards = (
        fact.where(F.col("k") == 0)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert shards == 8
