"""Batch MERGE (upsert/delete apply): all three WHEN branches, full-row
replace semantics, non-unique-base convergence, idempotence, and the
column-contract guards."""

from __future__ import annotations

import pytest

from biosample_enricher_spark.operators.merge import merge_upsert

BASE_SCHEMA = "k bigint, v string"
CHG_SCHEMA = "k bigint, v string, op string"


def _snap(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_merge_delete_update_insert(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")], BASE_SCHEMA
    )
    changes = spark.createDataFrame(
        [(2, None, "delete"), (3, "C2", "upsert"), (6, "f", "upsert")],
        CHG_SCHEMA,
    )
    out = merge_upsert(base, changes, ["k"])
    assert _snap(out) == [(1, "a"), (3, "C2"), (4, "d"), (5, "e"), (6, "f")]


def test_merge_delete_of_missing_key_is_noop(spark):
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    changes = spark.createDataFrame([(9, None, "delete")], CHG_SCHEMA)
    assert _snap(merge_upsert(base, changes, ["k"])) == [(1, "a")]


def test_merge_nonunique_base_converges_to_one_row_per_changed_key(spark):
    base = spark.createDataFrame([(3, "x"), (3, "y"), (4, "z")], BASE_SCHEMA)
    changes = spark.createDataFrame([(3, "w", "upsert")], CHG_SCHEMA)
    assert _snap(merge_upsert(base, changes, ["k"])) == [(3, "w"), (4, "z")]


def test_merge_composite_key(spark):
    base = spark.createDataFrame(
        [(1, "p", "a"), (1, "q", "b")], "k bigint, k2 string, v string"
    )
    changes = spark.createDataFrame(
        [(1, "p", None, "delete"), (1, "r", "c", "upsert")],
        "k bigint, k2 string, v string, op string",
    )
    out = merge_upsert(base, changes, ["k", "k2"])
    got = sorted((r["k"], r["k2"], r["v"]) for r in out.collect())
    assert got == [(1, "q", "b"), (1, "r", "c")]


def test_merge_idempotent_under_reapply(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], BASE_SCHEMA
    )
    changes = spark.createDataFrame(
        [(1, None, "delete"), (2, "B", "upsert"), (7, "g", "upsert")],
        CHG_SCHEMA,
    )
    once = merge_upsert(base, changes, ["k"])
    twice = merge_upsert(once, changes, ["k"])
    assert _snap(once) == _snap(twice) == [(2, "B"), (3, "c"), (7, "g")]


def test_merge_rejects_missing_op_column(spark):
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    bad = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    with pytest.raises(ValueError, match="op column"):
        merge_upsert(base, bad, ["k"])


def test_merge_rejects_column_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    bad = spark.createDataFrame(
        [(1, "a", 5, "upsert")], "k bigint, v string, extra int, op string"
    )
    with pytest.raises(ValueError, match="!= base"):
        merge_upsert(base, bad, ["k"])


def test_merge_rejects_unknown_op_value(spark):
    """r6 (ADVICE r5): an unrecognized op must FAIL the job, not
    silently behave as DELETE (anti-joined out of base, re-inserted by
    neither branch)."""
    from pyspark.errors import SparkRuntimeException

    base = spark.createDataFrame([(1, "a"), (2, "b")], BASE_SCHEMA)
    bad = spark.createDataFrame(
        [(1, "a2", "update")], "k bigint, v string, op string"
    )
    with pytest.raises(SparkRuntimeException, match="unknown op"):
        _snap(merge_upsert(base, bad, ["k"]))
