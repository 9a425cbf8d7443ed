"""Schema profiler vs the reference's walk-test cases
(/root/reference/tests/test_schema_tools.py:49-237, adapted to typed
frames): exact per-path coverage, presence counts, array-element
profiling, and example values."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from biosample_enricher_spark.operators.profile import schema_profile
from biosample_enricher_spark.synth import GenParams, gen_documents

NESTED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("depth", T.DoubleType()),
        T.StructField(
            "env",
            T.StructType(
                [
                    T.StructField("term", T.StringType()),
                    T.StructField("score", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("weight", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

DOCS = [
    {"id": "a", "depth": 1.5, "env": {"term": "soil", "score": 3},
     "tags": [{"name": "x", "weight": 0.5}, {"name": "y", "weight": None}]},
    {"id": "b", "depth": None, "env": {"term": "water", "score": None},
     "tags": []},
    {"id": "c", "depth": 2.5, "env": None, "tags": None},
]


def _profile(spark):
    df = spark.createDataFrame(DOCS, NESTED_SCHEMA)
    return {r.field_path: r for r in schema_profile(df, max_examples=2).collect()}


def test_coverage_per_path(spark):
    p = _profile(spark)
    assert p["id"].present_docs == 3 and p["id"].coverage_pct == 100.0
    assert p["depth"].present_docs == 2
    assert round(p["depth"].coverage_pct, 2) == 66.67
    # nested struct leaves: env null on doc c → term present in 2
    assert p["env.term"].present_docs == 2
    assert p["env.score"].present_docs == 1
    assert p["env.term"].total_docs == 3


def test_array_element_paths(spark):
    p = _profile(spark)
    # two tag elements exist in total (doc a); weight null on one
    assert p["tags[].name"].present_docs == 2
    assert p["tags[].name"].total_docs == 2
    assert p["tags[].weight"].present_docs == 1
    assert p["tags[].weight"].coverage_pct == 50.0


def test_dtype_and_examples(spark):
    p = _profile(spark)
    assert p["depth"].dtype == "double"
    assert p["env.term"].dtype == "string"
    # examples serialize to one JSON string so external result hashers
    # (pandas canonicalizers) never see an unhashable list cell
    assert p["env.term"].examples == '["soil","water"]'
    assert p["id"].examples == '["a","b"]'  # max_examples=2, sorted


def test_profile_on_span_corpus(spark):
    docs = gen_documents(spark, 200, GenParams(seed=4))
    p = {r.field_path: r for r in schema_profile(docs).collect()}
    assert p["doc_id"].coverage_pct == 100.0
    assert "spans[].kind" in p and "spans[].offset" in p
    n_spans = p["spans[].kind"].total_docs
    assert n_spans > 200  # multiple spans per doc
    # seeded null kinds → coverage below 100
    assert p["spans[].kind"].coverage_pct < 100.0


def test_snapshot_diff_statuses(spark):
    from biosample_enricher_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k long, v string"
    )
    got = {
        r.k: r.status
        for r in snapshot_diff(old, new, ["k"], F.col("v")).collect()
    }
    assert got == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added"
    }


def test_snapshot_diff_composite_key_and_guard(spark):
    import pytest

    from biosample_enricher_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], "k1 long, k2 string, v long"
    )
    new = spark.createDataFrame(
        [(1, "x", 10), (1, "z", 30)], "k1 long, k2 string, v long"
    )
    got = {
        (r.k1, r.k2): r.status
        for r in snapshot_diff(
            old, new, ["k1", "k2"], F.col("v").cast("string")
        ).collect()
    }
    assert got == {
        (1, "x"): "unchanged", (1, "y"): "removed", (1, "z"): "added"
    }
    with pytest.raises(ValueError, match="reserved"):
        snapshot_diff(
            old.withColumn("_fp_old", F.lit(1)), new, ["k1"], F.col("v")
        )


def test_snapshot_diff_null_fingerprints(spark):
    """Presence is tracked by explicit marker columns, never inferred
    from fingerprint nullness: a NULL fingerprint on a present key
    must compare null-safely (NULL↔NULL unchanged, NULL↔value
    changed), not read as 'added'/'removed' (r5d review finding)."""
    from biosample_enricher_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None), (4, "gone")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (5, None)], "k long, v string"
    )
    got = {
        r.k: r.status
        for r in snapshot_diff(old, new, ["k"], F.col("v")).collect()
    }
    assert got == {
        1: "changed",    # NULL → 'x'
        2: "changed",    # 'b' → NULL
        3: "unchanged",  # NULL ↔ NULL, both present
        4: "removed",
        5: "added",      # present only in new, even with NULL fp
    }
