"""normalize_offsets / running_offsets (operators/spans.py): prefix-sum
exactness vs a plain-Python model, schema preservation, and the
repair↔detect round trip against the constraint suite's
offset_ordering check on the dirty synthetic corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from biosample_enricher_spark.constraints import exprs
from biosample_enricher_spark.operators.spans import (
    normalize_offsets,
    running_offsets,
    span_lengths,
)
from biosample_enricher_spark.synth import GenParams, gen_documents


def test_running_offsets_matches_python(spark):
    rng = random.Random(3)
    rows = [([rng.randrange(0, 50) for _ in range(rng.randrange(1, 12))],)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "lens array<long>")
    got = df.select(
        "lens", running_offsets(F.col("lens")).alias("offs")
    ).collect()
    for r in got:
        acc, expect = 0, []
        for x in r.lens:
            expect.append(acc)
            acc += x
        assert list(r.offs) == expect


def _dirty_docs(spark, n=400):
    return gen_documents(spark, n, GenParams(seed=9, n_assets=100))


def test_normalize_offsets_preserves_schema_and_fields(spark):
    docs = _dirty_docs(spark)
    repaired = docs.select(
        "doc_id", normalize_offsets(F.col("spans")).alias("spans")
    )
    assert repaired.schema["spans"].dataType == docs.schema["spans"].dataType
    # kind/text/media_ref untouched; only offset changes
    a = docs.select(
        "doc_id",
        F.transform(
            "spans", lambda s: F.struct(s["kind"], s["text"], s["media_ref"])
        ).alias("body"),
    )
    b = repaired.select(
        "doc_id",
        F.transform(
            "spans", lambda s: F.struct(s["kind"], s["text"], s["media_ref"])
        ).alias("body"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_repair_zeroes_offset_violations_for_positive_length_docs(spark):
    """The round trip: normalize_offsets must eliminate every
    offset_ordering violation the dirty generator planted — for docs
    whose spans all advance the stream (len > 0; an empty/null text
    span legitimately repairs to an equal offset, which the STRICT
    ordering constraint still rejects, so those docs are excluded —
    and checked separately below)."""
    docs = _dirty_docs(spark)
    all_positive = F.forall(
        span_lengths(F.col("spans")), lambda x: x > 0
    )
    repaired = docs.where(all_positive).select(
        "doc_id", normalize_offsets(F.col("spans")).alias("spans")
    )
    before = (
        docs.where(all_positive)
        .select(F.explode(exprs.span_violations(F.col("spans"))).alias("v"))
        .where(F.col("v.constraint_id") == "offset_ordering")
        .count()
    )
    after = (
        repaired.select(
            F.explode(exprs.span_violations(F.col("spans"))).alias("v")
        )
        .where(F.col("v.constraint_id") == "offset_ordering")
        .count()
    )
    assert before > 0  # the generator really plants offset violations
    assert after == 0


def test_repair_leaves_only_zero_length_ties(spark):
    """On the full dirty corpus the only offset_ordering findings that
    survive repair are non-increasing ties at zero-length spans —
    never a null or negative offset."""
    docs = _dirty_docs(spark)
    repaired = docs.select(
        "doc_id", normalize_offsets(F.col("spans")).alias("spans")
    )
    leftover = (
        repaired.select(
            F.explode(exprs.span_violations(F.col("spans"))).alias("v")
        )
        .where(F.col("v.constraint_id") == "offset_ordering")
        .select("v.message")
        .collect()
    )
    assert all("not increasing" in r.message for r in leftover)
