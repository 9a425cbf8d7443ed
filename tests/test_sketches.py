"""Mergeable per-partition HLL distinct sketches: union must equal the
whole-corpus sketch (incremental ingest without rescan) and estimate
within HLL error of exact."""

from __future__ import annotations

from pyspark.sql import types as T

from biosample_enricher_spark.operators.stats import (
    merge_distinct_sketches,
    partition_distinct_sketches,
)
from biosample_enricher_spark.synth import GenParams, gen_documents


def test_merged_estimate_near_exact_and_binary_schema(spark):
    docs = gen_documents(spark, 20_000, GenParams(seed=4))
    sk = partition_distinct_sketches(docs)
    assert isinstance(
        sk.schema["sketch"].dataType, T.BinaryType
    )  # datasketches-compatible payload, checkpoint-storable
    m = merge_distinct_sketches(sk).first()
    exact = docs.select("doc_id").distinct().count()
    assert m.n_partitions == 64
    assert abs(m.merged_estimate - exact) / exact < 0.05


def test_incremental_union_tracks_whole_corpus(spark):
    """Sketching two disjoint halves separately and unioning the
    sketches must track the whole-corpus sketch — the property that
    lets a resumed run skip completed partitions. DataSketches unions
    are not bit-identical to a direct build across SET→HLL mode
    promotions, so assert near-equality (observed delta ~0.02%) and
    that both sit inside HLL error of exact."""
    docs = gen_documents(spark, 10_000, GenParams(seed=7)).persist()
    exact = docs.select("doc_id").distinct().count()
    whole = merge_distinct_sketches(
        partition_distinct_sketches(docs)
    ).first()
    a = docs.where("substring(doc_id, -1, 1) in ('0','1','2','3','4')")
    b = docs.where("substring(doc_id, -1, 1) not in ('0','1','2','3','4')")
    split = merge_distinct_sketches(
        partition_distinct_sketches(a).unionByName(
            partition_distinct_sketches(b)
        )
    ).first()
    assert split.n_partitions == 2 * whole.n_partitions
    rel = abs(split.merged_estimate - whole.merged_estimate) / exact
    assert rel < 0.005
    assert abs(whole.merged_estimate - exact) / exact < 0.05
    assert abs(split.merged_estimate - exact) / exact < 0.05
    docs.unpersist()


def test_a2_sketch_mergeable_row_carries_error_signal(spark):
    """The driver-visible a2_sketch_mergeable row must include the
    exact count and a relative error < 2% — so the rows-only
    CORRECTNESS row carries a quantitative signal, not just rows>0."""
    from biosample_enricher_spark.queries import QUERIES

    row = QUERIES["a2_sketch_mergeable"](
        spark, "/root/testdata/sf0.01"
    ).first()
    assert row.exact_distinct == 500  # sf0.01 documents table
    assert row.rel_err < 0.02
    assert (
        abs(row.merged_estimate - row.exact_distinct)
        / row.exact_distinct
        < 0.02
    )
