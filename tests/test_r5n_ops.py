"""Pins for the r5n batch: HLL sliding distinct, foreachBatch sink."""

from __future__ import annotations

from biosample_enricher_spark.queries import QUERIES

SF01 = "/root/testdata/sf0.01"


def test_hll_sliding_distinct_error_floor_and_agreement_with_a21(spark):
    rows = QUERIES["a38_sliding_distinct_hll"](spark, SF01).collect()
    assert len(rows) > 20
    for r in rows:
        assert r.rel_err <= 0.02, (r.day, r.rel_err)
    # the exact tier must equal a21's exact sliding distinct
    a21 = {
        (r.day, r.active_7d)
        for r in QUERIES["a21_sliding_distinct"](spark, SF01).collect()
    }
    assert {(r.day, r.exact_7d) for r in rows} == a21


def test_foreachbatch_sink_rerun_is_idempotent(spark):
    """Two invocations (fresh checkpoint each) must produce identical
    sink aggregates — the truncate-then-write contract; and a single
    drain must emit exactly one epoch."""
    one = {tuple(r) for r in QUERIES["streaming_foreachbatch_sink"](spark, SF01).collect()}
    two = {tuple(r) for r in QUERIES["streaming_foreachbatch_sink"](spark, SF01).collect()}
    assert one == two and len(one) == 5
    back = spark.read.parquet("/tmp/fb_sink_sf0_01")
    epochs = [r._epoch for r in back.select("_epoch").distinct().collect()]
    assert epochs == [0]
