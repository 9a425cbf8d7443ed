"""Checkpoint/resume: partition-granular work skipping (the batch
analog of HTTP-cache HIT/MISS, FIXTURES.md §A3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.checkpoint import (
    CheckpointTable,
    ResumableRun,
    checkpoint_rows_from_summary,
)
from biosample_enricher_spark.constraints import ConstraintSuite, stable_partition_id
from biosample_enricher_spark.synth import GenParams, gen_asset_catalog, gen_documents

P = GenParams(seed=33, n_assets=200)


@pytest.fixture
def corpus(spark):
    return gen_documents(spark, 500, P), gen_asset_catalog(spark, P)


def test_fresh_run_completes_all_partitions(spark, corpus, tmp_path):
    docs, catalog = corpus
    run = ResumableRun(spark, str(tmp_path / "cp"), run_id="r1",
                       suite=ConstraintSuite(n_buckets=16))
    summary = run.run(docs, catalog)
    assert summary.select("partition_id").distinct().count() == 16
    done = run.table.completed_partitions("r1")
    assert done.count() == 16
    # second invocation: everything HIT → no pending docs, empty summary
    assert run.pending(docs).count() == 0
    summary2 = run.run(docs, catalog)
    assert summary2.count() == 0


def test_resume_processes_only_missing_partitions(spark, corpus, tmp_path):
    docs, catalog = corpus
    path = str(tmp_path / "cp")
    suite = ConstraintSuite(n_buckets=16)
    # simulate an interrupted run: checkpoint only buckets 0..7
    docs_p = suite.with_partition_id(docs)
    first_half = docs_p.where(F.col("partition_id") < 8).drop("partition_id")
    run = ResumableRun(spark, path, run_id="r2", suite=suite)
    run.run(first_half, catalog)
    assert run.table.completed_partitions("r2").count() == 8

    pending = suite.with_partition_id(run.pending(docs))
    pids = {r.partition_id for r in pending.select("partition_id").distinct().collect()}
    assert pids == set(range(8, 16))

    summary2 = run.run(docs, catalog)
    pids2 = {r.partition_id for r in summary2.select("partition_id").distinct().collect()}
    assert pids2 == set(range(8, 16))
    assert run.table.completed_partitions("r2").count() == 16


def test_resume_result_equals_single_shot(spark, corpus, tmp_path):
    """Interrupted-then-resumed violations == one-shot violations."""
    docs, catalog = corpus
    suite = ConstraintSuite(n_buckets=16)
    one_shot = sorted(map(tuple, suite.run(docs, catalog).violations.collect()))

    path = str(tmp_path / "cp")
    vpath = str(tmp_path / "viols")
    docs_p = suite.with_partition_id(docs)
    run = ResumableRun(spark, path, run_id="r3", suite=suite)
    run.run(docs_p.where(F.col("partition_id") < 5).drop("partition_id"),
            catalog, violations_path=vpath)
    run.run(docs, catalog, violations_path=vpath)
    resumed = sorted(map(tuple, spark.read.parquet(vpath).select(
        "partition_id", "doc_id", "constraint_id", "field", "message").collect()))
    assert resumed == one_shot


def test_runs_are_isolated_by_run_id(spark, corpus, tmp_path):
    docs, catalog = corpus
    path = str(tmp_path / "cp")
    suite = ConstraintSuite(n_buckets=16)
    ResumableRun(spark, path, run_id="a", suite=suite).run(docs, catalog)
    fresh = ResumableRun(spark, path, run_id="b", suite=suite)
    assert fresh.table.completed_partitions("b").count() == 0
    assert fresh.pending(docs).count() == docs.count()


def test_duplicate_doc_ids_share_a_bucket(spark, corpus):
    """Uniqueness is safe under partition-granular resume because equal
    doc_ids land in the same content-addressed bucket."""
    docs, _ = corpus
    dup_buckets = (
        docs.groupBy("doc_id")
        .count()
        .where(F.col("count") > 1)
        .select(stable_partition_id(F.col("doc_id"), 16).alias("b"))
    )
    assert dup_buckets.count() > 0


def test_sketch_sidecar_accumulates_across_resume(spark, corpus, tmp_path):
    """Per-partition HLL sketches ride a sidecar table; after an
    interrupted run + resume, the merged estimate covers the WHOLE
    corpus without rescanning completed partitions, and a no-op
    re-invocation appends nothing."""
    docs, catalog = corpus
    suite = ConstraintSuite(n_buckets=16)
    path = str(tmp_path / "cp")
    docs_p = suite.with_partition_id(docs)
    run = ResumableRun(spark, path, run_id="rs", suite=suite,
                       sketch_columns=("doc_id",))
    # interrupted: only buckets 0..7
    run.run(docs_p.where(F.col("partition_id") < 8).drop("partition_id"),
            catalog)
    partial = run.distinct_estimates().first()
    assert partial.n_partitions == 8

    # resume: remaining buckets; merged estimate now ~= full distinct
    run.run(docs, catalog)
    est = run.distinct_estimates().first()
    exact = docs.select("doc_id").distinct().count()
    assert est.column == "doc_id" and est.n_partitions == 16
    assert abs(est.estimate - exact) / exact < 0.05
    assert partial.estimate < est.estimate

    # fully resumed: nothing pending, no new sketch rows
    n_rows = run.sketches.read().count()
    run.run(docs, catalog)
    assert run.sketches.read().count() == n_rows


def test_foreign_lineage_rows_do_not_satisfy_completeness(spark, corpus, tmp_path):
    """Code-review r3: drift verdict rows share the checkpoint table;
    they must NOT count toward a partition's suite completeness. Run
    without referential, append 2 drift rows per partition (k+2 >= k+1
    distinct ids), then resume WITH a catalog: every partition must
    still be pending so the referential check actually runs."""
    docs, catalog = corpus
    suite = ConstraintSuite(n_buckets=16)
    run = ResumableRun(spark, str(tmp_path / "cp"), run_id="fx", suite=suite)
    run.run(docs)  # no catalog: k row-scope+uniqueness constraints

    # simulate --drift-by-partition lineage: 2 foreign constraint rows
    # per partition under the same run_id
    drift_rows = (
        spark.range(16)
        .selectExpr("cast(id as int) AS partition_id")
        .selectExpr(
            "'fx' AS run_id",
            "partition_id",
            "explode(array('drift_span_length','drift_kind_frequency'))"
            " AS constraint_id",
            "'ok' AS status",
            "cast(1 as long) AS n_rows",
            "cast(0 as long) AS n_violations",
            "map('ks_stat', cast(0.0 as double)) AS metrics",
            "current_timestamp() AS finished_at",
        )
    )
    run.table.append(drift_rows)

    # without the constraint_ids filter, k+2 foreign-inflated ids would
    # satisfy the k+1 referential-inclusive bar and skip everything
    pending = run.pending(docs, with_referential=True)
    assert pending.count() == docs.count()
    summary = run.run(docs, catalog)
    assert "media_ref_referential" in {
        r.constraint_id for r in summary.collect()
    }


def test_violations_write_is_idempotent_under_crash_retry(spark, corpus, tmp_path):
    """Crash between the violations write and the lineage append makes
    the resume reprocess those partitions: dynamic partition overwrite
    must replace their violation rows, not duplicate them."""
    docs, catalog = corpus
    suite = ConstraintSuite(n_buckets=16)
    vpath = str(tmp_path / "viols")
    cpath = str(tmp_path / "cp")

    one_shot = sorted(
        map(tuple, suite.run(docs, catalog).violations.collect())
    )

    run = ResumableRun(spark, cpath, run_id="cr", suite=suite)
    run.run(docs, catalog, violations_path=vpath)
    # simulate the crash: violations landed but the lineage append was
    # lost → wipe the checkpoint table and retry the whole run
    import shutil

    shutil.rmtree(cpath)
    run2 = ResumableRun(spark, cpath, run_id="cr", suite=suite)
    run2.run(docs, catalog, violations_path=vpath)

    resumed = sorted(
        map(
            tuple,
            spark.read.parquet(vpath)
            .select("partition_id", "doc_id", "constraint_id", "field", "message")
            .collect(),
        )
    )
    assert resumed == one_shot  # no duplicates from the retried write
