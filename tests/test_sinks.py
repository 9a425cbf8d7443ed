"""S9/S10 sinks: partitioned violation writes, CSV/JSON outputs,
Markdown summary rendering."""

from __future__ import annotations

import os

from biosample_enricher_spark.constraints import ConstraintSuite
from biosample_enricher_spark.operators.sinks import (
    summary_markdown,
    write_csv,
    write_json,
    write_violations,
)
from biosample_enricher_spark.synth import GenParams, gen_asset_catalog, gen_documents


def test_sinks_roundtrip(spark, tmp_path):
    p = GenParams(seed=17, n_assets=100)
    docs = gen_documents(spark, 300, p)
    res = ConstraintSuite().run(docs, gen_asset_catalog(spark, p))

    vpath = str(tmp_path / "viols")
    write_violations(res.violations, vpath)
    back = spark.read.parquet(vpath)
    assert back.count() == res.violations.count()
    # partitioned by constraint_id → directory-per-value layout enables
    # partition pruning
    assert any(
        d.startswith("constraint_id=") for d in os.listdir(vpath) if "=" in d
    )
    pruned = back.where(back.constraint_id == "offset_ordering")
    assert pruned.count() == res.violations.where(
        res.violations.constraint_id == "offset_ordering"
    ).count()

    cpath = str(tmp_path / "summary_csv")
    write_csv(res.summary, cpath)
    csv_back = spark.read.option("header", "true").csv(cpath)
    assert csv_back.count() == res.summary.count()

    jpath = str(tmp_path / "summary_json")
    write_json(res.summary, jpath)
    assert spark.read.json(jpath).count() == res.summary.count()

    md = summary_markdown(res.summary)
    assert md.startswith("# Constraint summary")
    assert "offset_ordering" in md and "| pass rate |" in md
    res.unpersist()


def test_write_sized_parquet_controls_file_count_and_size(spark, tmp_path):
    """Output-file sizing: target_files_per_partition bounds the number
    of data files in EVERY hive partition regardless of upstream task
    count; maxRecordsPerFile rolls oversized tasks into capped files;
    rows round-trip exactly and min/max sort survives."""
    import glob

    from pyspark.sql import functions as F

    from biosample_enricher_spark.operators.sinks import write_sized_parquet

    df = (
        spark.range(10_000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("lang"),
            F.col("id").alias("n_chars"),
        )
        .repartition(32)  # many upstream tasks: the naive writer would
    )                     # emit up to 32 files per hive partition

    out = str(tmp_path / "sized")
    write_sized_parquet(
        df,
        out,
        partition_cols=("lang",),
        target_files_per_partition=2,
        sort_within=("n_chars",),
    )
    for part in ("0", "1", "2"):
        files = glob.glob(f"{out}/lang={part}/*.parquet")
        assert 1 <= len(files) <= 2, (part, files)
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.groupBy().sum("n_chars").first()[0] == sum(range(10_000))

    # cap forces task-local file rolls: same data, tiny cap → many files
    out2 = str(tmp_path / "rolled")
    write_sized_parquet(
        df,
        out2,
        partition_cols=("lang",),
        target_files_per_partition=1,
        max_records_per_file=500,
    )
    files2 = glob.glob(f"{out2}/lang=0/*.parquet")
    assert len(files2) >= 6  # ~3334 rows / 500 cap
    assert spark.read.parquet(out2).count() == 10_000


def test_write_sized_parquet_rejects_orphan_repartition_num(spark, tmp_path):
    """repartition_num without target_files_per_partition must raise,
    not be silently ignored (it sizes the shuffle the bucketing
    creates — alone it has nothing to act on)."""
    import pytest

    from biosample_enricher_spark.operators.sinks import write_sized_parquet

    df = spark.range(10).selectExpr("id", "cast(id % 2 as string) lang")
    with pytest.raises(ValueError, match="requires target_files_per_partition"):
        write_sized_parquet(
            df, str(tmp_path / "x"), partition_cols=("lang",),
            repartition_num=4,
        )
    with pytest.raises(ValueError, match=">= 1"):
        write_sized_parquet(
            df, str(tmp_path / "y"), partition_cols=("lang",),
            target_files_per_partition=2, repartition_num=0,
        )
