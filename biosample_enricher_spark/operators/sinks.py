"""Sinks (SURVEY.md §2.1 S9/S10): violation/summary/stats writers.

The reference emits CSV + Markdown artifacts
(``/root/reference/biosample_enricher/schema_statistics.py:152-158``,
``metrics/reporter.py`` save paths). The engine writes:

- violations → parquet partitioned by ``constraint_id`` (predicate
  pushdown on the most common filter axis; at Iceberg deployments the
  same call maps to ``writeTo(...).append()``),
- summary/stats → single-file CSV (post-aggregation data is tiny —
  coalesce(1) is deliberate and safe),
- a Markdown rendering of the summary (driver-side; report rendering
  stays driver-side as in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_violations(
    violations: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    (
        violations.write.mode("append")
        .partitionBy("constraint_id")
        .format(fmt)
        .save(path)
    )


def write_sized_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    max_records_per_file: int = 1_000_000,
    target_files_per_partition: int | None = None,
    sort_within: tuple[str, ...] = (),
    mode: str = "overwrite",
    repartition_num: int | None = None,
) -> None:
    """Corpus-scale parquet writer with explicit output-file sizing —
    the piece naive ``df.write.parquet`` gets wrong at 100 TB, in both
    directions: a shuffle with 10k tasks × 100 hive partitions emits a
    million tiny files (NameNode/manifest poison), while one task
    holding a hot partition emits a single 50 GB file no scan can
    split across row groups it never planned.

    - ``maxRecordsPerFile`` caps file size task-locally (a task rolls
      to a new file at the cap — no extra shuffle).
    - ``target_files_per_partition`` repartitions by (partition_cols +
      deterministic pseudo-random bucket) first. This bounds the
      number of WRITER TASKS per hive partition at ``target``
      regardless of upstream task count (each (partition, bucket)
      group lands wholly in one task); the file count per partition is
      therefore at most ``target × ceil(task_rows /
      max_records_per_file)`` — the record cap still rolls oversized
      tasks, by design. The spread of a hot partition over the full
      ``target`` writers is BEST-EFFORT: hash collisions across
      groups and AQE partition coalescing can place several of its
      buckets in one task. When writer spread matters more than
      shuffle width (one hot partition dominating the table), pass
      ``repartition_num`` ≥ expected #groups so each group gets its
      own shuffle partition and AQE has nothing to coalesce away
      (requires ``target_files_per_partition``; rejected otherwise
      rather than silently ignored).
    - ``sort_within`` orders rows inside each task before writing —
      parquet min/max stats on those columns become selective, the
      cheap substitute for Z-ordering.
    """
    if repartition_num is not None:
        if repartition_num < 1:
            raise ValueError(f"repartition_num must be >= 1, got {repartition_num}")
        if not target_files_per_partition:
            raise ValueError(
                "repartition_num requires target_files_per_partition "
                "(it sizes the shuffle that the bucketing creates)"
            )
    out = df
    if target_files_per_partition:
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(target_files_per_partition),
        )
        cols = [*[F.col(c) for c in partition_cols], bucket]
        out = (
            out.repartition(repartition_num, *cols)
            if repartition_num
            else out.repartition(*cols)
        )
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Small post-aggregation outputs only (summary, stats)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.coalesce(1).write.mode("overwrite").json(path)


def summary_markdown(summary: DataFrame) -> str:
    """Markdown rendering of the per-constraint rollup (analog of the
    reference's stats Markdown, schema_statistics.py:154-158)."""
    from pyspark.sql import functions as F

    rows = (
        summary.groupBy("constraint_id")
        .agg(
            F.sum("total").alias("total"),
            F.sum("failed").alias("failed"),
        )
        .orderBy("constraint_id")
        .collect()
    )
    lines = [
        "# Constraint summary",
        "",
        "| constraint | total | failed | pass rate |",
        "|---|---|---|---|",
    ]
    for r in rows:
        rate = 1.0 - (r.failed / r.total) if r.total else 1.0
        lines.append(f"| {r.constraint_id} | {r.total} | {r.failed} | {rate:.6f} |")
    return "\n".join(lines) + "\n"
