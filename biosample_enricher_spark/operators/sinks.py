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


def write_violations(
    violations: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    (
        violations.write.mode("append")
        .partitionBy("constraint_id")
        .format(fmt)
        .save(path)
    )


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
