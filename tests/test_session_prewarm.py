"""The session-build Python-worker prewarm must ACTUALLY execute.

This job has silently no-op'd twice (a quoted type hint raising at
decoration behind the failure guard, then count() pruning the
deterministic UDF projection so the job never touched Python). The
operator contract is behavioral: the warm-up returns True only when
the UDF BODY executed on workers (a per-row accumulator inside the
UDF must reach the row count — a job that completes without touching
Python cannot fake it), and a daemon process must exist afterwards.
"""

from __future__ import annotations

import subprocess

from biosample_enricher_spark.session import _prewarm_python_workers


def _daemon_count() -> int:
    out = subprocess.run(
        ["ps", "-eo", "cmd"], capture_output=True, text=True
    ).stdout
    return sum(
        1
        for line in out.splitlines()
        if "pyspark.daemon" in line or "pyspark.worker" in line
    )


def test_prewarm_executes_udf_job(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PREWARM", "1")
    assert _prewarm_python_workers(spark) is True
    # the warm-up spawned (or reused) the worker pool: the daemon that
    # forks per-task workers is alive
    assert _daemon_count() >= 1


def test_prewarm_disabled_by_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PREWARM", "0")
    assert _prewarm_python_workers(spark) is False
