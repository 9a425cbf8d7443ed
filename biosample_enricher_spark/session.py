"""SparkSession factory tuned for the validation engine.

Defaults follow the scale posture in SURVEY.md §4: AQE on (runtime
re-plan + skew-join splitting), Arrow on (vectorized JVM<->Python
batches for the two pandas UDFs), nested-schema pruning on (constraint
expressions touch few struct fields of ``spans``), shuffle partitions
sized to cores rather than the 200 default.

On a real cluster the same builder is used by ``spark-submit
--py-files``; only ``master`` and memory sizing differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "biosample_enricher_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    when launched via spark-submit on a cluster the submitted master
    wins (builder configs do not override an active session's master).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge when the per-partition
        # build side fits (guide §3.1): drops both sort passes from
        # equi-joins like j4. Scale posture: the planner still falls
        # back to sort-merge when its size conditions fail, and the AQE
        # threshold below lets a finished shuffle stage convert at
        # runtime from observed (not estimated) sizes.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _prewarm_python_workers(spark)
    return spark


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Initialize the reusable Python worker pool at session build.

    The first Arrow/pandas-UDF stage of a fresh session otherwise pays
    one python-daemon fork + ``import pandas``/``pyarrow`` per
    concurrent task (cores × ~0.5-1 s of CPU, all at once) in the
    middle of the first user query — guide §4.5's "heavyweight init
    once" applied to the pool itself, the same reason
    ``spark.python.worker.reuse`` keeps workers alive afterwards. The
    warm-up job touches no user data (a ``spark.range`` over the
    core count) and caches nothing; disable with
    ``SPARK_GRAFT_PREWARM=0``. Failures are non-fatal — the pool then
    initializes lazily exactly as before."""
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") == "0":
        return
    try:
        import pandas as pd
        from pyspark.sql import functions as F

        # REAL annotation objects, not strings: pandas_udf resolves the
        # type hints at decoration time from this local scope — quoted
        # "pd.Series" annotations raise UNSUPPORTED_SIGNATURE (caught
        # by a review pass after the first version silently no-op'd)
        @F.pandas_udf("long")
        def _identity(s: pd.Series) -> pd.Series:
            return s

        n = spark.sparkContext.defaultParallelism
        try:
            spark.sparkContext.setJobDescription(
                "session: python worker prewarm"
            )
            spark.range(n, numPartitions=n).select(_identity("id")).count()
        finally:
            spark.sparkContext.setJobDescription(None)
    except Exception:
        pass


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
