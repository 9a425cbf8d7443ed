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


def _prewarm_python_workers(spark: SparkSession) -> bool:
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
    initializes lazily exactly as before. Returns True iff the warm-up
    job actually ran (pinned by tests/test_session_prewarm.py — this
    job has silently no-op'd twice; never trust it unverified)."""
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") == "0":
        return False
    try:
        import pandas as pd
        from pyspark.sql import functions as F

        # Annotations are ASSIGNED as real objects, not written inline:
        # this module has ``from __future__ import annotations``, so an
        # inline ``s: pd.Series`` hint is a STRING that pandas_udf
        # resolves against MODULE globals — where the locally-imported
        # ``pd`` does not exist — raising at decoration (the silent
        # no-op's third disguise; the first was a quoted hint, the
        # second count()'s UDF pruning, see below). The accumulator is
        # the execution proof: True is returned only if the UDF BODY
        # ran on workers — a job that completes without touching
        # Python (the count() failure class) cannot fake it.
        acc = spark.sparkContext.accumulator(0)

        def _identity_fn(s):
            acc.add(len(s))
            return s

        _identity_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _identity = F.pandas_udf(_identity_fn, returnType="long")

        n = spark.sparkContext.defaultParallelism
        try:
            spark.sparkContext.setJobDescription(
                "session: python worker prewarm"
            )
            # noop sink, NOT count(): count() lets the optimizer prune
            # the (deterministic) UDF projection entirely — the guide
            # §1.4 trap — so a count()-based prewarm runs a job that
            # never touches Python (verified: zero worker executions
            # under count(), one per task under the noop write)
            (
                spark.range(n, numPartitions=n)
                .select(_identity("id"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        finally:
            spark.sparkContext.setJobDescription(None)
        return acc.value >= n
    except Exception:
        return False


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
