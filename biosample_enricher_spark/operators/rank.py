"""Distributed global ranking (two-pass, no single-partition window).

``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY clause
funnels the entire input through ONE task — Spark even warns
``No Partition Defined for Window operation``. Fine for driver-small
frames; a serialization choke point at 10^12 rows (the r2 VERDICT's one
flagged anti-pattern, in j2's request-rank).

``distributed_rank`` computes the identical global row_number as a
composition of shuffle-parallel primitives — the classic two-pass
distributed sort-rank:

1. range-bucket each row by the order key (min/max from a 1-row
   broadcast aggregate; the bucket function is monotone in the key, so
   bucket order == key order),
2. rank *within* each bucket with a window PARTITIONED by bucket
   (parallel across buckets),
3. offset each bucket's local ranks by the total count of rows in all
   earlier buckets (a ≤``n_buckets``-row aggregate, window'd on the
   driver-small side and broadcast back).

Only the ≤``n_buckets``-row offset frame ever passes through a single
partition; the data-sized window shuffles on ``hashpartitioning(bucket)``
(asserted in tests/test_plans.py).

Reference analog: adapters.py batch-fetch re-alignment assigns request
positions by enumerating the id list in order; here that enumeration is
re-expressed as a distributed rank so the request list may itself be a
table-scale frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_rank(
    df: DataFrame,
    order_col: str,
    *,
    ascending: bool = True,
    n_buckets: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Append a global 1-based ``row_number``-equivalent ``rank_col``
    ordered by ``order_col`` without a single-partition window.

    Requires a non-null, unique numeric order key (ties under a plain
    ``row_number`` are nondeterministic anyway; with a unique key the
    result is byte-identical to the global window). Skewed key ranges
    only skew bucket *sizes*, never correctness — bucket order is
    monotone in the key by construction.
    """
    c = F.col(order_col)
    stats = df.agg(F.min(c).alias("_rk_lo"), F.max(c).alias("_rk_hi"))
    # double math keeps the bucket function monotone for any numeric
    # key width (floor of a monotone map is monotone non-decreasing);
    # least() guards the x == hi rounding edge
    span = F.col("_rk_hi").cast("double") - F.col("_rk_lo").cast("double") + 1.0
    bucket = F.least(
        F.floor(
            (c.cast("double") - F.col("_rk_lo").cast("double"))
            * n_buckets
            / span
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    b = df.join(F.broadcast(stats)).withColumn("_rk_bucket", bucket)

    order = c.asc() if ascending else c.desc()
    local = F.row_number().over(
        Window.partitionBy("_rk_bucket").orderBy(order)
    )

    counts = b.groupBy("_rk_bucket").agg(F.count(F.lit(1)).alias("_rk_n"))
    bucket_order = (
        F.col("_rk_bucket").asc() if ascending else F.col("_rk_bucket").desc()
    )
    # window over ≤ n_buckets rows — the ONLY single-partition frame
    off_w = Window.orderBy(bucket_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_rk_bucket",
        F.coalesce(F.sum("_rk_n").over(off_w), F.lit(0)).alias("_rk_off"),
    )

    return (
        b.withColumn("_rk_local", local)
        .join(F.broadcast(offsets), "_rk_bucket")
        .withColumn(
            # long, not int: the operator exists FOR >2^31-row frames —
            # an int cast would overflow (ANSI: throw; legacy: wrap)
            rank_col, (F.col("_rk_local") + F.col("_rk_off")).cast("long")
        )
        .drop("_rk_bucket", "_rk_local", "_rk_off", "_rk_lo", "_rk_hi")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_structs: Column,
    k: int,
) -> DataFrame:
    """Exact per-group top-k by MERGEABLE bounded aggregation — the
    100-TB alternative to ``row_number() OVER (PARTITION BY group)``:
    a window ranks by sorting EVERY row of every group; this keeps at
    most k rows per (group, input partition) alive past the map side,
    so the shuffle is bounded by k·|partitions|·|groups| regardless of
    data size (top-k is a mergeable summary: merging per-partition
    top-k lists and re-truncating is exactly the global top-k,
    provided the order key is a total order — pass fully tie-broken
    ``order_structs``).

    ``order_structs``: a struct Column whose ASCENDING order puts the
    WANTED rows LAST (e.g. ``struct(price, -id)`` for highest-price-
    first with smallest-id tie-wins). Returns one row per kept input
    row: ``group_cols + (rank, pick)`` where rank 1 = best and
    ``pick`` is the ``order_structs`` value (callers unpack fields).

    Stage 1 groups by (group, spark_partition_id()) — a map-side-local
    key, so the collect_list never holds more than one input
    partition's worth of one group (bounded memory), and its output is
    ≤ k rows per such pair. Stage 2 merges the survivors per group.
    """
    pid = F.spark_partition_id().alias("_pid")
    # descending sort + front slice: slice(arr, 1, k) on an array
    # SHORTER than k returns the whole array, while the tail form
    # slice(arr, -k, k) returns EMPTY and would silently drop every
    # (group, partition) holding fewer than k rows
    top_slice = F.slice(
        F.sort_array(F.collect_list(F.col("_s")), asc=False), 1, k
    )
    partial = (
        df.select(*group_cols, pid, order_structs.alias("_s"))
        .groupBy(*group_cols, "_pid")
        .agg(top_slice.alias("_top"))
        .select(*group_cols, F.explode("_top").alias("_s"))
    )
    merged = (
        partial.groupBy(*group_cols)
        .agg(top_slice.alias("_top"))
        .select(
            *group_cols,
            F.posexplode("_top").alias("_i", "pick"),
        )
        .select(*group_cols, (F.col("_i") + 1).alias("rank"), "pick")
    )
    return merged
