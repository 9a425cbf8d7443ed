"""distributed_rank must equal the single-partition global row_number
byte-for-byte while shuffling the data-sized window on a bucket key."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.rank import distributed_rank


def _ids(spark, n, stride=97, offset=13):
    # non-contiguous, shuffled-ish unique keys (stride coprime to n)
    return spark.range(n).select(
        (F.pmod(F.col("id") * stride, F.lit(n)) * 1000 + offset).alias("k")
    )


def _global_rank(df, ascending):
    order = F.col("k").asc() if ascending else F.col("k").desc()
    return df.select(
        "k", F.row_number().over(Window.orderBy(order)).alias("rank")
    )


def test_matches_global_row_number_both_directions(spark):
    df = _ids(spark, 5_000).repartition(16)
    for ascending in (True, False):
        got = {
            (r.k, r.rank)
            for r in distributed_rank(df, "k", ascending=ascending).collect()
        }
        exp = {
            (r.k, r.rank) for r in _global_rank(df, ascending).collect()
        }
        assert got == exp


def test_skewed_and_tiny_inputs(spark):
    # heavy skew: 90% of keys in one narrow range + far outliers
    skew = spark.range(1_000).select(
        F.when(F.col("id") < 900, F.col("id"))
        .otherwise(F.col("id") * 1_000_000)
        .alias("k")
    )
    got = {(r.k, r.rank) for r in distributed_rank(skew, "k").collect()}
    exp = {(r.k, r.rank) for r in _global_rank(skew, True).collect()}
    assert got == exp

    # single row and two rows (min == max edge)
    one = spark.range(1).select(F.lit(42).alias("k"))
    assert distributed_rank(one, "k").first().rank == 1

    two = spark.range(2).select((F.col("id") + 7).alias("k"))
    got = sorted(
        (r.k, r.rank)
        for r in distributed_rank(two, "k", ascending=False).collect()
    )
    assert got == [(7, 2), (8, 1)]


def test_data_window_is_bucket_partitioned(spark):
    """The data-sized row_number window must shuffle on the bucket key;
    the only SinglePartition frame is the <= n_buckets offset agg."""
    df = _ids(spark, 2_000).repartition(8)
    ranked = distributed_rank(df, "k")
    p = ranked._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_rk_bucket" in p
    # the global-window anti-pattern would put row_number over an empty
    # partition spec: Window [row_number() ... ] with no partition cols
    for line in p.splitlines():
        if "row_number()" in line:
            assert "_rk_bucket" in line


def test_j2_uses_distributed_rank(spark):
    from biosample_enricher_spark.queries import QUERIES

    df = QUERIES["j2_realignment_join"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_rk_bucket" in p
    # spot-check rank semantics: largest matching doc_id has rank 1
    rows = df.orderBy(F.col("doc_id").desc()).limit(3).collect()
    assert [r.req_rank for r in rows] == [1, 2, 3]


def test_rank_fuzz_against_sorted_enumerate(spark):
    """Hypothesis over unique key sets (negatives, huge gaps, tiny and
    larger sizes, several bucket counts) vs Python sorted-enumerate."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1, max_size=60, unique=True,
        ),
        st.sampled_from([1, 2, 7, 64]),
        st.booleans(),
    )
    def check(keys, n_buckets, ascending):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r.k: r.rank
            for r in distributed_rank(
                df, "k", ascending=ascending, n_buckets=n_buckets
            ).collect()
        }
        exp = {
            k: i + 1
            for i, k in enumerate(sorted(keys, reverse=not ascending))
        }
        assert got == exp

    check()


def test_topk_per_group_partitioning_invariant_with_ties(spark):
    """topk_per_group: the merge of per-partition top-k must equal the
    global window top-k under ANY partitioning, including planted
    boundary ties and partitions holding fewer than k rows of a group
    (the regression that killed the first draft twice: tail-slice
    dropping short arrays, then partial_collect_list shipping
    everything)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from biosample_enricher_spark.operators.rank import topk_per_group

    rng = random.Random(17)
    # values drawn from a tiny range so rank-boundary ties are common
    rows = [(f"g{i % 5}", rng.randrange(0, 8), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, val long, id long")
    order = [("val", False), ("id", True)]

    w = W.partitionBy("grp").orderBy(F.desc("val"), "id")
    expected = {
        (r.grp, r.rank, r.val, r.id)
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .collect()
    }
    for parts in (1, 7, 64):
        got = {
            (r.grp, r.rank, r.val, r.id)
            for r in topk_per_group(
                df.repartition(parts), ["grp"], order, k=4
            ).collect()
        }
        assert got == expected, parts


def test_topk_per_group_null_group_keys_survive_truncation(spark):
    """r6 (ADVICE r5): pandas groupby drops null keys by default — the
    stage-1 truncation must keep them (Spark groups null-safely), and
    null order values must rank as Spark ranks them (asc -> first)."""
    from pyspark.sql import functions as F

    from biosample_enricher_spark.operators.rank import topk_per_group

    rows = [("g", 5), ("g", 3), ("g", 1), (None, 9), (None, 2), (None, 7)]
    df = spark.createDataFrame(rows, "grp string, val int").repartition(3)
    got = topk_per_group(df, ["grp"], [("val", True), ("grp", True)], 2)
    out = {(r.grp, r.val, r.rank) for r in got.collect()}
    assert out == {("g", 1, 1), ("g", 3, 2), (None, 2, 1), (None, 7, 2)}
