"""Two-pass Misra-Gries heavy hitters (operators/freq.py): the
candidate-superset guarantee under forced trims, exactness of the
final output vs a plain groupBy, and the bounded-candidate property."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.freq import (
    heavy_hitters,
    mg_partition_candidates,
)


def _skewed_tokens(spark, n_heavy=8, heavy_count=400, n_tail=3000, seed=7):
    """A few genuinely heavy tokens over a long distinct tail — the
    tail forces MG trims at small caps while the heavy set must
    survive them."""
    rng = random.Random(seed)
    rows = []
    for h in range(n_heavy):
        rows += [(f"heavy_{h}",)] * heavy_count
    for i in range(n_tail):
        rows.append((f"tail_{i}_{rng.randint(0, 10**6)}",))
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "token string").repartition(8)


def test_heavy_hitters_exact_vs_groupby(spark):
    toks = _skewed_tokens(spark)
    k, cap = 50, 64  # cap far below |vocab| (~3008) → trims happen
    got = {
        r["token"]: (r["cnt"], r["n_total"])
        for r in heavy_hitters(toks, "token", k=k, cap=cap).collect()
    }
    n = toks.count()
    exp = {
        r["token"]: (r["cnt"], n)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .collect()
    }
    assert got == exp
    assert len(exp) == 8  # all planted heavies, nothing else


def test_mg_candidates_superset_and_bounded(spark):
    toks = _skewed_tokens(spark)
    cap = 64
    cand = set(
        r["token"] for r in mg_partition_candidates(toks, "token", cap).collect()
    )
    n = toks.count()
    heavies = set(
        r["token"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (cap + 1) > F.lit(n))
        .collect()
    )
    # superset guarantee at the MG bound (share > 1/(cap+1))
    assert heavies <= cand
    # bounded: at most cap survivors per input partition
    assert len(cand) <= cap * toks.rdd.getNumPartitions()


def test_heavy_hitters_cap_below_k_rejected(spark):
    toks = spark.createDataFrame([("a",)], "token string")
    with pytest.raises(ValueError):
        heavy_hitters(toks, k=200, cap=100)


def test_heavy_hitters_share_is_exact_division(spark):
    toks = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 10, "token string"
    ).repartition(4)
    rows = {r["token"]: r for r in heavy_hitters(toks, k=3, cap=16).collect()}
    assert set(rows) == {"x"}
    assert rows["x"]["cnt"] == 30
    assert rows["x"]["n_total"] == 40
    assert rows["x"]["share"] == 30 / 40


def test_heavy_hitters_shuffled_semi_join_path_matches(spark):
    """broadcast_candidates=False (the extreme-partition-count
    fallback) must produce the identical result."""
    toks = _skewed_tokens(spark)
    a = {
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(toks, "token", k=50, cap=64).collect()
    }
    b = {
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(
            toks, "token", k=50, cap=64, broadcast_candidates=False
        ).collect()
    }
    assert a == b and len(a) == 8


def test_heavy_hitters_bigint_tokens_no_string_coercion_loss(spark):
    """r6 (ADVICE r5): the MG candidate frame is string-typed; joining
    it against a BIGINT fact column must compare string-to-string, not
    coerce both to double (which collapses keys past 2^53). Two huge
    keys that are double-equal but distinct must both survive."""
    from pyspark.sql import functions as F

    k1 = 9_007_199_254_740_993  # 2^53 + 1
    k2 = 9_007_199_254_740_992  # 2^53     (same double as k1)
    rows = [(k1,)] * 30 + [(k2,)] * 30 + [(i,) for i in range(40)]
    toks = spark.createDataFrame(rows, "token long").repartition(4)
    got = {r.token: r.cnt for r in heavy_hitters(toks, k=4).collect()}
    assert got == {k1: 30, k2: 30}
    assert heavy_hitters(toks, k=4).schema["token"].dataType.typeName() == "long"


def test_heavy_hitters_boolean_and_double_tokens(spark):
    """r6 review follow-up: dtypes whose Spark string rendering differs
    from pandas str() (booleans 'true' vs 'True', doubles '1.0E20' vs
    '1e+20') must still match their MG candidates — the candidate
    frame now mirrors the input dtype, so no rendering is involved."""
    rows = [(True,)] * 30 + [(False,)] * 5
    toks = spark.createDataFrame(rows, "token boolean").repartition(3)
    got = {r.token: r.cnt for r in heavy_hitters(toks, k=4).collect()}
    assert got == {True: 30}

    drows = [(1e20,)] * 30 + [(float(i),) for i in range(30)]
    dtoks = spark.createDataFrame(drows, "token double").repartition(3)
    dgot = {r.token: r.cnt for r in heavy_hitters(dtoks, k=4).collect()}
    assert dgot == {1e20: 30}
