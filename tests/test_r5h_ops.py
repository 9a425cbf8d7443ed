"""Structural and losslessness tests for the r5h batch: grid spatial
join, Count-Min sketch, stream-static join, weighted median."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from biosample_enricher_spark.operators.freq import (
    countmin_estimates,
    countmin_sketch,
)
from biosample_enricher_spark.operators.geo import grid_near_join
from biosample_enricher_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _random_points(spark, seed, n, lo=0, hi=1_000_000):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(lo, hi), rng.randrange(lo, hi)) for i in range(n)]
    return rows, spark.createDataFrame(rows, "id long, x long, y long")


def _exhaustive_pairs(rows_a, rows_b, radius):
    r2 = radius * radius
    out = set()
    for ia, xa, ya in rows_a:
        for ib, xb, yb in rows_b:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r2:
                out.add((ia, ib, d2))
    return out


def test_grid_near_join_equals_exhaustive_on_random_points(spark):
    """Losslessness: the 3x3-neighborhood candidate set must recover
    EVERY pair the all-pairs check finds, at two radii (cells resize
    with the radius, so both cell geometries are exercised), including
    boundary pairs sitting exactly at d2 == r*r."""
    rows_a, a = _random_points(spark, 7, 60)
    rows_b, b = _random_points(spark, 11, 400)
    for radius in (15_000, 60_000):
        got = {
            (r.id_a, r.id_b, r.d2)
            for r in grid_near_join(a, b, radius).collect()
        }
        assert got == _exhaustive_pairs(rows_a, rows_b, radius)


def test_grid_near_join_boundary_pair_and_cell_straddle(spark):
    """A pair exactly at distance r straddling a cell border (cells
    differ by 1 on both axes) must be found, and a pair 1 unit past r
    must not."""
    a = spark.createDataFrame([(1, 19_999, 19_999)], "id long, x long, y long")
    b = spark.createDataFrame(
        [(10, 19_999 + 20_000, 19_999), (11, 19_999 + 20_001, 19_999)],
        "id long, x long, y long",
    )
    got = [(r.id_a, r.id_b, r.d2) for r in grid_near_join(a, b, 20_000).collect()]
    assert got == [(1, 10, 20_000 * 20_000)]


def test_grid_near_join_plan_is_equi_join_not_cartesian(spark):
    """The whole point of the grid: the plan must hash-join on the
    cell key, never cross-join the two sides."""
    _, a = _random_points(spark, 3, 50)
    _, b = _random_points(spark, 5, 50)
    plan = grid_near_join(a, b, 20_000)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_countmin_overestimates_every_key_and_bounds_error(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    est = countmin_estimates(ev, exact, "user_id", depth=3, width=64)
    joined = exact.join(est, "user_id").collect()
    n_total = sum(r.exact_n for r in joined)
    assert len(joined) > 0
    for r in joined:
        assert r.est_n >= r.exact_n, r  # structural: never undercounts
        # CM bound: P[over > e*N/w] < e^-depth per key; assert the far
        # looser deterministic row-sum cap (a cell never exceeds N).
        assert r.est_n - r.exact_n <= n_total


def test_countmin_sketch_is_fixed_size_and_mergeable(spark):
    """Cells are <= depth*width regardless of cardinality, and the
    sketch of a union is the cell-wise SUM of the parts' sketches —
    the mergeable-summaries property that makes it a distributive
    aggregate at 100 TB."""
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("user_id").isNotNull()
    )
    whole = {
        (r.j, r.bucket): r.bucket_n
        for r in countmin_sketch(ev, "user_id", 3, 64).collect()
    }
    assert len(whole) <= 3 * 64
    pa = ev.where(F.col("event_id") % 2 == 0)
    pb = ev.where(F.col("event_id") % 2 == 1)
    merged: dict[tuple, int] = {}
    for part in (pa, pb):
        for r in countmin_sketch(part, "user_id", 3, 64).collect():
            merged[(r.j, r.bucket)] = merged.get((r.j, r.bucket), 0) + r.bucket_n
    assert merged == whole


def test_weighted_median_matches_python_on_planted_ties(spark, tmp_path):
    """Lower weighted median with heavy ties: the RANGE-frame peer
    semantics must pick the same value a direct Python scan picks."""
    rows = [
        # (flag, val, weight_cents) — group A: ties at the median
        ("A", 1, 100), ("A", 2, 100), ("A", 2, 100), ("A", 9, 100),
        # group B: single dominant weight wins outright
        ("B", 5, 1), ("B", 7, 1000), ("B", 9, 1),
        # group C: exact half boundary -> 2*cum == tot selects val 3
        ("C", 3, 500), ("C", 8, 500),
    ]
    df = spark.createDataFrame(
        [(f, float(v), w / 100.0) for f, v, w in rows],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    out = str(tmp_path / "wm")
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    got = {
        (r.l_returnflag, r.weighted_median, r.total_w)
        for r in QUERIES["a37_weighted_median"](spark, out).collect()
    }

    def py_wmedian(group):
        group = sorted(group)
        tot = sum(w for _, w in group)
        cum = 0
        # peer semantics: accumulate full tie-groups before testing
        i = 0
        while i < len(group):
            v = group[i][0]
            while i < len(group) and group[i][0] == v:
                cum += group[i][1]
                i += 1
            if 2 * cum >= tot:
                return v, tot
        raise AssertionError

    exp = set()
    for flag in ("A", "B", "C"):
        g = [(v, w) for f, v, w in rows if f == flag]
        v, tot = py_wmedian(g)
        exp.add((flag, v, tot))
    assert got == exp


def test_grid_near_join_handles_negative_coordinates(spark):
    """Floor-division cell math: a truncating div would put (-1, -1)
    and (1, 1) in the SAME cell 0 (fine) but (-10001, 0) and
    (9999, 0) two cells apart while a straddling near pair around a
    negative boundary would be missed. Exhaustive check on a grid of
    points spanning both signs."""
    rows_a = [(i, x, y) for i, (x, y) in enumerate(
        (dx * 7001 - 15000, dy * 6337 - 15000)
        for dx in range(5) for dy in range(5)
    )]
    rows_b = [(100 + i, x, y) for i, (x, y) in enumerate(
        (dx * 6673 - 14000, dy * 7411 - 16000)
        for dx in range(5) for dy in range(5)
    )]
    a = spark.createDataFrame(rows_a, "id long, x long, y long")
    b = spark.createDataFrame(rows_b, "id long, x long, y long")
    radius = 10_000
    got = {
        (r.id_a, r.id_b, r.d2) for r in grid_near_join(a, b, radius).collect()
    }
    exp = _exhaustive_pairs(rows_a, rows_b, radius)
    assert got == exp and len(exp) > 0


def test_countmin_absent_key_estimates_zero_via_empty_cell(spark):
    """A queried key the stream never saw must estimate 0 whenever
    any of its cells is empty — the left-join + coalesce(0) contract
    (an inner join would drop the empty cell from the min)."""
    items = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "k string")
    # probe many absent keys: with 3 rows x 64 buckets and only 2
    # occupied cells per row, almost every absent key hits an empty
    # cell; assert at least one absent key estimates exactly 0 and
    # that no absent key estimates above the total mass.
    absent = spark.createDataFrame([(f"zz{i}",) for i in range(30)], "k string")
    est = {
        r.k: r.est_n
        for r in countmin_estimates(items, absent, "k", 3, 64).collect()
    }
    assert len(est) == 30
    assert min(est.values()) == 0
    assert max(est.values()) <= 8


def test_countmin_null_keys_are_excluded_not_mishashed(spark):
    """concat_ws drops a null operand, so without the explicit
    filter a NULL key would hash as the bare row-index string and
    return a spurious collision-mass estimate (and diverge from the
    SQL oracle idiom, which yields NULL). NULL keys must simply be
    absent from the output."""
    items = spark.createDataFrame([("a",)] * 4 + [("b",)] * 2, "k string")
    keys = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    est = {r.k: r.est_n for r in countmin_estimates(items, keys, "k", 3, 64).collect()}
    assert set(est) == {"a", "b"}
    assert est["a"] >= 4 and est["b"] >= 2
