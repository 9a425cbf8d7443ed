"""Pins for the r5i batch: fixed-point PageRank, range-checksum
reconciliation, last-touch attribution."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.graph import _FP, pagerank
from biosample_enricher_spark.operators.profile import range_checksum_diff
from biosample_enricher_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _edges_df(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            (F.col("l_orderkey") % 1000).alias("src"),
            (F.col("l_partkey") % 1000).alias("dst"),
        )
        .distinct()
    )


def _numpy_pagerank(edges, iterations=12, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges_rows = [(r.src, r.dst) for r in _edges_df(spark).collect()]
    exp = _numpy_pagerank(edges_rows)
    got = {r.node: r.rank_fp / _FP for r in pagerank(_edges_df(spark)).collect()}
    assert got.keys() == exp.keys()
    # fixed-point truncation deficit is < iters*(max_indeg+2)*1e-15
    assert max(abs(got[v] - exp[v]) for v in exp) < 1e-6


def test_pagerank_is_bit_deterministic_and_conserves_mass(spark):
    a = {r.node: r.rank_fp for r in pagerank(_edges_df(spark)).collect()}
    b = {r.node: r.rank_fp for r in pagerank(_edges_df(spark)).collect()}
    assert a == b  # exact integer equality, not approx
    total = sum(a.values())
    # mass is 1.0 minus only the cumulative integer-division deficit
    n = len(a)
    assert _FP * 0.999999 < total <= _FP, (total, n)


def test_pagerank_dangling_and_sink_graph(spark):
    # star into a sink: 1->4, 2->4, 3->4; node 4 dangles. The sink
    # must collect the most rank; spokes tie exactly (bit-equal).
    e = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "src long, dst long"
    )
    got = {r.node: r.rank_fp for r in pagerank(e, iterations=8).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == got[2] == got[3]
    assert got[4] > got[1]
    exp = _numpy_pagerank([(1, 4), (2, 4), (3, 4)], iterations=8)
    for v in exp:
        assert abs(got[v] / _FP - exp[v]) < 1e-9


def test_range_checksum_diff_finds_exactly_planted_ranges(spark):
    base = spark.range(0, 4096).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("val")
    )
    # plant: value change at k=100 (range 0), deletion at k=1000
    # (range 3), insertion at k=5000 (range 19, new side only)
    old = base.union(
        spark.createDataFrame([(9999, 1)], "k long, val long")
    ).where(F.col("k") != 5000)
    new = (
        base.where(F.col("k") != 1000)
        .withColumn(
            "val",
            F.when(F.col("k") == 100, F.lit(-1)).otherwise(F.col("val")),
        )
        .union(spark.createDataFrame([(5000, 5), (9999, 1)], "k long, val long"))
    )
    fp = F.col("val").cast("string")
    got = {
        (r.range_id, r.n_old, r.n_new)
        for r in range_checksum_diff(old, new, "k", fp, 256).collect()
    }
    assert got == {
        (100 // 256, 256, 256),   # changed value, same counts
        (1000 // 256, 256, 255),  # deletion
        (5000 // 256, 0, 1),      # insertion into a fresh range
    }
    # identical sides -> zero differing ranges
    assert range_checksum_diff(base, base, "k", fp, 256).count() == 0


def test_last_touch_attribution_planted_edges(spark, tmp_path):
    t0 = dt.datetime(2021, 1, 1)

    def ev(eid, secs, uid, typ):
        return (eid, t0 + dt.timedelta(seconds=secs), uid, typ, 1.0)

    rows = [
        ev(1, 0, 1, "purchase"),            # before any touch -> NULL
        ev(2, 10, 1, "view"),
        ev(3, 20, 1, "click"),
        ev(4, 30, 1, "purchase"),           # -> click 3 (latest touch)
        ev(5, 40, 1, "view"),
        ev(6, 40, 1, "purchase"),           # same ts: view 5 wins (event_id order)
        ev(7, 50, 2, "view"),
        ev(8, 60, 1, "purchase"),           # user 2's view must NOT leak -> view 5
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = str(tmp_path / "attr")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    got = {
        (r.event_id, r.attributed_event_id, r.attr_age_us)
        for r in QUERIES["fn2_last_touch_attribution"](spark, out).collect()
    }
    assert got == {
        (1, None, None),
        (4, 3, 10_000_000),
        (6, 5, 0),
        (8, 5, 20_000_000),
    }


def test_pagerank_chain_scale_smoke(spark):
    """10^4-node chain (worst sparsity for per-round joins): 12
    rounds complete, the head (pure source) holds exactly the
    teleport mass, ranks increase monotonically down the first few
    hops, and the run is bit-deterministic."""
    n = 10_000
    e = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    got = {r.node: r.rank_fp for r in pagerank(e, iterations=12).collect()}
    assert len(got) == n
    teleport = ((100 - 85) * _FP // 100) // n
    # head receives teleport + its share of the tail sink's dangling
    # mass, nothing else — so it is the strict minimum, and every
    # node holds at least the teleport floor
    assert got[0] == min(got.values())
    assert got[0] >= teleport
    assert got[0] < got[1] < got[2]    # mass accumulates down-chain
    again = {r.node: r.rank_fp for r in pagerank(e, iterations=12).collect()}
    assert got == again
