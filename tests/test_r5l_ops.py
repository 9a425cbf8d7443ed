"""Pins for the r5l batch: triangle counting, CDC changelog apply,
equi-depth histogram."""

from __future__ import annotations

import itertools
import random

from biosample_enricher_spark.operators.graph import triangle_count
from biosample_enricher_spark.queries import QUERIES

SF01 = "/root/testdata/sf0.01"


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri += 1
    return len(adj), len(und), tri


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    for seed, n, m in ((1, 12, 30), (2, 20, 60), (3, 9, 36)):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles) == _py_triangles(edges), seed


def test_triangle_count_planted_shapes(spark):
    # K4 = 4 triangles; a 5-spoke star = 0; duplicate/reversed/self
    # edges must not change either count
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(0, 0), (1, 1), (0, 1)]
    r = triangle_count(
        spark.createDataFrame(noisy, "src long, dst long")
    ).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    star = [(0, i) for i in range(1, 6)]
    r = triangle_count(
        spark.createDataFrame(star, "src long, dst long")
    ).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 5, 0)


def test_cdc_changelog_last_op_wins_regardless_of_input_order(spark, tmp_path):
    """The window orders by seq, not arrival: feed the same log rows
    through the driver query's manufacture at sf0.001 and check the
    I/U/D endstates directly against the plant rules."""
    rows = {
        r.k: (r.last_op, r.cents)
        for r in QUERIES["cdc1_changelog_apply"](spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    con = duckdb.connect()
    base = con.execute(
        "SELECT o_orderkey, CAST(floor(o_totalprice*100.0) AS BIGINT) "
        "FROM '/root/testdata/sf0.001/orders.parquet'"
    ).fetchall()
    for k, cents in base:
        if k % 13 == 0:
            assert k not in rows  # deleted — even if also updated
        elif k % 11 == 0:
            assert rows[k] == ("U", cents + 100)
        else:
            assert rows[k] == ("I", cents)
    assert len(rows) == sum(1 for k, _ in base if k % 13 != 0)


def test_equidepth_histogram_balanced_and_ordered(spark):
    got = QUERIES["v13_equidepth_histogram"](spark, SF01).collect()
    assert [r.bucket for r in got] == list(range(1, 9))
    counts = [r.n for r in got]
    assert max(counts) - min(counts) <= 1  # equi-depth, ntile contract
    assert sum(counts) == 500
    for i in range(len(got) - 1):
        assert got[i].lo <= got[i].hi <= got[i + 1].lo  # monotone bounds


def test_triangle_count_hub_star_is_orientation_safe(spark):
    """50k-spoke hub + one planted triangle: the naive wedge join
    would enumerate C(50k,2) ≈ 1.2e9 hub wedges; orientation points
    every spoke edge INTO the hub (it has the max degree), so the
    hub's out-degree is 0 and the wedge join stays ~|spokes|. The
    test completing in seconds with the exact count IS the
    scale-evidence for the orientation claim."""
    hub = 10**9
    spokes = [(hub, i) for i in range(50_000)]
    tri = [(1, 2)]  # 1-2 closes the (hub,1),(hub,2) wedge
    df = spark.createDataFrame(spokes + tri, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (50_001, 50_001, 1)
