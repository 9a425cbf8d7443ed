"""Planted-data and Python-reference tests for the r5g batch:
star-schema rollup, rolling z-score, interval merge, bitmap distinct."""

from __future__ import annotations

import datetime as dt

import duckdb

from biosample_enricher_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

EPOCH = dt.datetime(2020, 1, 1)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_offset_s, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [
            (eid, EPOCH + dt.timedelta(seconds=off), uid, et, val)
            for eid, off, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = str(tmp_path / "planted")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def test_w10_flags_planted_spike_and_skips_constant(spark, tmp_path):
    # user 1: 19 steady values then one spike -> exactly one flag (the
    # spike row; the 20-row full-window requirement suppresses warm-up).
    # user 2: perfectly constant -> dev2 == 0 is never > bound == 0.
    rows = []
    for i in range(19):
        rows.append((i, i, 1, "view", 100.0 + (i % 2)))  # tiny jitter
    rows.append((19, 19, 1, "view", 400.0))
    for i in range(25):
        rows.append((100 + i, i, 2, "view", 50.0))
    sf = _write_events(spark, tmp_path, rows)
    got = QUERIES["w10_rolling_zscore"](spark, sf).collect()
    assert [(r.user_id, r.event_id) for r in got] == [(1, 19)]


def test_w10_matches_python_reference_on_testdata(spark):
    got = {
        (r.user_id, r.event_id)
        for r in QUERIES["w10_rolling_zscore"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) v, ts "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    exp = set()
    hist: dict[int, list[tuple[int, int]]] = {}
    for uid, eid, v, _ in rows:
        h = hist.setdefault(uid, [])
        h.append((eid, v))
        if len(h) >= 20:
            w = h[-20:]
            s1 = sum(x for _, x in w)
            s2 = sum(x * x for _, x in w)
            n = 20
            if (n * v - s1) ** 2 > 9 * (n * s2 - s1 * s1):
                exp.add((uid, eid))
    assert got == exp


def test_w11_merges_overlap_and_touching_keeps_disjoint(spark, tmp_path):
    # durations come from value: dur_s = (round(value*100) % 300) + 60.
    # value 3.00 -> 60 s; value 0.40 -> 100 s; value 1.40 -> 200 s.
    rows = [
        # user 1: [0,100) + [50,150) overlap; [150,210) touches (start
        # == running max end -> merges, the documented half-open
        # adjacency contract) => one island [0,210); [1000,1060)
        # disjoint => second island.
        (1, 0, 1, "view", 0.40),
        (2, 50, 1, "view", 0.40),
        (3, 150, 1, "view", 3.00),
        (4, 1000, 1, "view", 3.00),
        # user 2: containment — [0,200) swallows [10,70).
        (5, 0, 2, "view", 1.40),
        (6, 10, 2, "view", 3.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.user_id: (r.n_merged, r.covered_us)
        for r in QUERIES["w11_interval_merge"](spark, sf).collect()
    }
    assert got == {1: (2, (210 + 60) * 1_000_000), 2: (1, 200 * 1_000_000)}


def test_a35_bitmap_exact_across_word_boundaries(spark, tmp_path):
    # ids straddling the 63-bit word boundary (62|63, 125|126) plus
    # duplicates must still count exactly once each.
    ids = [0, 1, 62, 63, 64, 125, 126, 127, 0, 63, 127]
    rows = [(i, i, uid, "click", 1.0) for i, uid in enumerate(ids)]
    sf = _write_events(spark, tmp_path, rows)
    r = QUERIES["a35_bitmap_distinct"](spark, sf).collect()
    assert len(r) == 1
    assert r[0].bitmap_distinct == r[0].exact_distinct == len(set(ids))


def test_star1_broadcasts_dimensions_and_pushes_date_filter(spark):
    df = QUERIES["star1_revenue_rollup"](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    # nation/region ride broadcast joins; the date range reaches the
    # orders scan as a pushed filter.
    assert p.count("BroadcastHashJoin") >= 2
    pushed = p.split("PushedFilters:")
    assert any("o_orderdate" in seg[:300] for seg in pushed[1:])


def test_star1_revenue_is_exact_integer(spark):
    sch = dict(QUERIES["star1_revenue_rollup"](spark, SF).dtypes)
    assert sch["revenue_c4"] == "bigint"
    assert sch["n_items"] == "bigint"
