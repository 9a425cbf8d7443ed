"""Pins for the r5m batch: Pareto ABC, forward as-of, split assign."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from biosample_enricher_spark.queries import QUERIES

SF01 = "/root/testdata/sf0.01"


def test_pareto_abc_planted_boundaries(spark, tmp_path):
    # revenues (cents): 5000, 3000, 1500, 400, 100 (tot 10000)
    # cum: 5000 A(50%), 8000 A(80% EXACTLY -> A), 9500 B(95% -> B),
    #      9900 C(99%), 10000 C
    rows = []
    lid = 0
    for k, cents in ((1, 5000), (2, 3000), (3, 1500), (4, 400), (5, 100)):
        rows.append((lid, k, cents / 100.0))
        lid += 1
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double"
    )
    out = str(tmp_path / "abc")
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    got = {
        r.k: (r.rev_c, r.cum_c, r.abc)
        for r in QUERIES["w13_pareto_abc"](spark, out).collect()
    }
    assert got == {
        1: (5000, 5000, "A"),
        2: (3000, 8000, "A"),   # cum*100 == tot*80 -> still A
        3: (1500, 9500, "B"),   # cum*100 == tot*95 -> still B
        4: (400, 9900, "C"),
        5: (100, 10000, "C"),
    }


def test_asof_forward_planted_cases(spark, tmp_path):
    t0 = dt.datetime(2022, 1, 1)

    def ev(eid, secs, uid, typ):
        return (eid, t0 + dt.timedelta(seconds=secs), uid, typ, 1.0)

    rows = [
        ev(1, 0, 1, "purchase"),   # -> error 3 (earliest at/after)
        ev(2, 5, 1, "purchase"),   # -> error 3
        ev(3, 10, 1, "error"),
        ev(4, 20, 1, "purchase"),  # after last error -> NULL
        ev(5, 30, 2, "error"),     # other user must not leak
        ev(6, 40, 1, "purchase"),  # -> NULL (user 2's error ignored)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = str(tmp_path / "asof")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    got = {
        (r.event_id, r.next_error_id, r.gap_us)
        for r in QUERIES["j13_asof_forward"](spark, out).collect()
    }
    assert got == {
        (1, 3, 10_000_000),
        (2, 3, 5_000_000),
        (4, None, None),
        (6, None, None),
    }


def test_split_assign_partitions_exhaustively_and_deterministically(spark):
    got = QUERIES["x16_split_assign"](spark, SF01).collect()
    again = QUERIES["x16_split_assign"](spark, SF01).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in again}
    per_lang = {}
    for r in got:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + r.n_docs
    totals = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF01}/documents.parquet")
        .where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang == totals  # exhaustive + exclusive per lang
    n_all = sum(per_lang.values())
    n_train = sum(r.n_docs for r in got if r.split == "train")
    assert 0.8 < n_train / n_all < 0.97  # ~90% within small-sample noise
