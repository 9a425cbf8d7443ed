#!/usr/bin/env python
"""Build the 10x stress table set: every sf0.1 table unioned 10 times
with shifted keys into /tmp/sfx10 (sf1.0-scale row counts). Texts and
embeddings recur 10x by construction — disclosed wherever the set is
cited; the exact-collapse / fingerprint tiers are SUPPOSED to absorb
planted duplication, which is exactly what this set stress-tests.
Key shifts keep referential integrity (all fact FKs shift with their
dimension PKs); region/nation are fixed dims and copy as-is.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/sfx10")
COPIES = 10

SHIFTS = {
    # table -> {column: per-copy shift}
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000, },
    "part": {"p_partkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    # user_id must shift WITH c_custkey (events.user_id ⊆ customer
    # keys in the base data) or copies 1-9 orphan every event
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "region": None,  # fixed dims, copy once
    "nation": None,
}


def main() -> None:
    from biosample_enricher_spark.session import get_spark

    spark = get_spark(app_name="gen_x10", master="local[32]",
                      shuffle_partitions=32)
    os.makedirs(DST, exist_ok=True)
    for table, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        if shifts is None:
            out = src
        else:
            parts = []
            for i in range(COPIES):
                c = src
                for col, step in shifts.items():
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(i * step)).cast("long")
                    )
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(table, "->", spark.read.parquet(
            f"{DST}/{table}.parquet").count())

    # documents_uv: unique vocabulary per copy (every word suffixed
    # with the copy index) — 10 vocab-disjoint corpora in one table.
    # The duplicated-text `documents` above is the EXACT-DEDUP stress
    # (collapse must absorb it) but is the documented pathological
    # input for the raw exact-jaccard tier (identical docs multiply
    # candidate pairs x100); this variant is the clean linear-scaling
    # probe for that tier.
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        c = src.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * 1_000_000)).cast("long")
        )
        if i > 0:
            c = c.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\w+)", rf"$1q{i}"),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents_uv.parquet")
    print("documents_uv ->", spark.read.parquet(
        f"{DST}/documents_uv.parquet").count())


if __name__ == "__main__":
    main()
