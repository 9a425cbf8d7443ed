#!/usr/bin/env python
"""Stage probe for g2_triangle_count (guide §1.4)."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from biosample_enricher_spark.session import get_spark

    spark = get_spark(app_name="probe_tri", master="local[32]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    times = {}

    def timeit(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        return r

    edges = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.col("l_partkey") % 1000).alias("dst"),
    )
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_edges = timeit("und distinct+persist", und.count)
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select("b"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_nodes = timeit("deg count", deg.count)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        .persist()
    )
    timeit("oriented persist", oriented.count)
    o1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    o2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = o1.join(o2, "u").where(F.col("v") < F.col("w"))
    n_wedges = timeit("wedge join count", wedges.count)
    closing = und.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri_df = wedges.join(closing, ["v", "w"])
    tri = timeit("close join count", tri_df.count)
    p = tri_df._sc._jvm.PythonSQLUtils.explainString(
        tri_df._jdf.queryExecution(), "formatted")
    open("/tmp/tri_plan.txt", "w").write(p)
    times.update(n_edges=n_edges, n_nodes=n_nodes, n_wedges=n_wedges,
                 n_tri=tri)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
