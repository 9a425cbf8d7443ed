#!/usr/bin/env python
"""Stage-by-stage probe for dedup_ngram_jaccard (guide §1.4 noop
isolation). Not part of the bench contract."""
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
    from biosample_enricher_spark.operators import dedup as D
    from biosample_enricher_spark.operators.text import ascii_word_tokens
    from biosample_enricher_spark.session import get_spark

    spark = get_spark(app_name="probe_ngram", master="local[32]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    times = {}

    def noop(name, df):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)

    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("text").isNotNull())
    )
    sh = d.select(
        F.col("doc_id").alias("doc_id"),
        D.token_bigrams(ascii_word_tokens(F.col("text"))).alias("sh"),
    ).where(F.size("sh") > 0)

    noop("tokenize+bigrams", sh)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    index = sh.select("doc_id", F.explode("sh").alias("shingle"))
    noop("index (explode)", index)
    docfreq = index.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    noop("docfreq", docfreq)
    cand = D.prefix_candidate_pairs(index, sizes, 3, 5)
    noop("candidates", cand)
    # prefix_filtered_jaccard_from is EAGER as of r6 — time the CALL,
    # not a noop of its (already-materialized) checkpointed result
    for tag in ("full query", "full query (2nd)"):
        sc.setJobDescription(tag)
        t0 = time.perf_counter()
        full = D.prefix_filtered_jaccard_from(sh, 3, 5)
        full.write.format("noop").mode("overwrite").save()
        times[tag] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
