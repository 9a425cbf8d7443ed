#!/usr/bin/env python
"""Benchmark harness.

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "suite_docs_per_sec": ..., "suite_n_docs": ...}

Headline pieces:
- ``suite``: the full constraint suite (span integrity via the JVM
  expression fold, salted uniqueness, broadcast anti-join referential,
  per-partition summary) over a synthesized interleaved corpus sized
  to the SF (500k docs at sf0.1) — this is the BASELINE.json metric.
- ``suite_arrow``: same suite with the mandated Arrow UDF row path
  (identical results; perf comparison vs the expression fold).
- a representative slice of the driver-table operator queries.

For the N vs 4N scaling-efficiency protocol, see ``bench_scaling.py``
(writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# synthesized-corpus size per SF (docs); ~4.4 spans/doc average
SUITE_DOCS = {"sf0.001": 5_000, "sf0.01": 50_000, "sf0.1": 500_000}


def sf_tag(path: str) -> str:
    return os.path.basename(path.rstrip("/"))


def main() -> None:
    if not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")):
        sys.exit(
            f"bench: {SF_DIR} has no testdata tables "
            "(set SPARK_GRAFT_SF_DIR to a /root/testdata/sf* dir)"
        )

    from pyspark.sql import functions as F

    from biosample_enricher_spark.constraints import ConstraintSuite
    from biosample_enricher_spark.queries import QUERIES
    from biosample_enricher_spark.session import get_spark
    from biosample_enricher_spark.synth import (
        GenParams,
        gen_asset_catalog,
        gen_documents,
    )

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )

    tag = sf_tag(SF_DIR)
    n_docs = SUITE_DOCS.get(tag, 50_000)
    params = GenParams(seed=42, n_assets=100_000)
    timings: dict[str, float] = {}

    # --- constraint suite (the headline metric) ---
    catalog = gen_asset_catalog(spark, params)
    docs = gen_documents(spark, n_docs, params)
    # materialize the corpus once so the suite timing measures
    # validation, not generation (parity with "reading an existing
    # Iceberg table")
    docs.persist()
    n_materialized = docs.count()

    def run_suite(use_arrow: bool) -> tuple[float, int]:
        suite = ConstraintSuite(use_arrow_udf=use_arrow)
        t0 = time.perf_counter()
        res = suite.run(docs, catalog)
        n_viol = res.violations.count()
        res.summary.collect()
        dt = time.perf_counter() - t0
        res.unpersist()
        return dt, n_viol

    # cold = first-ever run (codegen compile, broadcast build, Python
    # worker spin-up for the Arrow path); warm = steady state, reported
    # as the MIN of 3 repeats. The sandbox VM shows heavy host steal
    # (load >10 with zero local CPU users; a warm re-run of the
    # identical deterministic plan measured 4× slower than its own
    # cold run). For noise that is strictly additive, min-of-N is the
    # consistent estimator of the true cost — medians still lose when
    # the steal outlasts 2 of 3 samples.
    def min3(use_arrow: bool) -> float:
        return min(run_suite(use_arrow)[0] for _ in range(3))

    timings["suite"], n_violations = run_suite(False)
    timings["suite_warm"] = min3(False)
    timings["suite_arrow"], _ = run_suite(True)
    timings["suite_arrow_warm"] = min3(True)

    # --- operator-query slice over driver tables ---
    bench_queries = [
        "s1_scan_filter_project",
        "a9_grouped_coverage",
        "a10_region_rollup",
        "a13_uniqueness_violations",
        "j4_tolerance_join",
        "w1_best_per_group",
        "dedup_exact_groups",
        "text_lang_id",
        "ann_bruteforce_topk",
    ]
    for name in bench_queries:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = min(runs)

    docs.unpersist()
    total = sum(timings.values())
    out = {
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": tag,
        "suite_n_docs": n_materialized,
        "suite_n_violations": n_violations,
        "suite_docs_per_sec": round(n_materialized / timings["suite"], 1),
        "suite_warm_docs_per_sec": round(
            n_materialized / timings["suite_warm"], 1
        ),
        "suite_arrow_docs_per_sec": round(
            n_materialized / timings["suite_arrow"], 1
        ),
        "suite_arrow_warm_docs_per_sec": round(
            n_materialized / timings["suite_arrow_warm"], 1
        ),
        "cpus": int(CPUS),
        "host_load_1m": round(os.getloadavg()[0], 2),
        "warm_protocol": "min of 3 (additive-noise-robust)",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
