"""S9/S10 sinks: partitioned violation writes, CSV/JSON outputs,
Markdown summary rendering."""

from __future__ import annotations

import os

from biosample_enricher_spark.constraints import ConstraintSuite
from biosample_enricher_spark.operators.sinks import (
    summary_markdown,
    write_csv,
    write_json,
    write_violations,
)
from biosample_enricher_spark.synth import GenParams, gen_asset_catalog, gen_documents


def test_sinks_roundtrip(spark, tmp_path):
    p = GenParams(seed=17, n_assets=100)
    docs = gen_documents(spark, 300, p)
    res = ConstraintSuite().run(docs, gen_asset_catalog(spark, p))

    vpath = str(tmp_path / "viols")
    write_violations(res.violations, vpath)
    back = spark.read.parquet(vpath)
    assert back.count() == res.violations.count()
    # partitioned by constraint_id → directory-per-value layout enables
    # partition pruning
    assert any(
        d.startswith("constraint_id=") for d in os.listdir(vpath) if "=" in d
    )
    pruned = back.where(back.constraint_id == "offset_ordering")
    assert pruned.count() == res.violations.where(
        res.violations.constraint_id == "offset_ordering"
    ).count()

    cpath = str(tmp_path / "summary_csv")
    write_csv(res.summary, cpath)
    csv_back = spark.read.option("header", "true").csv(cpath)
    assert csv_back.count() == res.summary.count()

    jpath = str(tmp_path / "summary_json")
    write_json(res.summary, jpath)
    assert spark.read.json(jpath).count() == res.summary.count()

    md = summary_markdown(res.summary)
    assert md.startswith("# Constraint summary")
    assert "offset_ordering" in md and "| pass rate |" in md
    res.unpersist()
