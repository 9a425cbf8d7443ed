"""Unit tests for the bench harness logic that gates the scaling
claim (no Spark; pure-Python paths only). The ≥0.8 pass gate moved to
a pooled-min estimator in r5 (ADVICE r4: one lucky single-exec run
must not flip the gate) — pin the pooling/trimming arithmetic."""

from __future__ import annotations

import json

import bench_scaling as bs


def test_pooled_min_efficiency_pools_disclosed_execs(tmp_path, monkeypatch):
    bench = tmp_path / "BENCH"
    bench.mkdir()
    (bench / "scaling_r4_exec1.json").write_text(
        json.dumps(
            {
                "n_docs": bs.N_DOCS,
                "levels": {
                    "2": {"times_sec": [80.0, 90.0]},
                    "8": {"times_sec": [30.0, 31.0]},
                },
            }
        )
    )
    # a second exec with the true 8-core min; a corrupt file must be
    # skipped, not crash the gate
    (bench / "scaling_r4_exec2.json").write_text(
        json.dumps({"n_docs": bs.N_DOCS, "levels": {"8": {"times_sec": [20.0]}}})
    )
    (bench / "scaling_r9_execX.json").write_text("{not json")
    # a smoke run at a different corpus size must NOT feed the gate
    # (its best time would otherwise fake the pooled min)
    (bench / "scaling_r9_exec9.json").write_text(
        json.dumps(
            {
                "n_docs": 100,
                "levels": {
                    "2": {"times_sec": [0.4]},
                    "8": {"times_sec": [0.1]},
                },
            }
        )
    )
    monkeypatch.setattr(bs, "REPO", str(tmp_path))

    current = {
        2: {"times_sec": [84.0]},
        8: {"times_sec": [25.0]},
    }
    out = bs.pooled_min_efficiency(current, 2, 8, 4.0)
    # pooled mins: level2 = min(80, 90, 84) = 80; level8 = min(30, 31,
    # 20, 25) = 20 → (80/20)/4 = 1.0
    assert out["min_sec"] == {"2": 80.0, "8": 20.0}
    assert out["efficiency"] == 1.0
    assert out["n_samples"] == 3  # min(|pool2|=3, |pool8|=4)
    assert out["pooled_files"] == [
        "scaling_r4_exec1.json",
        "scaling_r4_exec2.json",
    ]


def test_pooled_min_efficiency_without_prior_execs(tmp_path, monkeypatch):
    (tmp_path / "BENCH").mkdir()
    monkeypatch.setattr(bs, "REPO", str(tmp_path))
    current = {2: {"times_sec": [100.0]}, 8: {"times_sec": [50.0]}}
    out = bs.pooled_min_efficiency(current, 2, 8, 4.0)
    assert out["efficiency"] == 0.5
    assert out["pooled_files"] == []


def test_persist_exec_increments_and_round_trips(tmp_path, monkeypatch):
    (tmp_path / "BENCH").mkdir()
    monkeypatch.setattr(bs, "REPO", str(tmp_path))
    results = {2: {"times_sec": [1.0]}, 8: {"times_sec": [0.5]}}
    bs.persist_exec(results)
    bs.persist_exec(results)
    f1 = tmp_path / "BENCH" / "scaling_r6_exec1.json"
    f2 = tmp_path / "BENCH" / "scaling_r6_exec2.json"
    assert f1.exists() and f2.exists()
    doc = json.loads(f1.read_text())
    assert doc["levels"]["2"]["times_sec"] == [1.0]
    # and the persisted file feeds straight back into the pool
    out = bs.pooled_min_efficiency(results, 2, 8, 4.0)
    assert out["pooled_files"] == [
        "scaling_r6_exec1.json",
        "scaling_r6_exec2.json",
    ]


def test_wait_quiet_disabled_returns_immediately(monkeypatch):
    monkeypatch.setattr(bs, "QUIET_GATE", 0.0)
    load, waited, ok = bs.wait_quiet()
    assert waited == 0.0 and ok


def test_hex_fraction_math_matches_duckdb(spark):
    """mix_corpus_weighted's keep predicate hinges on
    conv(substr(md5(id),1,8),16,10)/2^32 (Spark) equalling
    CAST('0x'||substr(md5(id),1,8) AS UBIGINT)/2^32 (DuckDB) for the
    SAME id rendering. Fuzz the parity over adversarial ids (0, huge,
    all-hex-digit-classes) — a divergence here would silently shift
    the mix, not error."""
    import duckdb

    from pyspark.sql import functions as F

    ids = [0, 1, 7, 42, 255, 4096, 99999, 123456789, 2**31 - 1,
           2**40 + 17, 2**62]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10,
            ).cast("double")
            / F.lit(4294967296.0)
        ).alias("frac"),
    )
    got = {r.doc_id: r.frac for r in sdf.collect()}
    con = duckdb.connect()
    for i in ids:
        (exp,) = con.execute(
            "SELECT CAST('0x' || substring(md5(CAST(? AS VARCHAR)), 1, 8)"
            " AS UBIGINT) / 4294967296.0",
            [i],
        ).fetchone()
        assert got[i] == exp, (i, got[i], exp)
