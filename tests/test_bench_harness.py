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
    f1 = tmp_path / "BENCH" / "scaling_r5_exec1.json"
    f2 = tmp_path / "BENCH" / "scaling_r5_exec2.json"
    assert f1.exists() and f2.exists()
    doc = json.loads(f1.read_text())
    assert doc["levels"]["2"]["times_sec"] == [1.0]
    # and the persisted file feeds straight back into the pool
    out = bs.pooled_min_efficiency(results, 2, 8, 4.0)
    assert out["pooled_files"] == [
        "scaling_r5_exec1.json",
        "scaling_r5_exec2.json",
    ]


def test_wait_quiet_disabled_returns_immediately(monkeypatch):
    monkeypatch.setattr(bs, "QUIET_GATE", 0.0)
    load, waited, ok = bs.wait_quiet()
    assert waited == 0.0 and ok
