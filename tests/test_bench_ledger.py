"""bench.py dead-chip replay: serves the newest COMPLETE green record.

The driver runs bench.py at round end; when the TPU worker is wedged the
bench replays the newest banked BENCH_LOG.jsonl record marked stale. That
replay must never serve a kernel-parity failure, and experiment sweeps with
sections disabled must never be banked (bench.py main gates the append on
all sections having run).
"""

import json

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    return bench, tmp_path


def _rec(ts, value, **extra):
    return {"ts": ts, "run": {"metric": "zeroshot_volumes_per_sec_per_chip",
                              "value": value, "unit": "volumes/s",
                              "vs_baseline": 1.0, "extra": extra}}


def test_replay_picks_newest_green_record(bench_mod, capsys):
    bench, tmp = bench_mod
    with open(tmp / "BENCH_LOG.jsonl", "w") as f:
        f.write(json.dumps(_rec("t1", 100.0, kernel_parity_ok=True)) + "\n")
        # newest record is a recorded parity FAILURE — must be skipped
        f.write(json.dumps(_rec("t2", 120.0, kernel_parity_ok=False)) + "\n")

    assert bench._replay_last_ledger_run("test reason") is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 100.0
    assert out["extra"]["stale"] is True
    assert out["extra"]["stale_measured_at"] == "t1"
    assert out["extra"]["stale_reason"] == "test reason"


def test_replay_without_ledger_returns_false(bench_mod):
    bench, _ = bench_mod
    assert bench._replay_last_ledger_run("no file") is False


def test_replay_all_failures_returns_false(bench_mod):
    bench, tmp = bench_mod
    with open(tmp / "BENCH_LOG.jsonl", "w") as f:
        f.write(json.dumps(_rec("t1", 50.0, kernel_parity_ok=False)) + "\n")
    assert bench._replay_last_ledger_run("x") is False


def test_main_gates_ledger_append_on_full_runs():
    """Source-level pin: the append is conditional on every section toggle
    (a sections-off sweep must not become the newest replayable record)."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    parity = src.index("KERNEL PARITY FAILURE")
    gate = src.index("WITH_ATTRIBUTION and WITH_KERNEL_PARITY and WITH_TRAIN")
    append = src.index("BENCH_LOG.jsonl")
    # parity failure raises BEFORE the gated return (a sections-off run with
    # a violation must still exit nonzero), and the gate precedes the append
    assert parity < gate < append
