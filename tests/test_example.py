"""The quickstart example stays runnable end-to-end."""

import os
import subprocess

import pytest
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_quickstart_example(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # single CPU device: the example is mesh-free
    res = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py"),
         "--out-dir", str(tmp_path), "--epochs", "1"],
        capture_output=True, text=True, timeout=540, env=env)
    assert res.returncode == 0, res.stderr[-2000:]

    assert list(tmp_path.rglob("best_checkpoint.msgpack"))
    metrics = list(tmp_path.rglob("metrics.txt"))
    assert metrics and "Mean ROC-AUC" in metrics[0].read_text()
    for sub in ["attention_rollout", "occlusion"]:
        assert list((tmp_path / "attribution" / sub).rglob("*.npy")), sub
