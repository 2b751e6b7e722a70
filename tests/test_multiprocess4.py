"""4-process distributed integration: FSDP + collective sharded
checkpoints + collective attribution composed past the 2-process coverage
(VERDICT round 4 item 7). Four `jax.distributed` processes with 2 virtual
CPU devices each (8 global) run tests/multiproc4_worker.py; the parent pins
the 4-process FSDP loss to a single-process 8-device replay of the SAME
global batch."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc4_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker4_results(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("mp4"))
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), coordinator, out_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(4)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = []
    for pid in range(4):
        with open(os.path.join(out_dir, f"worker4_{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_four_process_fsdp_loss_matches_single_process(worker4_results):
    """All 4 ranks see the same global FSDP loss, and it equals a
    single-process 8-device step over the same global batch."""
    losses = [r["fsdp_train_loss"] for r in worker4_results]
    assert all(l == pytest.approx(losses[0], abs=1e-6) for l in losses)

    from test_trainer_driver import SMALL_CLIP, HashTokenizer

    from ct_clip_ut_tpu.config import TrainConfig
    from ct_clip_ut_tpu.train.trainer import CTClipTrainer

    rs = np.random.RandomState(7)
    images = rs.randn(8, 1, 20, 32, 32).astype(np.float32)
    texts = [f"report row {i} effusion" for i in range(8)]
    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            train_data=[], valid_data=[],
                            results_folder="/tmp/mp4_replay")
    img, tok = trainer._put_batch(images, texts)
    _, loss = trainer.train_step(trainer.state, img, tok)
    assert losses[0] == pytest.approx(float(loss), abs=5e-5)


def test_four_process_collective_subsystems(worker4_results):
    for r in worker4_results:
        assert r["orbax4_roundtrip_ok"]
        assert r["mp4_occlusion_ok"]
