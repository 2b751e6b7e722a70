"""Training worker for the failure-injection test: trains the small config
with per-step checkpointing and an artificial per-step delay so the parent
can SIGKILL it at an arbitrary moment between (or during) saves.

Usage: python failure_worker.py RESULTS_DIR STEP_DELAY_S
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_trainer_driver import (FakeBatches, HashTokenizer,  # noqa: E402
                                 SMALL_CLIP, SizedFakeBatches)

from ct_clip_ut_tpu.config import TrainConfig  # noqa: E402
from ct_clip_ut_tpu.train.trainer import CTClipTrainer  # noqa: E402


def main():
    folder, delay = sys.argv[1], float(sys.argv[2])
    cfg = TrainConfig(lr=1e-3, num_epochs=2, compute_dtype="float32",
                      text_max_length=16, save_every_steps=1,
                      save_best_model=False)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            SizedFakeBatches(3, 2),
                            FakeBatches(1, 2, with_labels=True),
                            results_folder=folder)
    # marker so the parent can find the dated/indexed run dir
    (trainer.results_folder / "RUNDIR").write_text("x")

    step_fn = trainer.train_step

    def slow_step(*a):
        time.sleep(delay)
        return step_fn(*a)

    trainer.train_step = slow_step
    trainer.train()
    # if the parent failed to kill us, record completion (test will skip)
    (trainer.results_folder / "COMPLETED").write_text("x")


if __name__ == "__main__":
    main()
