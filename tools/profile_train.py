"""Op-level profile of the flagship train step via jax.profiler + xplane
parsing (same harness as tools/profile_zeroshot.py).

Usage: python tools/profile_train.py [trace_dir]
Env: PROF_BATCH (default 8), PROF_REMAT=1 to turn per-layer remat on.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import flagship_cfg  # noqa: E402
from ct_clip_ut_tpu.config import TrainConfig  # noqa: E402
from ct_clip_ut_tpu.train.trainer import (create_train_state,  # noqa: E402
                                          make_train_step)

B = int(os.environ.get("PROF_BATCH", "8"))
REMAT = os.environ.get("PROF_REMAT", "0") == "1"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ctclip_train_trace"
    cfg = flagship_cfg()
    if REMAT:
        cfg = dataclasses.replace(
            cfg, ctvit=dataclasses.replace(cfg.ctvit, remat=True))
    train_cfg = TrainConfig(compute_dtype="bfloat16")
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, train_cfg)
    state = jax.device_put(state)
    step = make_train_step(cfg, train_cfg, tx)

    image = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 240, 480, 480),
                              jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, 512), 0,
                             cfg.bert.vocab_size)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    state, loss = step(state, image, tokens)
    print("warm loss", float(loss), flush=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state, loss = step(state, image, tokens)
            float(loss)

    from xplane import op_summary
    op_summary(trace_dir)


if __name__ == "__main__":
    main()
