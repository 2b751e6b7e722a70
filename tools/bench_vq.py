"""VQ nearest-neighbor kernel tile sweep on the real chip.

The Pallas kernel (ops/pallas_vq.py) runs at ~139 TF/s at the default
(tm=256, tc=2048) — ~70% of v5e bf16 peak; the residue is the per-tile
VPU (max, argmax) reduction serializing against the MXU matmul. This
sweeps tile shapes at the flagship shape (55k tokens x 8192 codes x 512)
and prints ms + TF/s per config, plus parity vs the XLA argmax.

Usage: python tools/bench_vq.py   (run ALONE: no concurrent pytest)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from ct_clip_ut_tpu.ops.pallas_vq import vq_nearest_pallas  # noqa: E402

M, C, D = 55296, 8192, 512
REPS = 20


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tokens = jax.random.normal(k1, (M, D), jnp.bfloat16)
    tokens = tokens / jnp.linalg.norm(tokens.astype(jnp.float32),
                                      axis=-1, keepdims=True).astype(jnp.bfloat16)
    cb = jax.random.normal(k2, (C, D), jnp.bfloat16)
    cb = cb / jnp.linalg.norm(cb.astype(jnp.float32), axis=-1,
                              keepdims=True).astype(jnp.bfloat16)

    want = np.asarray(jnp.argmax(
        jax.lax.dot_general(tokens, cb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32), axis=1))

    flops = 2 * M * C * D
    for tm in (128, 256, 512, 1024):
        for tc in (1024, 2048, 4096):
            try:
                got = vq_nearest_pallas(tokens, cb, tm=tm, tc=tc)
                mismatch = int((np.asarray(got) != want).sum())
                # dispatch-N-drain sustained timing (relay: block_until_ready
                # returns early; force a host fetch)
                t0 = time.perf_counter()
                outs = [vq_nearest_pallas(tokens, cb, tm=tm, tc=tc)
                        for _ in range(REPS)]
                for o in outs:
                    np.asarray(o[:8])
                dt = (time.perf_counter() - t0) / REPS
                print(f"tm={tm:5d} tc={tc:5d}: {dt*1e3:7.2f} ms "
                      f"{flops/dt/1e12:6.1f} TF/s mismatch={mismatch}")
            except Exception as e:
                print(f"tm={tm:5d} tc={tc:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
