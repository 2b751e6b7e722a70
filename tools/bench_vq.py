"""VQ nearest-neighbor kernel tile sweep on the real chip.

Times a DEVICE-SIDE chain of CHAIN kernel applications per jitted call
(each iteration's tokens carry a zero-valued dependency on the previous
iteration's indices), so one host dispatch covers CHAIN kernel runs. The
earlier dispatch-N-drain version measured the relay's ~29 ms/call host
dispatch floor, not the ~3 ms kernel (2026-08-19: every tile config read
identically ~29 ms) — single small ops CANNOT be timed per-call through
the relay; chain them or read an xplane trace.

In-situ reference point (xplane trace of the flagship B=16 zero-shot
program, 2026-08-19): 1.855 TFLOP in 10.4 ms = ~178 TF/s, ~90% of v5e
bf16 peak, at the default (tm=256, tc=2048).

Usage: python -u tools/bench_vq.py   (run ALONE: no concurrent pytest)
"""

from __future__ import annotations

import functools
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
CHAIN = int(os.environ.get("VQ_CHAIN", "20"))
REPS = int(os.environ.get("VQ_REPS", "3"))


@functools.partial(jax.jit, static_argnames=("tm", "tc", "n"))
def _chained(tokens, cb, tm: int, tc: int, n: int):
    """n data-dependent kernel applications in one compiled program.

    optimization_barrier ties each iteration's indices into the loop carry
    (an `idx * 0` arithmetic dependency would be constant-folded and the
    kernels dead-code-eliminated), so all n runs execute in sequence."""

    def body(_, tok):
        idx = vq_nearest_pallas(tok, cb, tm=tm, tc=tc)
        tok, _ = jax.lax.optimization_barrier((tok, idx))
        return tok

    return jax.lax.fori_loop(0, n, body, tokens)


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
                np.asarray(_chained(tokens, cb, tm, tc, CHAIN)[:8])  # compile
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    np.asarray(_chained(tokens, cb, tm, tc, CHAIN)[:8])
                    best = min(best, time.perf_counter() - t0)
                # subtract one dispatch+fetch round trip measured... not
                # separable; CHAIN large enough that it amortizes to <5%
                dt = best / CHAIN
                print(f"tm={tm:5d} tc={tc:5d}: {dt*1e3:7.2f} ms "
                      f"{flops/dt/1e12:6.1f} TF/s mismatch={mismatch}")
            except Exception as e:
                print(f"tm={tm:5d} tc={tc:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
