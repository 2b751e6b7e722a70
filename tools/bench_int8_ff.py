"""On-chip A/B of the W8A8 GEGLU FF kernel vs the bf16 kernel.

Shape: 13,824 tokens x 512, inner 1365 (one volume's spatial FF call at
B=16 is 16x this N; per-token work identical). Device-side chained loop
(lax.fori_loop + optimization_barrier) per the relay timing rules.

RESULT (2026-08-19, v5e via relay): parity 0.64 % max rel (green);
int8 26.6 ms vs bf16 9.0 ms/apply — int8 is ~3x SLOWER (no native int8
MXU lowering in the current Mosaic toolchain). See docs/ROADMAP.md.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ct_clip_ut_tpu.ops.pallas_ff import geglu_ff_fused
from ct_clip_ut_tpu.ops.pallas_ff_int8 import (
    geglu_ff_int8, quantize_weight_int8, xla_int8_reference)

N, D = 24 * 576, 512
INNER = int(4 * 2 / 3 * D)
REPS = 50


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(ks[0], (N, D)) * 0.7).astype(jnp.bfloat16)
    gamma = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (D,)) * 0.1
    wv = jax.random.normal(ks[3], (D, INNER)) / 23
    wg = jax.random.normal(ks[4], (D, INNER)) / 23
    w2 = jax.random.normal(ks[5], (INNER, D)) / 26

    wvq, sv = quantize_weight_int8(wv)
    wgq, sg = quantize_weight_int8(wg)
    w2q, s2 = quantize_weight_int8(w2)

    # --- parity: compiled Pallas int8 vs its XLA int8 twin ---------------
    got = np.asarray(jax.jit(
        lambda *a: geglu_ff_int8(*a, False, True))(
            x, gamma, beta, wvq, wgq, w2q, sv, sg, s2), np.float32)
    want = np.asarray(jax.jit(functools.partial(
        xla_int8_reference, residual=True))(
            x, gamma, beta, wvq, wgq, w2q, sv, sg, s2), np.float32)
    rel = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-6))
    print(f"parity int8 pallas vs xla-int8 twin: max rel {rel:.5f}")

    bf16 = np.asarray(jax.jit(
        lambda *a: geglu_ff_fused(*a, False, True))(
            x, gamma, beta, wv.astype(jnp.bfloat16), wg.astype(jnp.bfloat16),
            w2.astype(jnp.bfloat16)), np.float32)
    q_err = float(np.linalg.norm(got - bf16) / np.linalg.norm(bf16))
    print(f"int8 vs bf16 block output: rel l2 {q_err:.5f}")

    # --- timing: device-side chained loop --------------------------------
    def chain(step):
        def run(x0):
            def body(_, acc):
                acc = step(acc)
                return jax.lax.optimization_barrier(acc)
            return jax.lax.fori_loop(0, REPS, body, x0)
        return jax.jit(run)

    f_bf16 = chain(lambda a: geglu_ff_fused(
        a, gamma, beta, wv.astype(jnp.bfloat16), wg.astype(jnp.bfloat16),
        w2.astype(jnp.bfloat16), False, True))
    f_int8 = chain(lambda a: geglu_ff_int8(
        a, gamma, beta, wvq, wgq, w2q, sv, sg, s2, False, True).astype(a.dtype))

    for name, f in (("bf16", f_bf16), ("int8", f_int8)):
        np.asarray(f(x))  # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPS * 1e3
        tfs = 2 * N * D * INNER * 3 / (ms / 1e3) / 1e12
        print(f"{name}: {ms:.3f} ms/apply  {tfs:.1f} T/s")


if __name__ == "__main__":
    main()
