"""On-chip A/B of the W8A8 GEGLU FF paths vs the bf16 kernel.

Compares three implementations at flagship token counts: the bf16 fused
Pallas kernel (ops/pallas_ff.py), the int8 fused Pallas kernel
(ops/pallas_ff_int8.py), and the int8 XLA reference (same quantized math,
XLA-lowered). Also times raw 2048^3 matmuls (bf16 vs int8->int32) to read
the MXU's int8 rate in isolation.

Timing rules (docs/ROADMAP.md relay notes): device-side chained loop
(lax.fori_loop + optimization_barrier) so one ~29 ms host dispatch covers
CHAIN kernel runs, and fetch only an [:8, :8] corner of the final output —
the relay moves device->host at ~16-36 MB/s, so fetching a full
[221184, 512] bf16 output costs ~6 s and DOMINATES any per-apply number
(this script's first version did exactly that and read the fetch, not the
kernel, for every variant).

Usage: python -u tools/bench_int8_ff.py   (run ALONE: no concurrent pytest)
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

from ct_clip_ut_tpu.ops.pallas_ff import geglu_ff_fused  # noqa: E402
from ct_clip_ut_tpu.ops.pallas_ff_int8 import (  # noqa: E402
    geglu_ff_int8, quantize_weight_int8, xla_int8_reference)

D = 512
INNER = int(4 * 2 / 3 * D)
CHAIN = int(os.environ.get("FF_CHAIN", "20"))
REPS = int(os.environ.get("FF_REPS", "3"))


def time_chained(step, x0, flops, tag):
    """step: bf16 [N, D] -> [N, D]. One jitted call runs CHAIN steps; only
    an 8x8 corner of the final carry is fetched."""

    @jax.jit
    def run(x):
        def body(_, acc):
            return jax.lax.optimization_barrier(step(acc).astype(acc.dtype))
        return jax.lax.fori_loop(0, CHAIN, body, x)[:8, :8]

    np.asarray(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(run(x0))
        best = min(best, time.perf_counter() - t0)
    dt = best / CHAIN
    print(f"{tag}: {dt*1e3:7.3f} ms/apply  {flops/dt/1e12:6.1f} T/s",
          flush=True)
    return dt


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    gamma = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (D,)) * 0.1
    wv = jax.random.normal(ks[3], (D, INNER)) / 23
    wg = jax.random.normal(ks[4], (D, INNER)) / 23
    w2 = jax.random.normal(ks[5], (INNER, D)) / 26
    wvb, wgb, w2b = (w.astype(jnp.bfloat16) for w in (wv, wg, w2))
    wvq, sv = quantize_weight_int8(wv)
    wgq, sg = quantize_weight_int8(wg)
    w2q, s2 = quantize_weight_int8(w2)

    # --- parity: compiled Pallas int8 vs its XLA int8 twin ----------------
    n0 = 13824
    x0 = (jax.random.normal(ks[0], (n0, D)) * 0.7).astype(jnp.bfloat16)
    got = np.asarray(jax.jit(
        lambda a: geglu_ff_int8(a, gamma, beta, wvq, wgq, w2q, sv, sg, s2,
                                False, True))(x0), np.float32)
    want = np.asarray(jax.jit(functools.partial(
        xla_int8_reference, residual=True))(
            x0, gamma, beta, wvq, wgq, w2q, sv, sg, s2), np.float32)
    rel = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-6))
    print(f"parity int8 pallas vs xla-int8 twin: max rel {rel:.5f}")

    bf16 = np.asarray(jax.jit(
        lambda a: geglu_ff_fused(a, gamma, beta, wvb, wgb, w2b,
                                 False, True))(x0), np.float32)
    q_err = float(np.linalg.norm(got - bf16) / np.linalg.norm(bf16))
    print(f"int8 vs bf16 block output: rel l2 {q_err:.5f}")

    # --- raw matmul MXU rate: bf16 vs int8 --------------------------------
    m = 2048
    ab = (jax.random.normal(ks[0], (m, m)) * 0.1).astype(jnp.bfloat16)
    wb = (jax.random.normal(ks[1], (m, m)) * 0.1).astype(jnp.bfloat16)
    time_chained(lambda a: a @ wb, ab, 2 * m**3, "matmul bf16 2048^3")
    wi = jax.random.randint(ks[2], (m, m), -4, 4, jnp.int8)

    def int8_mm(a):
        ai = jnp.clip(jnp.round(a * 64), -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(ai, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) / 4096).astype(jnp.bfloat16)
    time_chained(int8_mm, ab, 2 * m**3, "matmul int8 2048^3")

    # --- FF block: three paths at two token counts -------------------------
    for n in (13824, 221184):
        x = (jax.random.normal(ks[0], (n, D)) * 0.7).astype(jnp.bfloat16)
        fl = 2 * n * D * INNER * 3
        time_chained(lambda a: geglu_ff_fused(
            a, gamma, beta, wvb, wgb, w2b, False, True), x, fl,
            f"bf16 pallas N={n}")
        time_chained(lambda a: geglu_ff_int8(
            a, gamma, beta, wvq, wgq, w2q, sv, sg, s2, False, True), x, fl,
            f"int8 pallas N={n}")
        time_chained(lambda a: xla_int8_reference(
            a, gamma, beta, wvq, wgq, w2q, sv, sg, s2, residual=True), x, fl,
            f"int8 xla   N={n}")


if __name__ == "__main__":
    main()
