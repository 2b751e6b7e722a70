"""On-chip drive for the fused BERT encoder-layer kernel
(ops/pallas_bert_layer.py): compiled fwd/bwd parity at flagship geometry
plus the dropout checks the CPU suite cannot run (the Pallas interpreter
stubs prng_random_bits to zeros — tests/test_pallas.py TPU-gates them).

Usage: python tools/drive_bert_kernel.py            # on a TPU host
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ct_clip_ut_tpu.ops.pallas_bert_layer import (bert_layer_fused,  # noqa: E402
                                                  bert_layer_xla)


def make_args(key, d, f, heads, b, n, dtype):
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, n, d)).astype(dtype)
    mask = np.zeros((b, n), np.float32)
    mask[-1, n - max(3, n // 14):] = np.finfo(np.float32).min
    w = [jax.random.normal(ks[1], (d, 3 * d)) / np.sqrt(d),
         jax.random.normal(ks[2], (3 * d,)) * 0.1,
         jax.random.normal(ks[3], (d, d)) / np.sqrt(d),
         jax.random.normal(ks[4], (d,)) * 0.1,
         1.0 + jax.random.normal(ks[5], (d,)) * 0.1,
         jax.random.normal(ks[6], (d,)) * 0.1,
         jax.random.normal(ks[7], (d, f)) / np.sqrt(d),
         jax.random.normal(ks[8], (f,)) * 0.1,
         jax.random.normal(ks[9], (f, d)) / np.sqrt(f),
         jax.random.normal(ks[10], (d,)) * 0.1,
         1.0 + jax.random.normal(ks[11], (d,)) * 0.1,
         jnp.zeros((d,))]
    return x, jnp.asarray(mask), w


def rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    z3 = jnp.zeros(3, jnp.int32)

    # ---- compiled parity at the flagship BERT geometry (bf16) ------------
    x, mask, w = make_args(jax.random.PRNGKey(5), 768, 3072, 12, 8, 512,
                           jnp.bfloat16)
    want = jax.jit(lambda x: bert_layer_xla(x, mask, *w, 12, 1e-12))(x)
    got = bert_layer_fused(x, mask, z3, *w, 12, 1e-12, 0.0, 0.0, False,
                           False)
    print(f"fwd parity rel err: {rel(got, want):.5f}")

    def loss_k(x, *w):
        return (bert_layer_fused(x, mask, z3, *w, 12, 1e-12, 0.0, 0.0,
                                 False, False).astype(jnp.float32) ** 2).sum()

    def loss_t(x, *w):
        return (bert_layer_xla(x, mask, *w, 12,
                               1e-12).astype(jnp.float32) ** 2).sum()

    gk = jax.jit(jax.grad(loss_k, argnums=tuple(range(13))))(x, *w)
    gt = jax.jit(jax.grad(loss_t, argnums=tuple(range(13))))(x, *w)
    worst = max(rel(a, b) for a, b in zip(gk, gt))
    print(f"bwd parity worst rel err: {worst:.5f}")
    assert rel(got, want) < 1.5e-2 and worst < 2e-2

    # ---- dropout: determinism, distinctness, fd-consistency (fp32) -------
    x, mask, w = make_args(jax.random.PRNGKey(7), 256, 512, 4, 2, 128,
                           jnp.float32)
    seeds = jnp.asarray([11, 22, 33], jnp.int32)

    def f(x):
        return bert_layer_fused(x, mask, seeds, *w, 4, 1e-12, 0.25, 0.25,
                                True, False)

    o1, o2 = np.asarray(f(x)), np.asarray(f(x))
    assert (o1 == o2).all(), "dropout not deterministic per seed"
    o3 = np.asarray(bert_layer_fused(x, mask, jnp.asarray([9, 8, 7],
                                                          jnp.int32),
                                     *w, 4, 1e-12, 0.25, 0.25, True, False))
    assert np.abs(o3 - o1).max() > 1e-3, "seeds did not change masks"

    # fd methodology (measured 2026-08-21): Mosaic runs 'fp32' dots at
    # DEFAULT precision (bf16 passes), so the kernel forward carries ~5e-3
    # relative rounding that is NOT smooth in the input — a small-eps fd is
    # pure rounding jitter (the same check against the true-fp32 CPU twin
    # passes at 2e-4). Large eps (0.1) lifts the signal well above the
    # jitter at ~1% curvature cost; reductions run in host float64.
    r = np.asarray(jax.random.normal(jax.random.PRNGKey(3), x.shape),
                   np.float64)
    g = jax.jit(jax.grad(
        lambda x: jnp.sum(f(x).astype(jnp.float32)
                          * jnp.asarray(r, jnp.float32))))(x)
    v = jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.1
    op = np.asarray(f(x + v), np.float64)
    om = np.asarray(f(x - v), np.float64)
    fd = float(((op - om) * r).sum())
    analytic = 2.0 * float((np.asarray(g, np.float64)
                            * np.asarray(v, np.float64)).sum())
    relerr = abs(fd - analytic) / max(abs(analytic), 1e-9)
    print(f"dropout fd vs analytic: {fd:.5f} vs {analytic:.5f} "
          f"(rel {relerr:.4f})")
    assert relerr < 0.15, "backward masks inconsistent with forward"
    print("drive_bert_kernel: ALL OK")


if __name__ == "__main__":
    main()
