"""Fused Pallas kernel for QUERY-ROW-BLOCK cosine attention (MaskGit).

Flash-style companion to `ops/attention_blockwise.blockwise_cosine_attention_qrows`
(reference semantics: src/utils/attention.py:121-178 — pre-norm LN, k/v from
the PRE-norm input, per-head l2norm + learned scales + fixed scale 8,
additive [heads, n, n] bias, full-row fp32 softmax). The XLA qrows route
round-trips each [b, heads, q_block, n] fp32 score block through HBM between
the QK einsum, the bias add, the softmax, and the PV einsum — measured ~2.5x
its matmul+traffic floor at the CTGenerate flagship grid (docs/ROADMAP.md
round 4). Here scores, bias stripe, and softmax all live in VMEM:

  grid = (batch, n // q_block); scratches persist across the row steps of
  one batch item, so the k/v projections (+ per-head l2norm/scale folding)
  run ONCE per sequence at row 0. Each row step LNs its own q stripe,
  projects it full-width, and loops heads statically: [q_block, n] fp32
  scores + the [1, q_block, n] bias ROW stripe (the 1.3 GB flagship CPB
  table never leaves HBM except as streamed stripes), softmax, PV into a
  per-head [dh, q_block] accumulator; one full-width output projection (+
  fused residual) per stripe.

Backward = XLA recompute via custom VJP (the qrows math equals the dense
block's — full-row softmax, no carries — so the dense twin is exact).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attn_block import _xla_reference_block

Array = jax.Array


def _kernel(x_ref, gamma_ref, wqt_ref, wkt_ref, wvt_ref, wo_ref,
            qs_ref, ks_ref, bias_ref, o_ref, kt_scr, vt_scr, *,
            scale: float, has_bias: bool, heads: int, q_block: int,
            residual: bool):
    """One grid step = one q-row stripe of one sequence. At row 0 the k/v
    projections fill the persistent [h*dh, n] transposed scratches (sublane
    per-head slicing — lane slices would need 128 alignment, dh=64 is not)
    and each head's k rows are l2-normalized with k_scale folded in place."""
    f32 = jnp.float32
    dh = qs_ref.shape[0]
    dt = x_ref.dtype
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        x_full = x_ref[0]                        # [n, D]; k/v from PRE-norm x
        kt_scr[:] = jax.lax.dot_general(
            wkt_ref[:], x_full, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)          # [hd, n]
        vt_scr[:] = jax.lax.dot_general(
            wvt_ref[:], x_full, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        ksc = ks_ref[:].astype(f32)
        for h in range(heads):                   # static unroll
            sl = slice(h * dh, (h + 1) * dh)
            kt = kt_scr[sl, :]
            kn = jnp.sqrt(jnp.sum(kt * kt, axis=0, keepdims=True))
            kt_scr[sl, :] = kt / jnp.maximum(kn, 1e-12) * ksc

    # this stripe's queries: LN + full-width projection
    x_stripe = x_ref[0, pl.ds(r * q_block, q_block), :]      # [q_block, D]
    x32 = x_stripe.astype(f32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    xn = ((x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
          * gamma_ref[0]).astype(dt)
    qt = jax.lax.dot_general(wqt_ref[:], xn, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)     # [hd, q_block]

    qsc = qs_ref[:].astype(f32) * scale
    outs = []
    for h in range(heads):                       # static unroll
        sl = slice(h * dh, (h + 1) * dh)
        qh = qt[sl]
        qn = jnp.sqrt(jnp.sum(qh * qh, axis=0, keepdims=True))
        qh = qh / jnp.maximum(qn, 1e-12) * qsc

        # scores [q_block, n]: contract dh (k already normalized+scaled)
        s = jax.lax.dot_general(qh, kt_scr[sl, :], (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if has_bias:
            s = s + bias_ref[h].astype(f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        # o^T[d, i] = sum_j v^T[d, j] p[i, j]
        outs.append(jax.lax.dot_general(
            vt_scr[sl, :].astype(dt), p.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32))
    ot = jnp.concatenate(outs, axis=0)           # [hd, q_block] fp32

    out = jax.lax.dot_general(ot.astype(dt), wo_ref[:],
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)    # [q_block, D]
    if residual:                                 # stripe already resident
        out = out + x32
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_kv(x_ref, gamma_ref, wqt_ref, wo_ref, qs_ref,
               kt_ref, vt_ref, bias_ref, o_ref, *,
               scale: float, heads: int, q_block: int, batch: int,
               residual: bool):
    """Shared-bias batch variant: grid = (n_rows,), k/v pre-projected,
    pre-normalized, transposed [b, h*dh, n] OUTSIDE the kernel (plain XLA
    dots) and VMEM-resident as constant-indexed inputs; x streams per row
    stripe. Each bias ROW stripe is DMA'd ONCE per row step and reused by
    every batch item — the per-item grid re-streams the full [heads, n, n]
    table per item (b x 1.34 GB x layers at the CTGenerate flagship: the
    measured bottleneck — bf16 matmuls moved nothing because the kernel was
    bias-DMA-bound). bf16-compute serving only: the resident k/v don't fit
    VMEM at fp32 (qrows_vmem_estimate_kv)."""
    f32 = jnp.float32
    dh = qs_ref.shape[0]
    dt = x_ref.dtype
    # index maps consume the (group, row) ids; the kernel body is agnostic

    qsc = qs_ref[:].astype(f32) * scale
    for bi in range(batch):                      # static unroll
        x32 = x_ref[bi].astype(f32)              # [q_block, D]
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
        xn = ((x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
              * gamma_ref[0]).astype(dt)
        qt = jax.lax.dot_general(wqt_ref[:], xn, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)  # [hd, q_block]
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = qt[sl]
            qn = jnp.sqrt(jnp.sum(qh * qh, axis=0, keepdims=True))
            qh = (qh / jnp.maximum(qn, 1e-12) * qsc).astype(dt)
            s = jax.lax.dot_general(qh, kt_ref[bi, sl, :],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            s = s + bias_ref[h].astype(f32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                vt_ref[bi, sl, :], p.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32))
        ot = jnp.concatenate(outs, axis=0)       # [hd, q_block] fp32
        out = jax.lax.dot_general(ot.astype(dt), wo_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        if residual:
            out = out + x32
        o_ref[bi] = out.astype(o_ref.dtype)


def qrows_vmem_estimate_kv(b: int, n: int, d: int, hd: int, heads: int,
                           q_block: int, itemsize: int) -> int:
    """VMEM bytes for the shared-bias kv variant: resident k/v inputs +
    double-buffered bias stripe (compute dtype) + x/out stripes + weights +
    score transients."""
    return (2 * b * hd * n * itemsize            # resident k^T / v^T
            + 2 * heads * q_block * n * itemsize  # bias stripe, dbl-buffered
            + 2 * hd * d * itemsize              # wq/wo
            + 4 * b * q_block * d * itemsize     # x/out stripes, dbl-buffered
            + 4 * q_block * n * 4)               # score transients


def qrows_vmem_estimate(n: int, d: int, hd: int, heads: int, q_block: int,
                        itemsize: int) -> int:
    """Rough VMEM bytes for the kernel at these shapes: persistent k/v
    scratches + the x block + a double-buffered bias stripe + weights +
    one live fp32 score block."""
    return (2 * hd * n * 4                       # k^T / v^T scratch
            + n * d * itemsize                   # x block
            + 2 * heads * q_block * n * 4        # bias stripe, double-buffered
            + 4 * hd * d * itemsize              # wq/wk/wv/wo
            + 2 * q_block * n * 4)               # score block (+headroom)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def attention_qrows_fused(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                          scale: float = 8.0, q_block: int = 64,
                          interpret: bool = False, residual: bool = False):
    """x: [B, N, D] with N % q_block == 0; gamma: [D]; wq/wk/wv: [D, h*dh];
    wo: [h*dh, D]; qs/ks: [dh]; bias: optional [H, N, N] (stays in HBM,
    streamed as row stripes). Returns [B, N, D], optionally with the +x
    residual folded into the kernel's output write."""
    return _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                         scale=scale, q_block=q_block, interpret=interpret,
                         residual=residual)


def _fwd(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale, q_block, interpret,
         residual):
    out = _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale=scale,
                        q_block=q_block, interpret=interpret,
                        residual=residual)
    return out, (x, gamma, wq, wk, wv, wo, qs, ks, bias)


def _bwd(scale, q_block, interpret, residual, res, g):
    x, gamma, wq, wk, wv, wo, qs, ks, bias = res
    diff = (x, gamma, wq, wk, wv, wo, qs, ks) + (
        (bias,) if bias is not None else ())

    def f(*args):
        if bias is not None:
            *xs, b = args
            return _xla_reference_block(*xs, b, scale, residual)
        return _xla_reference_block(*args, None, scale, residual)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(g)
    if bias is None:
        grads = grads + (None,)
    return grads


attention_qrows_fused.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("scale", "q_block", "interpret",
                                             "residual"))
def _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks,
                  bias: Optional[Array] = None, *, scale: float = 8.0,
                  q_block: int = 64, interpret: bool = False,
                  residual: bool = False):
    b, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh
    assert n % q_block == 0 and q_block % 8 == 0, (n, q_block)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)
    bias_block = (heads, q_block, n) if has_bias else (1, 1, 1)

    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(dh, 1)
    ks2 = ks.astype(jnp.float32).reshape(dh, 1)

    # shared-bias kv variant when the resident k/v fit VMEM (bf16 serving at
    # the flagship shapes): k/v are projected + l2-normalized + transposed by
    # plain XLA dots, then each bias row stripe is DMA'd once per row and
    # shared across the batch (the per-item grid below re-streams the whole
    # table per item — measured bias-DMA-bound at the CTGenerate grid). The
    # bias rides in the compute dtype here (bf16 in bf16 serving — within
    # the serving parity band; the fp32 parity path takes the per-item grid).
    g = b    # largest even split of the batch whose resident k/v fit VMEM
    while (g > 1 and g % 2 == 0
           and qrows_vmem_estimate_kv(g, n, d, hd, heads, q_block,
                                      x.dtype.itemsize) > 100 * 2**20):
        g //= 2
    if (has_bias and g > 1
            and qrows_vmem_estimate_kv(
                g, n, d, hd, heads, q_block,
                x.dtype.itemsize) <= 100 * 2**20):
        f32 = jnp.float32
        k = jax.lax.dot_general(x, wk, (((2,), (0,)), ((), ())))
        v = jax.lax.dot_general(x, wv, (((2,), (0,)), ((), ())))

        def to_heads_t(t):   # [b, n, hd] -> [b, hd, n], head-major rows
            return (t.reshape(b, n, heads, dh).transpose(0, 2, 3, 1)
                    .reshape(b, hd, n))

        kf = k.astype(f32).reshape(b, n, heads, dh)
        kf = kf / jnp.maximum(
            jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
        kf = kf * ks.astype(f32)
        kt = to_heads_t(kf.reshape(b, n, hd).astype(x.dtype))
        vt = to_heads_t(v)
        bias_c = bias.astype(x.dtype)
        groups = b // g
        return pl.pallas_call(
            functools.partial(_kernel_kv, scale=scale, heads=heads,
                              q_block=q_block, batch=g, residual=residual),
            grid=(groups, n // q_block),
            in_specs=[
                pl.BlockSpec((g, q_block, d), lambda ig, ir: (ig, ir, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda ig, ir: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, d), lambda ig, ir: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, d), lambda ig, ir: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dh, 1), lambda ig, ir: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, hd, n), lambda ig, ir: (ig, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, hd, n), lambda ig, ir: (ig, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((heads, q_block, n), lambda ig, ir: (0, ir, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, q_block, d),
                                   lambda ig, ir: (ig, ir, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * (2 * n * d * hd + heads * 2 * n * n * dh),
                bytes_accessed=(b // g) * heads * n * n * x.dtype.itemsize
                + 2 * b * n * d * x.dtype.itemsize,
                transcendentals=b * heads * n * n),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2**20),
            interpret=interpret,
        )(x, gamma2, wq.T, wo, qs2, kt, vt, bias_c)

    bias_index = (lambda ib, ir: (0, ir, 0)) if has_bias else \
        (lambda ib, ir: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_bias=has_bias,
                          heads=heads, q_block=q_block, residual=residual),
        grid=(b, n // q_block),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda ib, ir: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda ib, ir: (ib, ir, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hd, n), jnp.float32),    # normalized k^T
            pltpu.VMEM((hd, n), jnp.float32),    # v^T
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (4 * n * d * hd + heads * 2 * n * n * dh),
            bytes_accessed=(b * heads * n * n * 4 if has_bias else 0)
            + 2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * heads * n * n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(x, gamma2, wq.T, wk.T, wv.T, wo, qs2, ks2, bias)
