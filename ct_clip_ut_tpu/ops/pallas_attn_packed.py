"""Fused attention block for SHORT sequences via head-packing.

The temporal transformer attends over t=24 tokens (reference ctvit.py:99-101,
attention.py:126-182): per-head [24, 24] score matrices with a 32-wide
contraction map terribly onto the 128x128 MXU (24-lane outputs, 73k tiny
matmuls at flagship shapes — measured ~13 TF/s).

TPU re-design: pack (token, head) pairs into ONE axis of length n*h (= 192)
— row (i*h + head) holds head `head` of token i. Then

  * scores = Q_packed @ K_packed^T is a single [192, 192] matmul per
    sequence whose off-head-diagonal entries are masked to -inf;
  * softmax over the masked rows equals the per-head softmax exactly
    (masked lanes contribute exp(-inf) = 0);
  * PV = P @ V_packed is again one [192, 192] @ [192, 32] matmul — the
    zero-masked probabilities kill cross-head terms.

Both packings are FREE reshapes of the [n, h*d] projection layout, and all
matmuls get >= 128 rows/lanes. The Pallas kernel fuses the whole block
(pre-norm LN, full-width QKV from the pre-norm input, packed cosine
attention, output projection) with everything VMEM-resident; several
sequences are blocked per program so projection matmuls see big row counts.

Backward = XLA recompute via custom VJP (the packed XLA twin below).

Precision bound (measured on chip at the flagship temporal stack): the
fused backward's dx deviates from the bf16 XLA twin by <= ~0.9% max-rel —
two independent bf16 rounding chains (the kernel's transposed-projection
layout vs the twin's head-split layout), NOT a math error: fp32 interpret
parity is pinned at 1e-5 (tests/test_pallas.py). The bound is safe because
(a) attribution maps never ride this kernel — they run the fp32 parity_cfg
XLA path, pinned <=1e-3 against the torch reference — and (b) training
gradients are bf16-noise-dominated at the same scale on both sides.
Upgrading the dx/dw dots to fp32 costs ~4x on those MXU ops (~+9 ms on the
291 ms train step) for no training-relevant accuracy; bench.py asserts the
band at KERNEL_TOL=1.5e-2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -3.4028234663852886e38


def _head_mask(n: int, heads: int) -> Array:
    """[n*h, n*h] additive mask: 0 where row-head == col-head, -inf else."""
    m = n * heads
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) % heads
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) % heads
    return jnp.where(row == col, 0.0, NEG_INF).astype(jnp.float32)


def _kernel(x_ref, gamma_ref, wqt_ref, wkt_ref, wvt_ref, wo_ref,
            qs_ref, ks_ref, neg_ref, o_ref, qt_scr, kt_scr, vt_scr, ot_scr, *,
            scale: float, heads: int, n: int, residual: bool = False):
    """R sequences of n tokens form one [m = R*n]-row pseudo-sequence; per
    head, scores are ONE [m, m] matmul with a block-diagonal same-sequence
    mask (off-diagonal exp(-inf) terms vanish, so softmax/PV equal the
    per-sequence results exactly). q/k/v live TRANSPOSED [h*dh, m] in
    scratch so per-head slicing is a static SUBLANE slice — static lane
    slices at 32-offsets cost a lane rotation of the whole register set."""
    r, _, d = x_ref.shape                           # [R, n, D]
    dh = qs_ref.shape[0]
    m = r * n

    x = x_ref[:].reshape(m, d)                       # major-dim merge: free
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    xn = (x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xn = (xn * gamma_ref[0]).astype(x.dtype)

    # full-width transposed projections [h*dh, D] x [m, D] -> [h*dh, m]
    # (k/v from PRE-norm x, reference attention.py:138-140)
    qt_scr[:] = jax.lax.dot_general(wqt_ref[:], xn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    kt_scr[:] = jax.lax.dot_general(wkt_ref[:], x, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    vt_scr[:] = jax.lax.dot_general(wvt_ref[:], x, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    # same-sequence block-diagonal mask (additive): precomputed once and
    # VMEM-resident across grid steps — building it from iotas in-kernel
    # costs ~4 VPU passes over [m, m] per program
    neg = neg_ref[:]

    qs = qs_ref[:].astype(jnp.float32) * scale       # [dh, 1]
    ks = ks_ref[:].astype(jnp.float32)
    dt = x_ref.dtype

    for h in range(heads):                            # static unroll
        sl = slice(h * dh, (h + 1) * dh)
        qt, kt, vt = qt_scr[sl, :], kt_scr[sl, :], vt_scr[sl, :]  # [dh, m]
        qt = qt / jnp.maximum(
            jnp.sqrt(jnp.sum(qt * qt, axis=0, keepdims=True)), 1e-12) * qs
        kt = kt / jnp.maximum(
            jnp.sqrt(jnp.sum(kt * kt, axis=0, keepdims=True)), 1e-12) * ks

        s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + neg
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        # o^T[e, i] = sum_j v^T[e, j] p[i, j]
        ot_scr[sl, :] = jax.lax.dot_general(
            vt.astype(dt), p.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jax.lax.dot_general(ot_scr[:].astype(dt), wo_ref[:],
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [m, D]
    if residual:                                   # x already resident
        out = out + x32
    o_ref[:] = out.reshape(r, n, d).astype(o_ref.dtype)


def packed_attention_xla(x, gamma, wq, wk, wv, wo, qs, ks, scale: float,
                         residual: bool = False):
    """Packed XLA twin (backward path + off-TPU forward). Weight layouts:
    wq/wk/wv [D, h*dh] (column blocks per head), wo [h*dh, D]."""
    b, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma).astype(x.dtype)

    q = (xn @ wq.astype(x.dtype)).reshape(b, n * heads, dh)
    k = (x @ wk.astype(x.dtype)).reshape(b, n * heads, dh)
    v = (x @ wv.astype(x.dtype)).reshape(b, n * heads, dh)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qf = qf * (qs.astype(jnp.float32) * scale)
    kf = kf * ks.astype(jnp.float32)

    s = jnp.einsum("bid,bjd->bij", qf, kf,
                   preferred_element_type=jnp.float32)
    s = s + _head_mask(n, heads)[None]
    p = jax.nn.softmax(s, axis=-1)

    o = jnp.einsum("bij,bjd->bid", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, n, heads * dh)
    o = (o @ wo.astype(x.dtype)).astype(x.dtype)
    return o + x if residual else o


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def attention_block_packed(x, gamma, wq, wk, wv, wo, qs, ks,
                           scale: float = 8.0, interpret: bool = False,
                           residual: bool = False):
    """Fused short-sequence attention block. x: [B, n, D]; gamma: [D];
    wq/wk/wv: [D, h*dh]; wo: [h*dh, D]; qs/ks: [dh]. Returns [B, n, D] —
    pre-residual, or with +x folded into the output write (residual=True)."""
    return _forward(x, gamma, wq, wk, wv, wo, qs, ks, scale, interpret,
                    residual)


def _fwd(x, gamma, wq, wk, wv, wo, qs, ks, scale, interpret, residual):
    out = _forward(x, gamma, wq, wk, wv, wo, qs, ks, scale, interpret,
                   residual)
    return out, (x, gamma, wq, wk, wv, wo, qs, ks)


def _bwd(scale, interpret, residual, res, g):
    x, gamma, wq, wk, wv, wo, qs, ks = res
    if jax.default_backend() == "tpu" or interpret:
        dx, dgamma, dwq, dwk, dwv, dwo, dqs, dks = _backward_impl(
            x, gamma, wq, wk, wv, wo, qs, ks, g, scale=scale,
            interpret=interpret, residual=residual)
        return (dx, dgamma.astype(gamma.dtype), dwq.astype(wq.dtype),
                dwk.astype(wk.dtype), dwv.astype(wv.dtype),
                dwo.astype(wo.dtype), dqs.astype(qs.dtype),
                dks.astype(ks.dtype))
    _, vjp = jax.vjp(
        lambda *a: packed_attention_xla(*a, scale, residual), x, gamma, wq,
        wk, wv, wo, qs, ks)
    return vjp(g)


attention_block_packed.defvjp(_fwd, _bwd)


def _pick_rows(b: int, n: int = 24, d: int = 512, hd: int = 256,
               itemsize: int = 2) -> int:
    """Sequences per program. Measured at the flagship temporal stack
    ([9216, 24, 512], v5e): r=8 -> 7.9 ms, r=16 -> 5.9 ms, r=32 -> 7.0 ms
    (beyond 16 the cross-sequence masked-score waste in the [r*n, r*n]
    matmul outgrows the per-program overhead saved).

    r is also bounded by a per-program VMEM estimate: the [r*n, r*n] fp32
    mask + in-kernel score/exp buffers dominate, and they grow with the
    SEQUENCE length, not just r — CTGenerate's fp32 [b, 101, 512] temporal
    stack at the flagship r=16 allocates a [1616, 1616] block and dies in
    Mosaic's 32 MB scoped-vmem stack (observed), while CT-CLIP's bf16
    [*, 24, 512] keeps its measured r=16 under the same bound."""
    for r in (16, 8, 4, 2):
        if b % r != 0:
            continue
        rn = r * n
        est = (3 * rn * rn * 4              # mask + score + exp buffers
               + 2 * r * n * d * itemsize   # x block + out block
               + 7 * hd * rn * 4            # scratch accumulators (bwd worst)
               + 4 * hd * d * itemsize)     # weight blocks
        if est <= 20 * 2**20:
            return r
    return 1


_USE_KERNEL = True


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "residual"))
def _forward(x, gamma, wq, wk, wv, wo, qs, ks, scale, interpret,
             residual=False):
    b, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh

    if (jax.default_backend() != "tpu" or not _USE_KERNEL) and not interpret:
        return packed_attention_xla(x, gamma, wq, wk, wv, wo, qs, ks, scale,
                                    residual)

    r = _pick_rows(b, n, d, hd, x.dtype.itemsize)
    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(dh, 1)
    ks2 = ks.astype(jnp.float32).reshape(dh, 1)

    m = n * heads
    rn = r * n
    seq = jnp.repeat(jnp.arange(r, dtype=jnp.int32), n)
    neg = jnp.where(seq[:, None] == seq[None, :], 0.0,
                    NEG_INF).astype(jnp.float32)           # [r*n, r*n]
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=heads, n=n,
                          residual=residual),
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec((r, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rn, rn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hd, r * n), jnp.float32),   # q^T
            pltpu.VMEM((hd, r * n), jnp.float32),   # k^T
            pltpu.VMEM((hd, r * n), jnp.float32),   # v^T
            pltpu.VMEM((hd, r * n), jnp.float32),   # PV^T accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (3 * n * d * hd + 2 * m * m * dh + n * hd * d),
            bytes_accessed=x.size * 2 * x.dtype.itemsize,
            transcendentals=b * m * m),
        interpret=interpret,
    )(x, gamma2, wq.T, wk.T, wv.T, wo, qs2, ks2, neg)


# ---------------------------------------------------------------------------
# fused backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, gamma_ref, wqt_ref, wkt_ref, wvt_ref, wo_ref,
                qs_ref, ks_ref, neg_ref,
                dx_ref, dgamma_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
                dqs_ref, dks_ref,
                qt_scr, kt_scr, vt_scr, ot_scr, dqt_scr, dkt_scr, dvt_scr, *,
                scale: float, heads: int, n: int, residual: bool):
    """Packed-sequence twin of pallas_attn_block._bwd_kernel: R sequences
    form one [m = R*n]-row packed block with the same-sequence -inf mask;
    the masked softmax's zero off-block probabilities kill every cross-
    sequence term in the backward exactly, so the per-sequence grads fall
    out of the packed formulas unchanged."""
    f32 = jnp.float32
    i = pl.program_id(0)
    dh = qs_ref.shape[0]
    dt = x_ref.dtype
    r, _, d = x_ref.shape
    m = r * n

    x = x_ref[:].reshape(m, d)
    x32 = x.astype(f32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xhat = (x32 - mean) * rstd
    xn = (xhat * gamma_ref[0]).astype(dt)
    qt_scr[:] = jax.lax.dot_general(wqt_ref[:], xn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
    kt_scr[:] = jax.lax.dot_general(wkt_ref[:], x, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
    vt_scr[:] = jax.lax.dot_general(wvt_ref[:], x, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)

    qsc = qs_ref[:].astype(f32) * scale
    ksc = ks_ref[:].astype(f32)
    neg = neg_ref[:]
    g = g_ref[:].reshape(m, d).astype(dt)
    dot_t = jax.lax.dot_general(wo_ref[:], g, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)   # [hd, m]

    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qt, kt, vt = qt_scr[sl, :], kt_scr[sl, :], vt_scr[sl, :]
        qn = jnp.maximum(jnp.sqrt(jnp.sum(qt * qt, axis=0, keepdims=True)),
                         1e-12)
        kn = jnp.maximum(jnp.sqrt(jnp.sum(kt * kt, axis=0, keepdims=True)),
                         1e-12)
        uq = qt / qn
        uk = kt / kn
        qh = uq * qsc
        kh = uk * ksc

        s = jax.lax.dot_general(qh, kh, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32) + neg
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pt = p.astype(dt)

        ot_scr[sl, :] = jax.lax.dot_general(
            vt.astype(dt), pt, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

        doh = dot_t[sl, :]
        dp = jax.lax.dot_general(doh.astype(dt), vt.astype(dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dvt_scr[sl, :] = jax.lax.dot_general(
            doh.astype(dt), pt, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dst = ds.astype(dt)
        dqh = jax.lax.dot_general(kh.astype(dt), dst, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        dkh = jax.lax.dot_general(qh.astype(dt), dst, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)

        @pl.when(i == 0)
        def _():
            if h == 0:
                dqs_ref[:] = jnp.zeros_like(dqs_ref)
                dks_ref[:] = jnp.zeros_like(dks_ref)
        dqs_ref[:] += jnp.sum(uq * dqh, axis=1, keepdims=True) * scale
        dks_ref[:] += jnp.sum(uk * dkh, axis=1, keepdims=True)
        duq = dqh * qsc
        duk = dkh * ksc
        dqt_scr[sl, :] = (duq - uq * jnp.sum(uq * duq, axis=0,
                                             keepdims=True)) / qn
        dkt_scr[sl, :] = (duk - uk * jnp.sum(uk * duk, axis=0,
                                             keepdims=True)) / kn

    ot = ot_scr[:].astype(dt)
    dwo_p = jax.lax.dot_general(ot, g, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dq = dqt_scr[:].astype(dt)
    dk = dkt_scr[:].astype(dt)
    dv = dvt_scr[:].astype(dt)
    dxn = jax.lax.dot_general(dq, wqt_ref[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dx_direct = (jax.lax.dot_general(dk, wkt_ref[:], (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 + jax.lax.dot_general(dv, wvt_ref[:],
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32))
    dwq_p = jax.lax.dot_general(xn, dq, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)
    dwk_p = jax.lax.dot_general(x, dk, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)
    dwv_p = jax.lax.dot_general(x, dv, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)

    dgamma_p = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dxhat = dxn * gamma_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd + dx_direct
    if residual:
        dx = dx + g.astype(f32)
    dx_ref[:] = dx.reshape(r, n, d).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    dgamma_ref[:] += dgamma_p
    dwq_ref[:] += dwq_p
    dwk_ref[:] += dwk_p
    dwv_ref[:] += dwv_p
    dwo_ref[:] += dwo_p


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "residual"))
def _backward_impl(x, gamma, wq, wk, wv, wo, qs, ks, g, *,
                   scale, interpret, residual):
    b, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh
    r = _pick_rows(b, n, d, hd, x.dtype.itemsize)

    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(dh, 1)
    ks2 = ks.astype(jnp.float32).reshape(dh, 1)
    rn = r * n
    seq = jnp.repeat(jnp.arange(r, dtype=jnp.int32), n)
    neg = jnp.where(seq[:, None] == seq[None, :], 0.0,
                    NEG_INF).astype(jnp.float32)

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=heads, n=n,
                          residual=residual),
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec((r, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((hd, d)), const((hd, d)), const((hd, d)),
            const((hd, d)), const((dh, 1)), const((dh, 1)), const((rn, rn)),
        ],
        out_specs=[
            pl.BlockSpec((r, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((d, hd)), const((d, hd)), const((d, hd)),
            const((hd, d)), const((dh, 1)), const((dh, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, d), jnp.float32),
            jax.ShapeDtypeStruct((dh, 1), jnp.float32),
            jax.ShapeDtypeStruct((dh, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((hd, rn), jnp.float32) for _ in range(7)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (9 * n * d * hd + heads * 6 * rn * n * dh),
            bytes_accessed=x.size * 3 * x.dtype.itemsize,
            transcendentals=2 * (b // r) * heads * rn * rn),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, g, gamma2, wq.T, wk.T, wv.T, wo, qs2, ks2, neg)

    dx, dgamma, dwq, dwk, dwv, dwo, dqs, dks = outs
    return (dx, dgamma.reshape(d), dwq, dwk, dwv, dwo,
            dqs.reshape(qs.shape), dks.reshape(ks.shape))
