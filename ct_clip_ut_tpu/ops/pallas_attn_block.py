"""Fully-fused Pallas kernel for the cosine-attention BLOCK.

One kernel covers everything between the residual taps of a self-attention
layer (reference attention.py:126-182): pre-norm LayerNorm, the q/k/v
projections (k/v from the PRE-norm input, attention.py:138-140), per-head
l2-normalization + learned scales + fixed scale, position bias, fp32
softmax, PV, and the output projection — with all weights VMEM-resident and
no intermediate ever written to HBM.

Grid = (rows, heads): at the first head step the q/k/v projections run
FULL-WIDTH ([n, D] @ [D, h*dh] — the per-head [D, 32] variant wastes 3/4 of
the MXU lanes) into VMEM scratch; each head step lane-slices its 32-wide
column block. Per-head PV results accumulate into an [n, h*dh] scratch whose
single full-width output projection runs at the last head. (TPU grids
iterate the last dimension fastest, so the scratches persist across the
head steps of one row.)

Backward = XLA recompute via custom VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, gamma_ref, wqt_ref, wkt_ref, wvt_ref, wo_ref,
            qs_ref, ks_ref, bias_ref, o_ref, qt_scr, kt_scr, vt_scr, ot_scr,
            *, scale: float, has_bias: bool, heads: int,
            residual: bool = False):
    """One grid step = one full sequence: LN + full-width projections, a
    STATIC loop over heads (scores/softmax/PV), output projection. The head
    loop lives inside the kernel rather than on the grid — at the flagship
    spatial stack that is 384 programs instead of 3072, and ~1.5 us of
    per-program pipeline overhead per step was ~5 ms/layer.

    Scratches hold q/k/v TRANSPOSED [h*dh, n]: per-head slicing is then a
    static SUBLANE slice (any multiple of 8 is legal; LANE slices must be
    128-aligned, which dh=32 is not). The transposed layouts come straight
    out of RHS-transposed dot_generals — no in-kernel transpose."""
    dh = qs_ref.shape[0]
    dt = x_ref.dtype

    x = x_ref[0]                                  # [N, D]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    xn = (x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xn = (xn * gamma_ref[0]).astype(x.dtype)
    # full-width projections ([h*dh, D] @contract-minor [N, D] -> [h*dh, N]);
    # k/v from the PRE-norm input (reference attention.py:138-140)
    qt_scr[:] = jax.lax.dot_general(
        wqt_ref[:], xn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    kt_scr[:] = jax.lax.dot_general(
        wkt_ref[:], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    vt_scr[:] = jax.lax.dot_general(
        wvt_ref[:], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    qsc = qs_ref[:].astype(jnp.float32) * scale
    ksc = ks_ref[:].astype(jnp.float32)
    for h in range(heads):                        # static unroll
        sl = slice(h * dh, (h + 1) * dh)
        qt = qt_scr[sl, :]                        # [dh, N] fp32
        kt = kt_scr[sl, :]
        vt = vt_scr[sl, :]

        qn = jnp.sqrt(jnp.sum(qt * qt, axis=0, keepdims=True))
        kn = jnp.sqrt(jnp.sum(kt * kt, axis=0, keepdims=True))
        qt = qt / jnp.maximum(qn, 1e-12) * qsc
        kt = kt / jnp.maximum(kn, 1e-12) * ksc

        s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [N, N]
        if has_bias:
            s = s + bias_ref[h].astype(jnp.float32)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        # o^T[d, i] = sum_j v^T[d, j] p[i, j]
        ot_scr[sl, :] = jax.lax.dot_general(
            vt.astype(dt), p.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jax.lax.dot_general(
        ot_scr[:].astype(dt), wo_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [N, D]
    if residual:                                   # x is already resident:
        out = out + x32                            # no separate HBM add pass
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_reference_block(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale,
                         residual: bool = False):
    """Pure-XLA twin (backward + tests). Weight layouts: wq/wk/wv [D, h*dh]
    column blocks per head, wo [h*dh, D]."""
    d = x.shape[-1]
    dh = qs.shape[-1]
    heads = wq.shape[1] // dh
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma).astype(x.dtype)

    def split(t):  # [r, n, h*dh] -> [r, h, n, dh]
        r, n, _ = t.shape
        return t.reshape(r, n, heads, dh).transpose(0, 2, 1, 3)

    q = split(xn @ wq.astype(x.dtype))
    k = split(x @ wk.astype(x.dtype))
    v = split(x @ wv.astype(x.dtype))
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qf = qf * (qs.astype(jnp.float32) * scale)
    kf = kf * ks.astype(jnp.float32)
    s = jnp.einsum("rhne,rhme->rhnm", qf, kf, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("rhnm,rhme->rhne", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], heads * dh)
    o = (o @ wo.astype(x.dtype)).astype(x.dtype)
    return o + x if residual else o


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def attention_block_fused(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                          scale: float = 8.0, interpret: bool = False,
                          residual: bool = False):
    """x: [R, N, D]; gamma: [D]; wq/wk/wv: [D, h*dh]; wo: [h*dh, D];
    qs/ks: [dh]; bias: optional [H, N, N]. Returns [R, N, D] — pre-residual,
    or with the +x residual folded into the kernel's output write when
    residual=True (saves a separate full-HBM add pass per layer)."""
    return _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                         scale=scale, interpret=interpret, residual=residual)


def _blk_fwd(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale, interpret,
             residual):
    out = _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                        scale=scale, interpret=interpret, residual=residual)
    return out, (x, gamma, wq, wk, wv, wo, qs, ks, bias)


def _blk_bwd(scale, interpret, residual, res, g):
    x, gamma, wq, wk, wv, wo, qs, ks, bias = res
    if jax.default_backend() == "tpu" or interpret:
        dt = x.dtype
        grads = _backward_impl(
            x, gamma, wq.astype(dt), wk.astype(dt), wv.astype(dt),
            wo.astype(dt), qs, ks, bias, g, scale=scale, interpret=interpret,
            residual=residual, has_bias=bias is not None)
        dx, dgamma, dwq, dwk, dwv, dwo, dqs, dks, dbias = grads
        return (dx, dgamma.astype(gamma.dtype), dwq.astype(wq.dtype),
                dwk.astype(wk.dtype), dwv.astype(wv.dtype),
                dwo.astype(wo.dtype), dqs.astype(qs.dtype),
                dks.astype(ks.dtype),
                None if bias is None else dbias.astype(bias.dtype))
    diff = (x, gamma, wq, wk, wv, wo, qs, ks) + ((bias,) if bias is not None else ())

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


attention_block_fused.defvjp(_blk_fwd, _blk_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "residual"))
def _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks,
                  bias: Optional[Array] = None, *,
                  scale: float = 8.0, interpret: bool = False,
                  residual: bool = False):
    r, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)
    bias_block = (heads, n, n) if has_bias else (1, 1, 1)
    bias_index = lambda i: (0, 0, 0)

    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(dh, 1)
    ks2 = ks.astype(jnp.float32).reshape(dh, 1)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_bias=has_bias,
                          heads=heads, residual=residual),
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hd, n), jnp.float32),   # q^T (full-width)
            pltpu.VMEM((hd, n), jnp.float32),   # k^T
            pltpu.VMEM((hd, n), jnp.float32),   # v^T
            pltpu.VMEM((hd, n), jnp.float32),   # per-head PV^T accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * (3 * n * d * hd + heads * 2 * n * n * dh
                           + n * hd * d),
            bytes_accessed=x.size * 2 * x.dtype.itemsize,
            transcendentals=r * heads * n * n),
        # the full [heads, N, N] bias is VMEM-resident (10.6 MB at the
        # flagship grid) on top of the scratches — needs more than the
        # 16 MB default scoped budget
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, gamma2, wq.T, wk.T, wv.T, wo, qs2, ks2, bias)


# ---------------------------------------------------------------------------
# fused backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, gamma_ref, wqt_ref, wkt_ref, wvt_ref, wo_ref,
                qs_ref, ks_ref, bias_ref,
                dx_ref, dgamma_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
                dqs_ref, dks_ref, dbias_ref,
                qt_scr, kt_scr, vt_scr, ot_scr, dqt_scr, dkt_scr, dvt_scr, *,
                scale: float, has_bias: bool, heads: int, residual: bool):
    """One grid step = one sequence. Recompute the transposed forward in
    VMEM, then every gradient; weight / scale / bias grads accumulate into
    constant-index output blocks across grid steps."""
    f32 = jnp.float32
    i = pl.program_id(0)
    dh = qs_ref.shape[0]
    dt = x_ref.dtype

    # ---- forward recompute (identical to _kernel) ------------------------
    x = x_ref[0]
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
    g = g_ref[0].astype(dt)                                  # [n, D]
    # dO^T = Wo g^T  ([hd, n]); also refill ot_scr (O^T) for dWo
    dot_t = jax.lax.dot_general(wo_ref[:], g, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)  # [hd, n]

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
                                preferred_element_type=f32)   # [n, n]
        if has_bias:
            s = s + bias_ref[h].astype(f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pt = p.astype(dt)

        ot_scr[sl, :] = jax.lax.dot_general(
            vt.astype(dt), pt, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                       # O^T [dh, n]

        doh = dot_t[sl, :]                                    # dO^T [dh, n]
        # dP[i, j] = sum_e dO[i, e] V[j, e]
        dp = jax.lax.dot_general(doh.astype(dt), vt.astype(dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # [n_i, n_j]
        # dV^T[e, j] = sum_i P[i, j] dO[i, e]
        dvt_scr[sl, :] = jax.lax.dot_general(
            doh.astype(dt), pt, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        # softmax backward
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [n, n]
        if has_bias:
            @pl.when(i == 0)
            def _():
                dbias_ref[h] = jnp.zeros_like(dbias_ref[h])
            dbias_ref[h] += ds
        dst = ds.astype(dt)
        # dqhat^T[e, i] = sum_j ds[i, j] khat[j, e]
        dqh = jax.lax.dot_general(kh.astype(dt), dst, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # [dh, n_i]
        dkh = jax.lax.dot_general(qh.astype(dt), dst, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)  # [dh, n_j]

        # scale + l2norm backward (column-wise over dh)
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

    # ---- projections backward (full-width) -------------------------------
    ot = ot_scr[:].astype(dt)
    # dWo [hd, D] = O^T g
    dwo_p = jax.lax.dot_general(ot, g, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dq = dqt_scr[:].astype(dt)
    dk = dkt_scr[:].astype(dt)
    dv = dvt_scr[:].astype(dt)
    # dxn [n, D] = dq^T Wq (wqt is [hd, D])
    dxn = jax.lax.dot_general(dq, wqt_ref[:], (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dx_direct = (jax.lax.dot_general(dk, wkt_ref[:], (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 + jax.lax.dot_general(dv, wvt_ref[:],
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32))
    # dWq [D, hd] = xn^T dq^T: contract the n axis
    xnt = xn
    dwq_p = jax.lax.dot_general(xnt, dq, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)
    xt_ = x
    dwk_p = jax.lax.dot_general(xt_, dk, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)
    dwv_p = jax.lax.dot_general(xt_, dv, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)

    dgamma_p = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dxhat = dxn * gamma_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd + dx_direct
    if residual:
        dx = dx + g_ref[0].astype(f32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

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
                                             "residual", "has_bias"))
def _backward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias, g, *,
                   scale, interpret, residual, has_bias):
    r, n, d = x.shape
    hd = wq.shape[1]
    dh = qs.shape[-1]
    heads = hd // dh
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)
    bias_block = (heads, n, n) if has_bias else (1, 1, 1)
    dbias_shape = (heads, n, n) if has_bias else (1, 1, 1)

    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(dh, 1)
    ks2 = ks.astype(jnp.float32).reshape(dh, 1)

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, has_bias=has_bias,
                          heads=heads, residual=residual),
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((hd, d)), const((hd, d)), const((hd, d)),
            const((hd, d)), const((dh, 1)), const((dh, 1)),
            const(bias_block),
        ],
        out_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((d, hd)), const((d, hd)), const((d, hd)),
            const((hd, d)), const((dh, 1)), const((dh, 1)),
            const(dbias_shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((d, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, d), jnp.float32),
            jax.ShapeDtypeStruct((dh, 1), jnp.float32),
            jax.ShapeDtypeStruct((dh, 1), jnp.float32),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((hd, n), jnp.float32) for _ in range(7)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * (9 * n * d * hd + heads * 6 * n * n * dh),
            bytes_accessed=x.size * 3 * x.dtype.itemsize,
            transcendentals=2 * r * heads * n * n),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, g, gamma2, wq.T, wk.T, wv.T, wo, qs2, ks2, bias)

    (dx, dgamma, dwq, dwk, dwv, dwo, dqs, dks, dbias) = outs
    grads = (dx, dgamma.reshape(d), dwq, dwk, dwv, dwo,
             dqs.reshape(qs.shape), dks.reshape(ks.shape))
    return grads + ((dbias,) if has_bias else (None,))
