"""Fully-fused Pallas kernel for one BERT encoder LAYER (fwd + bwd).

The text tower (models/bert.py, HF BertModel semantics — the reference
consumes CXR-BERT as a black box, src/train_ctclip.py:17) was ~50 ms of the
285 ms flagship train step as ~20 separate XLA ops per layer direction
(round-4 source-line ledger, docs/ROADMAP.md) against a ~15 ms pure-MXU
floor. One kernel covers the whole layer:

    x -> QKV (one [D, 3D] dot) -> per-head softmax attention (+ additive
    key mask, + attention-prob dropout) -> out projection (+ hidden
    dropout) -> +x -> LayerNorm -> GELU FF (exact-erf via an fp32 minimax
    polynomial — Mosaic has no erf primitive) (+ hidden dropout) ->
    +residual -> LayerNorm

Grid = (batch,): one program per sequence; q/k/v live TRANSPOSED [3D, n]
in scratch so per-head slicing is a static sublane slice (dh=64 lane
slices would need 128 alignment). The backward kernel recomputes the
forward in VMEM (nothing is saved to HBM between fwd and bwd) and
accumulates every weight/bias/LN grad across programs.

Dropout uses the TPU hardware PRNG (pltpu.prng_seed / prng_random_bits),
reseeded per (site, program, head) so forward and backward regenerate
IDENTICAL masks independent of generation order. The masks differ from the
XLA path's threefry draws — statistically equivalent, like any
cross-framework dropout (the torch reference's masks differ from ours
too); deterministic mode is bit-comparable to the XLA twin. Seeds derive
from the caller's PRNG key, so a fixed key still gives reproducible steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf(x):
    """fp32 erf, Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has
    no erf primitive, and the tanh-gelu approximation (~1e-3) would break
    the 1e-5 HF-parity bands."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x):
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT2PI
    return 0.5 * (1.0 + _erf(x * _INV_SQRT2)) + x * phi


def _keep_mask(shape, seed, rate):
    """Multiplicative dropout mask (0 or 1/(1-rate)) from the TPU PRNG."""
    pltpu.prng_seed(seed)
    bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits(shape),
                                        jnp.uint32)
    thresh = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _ln_fwd(r, gamma, beta, eps):
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xhat = (r - mean) * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd(dout, xhat, rstd, gamma):
    dxhat = dout * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dr = (dxhat - m1 - xhat * m2) * rstd
    dgamma = jnp.sum(dout * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dout, axis=0, keepdims=True)
    return dr, dgamma, dbeta


def _attn_seed(s_ref, i, h):
    return s_ref[0] + i * 7919 + h


def _fwd_body(i, x, mask_row, s_ref, wqkvt_ref, bqkv_ref, wo_ref, bo_ref,
              g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
              be2_ref, qkvt_scr, ctxt_scr, *, heads, eps, p_attn, p_hidden,
              train):
    """Shared forward math (kernel fwd + bwd recompute). Returns the
    intermediates the backward needs; scratches are filled in place."""
    f32 = jnp.float32
    dt = x.dtype
    d = x.shape[-1]
    n = x.shape[0]
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)

    qkvt_scr[:] = jax.lax.dot_general(
        wqkvt_ref[:], x, (((1,), (1,)), ((), ())),
        preferred_element_type=f32) + bqkv_ref[:]
    for h in range(heads):
        q = qkvt_scr[h * dh:(h + 1) * dh, :]
        k = qkvt_scr[d + h * dh:d + (h + 1) * dh, :]
        v = qkvt_scr[2 * d + h * dh:2 * d + (h + 1) * dh, :]
        s = jax.lax.dot_general(q.astype(dt), k.astype(dt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32) * scale
        s = s + mask_row[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if train and p_attn > 0.0:
            p = p * _keep_mask((n, n), _attn_seed(s_ref, i, h), p_attn)
        ctxt_scr[h * dh:(h + 1) * dh, :] = jax.lax.dot_general(
            v.astype(dt), p.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    o1 = jax.lax.dot_general(ctxt_scr[:].astype(dt), wo_ref[:],
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=f32) + bo_ref[:]
    if train and p_hidden > 0.0:
        o1 = o1 * _keep_mask((n, d), s_ref[1] + i * 7919, p_hidden)
    r1 = o1 + x.astype(f32)
    y, xhat1, rstd1 = _ln_fwd(r1, g1_ref[:], be1_ref[:], eps)

    h1 = jax.lax.dot_general(y.astype(dt), w1_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) + b1_ref[:]
    g = _gelu(h1)
    o2 = jax.lax.dot_general(g.astype(dt), w2_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) + b2_ref[:]
    if train and p_hidden > 0.0:
        o2 = o2 * _keep_mask((n, d), s_ref[2] + i * 7919, p_hidden)
    r2 = o2 + y
    out, xhat2, rstd2 = _ln_fwd(r2, g2_ref[:], be2_ref[:], eps)
    return out, (y, xhat1, rstd1, h1, xhat2, rstd2)


def _kernel_fwd(s_ref, x_ref, mask_ref, wqkvt_ref, bqkv_ref, wo_ref, bo_ref,
                g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                be2_ref, o_ref, qkvt_scr, ctxt_scr, *, heads, eps, p_attn,
                p_hidden, train):
    i = pl.program_id(0)
    out, _ = _fwd_body(i, x_ref[0], mask_ref[0, 0], s_ref, wqkvt_ref,
                       bqkv_ref,
                       wo_ref, bo_ref, g1_ref, be1_ref, w1_ref, b1_ref,
                       w2_ref, b2_ref, g2_ref, be2_ref, qkvt_scr, ctxt_scr,
                       heads=heads, eps=eps, p_attn=p_attn,
                       p_hidden=p_hidden, train=train)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_bwd(s_ref, x_ref, mask_ref, wqkvt_ref, bqkv_ref, wo_ref, bo_ref,
                g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                be2_ref, dout_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
                dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref,
                dbe2_ref,
                qkvt_scr, ctxt_scr, dqkvt_scr, *, heads, eps, p_attn,
                p_hidden, train):
    f32 = jnp.float32
    i = pl.program_id(0)
    x = x_ref[0]
    dt = x.dtype
    n, d = x.shape
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)

    _, (y, xhat1, rstd1, h1, xhat2, rstd2) = _fwd_body(
        i, x, mask_ref[0, 0], s_ref, wqkvt_ref, bqkv_ref, wo_ref, bo_ref,
        g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
        qkvt_scr, ctxt_scr, heads=heads, eps=eps, p_attn=p_attn,
        p_hidden=p_hidden, train=train)
    y_dt = y.astype(dt)
    g = _gelu(h1)

    dout = dout_ref[0].astype(f32)
    # ---- LN2 -> FF -> LN1 -------------------------------------------------
    dr2, dg2, dbe2 = _ln_bwd(dout, xhat2, rstd2, g2_ref[:])
    do2 = dr2
    if train and p_hidden > 0.0:
        do2 = do2 * _keep_mask((n, d), s_ref[2] + i * 7919, p_hidden)
    dy = dr2                                      # residual branch
    # o2 = g @ w2 + b2
    dw2 = jax.lax.dot_general(g.astype(dt), do2.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [f, d]
    db2 = jnp.sum(do2, axis=0, keepdims=True)
    dg_ff = jax.lax.dot_general(do2.astype(dt), w2_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)     # [n, f]
    dh1 = dg_ff * _gelu_grad(h1)
    dw1 = jax.lax.dot_general(y_dt, dh1.astype(dt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [d, f]
    db1 = jnp.sum(dh1, axis=0, keepdims=True)
    dy = dy + jax.lax.dot_general(dh1.astype(dt), w1_ref[:],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)   # [n, d]
    dr1, dg1, dbe1 = _ln_bwd(dy, xhat1, rstd1, g1_ref[:])
    do1 = dr1
    if train and p_hidden > 0.0:
        do1 = do1 * _keep_mask((n, d), s_ref[1] + i * 7919, p_hidden)
    dx = dr1                                      # residual branch

    # ---- attention out projection ----------------------------------------
    ctxt = ctxt_scr[:]                            # [d, n] f32
    dwo = jax.lax.dot_general(ctxt.astype(dt), do1.astype(dt),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [d, d]
    dbo = jnp.sum(do1, axis=0, keepdims=True)
    # dctx^T [d, n] = wo @ do1^T
    dctxt = jax.lax.dot_general(wo_ref[:], do1.astype(dt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)

    # ---- per-head attention backward (scores recomputed) ------------------
    for h in range(heads):
        q = qkvt_scr[h * dh:(h + 1) * dh, :]
        k = qkvt_scr[d + h * dh:d + (h + 1) * dh, :]
        v = qkvt_scr[2 * d + h * dh:2 * d + (h + 1) * dh, :]
        s = jax.lax.dot_general(q.astype(dt), k.astype(dt),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32) * scale
        s = s + mask_ref[0, 0][None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)        # pre-dropout
        if train and p_attn > 0.0:
            keep = _keep_mask((n, n), _attn_seed(s_ref, i, h), p_attn)
            p_used = p * keep
        else:
            keep = None
            p_used = p
        dct_h = dctxt[h * dh:(h + 1) * dh, :]             # [dh, n_i]
        # dp_used[i, j] = sum_d dctx^T[d, i] v[d, j]
        dp = jax.lax.dot_general(dct_h.astype(dt), v.astype(dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)   # [n_i, n_j]
        # dv^T[d, j] = sum_i p_used[i, j] dctx^T[d, i]
        dqkvt_scr[2 * d + h * dh:2 * d + (h + 1) * dh, :] = \
            jax.lax.dot_general(dct_h.astype(dt), p_used.astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(dt)
        # dq^T[d, i] = sum_j ds[i, j] k[d, j];  dk^T[d, j] = sum_i ds q
        dqkvt_scr[h * dh:(h + 1) * dh, :] = jax.lax.dot_general(
            k.astype(dt), ds, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dqkvt_scr[d + h * dh:d + (h + 1) * dh, :] = jax.lax.dot_general(
            q.astype(dt), ds, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- QKV projection backward ------------------------------------------
    dqkvt = dqkvt_scr[:]
    dx = dx + jax.lax.dot_general(dqkvt.astype(dt), wqkvt_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [n, d]
    dwqkv = jax.lax.dot_general(x, dqkvt.astype(dt),
                                (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)     # [d, 3d]
    dbqkv = jnp.sum(dqkvt, axis=1, keepdims=True)               # [3d, 1]

    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
                    dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref,
                    dbe2_ref):
            ref[:] = jnp.zeros_like(ref)

    dwqkv_ref[:] += dwqkv
    dbqkv_ref[:] += dbqkv
    dwo_ref[:] += dwo
    dbo_ref[:] += dbo
    dg1_ref[:] += dg1
    dbe1_ref[:] += dbe1
    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2
    dg2_ref[:] += dg2
    dbe2_ref[:] += dbe2


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------

def bert_layer_xla(x, mask_row, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2,
                   g2, be2, heads: int, eps: float):
    """Deterministic XLA twin (tests + non-TPU backward). Semantics match
    models/bert.py's layer body exactly."""
    f32 = jnp.float32
    b_, n, d = x.shape
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)

    qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    q, k, v = [t.reshape(b_, n, heads, dh).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1)]
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=f32) * scale
    sim = sim + mask_row[:, None, None, :]
    attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     preferred_element_type=f32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, n, d)

    def ln(r, gamma, beta):
        mean = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.var(r, axis=-1, keepdims=True)
        return (r - mean) * jax.lax.rsqrt(var + eps) * gamma + beta

    o1 = (ctx @ wo.astype(x.dtype) + bo.astype(x.dtype)).astype(f32)
    y = ln(o1 + x.astype(f32), g1, be1).astype(x.dtype)
    h1 = (y @ w1.astype(x.dtype) + b1.astype(x.dtype)).astype(f32)
    g = jax.nn.gelu(h1, approximate=False)
    o2 = (g.astype(x.dtype) @ w2.astype(x.dtype)
          + b2.astype(x.dtype)).astype(f32)
    return ln(o2 + y.astype(f32), g2, be2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def bert_layer_fused(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1,
                     b1, w2, b2, g2, be2, heads: int, eps: float,
                     p_attn: float, p_hidden: float, train: bool,
                     interpret: bool = False):
    """x: [B, N, D]; mask_row: [B, N] additive fp32 key mask (HF style);
    seeds: [3] int32 (attention / post-attention / post-FF dropout sites —
    ignored when not train); wqkv: [D, 3D]; bqkv: [3D]; wo: [D, D]; w1:
    [D, F]; w2: [F, D]; LN params fp32 [D]. Returns [B, N, D]."""
    return _fwd_impl(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1,
                     b1, w2, b2, g2, be2, heads=heads, eps=eps,
                     p_attn=p_attn, p_hidden=p_hidden, train=train,
                     interpret=interpret)


def _vjp_fwd(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2,
             b2, g2, be2, heads, eps, p_attn, p_hidden, train, interpret):
    out = _fwd_impl(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1,
                    w2, b2, g2, be2, heads=heads, eps=eps, p_attn=p_attn,
                    p_hidden=p_hidden, train=train, interpret=interpret)
    return out, (x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1,
                 w2, b2, g2, be2)


def _vjp_bwd(heads, eps, p_attn, p_hidden, train, interpret, res, dout):
    (x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2,
     be2) = res
    if jax.default_backend() == "tpu" or interpret:
        grads = _bwd_impl(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1,
                          w1, b1, w2, b2, g2, be2, dout, heads=heads,
                          eps=eps, p_attn=p_attn, p_hidden=p_hidden,
                          train=train, interpret=interpret)
        (dx, dwqkv, dbqkv, dwo, dbo, dg1, dbe1, dw1, db1, dw2, db2, dg2,
         dbe2) = grads
        return (dx, None, None, dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwo.astype(wo.dtype), dbo.reshape(bo.shape).astype(bo.dtype),
                dg1.reshape(g1.shape).astype(g1.dtype),
                dbe1.reshape(be1.shape).astype(be1.dtype),
                dw1.astype(w1.dtype),
                db1.reshape(b1.shape).astype(b1.dtype),
                dw2.astype(w2.dtype),
                db2.reshape(b2.shape).astype(b2.dtype),
                dg2.reshape(g2.shape).astype(g2.dtype),
                dbe2.reshape(be2.shape).astype(be2.dtype))
    # non-TPU fallback: XLA twin autodiff (deterministic only — the fused
    # path is never routed for training off-TPU)
    assert not (train and (p_attn > 0.0 or p_hidden > 0.0)), \
        "fused BERT layer dropout backward requires TPU (or interpret)"
    diff = (x, mask_row, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2,
            be2)
    _, vjp = jax.vjp(
        lambda *a: bert_layer_xla(*a, heads, eps), *diff)
    g = vjp(dout)
    return (g[0], None, None) + g[2:]


bert_layer_fused.defvjp(_vjp_fwd, _vjp_bwd)


def _specs(b, n, d, f):
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seeds
        pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                 # x
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                 # mask
        const((3 * d, d)), const((3 * d, 1)),                  # wqkv^T, bqkv
        const((d, d)), const((1, d)),                          # wo, bo
        const((1, d)), const((1, d)),                          # g1, be1
        const((d, f)), const((1, f)),                          # w1, b1
        const((f, d)), const((1, d)),                          # w2, b2
        const((1, d)), const((1, d)),                          # g2, be2
    ]


def _prep(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2,
          g2, be2):
    dt = x.dtype
    f32 = jnp.float32
    d = x.shape[-1]
    f = w1.shape[-1]
    return (seeds.astype(jnp.int32), x,
            mask_row.astype(f32)[:, None, :],
            wqkv.T.astype(dt), bqkv.astype(f32).reshape(3 * d, 1),
            wo.astype(dt), bo.astype(f32).reshape(1, d),
            g1.astype(f32).reshape(1, d), be1.astype(f32).reshape(1, d),
            w1.astype(dt), b1.astype(f32).reshape(1, f),
            w2.astype(dt), b2.astype(f32).reshape(1, d),
            g2.astype(f32).reshape(1, d), be2.astype(f32).reshape(1, d))


@functools.partial(jax.jit, static_argnames=("heads", "eps", "p_attn",
                                             "p_hidden", "train",
                                             "interpret"))
def _fwd_impl(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2,
              b2, g2, be2, *, heads, eps, p_attn, p_hidden, train,
              interpret):
    b, n, d = x.shape
    f = w1.shape[-1]
    args = _prep(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1,
                 w2, b2, g2, be2)
    return pl.pallas_call(
        functools.partial(_kernel_fwd, heads=heads, eps=eps, p_attn=p_attn,
                          p_hidden=p_hidden, train=train),
        grid=(b,),
        in_specs=_specs(b, n, d, f),
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * d, n), jnp.float32),   # qkv^T
            pltpu.VMEM((d, n), jnp.float32),       # ctx^T
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * (3 * d + d + 2 * f)
            + 4 * b * heads * n * n * (d // heads),
            bytes_accessed=2 * b * n * d * x.dtype.itemsize
            + (3 * d * d + d * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=b * heads * n * n + 2 * b * n * f),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "p_attn",
                                             "p_hidden", "train",
                                             "interpret"))
def _bwd_impl(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2,
              b2, g2, be2, dout, *, heads, eps, p_attn, p_hidden, train,
              interpret):
    b, n, d = x.shape
    f = w1.shape[-1]
    args = _prep(x, mask_row, seeds, wqkv, bqkv, wo, bo, g1, be1, w1, b1,
                 w2, b2, g2, be2)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_bwd, heads=heads, eps=eps, p_attn=p_attn,
                          p_hidden=p_hidden, train=train),
        grid=(b,),
        in_specs=_specs(b, n, d, f) + [
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],             # dout
        out_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # dx
            const((d, 3 * d)), const((3 * d, 1)),               # dwqkv, dbqkv
            const((d, d)), const((1, d)),                       # dwo, dbo
            const((1, d)), const((1, d)),                       # dg1, dbe1
            const((d, f)), const((1, f)),                       # dw1, db1
            const((f, d)), const((1, d)),                       # dw2, db2
            const((1, d)), const((1, d)),                       # dg2, dbe2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((3 * d, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * d, n), jnp.float32),   # qkv^T
            pltpu.VMEM((d, n), jnp.float32),       # ctx^T
            pltpu.VMEM((3 * d, n), jnp.float32),   # d(qkv)^T
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * d * (3 * d + d + 2 * f)
            + 12 * b * heads * n * n * (d // heads),
            bytes_accessed=4 * b * n * d * x.dtype.itemsize
            + 3 * (3 * d * d + d * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=3 * b * heads * n * n + 4 * b * n * f),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*args, dout)
    return outs
