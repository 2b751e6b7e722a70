"""Fused Pallas TPU kernel for the CT-ViT patch embedding.

Semantics: patchify -> LayerNorm(patch_dim) -> Linear(patch_dim, dim) ->
LayerNorm(dim) (reference ctvit.py:44-52), in the algebraically LN-folded
conv formulation of models/ctvit._patch_embed_conv.

Why a kernel: XLA lowers that formulation as three full-volume layout
copies (raw-input relayout, the (b t hp cin W) transpose, the conv-input
im2col) plus separate moment reductions — ~29.6 ms at flagship B=16 where
the information-theoretic cost is one read of the 1.8 GB volume + one write
of the 226 MB token grid (~4.4 ms) + a 906 GFLOP matmul (~5 ms). Here each
grid step (b, t-frame) does everything VMEM-resident:

  * the (tv, hp, p1, w) -> (wv, hp*pw, cin) rearrangement is two sublane
    permutations, one batched lane transpose and free row-major reshapes —
    no HBM round-trips. The one layout rule: never materialize a minor dim
    of `patch`(=20) in HBM (T(8,128) pads 20 -> 128); in-kernel VMEM values
    are Mosaic's problem, and the matmul operands end (576, cin) / (cin, D);
  * the strided conv runs as `patch` MXU matmuls [hp*wp, cin] @ [cin, dim]
    (one per within-patch column wv) accumulated in fp32 — exactly the
    useful FLOPs, no im2col materialization;
  * per-patch LN1 moments ride a channel reduce + one [hp, W] @ [W, wp]
    block-ones matmul; LN1 (folded) and LN2 apply before the single output
    write.

Backward: the LayerNorm chain re-derives from residuals the FORWARD kernel
saves (the fp32 conv accumulator + per-patch LN1 moments — one extra VMEM
write per frame), the projection weight grad runs as a second Pallas kernel
(`_dkw_kernel`: the same in-VMEM rearrangement, then per-wv xt^T @ dconv
MXU matmuls accumulated across the sequential grid), and the image
cotangent stays on the `_xla_twin` VJP — training never uses it, so XLA
dead-code-eliminates that whole subgraph; attribution paths that DO
differentiate w.r.t. the volume get the exact twin gradient. This replaces
the round-2 backward (a full `_xla_twin` recompute + conv weight-grad
lowering, ~18 ms of the flagship train step in layout copies) with one
image read + one dconv read at MXU rates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _frame_moments(xa, patch, W, wp, patch_dim):
    """Per-patch LN1 moments as MXU contractions with the block-ones lane
    grouping (f32 accumulation of bf16 x {0,1} products is exact for
    sum1; sum2 only carries the bf16 squaring rounding, ~1e-3 relative on
    sigma — inside the compute-dtype tolerance). Returns ([hp, wp] mean,
    [hp, wp] var)."""
    f32 = jnp.float32
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 0) // patch
    pw_iota = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 1)
    inc = (w_iota == pw_iota).astype(xa.dtype)         # [W, wp]
    sum1 = jnp.sum(jax.lax.dot_general(xa, inc, (((2,), (0,)), ((), ())),
                                       preferred_element_type=f32),
                   axis=1)                             # [hp, wp]
    sum2 = jnp.sum(jax.lax.dot_general(xa * xa, inc, (((2,), (0,)), ((), ())),
                                       preferred_element_type=f32),
                   axis=1)
    mean2 = sum1 / patch_dim
    var2 = jnp.maximum(sum2 / patch_dim - mean2 * mean2, 0.0)
    return mean2, var2


def _frame_rearrange(x, patch, t_patch, H, W):
    """[t_patch, H, W] frame -> (xa [hp, cin, W], xt [patch, hp*wp, cin]).

    The (tv, hp, p1, w) -> (wv, hp*pw, cin) rearrangement is two sublane
    permutations, one batched lane transpose and free row-major reshapes —
    no HBM round-trips. The lane<->sublane transpose rides an MXU identity
    contraction: Mosaic's native shuffle transpose of a [cin, W] bf16 tile
    stack measures far slower than the 0.9 GFLOP identity matmul."""
    hp, wp = H // patch, W // patch
    cin = t_patch * patch
    x4 = x.reshape(t_patch, hp, patch, W)              # [tv, hp, p1, w]
    xa = x4.transpose(1, 0, 2, 3).reshape(hp, cin, W)  # [hp, cin, w]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (cin, cin), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (cin, cin), 1)
           ).astype(x.dtype)
    xt = jax.lax.dot_general(xa, eye, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
    xt = xt.reshape(hp, wp, patch, cin)                # [hp, pw, wv, cin]
    xt = xt.transpose(2, 0, 1, 3).reshape(patch, hp * wp, cin)
    return xa, xt


def _kernel(x_ref, kw_ref, s1_ref, b1_ref, g2_ref, b2_ref, o_ref, *refs,
            patch: int, t_patch: int, eps: float):
    """Forward. With 3 extra out refs, the fp32 conv accumulator and the
    per-patch LN1 moments are also written — the residuals `_pe_bwd`
    rebuilds the LayerNorm chain from."""
    _, _, _, H, W = x_ref.shape
    hp, wp = H // patch, W // patch
    cin = t_patch * patch
    dim = kw_ref.shape[-1]
    f32 = jnp.float32

    x = x_ref[0, 0]                                    # [t_patch, H, W]
    xa, xt = _frame_rearrange(x, patch, t_patch, H, W)

    # the (hp, wp) moment grid broadcasts over dim BEFORE the row merge (a
    # lane->sublane merging reshape of a 2-d vector is not a legal Mosaic
    # shape cast, but broadcast-then-merge is)
    mean2, var2 = _frame_moments(xa, patch, W, wp, cin * patch)
    mean = jnp.broadcast_to(mean2[:, :, None],
                            (hp, wp, dim)).reshape(hp * wp, dim)
    var = jnp.broadcast_to(var2[:, :, None],
                           (hp, wp, dim)).reshape(hp * wp, dim)

    # strided conv as per-wv MXU matmuls accumulated in fp32
    acc = jnp.zeros((hp * wp, dim), f32)
    for wv in range(patch):                            # static unroll
        acc = acc + jax.lax.dot_general(
            xt[wv], kw_ref[wv], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    if refs:
        conv_ref, m_ref, v_ref = refs
        conv_ref[0, 0] = acc.reshape(hp, wp, dim)
        m_ref[0, 0] = mean2
        v_ref[0, 0] = var2

    # folded LN1 + bias; LN2 runs on the compute-dtype-cast h (matching the
    # XLA path, which norms h AFTER the .astype(image.dtype))
    h = (acc - mean * s1_ref[0]) * jax.lax.rsqrt(var + eps) + b1_ref[0]
    h = h.astype(o_ref.dtype).astype(f32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu
    out = (h - mu) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    out = out * g2_ref[0] + b2_ref[0]
    o_ref[0, 0] = out.reshape(hp, wp, dim).astype(o_ref.dtype)


def _dkw_kernel(x_ref, dc_ref, o_ref, *, patch: int, t_patch: int):
    """Projection weight grad: o[wv, cin, dim] += xt[wv]^T @ dconv — the
    exact transpose of the forward's per-wv conv matmuls, accumulated
    across the sequential (b, t) grid into the VMEM-resident output."""
    _, _, _, H, W = x_ref.shape
    hp, wp = H // patch, W // patch
    dim = dc_ref.shape[-1]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    _, xt = _frame_rearrange(x_ref[0, 0], patch, t_patch, H, W)
    dc = dc_ref[0, 0].reshape(hp * wp, dim).astype(x_ref.dtype)
    for wv in range(patch):                            # static unroll
        o_ref[wv] += jax.lax.dot_general(
            xt[wv], dc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _xla_twin(image, kw, s1, b1, g2, b2, patch, t_patch, eps=1e-5):
    """XLA restatement over the kernel's raw operands (backward path /
    off-TPU forward) — the 1D-conv formulation of ctvit._patch_embed_conv."""
    b, c, T, H, W = image.shape
    t, hp, wp = T // t_patch, H // patch, W // patch
    cin = c * t_patch * patch
    dim = kw.shape[-1]
    patch_dim = cin * patch

    x1d = image.reshape(b, c, t, t_patch, hp, patch, W)
    x1d = x1d.transpose(0, 2, 4, 1, 3, 5, 6).reshape(b * t * hp, cin, W)
    conv = jax.lax.conv_general_dilated(
        x1d[:, :, None, :], kw.astype(image.dtype)[None],
        window_strides=(1, patch), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC")).astype(jnp.float32)
    conv = conv.reshape(b * t, hp, wp, dim)

    inc = jnp.kron(jnp.eye(wp, dtype=jnp.float32),
                   jnp.ones((patch, 1), jnp.float32))
    x32 = x1d.astype(jnp.float32)
    sum1 = (x32.sum(axis=1) @ inc).reshape(b * t, hp, wp)
    sum2 = ((x32 * x32).sum(axis=1) @ inc).reshape(b * t, hp, wp)
    mean = (sum1 / patch_dim)[..., None]
    var = jnp.maximum((sum2 / patch_dim)[..., None] - mean * mean, 0.0)

    h = (conv - mean * s1) * jax.lax.rsqrt(var + eps) + b1
    h = h.astype(image.dtype).astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.var(h, axis=-1, keepdims=True)
    out = (h - mu) * jax.lax.rsqrt(v + eps) * g2 + b2
    return out.reshape(b, t, hp, wp, dim).astype(image.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def patch_embed_fused(image: Array, kw: Array, s1: Array, b1: Array,
                      g2: Array, b2: Array, patch: int, t_patch: int,
                      interpret: bool = False) -> Array:
    """Fused patchify+LN+proj+LN.

    Args:
      image: [B, 1, T, H, W] volume.
      kw: [patch(wv), cin=(c t_patch p1), dim] gamma-folded projection (the
          `k1d` of ctvit._patch_embed_conv).
      s1: [dim] sum_i gamma_i W_i (mean-correction row).
      b1: [dim] beta @ W + proj bias.
      g2/b2: [dim] output LayerNorm scale/bias.
    Returns [B, T//t_patch, H//patch, W//patch, dim] in image dtype.
    """
    return _forward_impl(image, kw, s1, b1, g2, b2, patch=patch,
                         t_patch=t_patch, interpret=interpret)


def _pe_fwd(image, kw, s1, b1, g2, b2, patch, t_patch, interpret):
    out, conv, mean2, var2 = _forward_res_impl(
        image, kw, s1, b1, g2, b2, patch=patch, t_patch=t_patch,
        interpret=interpret)
    return out, (image, kw, s1, b1, g2, b2, conv, mean2, var2)


def _pe_bwd(patch, t_patch, interpret, res, g):
    """LayerNorm-chain backward from the forward kernel's saved residuals
    (fp32 conv accumulator + per-patch LN1 moments) — no forward recompute.
    With  pre = (conv - mean*s1)*rs + b1,  out = LN2(cast(pre))*g2 + b2:
      dconv = dLN2 * rs,   ds1 = -sum(dconv * mean),   db1 = sum(dLN2),
      dkw[wv] = xt[wv]^T @ dconv  (Pallas, `_dkw_kernel`).
    The image cotangent rides the `_xla_twin` VJP: training never uses it,
    so XLA dead-code-eliminates that subgraph; volume-gradient callers get
    the exact twin value."""
    image, kw, s1, b1, g2, b2, conv, mean2, var2 = res

    # escape hatch: CTCLIP_PE_BWD_TWIN=1 restores the round-2 backward (full
    # XLA-twin recompute VJP) — for isolating compiler regressions on the
    # residual-based path without a code change. Read at TRACE time: set it
    # before the process's first backward trace; flipping it later hits the
    # jit cache and has no effect.
    import os
    if os.environ.get("CTCLIP_PE_BWD_TWIN") == "1":
        _, vjp = jax.vjp(lambda *a: _xla_twin(*a, patch, t_patch),
                         image, kw, s1, b1, g2, b2)
        return vjp(g)

    eps = 1e-5
    f32 = jnp.float32
    b, t, hp, wp, dim = conv.shape
    n = b * t * hp * wp

    conv2 = conv.reshape(n, dim)
    meanc = mean2.reshape(n, 1)
    rs = jax.lax.rsqrt(var2.reshape(n, 1) + eps)
    s1f, b1f, g2f = s1.astype(f32), b1.astype(f32), g2.astype(f32)

    pre = (conv2 - meanc * s1f) * rs + b1f
    h = pre.astype(image.dtype).astype(f32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu, 0.0)
    r = jax.lax.rsqrt(v + eps)
    xhat = (h - mu) * r

    gf = g.reshape(n, dim).astype(f32)
    dg2 = jnp.sum(gf * xhat, axis=0)
    db2 = jnp.sum(gf, axis=0)
    gq = gf * g2f
    dpre = r * (gq - jnp.mean(gq, axis=-1, keepdims=True)
                - xhat * jnp.mean(gq * xhat, axis=-1, keepdims=True))
    db1 = jnp.sum(dpre, axis=0)
    dconv = dpre * rs
    ds1 = -jnp.sum(dconv * meanc, axis=0)

    dkw = _dkw_impl(image, dconv.reshape(b, t, hp, wp, dim)
                    .astype(image.dtype),
                    patch=patch, t_patch=t_patch, interpret=interpret)

    _, ivjp = jax.vjp(
        lambda im: _xla_twin(im, kw, s1, b1, g2, b2, patch, t_patch), image)
    dimage, = ivjp(g)
    return (dimage, dkw.astype(kw.dtype), ds1.astype(s1.dtype),
            db1.astype(b1.dtype), dg2.astype(g2.dtype), db2.astype(b2.dtype))


patch_embed_fused.defvjp(_pe_fwd, _pe_bwd)


@functools.partial(jax.jit, static_argnames=("patch", "t_patch", "interpret"))
def _forward_impl(image, kw, s1, b1, g2, b2, *, patch, t_patch, interpret):
    b, c, T, H, W = image.shape
    assert c == 1, "kernel path is for single-channel CT volumes"
    t, hp, wp = T // t_patch, H // patch, W // patch
    dim = kw.shape[-1]

    kwd = kw.astype(image.dtype)
    row = lambda a: a.astype(jnp.float32).reshape(1, dim)

    return pl.pallas_call(
        functools.partial(_kernel, patch=patch, t_patch=t_patch, eps=1e-5),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, t_patch, H, W),
                         lambda bi, ti: (bi, 0, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kwd.shape, lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hp, wp, dim),
                               lambda bi, ti: (bi, ti, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, hp, wp, dim), image.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * hp * wp * dim * t_patch * patch * patch,
            bytes_accessed=image.size * image.dtype.itemsize
            + b * t * hp * wp * dim * image.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(image, kwd, row(s1), row(b1), row(g2), row(b2))


@functools.partial(jax.jit, static_argnames=("patch", "t_patch", "interpret"))
def _forward_res_impl(image, kw, s1, b1, g2, b2, *, patch, t_patch,
                      interpret):
    """Forward + backward residuals: (out, conv fp32 [b,t,hp,wp,dim],
    mean2 fp32 [b,t,hp,wp], var2 fp32 [b,t,hp,wp])."""
    b, c, T, H, W = image.shape
    assert c == 1, "kernel path is for single-channel CT volumes"
    t, hp, wp = T // t_patch, H // patch, W // patch
    dim = kw.shape[-1]

    kwd = kw.astype(image.dtype)
    row = lambda a: a.astype(jnp.float32).reshape(1, dim)
    small = pl.BlockSpec((1, dim), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, patch=patch, t_patch=t_patch, eps=1e-5),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, t_patch, H, W),
                         lambda bi, ti: (bi, 0, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kwd.shape, lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            small, small, small, small,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, hp, wp, dim), lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp, dim), lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hp, wp, dim), image.dtype),
            jax.ShapeDtypeStruct((b, t, hp, wp, dim), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hp, wp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * hp * wp * dim * t_patch * patch * patch,
            bytes_accessed=image.size * image.dtype.itemsize
            + 3 * b * t * hp * wp * dim * image.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(image, kwd, row(s1), row(b1), row(g2), row(b2))


@functools.partial(jax.jit, static_argnames=("patch", "t_patch", "interpret"))
def _dkw_impl(image, dconv, *, patch, t_patch, interpret):
    """[patch, cin, dim] projection-kernel grad via `_dkw_kernel`: one read
    of the volume + one read of dconv, 453 GFLOP of MXU matmuls at flagship
    B=8 — vs ~18 ms of layout copies in the XLA conv-weight-grad lowering."""
    b, c, T, H, W = image.shape
    t, hp, wp = T // t_patch, H // patch, W // patch
    cin = c * t_patch * patch
    dim = dconv.shape[-1]

    return pl.pallas_call(
        functools.partial(_dkw_kernel, patch=patch, t_patch=t_patch),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, t_patch, H, W),
                         lambda bi, ti: (bi, 0, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp, dim),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((patch, cin, dim), lambda bi, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((patch, cin, dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * hp * wp * dim * t_patch * patch * patch,
            bytes_accessed=image.size * image.dtype.itemsize
            + b * t * hp * wp * dim * dconv.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(image, dconv)
