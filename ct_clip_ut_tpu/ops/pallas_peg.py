"""Fused Pallas TPU kernel for the PEG depthwise 3x3x3 conv (+bias+residual).

Reference semantics: attention.py:55-83 — depthwise Conv3d(dim, dim, k=3,
groups=dim) over the [b, t, h, w, c] token video with causal frame padding
(2, 0) (or (1, 1) non-causal) and (1, 1) spatial padding, followed by the
residual add.

Why a kernel: XLA lowers the depthwise conv as per-tap passes over the
113M-element activation (B=16 flagship), ~27x the necessary HBM traffic on a
VPU-bound op, ~3.5 ms/layer. Design here:

  * grid (B, T/TB): TB output frames per program, so the +-2 temporal halo
    frames amortize to (TB+2)/TB reads per frame instead of 3, and the
    residual is the already-resident center frame (no extra operand);
  * halo frames are expressed as TB+2 BlockSpecs over the SAME (unpadded)
    array with T-block size 1 — a block index along a size-1 block dim IS an
    element offset, which is how Pallas writes stride-1 halos. Out-of-range
    edge frames are index-clamped and their taps zeroed via a program_id
    predicate;
  * each input frame is zero-padded ONCE in VMEM to (H+2, WP, C) with WP the
    next multiple of 8 >= W+2; that makes the (H+2, WP, C) -> ((H+2)*WP, C)
    flatten a layout no-op (whole sublane tiles), and then every spatial tap
    is exactly one sublane `pltpu.roll` + one f32 fma: for interior rows
    r = hp*WP + wp the source row r + (dh-1)*WP + (dw-1) never wraps and the
    zero padding supplies the conv boundary, so no per-tap edge masks exist
    at all. Wrapped garbage lands only on pad rows, which are discarded by
    the final interior slice.

Backward = XLA conv recompute via custom VJP (same pattern as the attention
and FF kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(*refs, h: int, w: int, tb: int, causal: bool, t_total: int):
    (*x_refs, w_ref, b_ref, o_ref) = refs
    c = o_ref.shape[-1]
    wp = (w + 2 + 7) // 8 * 8          # padded width, whole sublane tiles
    rows = (h + 2) * wp
    j = pl.program_id(1)
    off = 2 if causal else 1           # frame index offset of tap dt=0

    # pad + flatten each needed input frame once (f32)
    flat = []
    for i in range(tb + 2):
        frame = x_refs[i][0, 0].astype(jnp.float32)            # [h, w, c]
        padded = jnp.pad(frame, ((1, 1), (1, wp - 1 - w), (0, 0)))
        flat.append(padded.reshape(rows, c))

    bias = b_ref[0]                                            # [c]
    for o in range(tb):
        acc = jnp.zeros((rows, c), jnp.float32)
        for dt in range(3):
            # input frame index for this tap row: j*tb + o + dt - off
            t_in = j * tb + o + dt - off
            valid = (t_in >= 0) & (t_in <= t_total - 1)
            scale = valid.astype(jnp.float32)
            for dh in range(3):
                for dw in range(3):
                    s = (-((dh - 1) * wp + (dw - 1))) % rows
                    tap = w_ref[pl.ds(dt * 9 + dh * 3 + dw, 1), :][0] * scale
                    shifted = pltpu.roll(flat[o + dt], s, axis=0)
                    acc = acc + shifted * tap
        interior = acc.reshape(h + 2, wp, c)[1:h + 1, 1:w + 1, :]
        res = x_refs[o + off][0, 0].astype(jnp.float32)
        o_ref[0, o] = (interior + bias + res).astype(o_ref.dtype)


def _xla_reference(x, w, b, causal):
    """The existing conv formulation (ops/layers.peg math, incl. residual)."""
    frame_pad = (2, 0) if causal else (1, 1)
    dim = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 3, 1, dim).astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=(frame_pad, (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=dim)
    return (out.astype(jnp.float32) + b).astype(x.dtype) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def peg_fused(x: Array, w: Array, b: Array, causal: bool = True,
              interpret: bool = False) -> Array:
    """Depthwise 3^3 conv + bias + residual.

    Args:
      x: [B, T, H, W, C] token video.
      w: [27, C] taps, row order (dt, dh, dw) row-major (the DHWIO kernel
         reshaped: w_dhwio.reshape(27, C)).
      b: [C] bias.
    Returns [B, T, H, W, C], same dtype as x.
    """
    return _forward_impl(x, w, b, causal=causal, interpret=interpret)


def _peg_fwd(x, w, b, causal, interpret):
    return _forward_impl(x, w, b, causal=causal, interpret=interpret), (x, w, b)


def _peg_bwd(causal, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _xla_reference(x_, w_, b_, causal),
                     x, w, b)
    return vjp(g)


peg_fused.defvjp(_peg_fwd, _peg_bwd)


def _pick_tb(t: int, itemsize: int) -> int:
    """Largest T-block (<= 8 for bf16, <= 4 for wider dtypes) dividing T."""
    cap = 8 if itemsize <= 2 else 4
    for tb in range(cap, 0, -1):
        if t % tb == 0:
            return tb
    return 1


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def _forward_impl(x, w, b, *, causal, interpret):
    bsz, t, h, wd, c = x.shape
    tb = _pick_tb(t, x.dtype.itemsize)
    off = 2 if causal else 1

    w27 = w.astype(jnp.float32)                    # [27, c]
    b2 = b.astype(jnp.float32).reshape(1, c)

    def frame_spec(i):
        return pl.BlockSpec(
            (1, 1, h, wd, c),
            lambda bi, j, i=i: (bi, jnp.clip(j * tb + i - off, 0, t - 1),
                                0, 0, 0),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=wd, tb=tb, causal=causal,
                          t_total=t),
        grid=(bsz, t // tb),
        in_specs=[frame_spec(i) for i in range(tb + 2)] + [
            pl.BlockSpec((27, c), lambda bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, h, wd, c),
                               lambda bi, j: (bi, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, h, wd, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * bsz * t * h * wd * c,
            bytes_accessed=x.size * x.dtype.itemsize
            * (2 + (tb + 2) // tb),
            transcendentals=0),
        # fp32 attribution paths (and their vmapped IG variants) push the
        # per-block working set past the 16 MB default scoped-vmem budget;
        # v5e has 128 MB of VMEM, so give the stencil room
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*([x] * (tb + 2)), w27, b2)
