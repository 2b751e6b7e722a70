"""NN primitives: layer norms, GEGLU feed-forward, PEG depthwise conv.

Re-designed functionally for TPU/XLA (pure functions over param pytrees);
behavior matches reference src/utils/attention.py:27-83.

Conventions:
  * linear weights are stored (in_features, out_features) and applied x @ w
    (the torch->jax converter transposes);
  * normalization / softmax run in fp32 regardless of compute dtype;
  * dropout takes an explicit PRNG key and a `deterministic` flag.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# initializers (torch nn.Linear / nn.Conv3d default: kaiming-uniform fan_in)
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, dim_in: int, dim_out: int, bias: bool = False):
    wkey, bkey = jax.random.split(key)
    p = {"w": _kaiming_uniform(wkey, (dim_in, dim_out), fan_in=dim_in)}
    if bias:
        bound = 1.0 / math.sqrt(dim_in)
        p["b"] = jax.random.uniform(bkey, (dim_out,), jnp.float32, -bound, bound)
    return p


def linear(params, x: Array) -> Array:
    y = x @ params["w"].astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# layer norms
# ---------------------------------------------------------------------------

def init_layernorm(dim: int, bias: bool = True):
    """bias=False gives the bias-frozen LayerNorm of reference attention.py:27-34
    (gamma learned, beta fixed zero); bias=True is torch nn.LayerNorm."""
    p = {"gamma": jnp.ones((dim,), jnp.float32)}
    if bias:
        p["beta"] = jnp.zeros((dim,), jnp.float32)
    return p


def layernorm(params, x: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the last axis, computed in fp32 (torch F.layer_norm
    semantics, eps 1e-5).

    bf16 inputs take a fused-moment path: means accumulate in fp32 via the
    reduce's accumulator (dtype=) and the normalize is ONE elementwise
    expression, so XLA never materializes an fp32 copy of x — the generic
    x.astype(f32)-first form costs a separate 3.3 ms convert of the
    [221k, 512] token grid per stack at flagship B=16 (profiled round 3).
    The E[x^2]-E[x]^2 variance form matches what the fused Pallas kernels
    already use in-VMEM; fp32 inputs keep the original two-pass jnp.var
    path bit-for-bit (the CPU parity oracle)."""
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(jnp.square(x), axis=-1, keepdims=True,
                         dtype=jnp.float32)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
        y = y * params["gamma"]
        if "beta" in params:
            y = y + params["beta"]
        return y.astype(orig_dtype)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["gamma"]
    if "beta" in params:
        y = y + params["beta"]
    return y.astype(orig_dtype)


def l2norm(t: Array, eps: float = 1e-12) -> Array:
    """torch F.normalize(dim=-1) semantics: x / max(||x||, eps).

    bf16 inputs accumulate the square-sum in fp32 via the reduce (no
    materialized fp32 copy of t — see layernorm); fp32 keeps the original
    jnp.linalg.norm path bit-for-bit."""
    if t.dtype == jnp.bfloat16:
        ss = jnp.sum(jnp.square(t), axis=-1, keepdims=True,
                     dtype=jnp.float32)
        out = t.astype(jnp.float32) * (1.0 / jnp.maximum(jnp.sqrt(ss), eps))
        return out.astype(t.dtype)
    n = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
    out = t.astype(jnp.float32) / jnp.maximum(n, eps)
    return out.astype(t.dtype)


def dropout(key, x: Array, rate: float, deterministic: bool) -> Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# GEGLU feed-forward (reference attention.py:38-51)
# ---------------------------------------------------------------------------

def init_feedforward(key, dim: int, inner_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        # first LN is a standard torch nn.LayerNorm (learned bias),
        # reference attention.py:46
        "norm": init_layernorm(dim, bias=True),
        "proj_in": init_linear(k1, dim, inner_dim * 2, bias=False),
        "proj_out": init_linear(k2, inner_dim, dim, bias=False),
    }


def feedforward(params, x: Array, *, dropout_rate: float = 0.0,
                rng: Optional[Array] = None, deterministic: bool = True,
                use_pallas: Optional[bool] = None,
                residual: bool = False) -> Array:
    """LN -> Linear(dim, 2*inner) -> GEGLU -> (dropout) -> Linear(inner, dim).

    GEGLU splits the doubled projection into (value, gate) halves and returns
    gelu(gate) * value — exact (erf) gelu, matching torch F.gelu
    (reference attention.py:38-41). On TPU (no dropout) the whole block runs
    as one fused Pallas kernel (ops/pallas_ff.py).

    A W8A8-quantized param dict (ops/quant.quantize_ff_params — leaf names
    wv_q/wg_q/w2_q) routes through the serving-only int8 kernel instead
    (ops/pallas_ff_int8.py): 2x less FF weight memory, forward-only,
    ~0.5 % block-output error — never produced by init_feedforward or the
    converters, only by an explicit quantize_ctclip_ff call."""
    if "wv_q" in params:
        assert deterministic or dropout_rate == 0.0, \
            "the int8 FF path is serving-only (no dropout)"
        from .pallas_ff_int8 import geglu_ff_int8, xla_int8_reference
        b, n, d = x.shape
        flat = x.reshape(b * n, d)
        args = (params["norm"]["gamma"], params["norm"]["beta"],
                params["wv_q"], params["wg_q"], params["w2_q"],
                params["sv"], params["sg"], params["s2"])
        if jax.default_backend() == "tpu":
            out = geglu_ff_int8(flat, *args, False, residual)
        else:
            out = xla_int8_reference(flat, *args, residual=residual)
        return out.reshape(b, n, d)
    if use_pallas is None:
        import jax as _jax
        use_pallas = ((deterministic or dropout_rate == 0.0)
                      and _jax.default_backend() == "tpu" and x.ndim == 3)
    if use_pallas:
        from .pallas_ff import geglu_ff_fused
        b, n, d = x.shape
        w = params["proj_in"]["w"]
        inner = w.shape[1] // 2
        out = geglu_ff_fused(
            x.reshape(b * n, d),
            params["norm"]["gamma"], params["norm"]["beta"],
            w[:, :inner].astype(x.dtype), w[:, inner:].astype(x.dtype),
            params["proj_out"]["w"].astype(x.dtype), False, residual)
        return out.reshape(b, n, d)

    h = layernorm(params["norm"], x)
    h = linear(params["proj_in"], h)
    value, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype) * value
    if not deterministic and dropout_rate > 0.0:
        h = dropout(rng, h, dropout_rate, deterministic=False)
    out = linear(params["proj_out"], h)
    return out + x if residual else out


# ---------------------------------------------------------------------------
# PEG — positional encoding generator (reference attention.py:55-83)
# ---------------------------------------------------------------------------

def init_peg(key, dim: int):
    # depthwise Conv3d(dim, dim, kernel 3, groups=dim), torch default bias=True.
    # kernel stored DHWIO with I=1 (feature_group_count=dim).
    wkey, bkey = jax.random.split(key)
    fan_in = 1 * 3 * 3 * 3
    return {
        "w": _kaiming_uniform(wkey, (3, 3, 3, 1, dim), fan_in=fan_in),
        "b": jax.random.uniform(bkey, (dim,), jnp.float32,
                                -1.0 / math.sqrt(fan_in), 1.0 / math.sqrt(fan_in)),
    }


def peg(params, x: Array, video_shape: Tuple[int, int, int, int],
        causal: bool = True) -> Array:
    """Depthwise 3D conv positional encoding, conv-only (residual added by
    the caller, matching the torch module: reference attention.py:55-83,
    323). On TPU prefer `peg_residual`, which fuses conv+bias+residual into
    one Pallas HBM pass.

    `x` is (B, N, D) token-major; it is raw-reshaped to video_shape + (dim,)
    exactly like the reference (attention.py:66-69) — note that for the
    temporal transformer this is an intentional bit-level reshape of the
    ((b h w), t, d) layout, reproduced for parity.

    Frame (depth) padding is (2, 0) when causal else (1, 1); spatial padding
    is (1, 1) on both axes (reference attention.py:73-75).
    """
    orig_shape = x.shape
    b, t, h, w = video_shape
    v = x.reshape(b, t, h, w, x.shape[-1])  # NDHWC
    dim = v.shape[-1]

    frame_pad = (2, 0) if causal else (1, 1)
    # compute in the input dtype with fp32 accumulation (the reference runs
    # this conv under fp16 autocast; bf16 here is >= that precision)
    out = jax.lax.conv_general_dilated(
        v,
        params["w"].astype(v.dtype),
        window_strides=(1, 1, 1),
        padding=(frame_pad, (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=dim,
    )
    out = out.astype(jnp.float32) + params["b"]
    return out.astype(x.dtype).reshape(orig_shape)


def _peg_conv_residual_impl(v, w, b, causal):
    """Depthwise 3^3 conv + bias + residual in VIDEO form [b,t,h,w,c], so
    XLA fuses bias + residual + convert into the conv's epilogue fusion:
    `peg(x) + x` adds after the reshape back to token form, and the
    reshape/convert barrier left a separate full-HBM add pass (~1 ms/layer
    at flagship B=16)."""
    dim = v.shape[-1]
    frame_pad = (2, 0) if causal else (1, 1)
    out = jax.lax.conv_general_dilated(
        v, w.astype(v.dtype),
        window_strides=(1, 1, 1),
        padding=(frame_pad, (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=dim,
    )
    out = out.astype(jnp.float32) + b + v.astype(jnp.float32)
    return out.astype(v.dtype)


def _peg_weight_grads_taps(v, g, causal: bool):
    """Grouped-conv weight grad as 27 shifted multiply-reduces over the
    padded input — only slice/multiply/reduce primitives, which the GSPMD
    partitioner handles correctly.

    This exists because XLA autodiff's weight grad for a
    feature_group_count>1 conv is WRONG under GSPMD on a multi-axis mesh
    (jax 0.9.0): the replicated kernel's gradient comes back multiplied by
    the size of every mesh axis the conv is not partitioned over (measured:
    exactly 2x on a ("data","model")=(4,2) mesh, 4x on (2,4), 1x on a flat
    8-device mesh; dense fgc=1 convs unaffected). Repro: grad of
    sum(conv(v, w, feature_group_count=C)**2) with v sharded P("data") and
    w replicated. The reference never hits this (torch DDP has no
    partitioner); our TP mesh does, so the PEG backward must not leave a
    grouped conv in the autodiff graph."""
    b, t, h, w, c = v.shape
    frame_pad = (2, 0) if causal else (1, 1)
    vp = jnp.pad(v.astype(jnp.float32),
                 ((0, 0), frame_pad, (1, 1), (1, 1), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for dt in range(3):
        for dh in range(3):
            for dx in range(3):
                sl = jax.lax.slice(
                    vp, (0, dt, dh, dx, 0), (b, dt + t, dh + h, dx + w, c))
                taps.append((sl * gf).sum(axis=(0, 1, 2, 3)))
    dw = jnp.stack(taps).reshape(3, 3, 3, 1, c)
    db = gf.sum(axis=(0, 1, 2, 3))
    return dw, db


@functools.lru_cache(maxsize=None)
def _peg_conv_residual(causal: bool):
    """custom-VJP peg+residual: explicit flipped-tap depthwise conv for the
    input grad (a plain forward grouped conv — safe under GSPMD), and a
    weight grad with NO grouped conv in the graph — the Pallas
    tap-accumulator (ops/pallas_peg_bwd.py) on TPU, `_peg_weight_grads_taps`
    elsewhere. This is the DEFAULT backward: XLA autodiff of the grouped
    conv mis-scales the weight grad on multi-axis meshes (see
    `_peg_weight_grads_taps`). Cost on a single chip: the Pallas weight grad
    measures 4.96 ms/layer vs 3.70 ms for XLA autodiff at flagship B=8
    ([8,24,24,24,512] bf16, v5e) — ~1.3 ms/layer paid for mesh-safe
    gradients (set CTCLIP_PEG_BWD=autodiff to claw it back on runs that
    will NEVER see a model axis)."""

    @jax.custom_vjp
    def f(v, w, b):
        return _peg_conv_residual_impl(v, w, b, causal)

    def fwd(v, w, b):
        return f(v, w, b), (v, w, b)

    def bwd(res, g):
        v, w, b = res
        dim = v.shape[-1]
        wf = w[::-1, ::-1, ::-1]
        frame_pad = (0, 2) if causal else (1, 1)
        gv = g.astype(v.dtype)
        dv = jax.lax.conv_general_dilated(
            gv, wf.astype(v.dtype),
            window_strides=(1, 1, 1),
            padding=(frame_pad, (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=dim,
        )
        dv = (dv.astype(jnp.float32) + g.astype(jnp.float32)).astype(v.dtype)
        # Pallas dkw only when nothing can partition it: a bare pallas_call
        # under GSPMD on a multi-device mesh would be force-replicated (or
        # fail to partition) — exactly the configuration this custom VJP
        # exists to make safe. Multi-device runs use the taps formulation,
        # which is built from partitionable primitives.
        if (jax.default_backend() == "tpu" and dim % 128 == 0
                and jax.device_count() == 1):
            from .pallas_peg_bwd import peg_weight_grads
            dw, db = peg_weight_grads(v, gv, causal=causal)
        else:
            dw, db = _peg_weight_grads_taps(v, g, causal)
        return dv, dw.astype(w.dtype), db.astype(b.dtype)

    f.defvjp(fwd, bwd)
    return f


def peg_residual(params, x: Array, video_shape: Tuple[int, int, int, int],
                 causal: bool = True,
                 use_pallas: Optional[bool] = None) -> Array:
    """peg(x) + x. XLA conv formulation forward (2.65 ms/apply at flagship
    B=16 vs 6.3 ms for the fused Pallas stencil, ops/pallas_peg.py — a
    recorded negative result, opt-in via use_pallas); custom-VJP backward
    (_peg_conv_residual) because XLA autodiff of a grouped conv mis-scales
    the weight grad under GSPMD on multi-axis meshes (see
    _peg_weight_grads_taps). CTCLIP_PEG_BWD=autodiff restores plain autodiff
    (3.70 vs 4.96 ms/layer-bwd on v5e) — ONLY safe when no ("data","model")
    mesh will ever see this program."""
    b, t, h, w = video_shape
    dim = x.shape[-1]
    if use_pallas is None:
        use_pallas = False
    if not (use_pallas and jax.default_backend() == "tpu"
            and dim % 128 == 0 and h >= 3 and w >= 3):
        orig_shape = x.shape
        v = x.reshape(b, t, h, w, dim)
        # backward selection: the GSPMD mis-scale needs a mesh axis the conv
        # is not partitioned over, so a single-device process can never hit
        # it — take the faster plain autodiff there (3.70 vs 4.96 ms/layer)
        # unless the env pins a choice. Any multi-device run (real or
        # virtual) defaults to the mesh-safe custom VJP.
        mode = os.environ.get("CTCLIP_PEG_BWD")
        if mode is None:
            mode = "autodiff" if jax.device_count() == 1 else "safe"
        if mode == "autodiff":
            out = _peg_conv_residual_impl(v, params["w"], params["b"], causal)
        else:
            out = _peg_conv_residual(causal)(v, params["w"], params["b"])
        return out.reshape(orig_shape)

    from .pallas_peg import peg_fused
    v = x.reshape(b, t, h, w, dim)
    out = peg_fused(v, params["w"].reshape(27, dim), params["b"], causal)
    return out.reshape(x.shape)
