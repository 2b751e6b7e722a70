"""Sequence-parallel CT-ViT spatial encoder (beyond-parity extension).

The reference bounds its 13,824-token volume sequence architecturally
(factorized 576-token spatial x 24-token temporal attention, ctvit.py:93-101)
and has no sequence parallelism at all; SURVEY.md section 5 marks SP over the
token axis as an optional extension. This module distributes the QUADRATIC
stage — the spatial transformer, whose [n, n] attention scores and
[heads, n, n] continuous-position-bias table are what outgrow a single core
as the spatial grid scales (image_size 960 -> n = 2304 means 16x the score
memory of flagship) — over a mesh axis:

  * the token-grid H axis shards over the mesh axis; every spatial-attention
    layer runs ring attention (parallel/ring_attention.py: kv blocks rotate
    with ppermute, online-softmax accumulation, O(n_loc^2) peak scores);
  * each device builds only its own CPB ROW STRIPE
    (ops/posbias.continuous_pos_bias_stripe) — the full [heads, n, n] table
    is never materialized;
  * PEG's depthwise 3^3 conv needs one grid row from each neighbor: a
    two-ppermute HALO EXCHANGE with zero rows at the global boundary
    (matching XLA's zero padding in the dense path, ops/layers.peg_residual);
  * feed-forward / LayerNorm are token-local.

The TEMPORAL stage stays replicated: the reference applies PEG inside the
temporal transformer through a bit-level reshape of the ((b h w), t, d)
buffer into video form (parity quirk, ops/layers.peg docstring), which makes
that conv non-local in h — and the temporal stage's memory is linear in n,
so there is nothing quadratic to shard. `encode_image_latents_sp` therefore
all-gathers the spatial output across the axis and finishes with the
standard temporal + VQ + pooling path on every device (identical replicated
values).

Validated for agreement with the dense encoder on the virtual CPU mesh
(tests/test_sp_encoder.py), forward and gradients.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig, CTViTConfig
from ..ops.layers import feedforward, layernorm, linear
from ..ops.posbias import continuous_pos_bias_stripe
from .ring_attention import ring_cosine_attention

Array = jax.Array


def peg_residual_halo(params, v: Array, axis_name: str,
                      causal: bool = True) -> Array:
    """peg(x) + x with the token-grid H axis sharded over `axis_name`.

    `v` is video-form [b, t, h_loc, w, d]. The depthwise 3^3 conv's h
    receptive field crosses the shard boundary by exactly one grid row each
    way, so the halo is one ppermute per direction; boundary devices
    substitute zero rows, reproducing the dense path's ((1,1)) zero padding
    (ops/layers._peg_conv_residual_impl)."""
    k = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    dim = v.shape[-1]

    up = jax.lax.ppermute(v[:, :, -1:], axis_name,
                          [(j, (j + 1) % k) for j in range(k)])  # from idx-1
    dn = jax.lax.ppermute(v[:, :, :1], axis_name,
                          [(j, (j - 1) % k) for j in range(k)])  # from idx+1
    up = jnp.where(idx == 0, jnp.zeros_like(up), up)
    dn = jnp.where(idx == k - 1, jnp.zeros_like(dn), dn)
    vh = jnp.concatenate([up, v, dn], axis=2)       # [b, t, h_loc+2, w, d]

    frame_pad = (2, 0) if causal else (1, 1)
    out = jax.lax.conv_general_dilated(
        vh, params["w"].astype(v.dtype),
        window_strides=(1, 1, 1),
        padding=(frame_pad, (0, 0), (1, 1)),        # h: VALID over the halo
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=dim)
    out = out.astype(jnp.float32) + params["b"] + v.astype(jnp.float32)
    return out.astype(v.dtype)


def ctvit_spatial_sp(vt_params, cfg: CTViTConfig, tokens: Array,
                     axis_name: str) -> Array:
    """The CT-ViT spatial transformer stack, sequence-parallel over the grid
    H axis (call INSIDE shard_map).

    Args:
      vt_params: the visual_transformer params subtree.
      tokens: [b, t, h_loc, w, d] local token-grid block.
    Returns the post-final-LN spatial output block [b, t, h_loc, w, d] —
    the same rows the dense stack produces (models/ctvit.ctvit_encode)."""
    tcfg = cfg.spatial_transformer()
    assert tcfg.attn_dropout == 0.0 and tcfg.ff_dropout == 0.0, \
        "SP spatial stack is deterministic: dropout is not implemented " \
        "(the dense stack would apply it; refusing to drop it silently)"
    b, t, h_loc, w, d = tokens.shape
    idx = jax.lax.axis_index(axis_name)

    bias = continuous_pos_bias_stripe(
        vt_params["spatial_rel_pos_bias"], cfg.patch_height, cfg.patch_width,
        idx * h_loc, h_loc)                          # [heads, n_loc, n]

    x = tokens
    for layer in vt_params["spatial"]["layers"]:
        if tcfg.peg:
            x = peg_residual_halo(layer["peg"], x, axis_name,
                                  causal=tcfg.peg_causal)
        xf = x.reshape(b * t, h_loc * w, d)
        xf = ring_cosine_attention(layer["self_attn"], tcfg.self_attn(), xf,
                                   axis_name, attn_bias=bias, residual=True)
        xf = feedforward(layer["ff"], xf, residual=True)
        x = xf.reshape(b, t, h_loc, w, d)
    return layernorm(vt_params["spatial"]["norm_out"], x)


def _auto_block(h: int, w: int, cap: int = 512) -> int:
    """Largest whole-grid-row key block <= cap: `rows * w` where `rows` is
    the largest divisor of h with rows * w <= cap (falls back to one row).
    Keeps the default usable for ANY grid — a fixed 512 satisfies the
    divisibility constraints for almost no CT grid (flagship w=24,
    image_size-960 w=48)."""
    rows = 1
    for r in range(1, h + 1):
        if h % r == 0 and r * w <= cap:
            rows = r
    return rows * w


def ctvit_spatial_blockwise(vt_params, cfg: CTViTConfig, tokens: Array,
                            block: Optional[int] = None) -> Array:
    """Single-chip analogue of `ctvit_spatial_sp` for volumes whose spatial
    grid outgrows the dense path's O(n^2) scores/bias on ONE chip: the
    spatial stack with blockwise online-softmax attention
    (ops/attention_blockwise.py) and CPB COLUMN stripes streamed per key
    block — the [heads, n, n] bias table never exists. [b, t, h, w, d]
    tokens -> post-final-LN spatial output, numerically matching the dense
    stack."""
    from ..ops.attention_blockwise import blockwise_cosine_attention
    from ..ops.layers import peg_residual
    from ..ops.posbias import (continuous_pos_bias_col_stripe,
                               cpb_offset_table)

    tcfg = cfg.spatial_transformer()
    assert tcfg.attn_dropout == 0.0 and tcfg.ff_dropout == 0.0, \
        "blockwise spatial stack is deterministic: dropout not implemented"
    b, t, h, w, d = tokens.shape
    if block is None:
        block = _auto_block(h, w)
    assert block % w == 0 and (h * w) % block == 0, (block, h, w)
    # MLP over the distinct offsets once; key blocks pay only the selection
    cpb_table = cpb_offset_table(vt_params["spatial_rel_pos_bias"], (h, w))

    def bias_fn(col0):
        return continuous_pos_bias_col_stripe(
            None, h, w, col0 // w, block // w, table=cpb_table)

    x = tokens.reshape(b * t, h * w, d)
    for layer in vt_params["spatial"]["layers"]:
        if tcfg.peg:
            x = peg_residual(layer["peg"], x, (b, t, h, w),
                             causal=tcfg.peg_causal)
        x = blockwise_cosine_attention(layer["self_attn"], tcfg.self_attn(),
                                       x, block=block, bias_fn=bias_fn,
                                       residual=True)
        x = feedforward(layer["ff"], x, residual=True)
    x = layernorm(vt_params["spatial"]["norm_out"], x)
    return x.reshape(b, t, h, w, d)


def encode_image_latents_blockwise(params, cfg: CTCLIPConfig, image: Array,
                                   block: Optional[int] = None) -> Array:
    """Image-tower latents with the blockwise spatial stage — the
    single-chip long-context path ([b, 1, T, H, W] -> [b, dim_latent],
    numerically matching models/ctclip.encode_image_latents)."""
    from ..models.ctclip import encode_image_latents_from_spatial_out
    from ..models.ctvit import _patch_embed, patchify

    tokens = _patch_embed(params["visual_transformer"]["to_patch_emb"],
                          patchify(image, cfg.ctvit.patch_size,
                                   cfg.ctvit.temporal_patch_size))
    sp_out = ctvit_spatial_blockwise(params["visual_transformer"], cfg.ctvit,
                                     tokens, block)
    return encode_image_latents_from_spatial_out(params, cfg, sp_out,
                                                 freeze_vq=True)


def _encode_sp_device(params, image: Array, *, cfg: CTCLIPConfig,
                      axis_name: str) -> Array:
    """Per-device body of encode_image_latents_sp."""
    from ..models.ctclip import encode_image_latents_from_spatial_out
    from ..models.ctvit import _patch_embed, patchify

    # patch embed is strictly per-patch -> local on the H shard
    tokens = _patch_embed(params["visual_transformer"]["to_patch_emb"],
                          patchify(image, cfg.ctvit.patch_size,
                                   cfg.ctvit.temporal_patch_size))
    sp_out = ctvit_spatial_sp(params["visual_transformer"], cfg.ctvit,
                              tokens, axis_name)
    # temporal + VQ + pooling on the gathered grid (linear in n; the
    # temporal PEG's bit-level reshape is non-local in h — module notes)
    full = jax.lax.all_gather(sp_out, axis_name, axis=2, tiled=True)
    return encode_image_latents_from_spatial_out(params, cfg, full,
                                                 freeze_vq=True)


@functools.lru_cache(maxsize=None)
def _encode_sp_jitted(cfg: CTCLIPConfig, mesh, axis_name: str):
    """Jitted shard_map encoder, cached per (cfg, mesh, axis) so repeated
    per-volume calls reuse one compiled program instead of re-tracing."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        partial(_encode_sp_device, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, None, None, axis_name, None)),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fn)


def encode_image_latents_sp(params, cfg: CTCLIPConfig, image: Array, mesh,
                            axis_name: str = "model") -> Array:
    """Image-tower latents with the spatial stage sequence-parallel over
    `mesh`'s `axis_name`: [b, 1, T, H, W] volume (replicated or sharded on
    H) -> [b, dim_latent] replicated latents, numerically matching
    models/ctclip.encode_image_latents."""
    return _encode_sp_jitted(cfg, mesh, axis_name)(params, image)
