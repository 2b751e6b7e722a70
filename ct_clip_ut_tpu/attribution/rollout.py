"""Attention rollout (identity-augmented, row-normalized attention products).

Reference: src/utils/visualizations.py:707-849. Two products are produced:

  * spatial: each depth slice of each spatial layer is treated as a one-layer
    rollout (reference visualizations.py:800-813) — for L layers that yields
    an [L*D, h, w] stack, min-max normalized as one volume and trilinear-
    upsampled to the scan shape;
  * temporal: per spatial token, a true multi-layer rollout over that token's
    [heads, t, t] attention across all temporal layers, summed over queries
    (reference visualizations.py:819-841), reshaped (h, w, t) -> (t, h, w).

TPU re-design: the reference loops 4x24 spatial slices and 576 tokens in
Python; here both are single vmapped einsum chains.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from .capture import minmax, score_and_weights

Array = jax.Array


def rollout_matrix(attn_layers: Array, head_fusion: str = "mean",
                   discard_ratio: float = 0.0, use_residual: bool = True) -> Array:
    """Rollout over stacked layers [L, heads, N, N] -> [N, N]
    (reference attention_rollout, visualizations.py:707-743)."""
    if head_fusion == "mean":
        fused = attn_layers.mean(axis=1)
    elif head_fusion == "max":
        fused = attn_layers.max(axis=1)
    else:
        raise ValueError(f"unsupported head_fusion: {head_fusion}")

    n = fused.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)

    def step(result, attn):
        attn = attn.astype(jnp.float32)
        if discard_ratio > 0.0:
            k = int(n * n * (1.0 - discard_ratio))
            flat = attn.reshape(n, -1)
            thresh = jax.lax.top_k(flat, k)[0].min(axis=1, keepdims=True)
            attn = jnp.where(attn >= thresh, attn, 0.0)
        attn = attn / (attn.sum(axis=-1, keepdims=True) + 1e-8)
        if use_residual:
            attn = attn + eye
            attn = attn / attn.sum(axis=-1, keepdims=True)
        return attn @ result, None

    result, _ = jax.lax.scan(step, eye, fused)
    return result


@partial(jax.jit, static_argnames=("cfg",))
def rollout_volumes(params, cfg: CTCLIPConfig, text_tokens, image: Array
                    ) -> Tuple[Array, Array]:
    """Returns (spatial [L*D, h, w] pre-upsample stack, temporal [t, h, w]),
    both min-max normalized (reference visualizations.py:813-814, 836-839)."""
    h, w = cfg.ctvit.patch_height, cfg.ctvit.patch_width
    _, spatial, temporal = score_and_weights(params, cfg, text_tokens, image)

    # ---- spatial: one-layer rollout per (layer, depth) slice -------------
    sp = jnp.stack(spatial)                       # [L, D, heads, hw, hw]
    L, D = sp.shape[0], sp.shape[1]
    slices = sp.reshape(L * D, 1, sp.shape[2], sp.shape[3], sp.shape[4])
    per_slice = jax.vmap(rollout_matrix)(slices)  # [L*D, hw, hw]
    spatial_vol = per_slice.sum(axis=1).reshape(L * D, h, w)  # sum over queries
    spatial_vol = minmax(spatial_vol)

    # ---- temporal: multi-layer rollout per spatial token ------------------
    tm = jnp.stack(temporal)                      # [L, hw, heads, t, t]
    per_token = tm.transpose(1, 0, 2, 3, 4)       # [hw, L, heads, t, t]
    rolled = jax.vmap(rollout_matrix)(per_token)  # [hw, t, t]
    token_importance = rolled.sum(axis=1)         # [hw, t] (sum over queries)
    t = token_importance.shape[-1]
    temporal_vol = token_importance.reshape(h, w, t).transpose(2, 0, 1)
    temporal_vol = minmax(temporal_vol)

    return spatial_vol, temporal_vol


def rollout_maps(params, cfg: CTCLIPConfig, text_tokens, image: Array):
    """Full-resolution saliency maps [D, H, W] (pre-rot90) as HOST numpy
    arrays, matching the reference's upsampled outputs
    (visualizations.py:815-816, 840-841). Only the grid-resolution volumes
    (~230 KB) cross the device->host link; the trilinear expansion to the
    ~221 MB scan shape runs on the host (capture.upsample_to_host, a
    <=1e-5 twin of the device resize) — pulling the expanded maps through
    the link costs ~10 s/map on relay-attached TPUs."""
    import numpy as np

    from .capture import upsample_to_host
    target = image.shape[-3:]
    spatial_vol, temporal_vol = rollout_volumes(params, cfg, text_tokens, image)
    return (upsample_to_host(np.asarray(spatial_vol), target),
            upsample_to_host(np.asarray(temporal_vol), target))


def rollout_maps_pipelined(params, cfg: CTCLIPConfig, items):
    """Rollout map pairs for a sequence of (text_tokens, image) items with
    device/host overlap: scan k's fetch + host expansion (the two ~221 MB
    trilinear upsamples) runs while scan k+1's rollout computes on device —
    JAX dispatch is async, so sustained cost per pair is
    max(device compute, host transport+expansion) instead of their sum
    (the integrated_gradients_pipelined pattern). Yields (spatial,
    temporal) [D, H, W] numpy pairs in item order."""
    import numpy as np

    from .capture import upsample_to_host

    def expand(entry):
        target, sp, tm = entry
        return (upsample_to_host(np.asarray(sp), target),
                upsample_to_host(np.asarray(tm), target))

    pending = []
    for text_tokens, image in items:
        sp, tm = rollout_volumes(params, cfg, text_tokens, image)
        pending.append((image.shape[-3:], sp, tm))
        if len(pending) > 1:
            yield expand(pending.pop(0))
    for entry in pending:
        yield expand(entry)
