"""Raw attention maps: per-layer, per-head received-attention volumes.

Reference: src/utils/visualizations.py:570-704. For each spatial layer the
weights are [b*t, heads, hw, hw]; averaging over the query axis gives the
attention each key token receives, reshaped to a [D, H, W] grid. Temporal
weights [b*h*w, heads, t, t] average to [hw, t], reshaped to (H, W, D) and
permuted to depth-first. Each head/layer volume is shift-max normalized and
(host-side) rotated like the reference GIF grid.

No backward pass is needed — the reference runs one (visualizations.py:581)
but never uses the gradients for this method.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CTCLIPConfig
from .capture import score_and_weights, shiftmax

Array = jax.Array


def spatial_received_volumes(attn: Array, h: int, w: int) -> Array:
    """[D, heads, hw, hw] -> [heads, D, h, w] received-attention volumes,
    shift-max normalized per head (reference visualizations.py:662-677)."""
    d = attn.shape[0]
    received = attn.mean(axis=2)                # mean over queries -> [D, heads, hw]
    vol = received.transpose(1, 0, 2).reshape(-1, d, h, w)
    return jax.vmap(shiftmax)(vol)


def temporal_received_volumes(attn: Array, h: int, w: int) -> Array:
    """[hw, heads, t, t] -> [heads, t, h, w] (reference visualizations.py:668-672:
    view(H, W, D) then permute(2, 0, 1))."""
    t = attn.shape[-1]
    received = attn.mean(axis=2)                # [hw, heads, t]
    vol = received.transpose(1, 0, 2).reshape(-1, h, w, t)
    vol = vol.transpose(0, 3, 1, 2)
    return jax.vmap(shiftmax)(vol)


@partial(jax.jit, static_argnames=("cfg",))
def raw_attention_maps(params, cfg: CTCLIPConfig, text_tokens, image: Array
                       ) -> Tuple[Array, Array]:
    """Returns (spatial [layers, heads, D, h, w], temporal [layers, heads, t, h, w])."""
    h, w = cfg.ctvit.patch_height, cfg.ctvit.patch_width
    _, spatial, temporal = score_and_weights(params, cfg, text_tokens, image)
    sp = jnp.stack([spatial_received_volumes(a, h, w) for a in spatial])
    tm = jnp.stack([temporal_received_volumes(a, h, w) for a in temporal])
    return sp, tm


def raw_attention_maps_np(params, cfg, text_tokens, image):
    """Host-side variant with the reference's rot90 applied per volume
    (reference visualizations.py:676), ready for GIF rendering:
    [layers, heads, D, h, w] with axes (h, w) rotated."""
    sp, tm = raw_attention_maps(params, cfg, text_tokens, image)
    sp, tm = np.asarray(sp), np.asarray(tm)
    # reference rotates with axes=(0, 1) on each [D, H, W] volume's (D, H)...
    # no: vol is [D, h, w]; np.rot90(vol, k=-1, axes=(0, 1)) rotates (D, h).
    sp = np.rot90(sp, k=-1, axes=(2, 3))
    tm = np.rot90(tm, k=-1, axes=(2, 3))
    return sp, tm
