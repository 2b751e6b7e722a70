"""Grad-CAM over CT-ViT intermediates: six CAM variants.

Reference: src/utils/visualizations.py:913-1026. From one scored forward +
backward, the reference hooks capture spatial/temporal self-attention
outputs, feed-forward outputs, and the VQ features, with gradients w.r.t.
the per-sample similarity score. Each CAM is
relu(sum_c feats_c * mean-grad_c) on the 24^3 token grid (temporal layouts
permuted depth-first), shift-max normalized; the combined map is
sqrt(spatial * temporal + 1e-8).

Gradient pairing: the reference indexes features[-1] and gradients[-1]
(visualizations.py:929-934, 954-959) — but features append in FORWARD order
while register_hook gradients fire in BACKWARD order, so features[-1] is the
LAST layer and gradients[-1] is the FIRST layer's gradient. `pairing =
"reference"` (default) reproduces that exactly for output parity;
`pairing = "aligned"` is the intent (last-layer features with their own
gradients).

Here the hooks are tap points and all six CAMs come out of ONE
jax.value_and_grad pass (capture.score_captures_and_grads).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from .capture import score_captures_and_grads, shiftmax

Array = jax.Array


def _cam(features: Array, grads: Array) -> Array:
    """relu(sum_c feats * mean-grad_c), channel weights averaged over all
    token axes (reference visualizations.py:933-938)."""
    weights = grads.mean(axis=(0, 1))                    # [channels]
    return jax.nn.relu((features * weights).sum(axis=-1))


@partial(jax.jit, static_argnames=("cfg", "pairing"))
def grad_cam_volumes(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                     *, text_embeds: Optional[Array] = None,
                     pairing: str = "reference") -> Dict[str, Array]:
    """Six token-grid CAM volumes, each [t, h, w] shift-max normalized:
    spatial, temporal, spatial_ff, temporal_ff, combined, vq."""
    vit = cfg.ctvit
    h, w = vit.patch_height, vit.patch_width
    last_sp, last_tm = vit.spatial_depth - 1, vit.temporal_depth - 1
    # backward-order quirk: gradients[-1] belongs to layer 0
    gsp, gtm = (0, 0) if pairing == "reference" else (last_sp, last_tm)

    names = {f"spatial.{last_sp}.attn_out", f"temporal.{last_tm}.attn_out",
             f"spatial.{last_sp}.ff_out", f"temporal.{last_tm}.ff_out",
             f"spatial.{gsp}.attn_out", f"temporal.{gtm}.attn_out",
             f"spatial.{gsp}.ff_out", f"temporal.{gtm}.ff_out",
             "vq.features"}
    _, feats, grads = score_captures_and_grads(
        params, cfg, text_tokens, image, sorted(names),
        text_embeds=text_embeds)

    # spatial blocks are [(b t), hw, d]; batch-1 => leading dim == t
    t = feats[f"spatial.{last_sp}.attn_out"].shape[0]

    def spatial_cam(f_key, g_key):
        cam = _cam(feats[f_key], grads[g_key])           # [t, hw]
        return shiftmax(cam.reshape(t, h, w))

    def temporal_cam(f_key, g_key):
        cam = _cam(feats[f_key], grads[g_key])           # [hw, t]
        return shiftmax(cam.reshape(h, w, t).transpose(2, 0, 1))

    sp = spatial_cam(f"spatial.{last_sp}.attn_out", f"spatial.{gsp}.attn_out")
    tm = temporal_cam(f"temporal.{last_tm}.attn_out", f"temporal.{gtm}.attn_out")
    sp_ff = spatial_cam(f"spatial.{last_sp}.ff_out", f"spatial.{gsp}.ff_out")
    tm_ff = temporal_cam(f"temporal.{last_tm}.ff_out", f"temporal.{gtm}.ff_out")

    combined = jnp.sqrt(sp * tm + 1e-8)  # reference visualizations.py:975

    vq_f = feats["vq.features"][0]       # [t*h*w, d]
    vq_g = grads["vq.features"][0]
    vq = jax.nn.relu((vq_f * vq_g.mean(axis=0)).sum(axis=-1))
    vq = shiftmax(vq.reshape(t, h, w))

    return {"spatial": sp, "temporal": tm, "spatial_ff": sp_ff,
            "temporal_ff": tm_ff, "combined": combined, "vq": vq}


def grad_cam_maps(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                  **kw) -> Dict[str, Array]:
    """Full-resolution [D, H, W] CAMs (pre-rot90) as HOST numpy arrays,
    trilinear-upsampled (reference visualizations.py:993-1000). Fetches the
    grid-resolution CAMs and expands on the host — see rollout.rollout_maps
    for why (device->host link cost)."""
    import numpy as np

    from .capture import upsample_to_host
    target = image.shape[-3:]
    vols = grad_cam_volumes(params, cfg, text_tokens, image, **kw)
    return {k: upsample_to_host(np.asarray(v), target)
            for k, v in vols.items()}
