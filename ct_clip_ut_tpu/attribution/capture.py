"""Shared attribution machinery: scored forwards, weight capture, and
intermediate gradients without hooks.

The reference drives every attribution method off the per-sample similarity
score sim[rank, rank] (reference visualizations.py:579-581, 785-787,
867-869, 919-921): forward, backward from the scalar, harvest hook captures.
Here:

  * `score_and_weights` — one forward returning the scalar score plus all
    per-layer attention weights as structured outputs;
  * `score_captures_and_grads` — one jax.value_and_grad pass over
    zero-injections at named tap points, returning the score, the captured
    activations, and d score / d activation for each — exactly what
    register_hook delivered, minus the hooks, in a single compiled program.

All attribution math runs in fp32 (saliency parity target <= 1e-3,
BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from ..models.ctclip import ctclip_apply
from ..ops.taps import Taps

Array = jax.Array


def parity_cfg(cfg: CTCLIPConfig) -> CTCLIPConfig:
    """Attribution variant of a model config: bit-stable matmul patch embed
    (conv lowering varies across vmap/scan contexts, which can flip VQ
    argmax near ties — fatal when scores are differenced at 1e-2 scale,
    e.g. occlusion importance)."""
    import dataclasses
    return dataclasses.replace(
        cfg, ctvit=dataclasses.replace(cfg.ctvit, patch_embed_conv=False))


def similarity_score(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                     text_embeds: Optional[Array] = None,
                     taps: Taps = None, return_weights: bool = False,
                     prepatchified: bool = False):
    """Per-sample scalar similarity sim[0, 0] (batch-1 convention of the
    attribution suite) plus the full output. prepatchified=True feeds a
    [b, t, h, w, patch_dim] patch tensor straight into the (bit-stable
    matmul) patch embed — the entry point for gradient methods that
    differentiate in patch space (see ctvit.ctvit_apply)."""
    cfg = parity_cfg(cfg)
    out = ctclip_apply(params, cfg, text_tokens, image,
                       text_embeds=text_embeds, freeze_vq=True,
                       return_weights=return_weights,
                       taps=taps if taps is not None else Taps(),
                       prepatchified=prepatchified)
    return out.sim_matrix[0, 0], out


def score_and_weights(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                      text_embeds: Optional[Array] = None):
    """(score, spatial_attn tuple, temporal_attn tuple); weights are fp32
    pre-dropout [b*t, heads, hw, hw] / [b*h*w, heads, t, t]."""
    score, out = similarity_score(params, cfg, text_tokens, image,
                                  text_embeds=text_embeds, return_weights=True)
    return score, out.spatial_attn, out.temporal_attn


def tap_shapes(params, cfg: CTCLIPConfig, text_tokens, image,
               tap_names: Sequence[str]) -> Dict[str, jax.ShapeDtypeStruct]:
    """Shapes of the requested tap points via abstract evaluation (no FLOPs)."""
    def f(params, text_tokens, image):
        taps = Taps(capture=set(tap_names))
        _, _ = similarity_score(params, cfg, text_tokens, image, taps=taps)
        return taps.collected

    return jax.eval_shape(f, params, text_tokens, image)


def score_captures_and_grads(params, cfg: CTCLIPConfig, text_tokens,
                             image: Array, tap_names: Sequence[str],
                             text_embeds: Optional[Array] = None
                             ) -> Tuple[Array, Dict[str, Array], Dict[str, Array]]:
    """One pass: scalar score, captured activations at `tap_names`, and
    d score / d activation for each (the register_hook gradients,
    reference visualizations.py:147-218)."""
    shapes = tap_shapes(params, cfg, text_tokens, image, tap_names)
    zeros = {k: jnp.zeros(v.shape, jnp.float32) for k, v in shapes.items()}

    def f(inject):
        taps = Taps(capture=set(tap_names), inject=inject)
        score, _ = similarity_score(params, cfg, text_tokens, image,
                                    text_embeds=text_embeds, taps=taps)
        return score, taps.collected

    (score, captured), grads = jax.value_and_grad(f, has_aux=True)(zeros)
    captured = {k: v.astype(jnp.float32) for k, v in captured.items()}
    grads = {k: v.astype(jnp.float32) for k, v in grads.items()}
    return score, captured, grads


# ---------------------------------------------------------------------------
# shared post-processing (fp32, matching the reference's numpy math)
# ---------------------------------------------------------------------------

def minmax(v: Array, eps: float = 1e-8) -> Array:
    """(v - min) / (max - min + eps) (reference visualizations.py:414,814,839)."""
    v = v.astype(jnp.float32)
    return (v - v.min()) / (v.max() - v.min() + eps)


def shiftmax(v: Array, eps: float = 1e-8) -> Array:
    """(v - min) / (max + eps) with max taken BEFORE the shift — the
    reference's (sic) normalization in grad-cam / raw attention
    (visualizations.py:620-621,674,946-947,971-972)."""
    v = v.astype(jnp.float32)
    return (v - v.min()) / (v.max() + eps)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("target_shape",))
def upsample_to(volume: Array, target_shape) -> Array:
    """Trilinear (align_corners=False) upsample of a [D, H, W] volume
    (reference _upsample, visualizations.py:289-293). Jitted — eager
    dispatch of the resize gather chain costs seconds through the relay."""
    return jax.image.resize(volume.astype(jnp.float32), tuple(target_shape),
                            method="trilinear")


def _lin_matrix(n_in: int, n_out: int):
    """[n_out, n_in] half-pixel-center linear interpolation matrix — the
    per-axis factor of trilinear resize with align_corners=False (same
    convention as jax.image.resize / torch F.interpolate upsampling)."""
    import numpy as np
    c = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(c)
    w = c - lo
    i0 = np.clip(lo.astype(np.int64), 0, n_in - 1)
    i1 = np.clip(lo.astype(np.int64) + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float64)
    m[np.arange(n_out), i0] += 1.0 - w
    m[np.arange(n_out), i1] += w
    return m


def _lin_taps(n_in: int, n_out: int):
    """(i0, i1, w) 2-tap form of `_lin_matrix`'s rows: out = (1-w)*v[i0]
    + w*v[i1] — identical weights (each matrix row has exactly these two
    nonzeros; clipped edge rows where i0 == i1 differ by <= 1 ulp from the
    matrix's exact-1.0 coefficient)."""
    import numpy as np
    c = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(c)
    w = (c - lo).astype(np.float32)
    i0 = np.clip(lo.astype(np.int64), 0, n_in - 1)
    i1 = np.clip(lo.astype(np.int64) + 1, 0, n_in - 1)
    return i0, i1, w


def upsample_to_host(volume, target_shape):
    """Host (numpy) twin of `upsample_to`: trilinear [d,h,w] -> target.

    Exists so drivers can fetch attribution maps at GRID resolution (a few
    hundred KB) and expand on the host, instead of pulling the full
    ~221 MB upsampled volume across the device->host link per map. Separable
    matmuls in fp32 — the same precision the device resize accumulates in;
    measured <=2e-7 from the fp64 formulation and ~60x faster (fp64 BLAS on
    the 442 MB final stage dominated the whole rollout pipeline). A 2-tap
    gather-lerp variant (linear interpolation reads exactly 2 inputs per
    output) was tried and REVERTED: single-threaded sgemm beats the
    memory-bound take/mul/add chain on the 1-core bench host (0.27 vs
    ~0.11 s/map steady). Per-map cost is allocation-dominated on a busy
    host (~221 MB of fresh mmap'd pages per map): ~0.11 s quiet vs ~0.3 s
    mid-bench measured — a shared output buffer was tried and rejected,
    since callers legitimately hold several live maps (rollout returns 2,
    grad-CAM 6)."""
    import numpy as np
    v = np.asarray(volume, np.float32)
    for ax in range(3):
        # upsample-only: on downscale jax.image.resize anti-aliases (wider
        # kernel), which this plain linear twin does not reproduce
        assert target_shape[ax] >= v.shape[ax], (v.shape, target_shape)
        m = _lin_matrix(v.shape[ax], target_shape[ax]).astype(np.float32)
        v = np.moveaxis(np.tensordot(m, np.moveaxis(v, ax, 0), axes=1), 0, ax)
    return v


def rot90_ct(volume, k: int = -1):
    """np.rot90(k=-1, axes=(1, 2)) — puts the CT table down
    (reference visualizations.py:423,628-630 etc). Host-side numpy op."""
    import numpy as np
    return np.rot90(np.asarray(volume), k=k, axes=(1, 2))
