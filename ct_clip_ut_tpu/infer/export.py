"""StableHLO export of the serving programs (jax.export).

Production deployment path: lower the jitted zero-shot scorer (and the
prompt-latent encoder it depends on) to a serialized StableHLO artifact
that a serving runtime (PJRT C API / IFRT / XLA AOT) can execute with NO
Python model code — only the artifact plus a checkpoint. The reference has
no deployment story beyond "run the torch scripts"
(src/utils/CTClipInference.py).

Params are ARGUMENTS of the exported program (not baked constants): one
artifact serves every checkpoint of the same architecture, and the blob
stays MB-scale instead of carrying 600 MB of weights.

Artifacts are portable across machines: `export(..., platforms=["tpu"])`
on a CPU dev box produces a TPU-servable blob (lowering does not need the
target hardware). Roundtrip equality is pinned in tests/test_export.py.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from ..models.ctclip import encode_text_latents
from .zeroshot import zeroshot_probs

Array = jax.Array


def _abstract(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def _register_pytrees() -> None:
    """Custom pytree nodes in the params tree need a registered
    serialization for export.serialize (idempotent)."""
    from jax import export as jexport

    from ..ops.vq import VQState
    try:
        jexport.register_namedtuple_serialization(
            VQState, serialized_name="ct_clip_ut_tpu.ops.vq.VQState")
    except ValueError:
        pass  # already registered in this process


def export_zeroshot(params, cfg: CTCLIPConfig, *, batch: int,
                    depth: int = 240,
                    n_pathologies: int = 18,
                    prompt_len: int = 24,
                    compute_dtype: str = "bfloat16",
                    platforms: Sequence[str] = ("tpu",)):
    """Export TWO programs as jax.export.Exported objects:

      scorer(params, image [B,1,D,H,W] bf16, prompt_latents [2P, L] f32)
        -> [B, P] probabilities          (the per-batch serving hot path)
      prompter(params, input_ids [2P, T] i32, attention_mask [2P, T] i32)
        -> [2P, L] prompt latents        (run once per pathology set)
    """
    from jax import export as jexport

    s = cfg.ctvit.image_size
    image_spec = jax.ShapeDtypeStruct((batch, 1, depth, s, s), jnp.bfloat16)
    pl_spec = jax.ShapeDtypeStruct((2 * n_pathologies, cfg.dim_latent),
                                   jnp.float32)
    params_spec = _abstract(params)

    scorer = jax.jit(lambda p, img, pl: zeroshot_probs(
        p, cfg, img, pl, compute_dtype=compute_dtype))
    scorer_exp = jexport.export(scorer, platforms=list(platforms))(
        params_spec, image_spec, pl_spec)

    ids_spec = jax.ShapeDtypeStruct((2 * n_pathologies, prompt_len), jnp.int32)
    prompter = jax.jit(lambda p, ids, mask: encode_text_latents(
        p, cfg, {"input_ids": ids, "attention_mask": mask}))
    prompter_exp = jexport.export(prompter, platforms=list(platforms))(
        params_spec, ids_spec, ids_spec)
    return scorer_exp, prompter_exp


def export_ctgenerate(params, cfg, *, batch: int, frames: int = 201,
                      text_len: int = 64,
                      compute_dtype: str = "bfloat16",
                      platforms: Sequence[str] = ("tpu",)):
    """Export the batched CTGenerate localization program:

      localizer(params, bias_table, scans [B,1,F,H,W] f32,
                text_embed [B,T,ctx] f32, text_mask [B,T] bool)
        -> (feature_map, last-layer cross_attention, codebook ids)

    The MaskGit CPB table is an ARGUMENT like the params (built once per
    checkpoint with `models.ctgenerate.maskgit_bias_table` at serving
    bring-up, exactly the bias_cache path) — baking the ~1.3 GB flagship
    table into the artifact would defeat the MB-scale-blob design. Note:
    kernel routing happens at TRACE time, so exporting ON a TPU host bakes
    the Pallas serving kernels into the artifact; exporting from a CPU dev
    box with platforms=["tpu"] produces a functionally identical XLA-path
    program."""
    from jax import export as jexport

    from ..config import CTGenerateConfig
    from ..models.ctgenerate import _ctgen_batched
    from ..models.ctvit import token_grid_shape

    assert isinstance(cfg, CTGenerateConfig)
    s = cfg.ctvit.image_size
    t, h, w = token_grid_shape(cfg.ctvit, (frames, s, s))
    n = t * h * w
    scans_spec = jax.ShapeDtypeStruct((batch, 1, frames, s, s), jnp.float32)
    emb_spec = jax.ShapeDtypeStruct((batch, text_len, cfg.maskgit.dim_context),
                                    jnp.float32)
    mask_spec = jax.ShapeDtypeStruct((batch, text_len), jnp.bool_)
    bias_spec = jax.ShapeDtypeStruct((cfg.maskgit.heads, n, n),
                                     jnp.dtype(compute_dtype))
    params_spec = _abstract(params)

    localizer = jax.jit(lambda p, bias, scans, emb, mask: _ctgen_batched(
        p, cfg, scans, emb, mask,
        bias if n >= 4096 else None, compute_dtype=compute_dtype))
    return jexport.export(localizer, platforms=list(platforms))(
        params_spec, bias_spec, scans_spec, emb_spec, mask_spec)


def save_exported_ctgenerate(out_dir, localizer_exp, cfg,
                             meta: Optional[dict] = None) -> None:
    _register_pytrees()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "ctgenerate_localizer.shlo").write_bytes(localizer_exp.serialize())
    manifest = {
        "platforms": list(localizer_exp.platforms),
        "localizer_in_avals": [str(a) for a in localizer_exp.in_avals],
        "model_cfg": repr(cfg),
    }
    manifest.update(meta or {})
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))


def load_exported_ctgenerate(out_dir):
    from jax import export as jexport
    _register_pytrees()
    return jexport.deserialize(
        (Path(out_dir) / "ctgenerate_localizer.shlo").read_bytes())


def save_exported(out_dir, scorer_exp, prompter_exp, cfg: CTCLIPConfig,
                  meta: Optional[dict] = None) -> None:
    _register_pytrees()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "zeroshot_scorer.shlo").write_bytes(scorer_exp.serialize())
    (out / "prompt_encoder.shlo").write_bytes(prompter_exp.serialize())
    manifest = {
        "platforms": list(scorer_exp.platforms),
        "scorer_in_avals": [str(a) for a in scorer_exp.in_avals],
        "prompter_in_avals": [str(a) for a in prompter_exp.in_avals],
        "model_cfg": repr(cfg),
    }
    manifest.update(meta or {})
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))


def load_exported(out_dir):
    """(scorer, prompter) jax.export.Exported — `.call(...)` runs them."""
    from jax import export as jexport
    _register_pytrees()
    out = Path(out_dir)
    scorer = jexport.deserialize((out / "zeroshot_scorer.shlo").read_bytes())
    prompter = jexport.deserialize((out / "prompt_encoder.shlo").read_bytes())
    return scorer, prompter
