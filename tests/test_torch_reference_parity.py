"""End-to-end parity against the ACTUAL reference torch modules.

Instantiates the real /root/reference/src models (utils/attention.py,
utils/ctvit.py, models/ctclip.py) on CPU at a small config, loads the SAME
weights into our JAX model through train/checkpoint.convert_ctclip (i.e. the
converter sees the genuine reference module naming), and asserts:

  * image/text latents and the sim matrix match <= 1e-5;
  * per-layer attention weights match <= 1e-5;
  * one full attribution map per method matches <= 1e-3, where the torch
    maps are computed by driving the torch model the reference's way —
    forward hooks on the module list + backward from sim[0, 0]
    (reference visualizations.py:570-581, 779-841, 851-893, 913-991,
    335-424).

Environment shims (behavior-preserving):
  * `beartype` is not installed -> identity-decorator stub;
  * `vector_quantize_pytorch` is not installed -> a faithful transcription
    of VectorQuantize(use_cosine_sim=True) in eval/frozen-codebook mode as
    the reference uses it (ctvit.py:66,117-118): l2-normalized input and
    codebook, argmax cosine lookup, straight-through gradient (the reference
    forces `self.vq.train()` so the ST branch is always active);
  * the reference hardcodes device='cuda' inside forwards (attention.py:134,
    170,196,220,261) -> the reference modules' module-level `torch` binding
    is replaced with a proxy whose .device() always returns cpu.
"""

import sys
import types

import numpy as np
import pytest


torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,  # noqa: E402
                                   OcclusionConfig)
from ct_clip_ut_tpu.models.ctclip import ctclip_apply  # noqa: E402
from ct_clip_ut_tpu.models.ctvit import patchify  # noqa: E402
from ct_clip_ut_tpu.train.checkpoint import convert_ctclip  # noqa: E402
from ct_clip_ut_tpu.attribution import (capture, grad_cam,  # noqa: E402
                                        integrated_gradients as ig_mod,
                                        occlusion as occ_mod, rollout)

REF_SRC = "/root/reference/src"

# small twin of the flagship layout: [1, 1, 20, 32, 32] -> 2 frames x 4x4
T_PATCH, PATCH, IMG, DEPTH = 10, 8, 32, 20
GT, GH, GW = 2, 4, 4
DIM, HEADS, DIM_HEAD = 16, 4, 4

SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16)
SMALL_VIT = CTViTConfig(dim=DIM, codebook_size=32, image_size=IMG,
                        patch_size=PATCH, temporal_patch_size=T_PATCH,
                        spatial_depth=2, temporal_depth=2,
                        dim_head=DIM_HEAD, heads=HEADS)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=GH * GW * DIM, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


# ---------------------------------------------------------------------------
# environment shims + reference import
# ---------------------------------------------------------------------------

class _CosineVQ(nn.Module):
    """vector_quantize_pytorch.VectorQuantize(use_cosine_sim=True), the slice
    the reference exercises: forced-train straight-through + frozen codebook
    (reference ctvit.py:66,117-118). Buffers named like the library so
    convert_ctclip reads the genuine key layout (`vq._codebook.embed` etc.)."""

    def __init__(self, dim, codebook_size, use_cosine_sim=True,
                 freeze_codebook=False):
        super().__init__()

        class _Codebook(nn.Module):
            def __init__(self):
                super().__init__()
                g = torch.Generator().manual_seed(7)
                embed = F.normalize(
                    torch.randn(1, codebook_size, dim, generator=g), dim=-1)
                self.register_buffer("embed", embed.clone())
                self.register_buffer("embed_avg", embed.clone())
                self.register_buffer("cluster_size",
                                     torch.zeros(1, codebook_size))

        self._codebook = _Codebook()

    def forward(self, x, freeze_codebook=True):
        embed = F.normalize(self._codebook.embed[0], dim=-1)
        xn = F.normalize(x.float(), dim=-1)
        idx = (xn @ embed.t()).argmax(dim=-1)
        quantize = embed[idx]
        quantize = x + (quantize - x).detach()      # straight-through
        return quantize, idx, torch.tensor(0.0)


class _TorchProxy:
    """torch with .device() pinned to cpu (the reference hardcodes 'cuda')."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, name):
        return getattr(self._real, name)

    def device(self, *a, **k):
        return self._real.__getattribute__("device")("cpu")


def _import_reference():
    if "beartype" not in sys.modules:
        bt = types.ModuleType("beartype")
        bt.beartype = lambda f: f
        sys.modules["beartype"] = bt
    if "vector_quantize_pytorch" not in sys.modules:
        vq = types.ModuleType("vector_quantize_pytorch")
        vq.VectorQuantize = _CosineVQ
        sys.modules["vector_quantize_pytorch"] = vq
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import utils.attention as ref_attention  # noqa: F401
    import utils.ctvit as ref_ctvit
    import models.ctclip as ref_ctclip
    for mod in (ref_attention, ref_ctvit, ref_ctclip):
        if not isinstance(mod.torch, _TorchProxy):
            mod.torch = _TorchProxy(torch)
    return ref_ctvit, ref_ctclip


# ---------------------------------------------------------------------------
# fixture: twin models with identical weights
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def twins():
    ref_ctvit, ref_ctclip = _import_reference()
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    bert = BertModel(HFBertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    ctvit = ref_ctvit.CTViT(
        dim=DIM, codebook_size=32, image_size=IMG, patch_size=PATCH,
        temporal_patch_size=T_PATCH, spatial_depth=2, temporal_depth=2,
        dim_head=DIM_HEAD, heads=HEADS)
    model = ref_ctclip.CTCLIP(
        text_encoder=bert, image_encoder=ctvit, dim_text=32,
        dim_image=GH * GW * DIM, dim_latent=8)
    model.eval()

    params = convert_ctclip(
        {k: v.float() for k, v in model.state_dict().items()}, SMALL_CLIP)

    rng = np.random.RandomState(0)
    image_np = rng.randn(2, 1, DEPTH, IMG, IMG).astype(np.float32)
    ids_np = rng.randint(0, 64, (2, 8))
    return model, params, image_np, ids_np


def _torch_inputs(image_np, ids_np, n=2):
    image = torch.from_numpy(image_np[:n])
    tokens = {"input_ids": torch.from_numpy(ids_np[:n]),
              "attention_mask": torch.ones(n, ids_np.shape[1],
                                           dtype=torch.long)}
    return image, tokens


def _jax_inputs(image_np, ids_np, n=2):
    image = jnp.asarray(image_np[:n])
    tokens = {"input_ids": jnp.asarray(ids_np[:n]),
              "attention_mask": jnp.ones((n, ids_np.shape[1]), jnp.int32)}
    return image, tokens


# ---------------------------------------------------------------------------
# hook-driven torch capture (the reference's driver, visualizations.py:140-272)
# ---------------------------------------------------------------------------

class _HookDriver:
    def __init__(self, model):
        self.model = model
        self.saved = {k: [] for k in (
            "spatial_attention_weights", "temporal_attention_weights",
            "spatial_features", "spatial_gradients",
            "temporal_features", "temporal_gradients",
            "spatial_ff_features", "spatial_ff_gradients",
            "temporal_ff_features", "temporal_ff_gradients")}
        self.saved["vq_features"] = []
        self.saved["vq_gradients"] = []
        self.hooks = []

    def _attn_hook(self, kind):
        def hook(module, inputs, output):
            feature_map, attn = output
            self.saved[f"{kind}_features"].append(feature_map.detach())
            self.saved[f"{kind}_attention_weights"].append(attn.detach())
            feature_map.register_hook(
                lambda g: self.saved[f"{kind}_gradients"].append(g))
        return hook

    def _ff_hook(self, kind):
        def hook(module, inputs, output):
            self.saved[f"{kind}_ff_features"].append(output.detach())
            output.register_hook(
                lambda g: self.saved[f"{kind}_ff_gradients"].append(g))
        return hook

    def _vq_hook(self, module, inputs, output):
        features = output[0]
        self.saved["vq_features"].append(features.detach())
        features.register_hook(
            lambda g: self.saved["vq_gradients"].append(g))

    def run(self, tokens, image):
        vit = self.model.visual_transformer
        self.hooks.append(vit.vq.register_forward_hook(self._vq_hook))
        for layer in vit.enc_spatial_transformer.layers:
            self.hooks.append(
                layer[1].register_forward_hook(self._attn_hook("spatial")))
            self.hooks.append(
                layer[3].register_forward_hook(self._ff_hook("spatial")))
        for layer in vit.enc_temporal_transformer.layers:
            self.hooks.append(
                layer[1].register_forward_hook(self._attn_hook("temporal")))
            self.hooks.append(
                layer[3].register_forward_hook(self._ff_hook("temporal")))
        with torch.enable_grad():
            sim, *_ = self.model(tokens, image)
            sim[0, 0].backward()
        for h in self.hooks:
            h.remove()
        return sim


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_forward_latents_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np)
    j_image, j_tokens = _jax_inputs(image_np, ids_np)

    with torch.no_grad():
        sim_t, img_lat_t, txt_lat_t, temp_t, _ = model(t_tokens, t_image)

    out = ctclip_apply(params, capture.parity_cfg(SMALL_CLIP),
                       j_tokens, j_image)
    np.testing.assert_allclose(np.asarray(out.text_latents),
                               txt_lat_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.image_latents),
                               img_lat_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.sim_matrix),
                               sim_t.numpy(), atol=1e-4)


def test_patchify_matches_reference_rearrange(twins):
    model, params, image_np, ids_np = twins
    t_image, _ = _torch_inputs(image_np, ids_np, n=1)
    # reference to_patch_emb[0] is the einops Rearrange (ctvit.py:45-48)
    ref = model.visual_transformer.to_patch_emb[0](t_image).numpy()
    ours = np.asarray(patchify(jnp.asarray(image_np[:1]), PATCH, T_PATCH))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_attention_weights_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = _jax_inputs(image_np, ids_np, n=1)

    driver = _HookDriver(model)
    driver.run(t_tokens, t_image.requires_grad_())

    _, spatial, temporal = capture.score_and_weights(
        params, SMALL_CLIP, j_tokens, j_image)

    for mine, ref in zip(spatial, driver.saved["spatial_attention_weights"]):
        np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-5)
    for mine, ref in zip(temporal, driver.saved["temporal_attention_weights"]):
        np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-5)


def _torch_rollout(attn_list, use_residual=True):
    """reference attention_rollout (visualizations.py:707-743), mean fusion."""
    result = torch.eye(attn_list[0].size(-1))
    for attn in attn_list:
        attn = attn.mean(dim=0)
        attn = attn / (attn.sum(dim=-1, keepdim=True) + 1e-8)
        if use_residual:
            attn = attn + torch.eye(attn.size(0))
            attn = attn / attn.sum(dim=-1, keepdim=True)
        result = attn @ result
    return result


def test_rollout_map_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = _jax_inputs(image_np, ids_np, n=1)

    driver = _HookDriver(model)
    driver.run(t_tokens, t_image.requires_grad_())

    # ---- reference spatial rollout (visualizations.py:795-814) ----------
    spatial_rollouts = []
    for attn_block in driver.saved["spatial_attention_weights"]:
        for d in range(attn_block.shape[0]):
            r = _torch_rollout([attn_block[d]])
            spatial_rollouts.append(
                r.sum(dim=0).view(GH, GW).numpy())
    vol = np.stack(spatial_rollouts, axis=0)
    vol = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)

    # ---- reference temporal rollout (visualizations.py:819-839) ---------
    tw = driver.saved["temporal_attention_weights"]
    token_rollouts = [
        _torch_rollout([layer[tok] for layer in tw]).sum(dim=0)
        for tok in range(tw[0].shape[0])]
    tvol = torch.stack(token_rollouts).view(GH, GW, GT).permute(2, 0, 1)
    tvol = ((tvol - tvol.min()) / (tvol.max() - tvol.min() + 1e-8)).numpy()

    sp_mine, tm_mine = rollout.rollout_volumes(
        params, SMALL_CLIP, j_tokens, j_image)
    np.testing.assert_allclose(np.asarray(sp_mine), vol, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tm_mine), tvol, atol=1e-3)


def test_grad_cam_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = _jax_inputs(image_np, ids_np, n=1)

    driver = _HookDriver(model)
    driver.run(t_tokens, t_image.requires_grad_())
    s = driver.saved

    def cam(features, grads, view, permute=None):
        w = grads.mean(dim=(0, 1))
        c = (features * w.view(1, 1, -1)).sum(dim=-1).relu().view(*view)
        if permute:
            c = c.permute(*permute)
        c = (c - c.min()) / (c.max() + 1e-8)
        return c.numpy()

    # features[-1] with gradients[-1]: backward-append order means
    # gradients[-1] is LAYER 0's gradient (visualizations.py:929-963)
    ref = {
        "spatial": cam(s["spatial_features"][-1], s["spatial_gradients"][-1],
                       (GT, GH, GW)),
        "temporal": cam(s["temporal_features"][-1],
                        s["temporal_gradients"][-1],
                        (GH, GW, GT), (2, 0, 1)),
        "spatial_ff": cam(s["spatial_ff_features"][-1],
                          s["spatial_ff_gradients"][-1], (GT, GH, GW)),
        "temporal_ff": cam(s["temporal_ff_features"][-1],
                           s["temporal_ff_gradients"][-1],
                           (GH, GW, GT), (2, 0, 1)),
    }
    ref["combined"] = np.sqrt(
        ref["spatial"] * ref["temporal"] + 1e-8).astype(np.float64)
    vq_feats = s["vq_features"][-1].squeeze(0)
    vq_grads = s["vq_gradients"][-1].squeeze(0)
    vq_cam = ((vq_feats * vq_grads.mean(dim=0)).sum(dim=-1).relu()
              .view(GT, GH, GW))
    ref["vq"] = ((vq_cam - vq_cam.min()) / (vq_cam.max() + 1e-8)).numpy()

    mine = grad_cam.grad_cam_volumes(params, SMALL_CLIP, j_tokens, j_image,
                                     pairing="reference")
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(mine[k]), v, atol=1e-3,
                                   err_msg=f"grad-cam '{k}' mismatch")


def test_integrated_gradients_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = _jax_inputs(image_np, ids_np, n=1)
    steps = 8

    # reference visualize_integrated_gradients (visualizations.py:851-893)
    baseline = torch.ones_like(t_image)
    diff = t_image - baseline
    grads = []
    for alpha in torch.linspace(0, 1, steps):
        interpolated = (baseline + alpha * diff).detach().requires_grad_()
        model.zero_grad()
        with torch.enable_grad():
            sim, *_ = model(t_tokens, interpolated)
            sim[0, 0].backward()
        grads.append(interpolated.grad.detach().clone())
    avg = torch.stack(grads).mean(dim=0)
    ig = (diff * avg).squeeze().relu()
    ig = ((ig - ig.min()) / (ig.max() + 1e-8)).numpy()
    q = np.quantile(ig, 0.90)
    ig = np.where(ig >= q, ig, 0.0) ** 0.05
    ig = ig / (ig.max() + 1e-8)

    mine = ig_mod.integrated_gradients(
        params, SMALL_CLIP, j_tokens, j_image, steps=steps, chunk=4)
    np.testing.assert_allclose(np.asarray(mine), ig, atol=1e-3)


def test_occlusion_parity(twins):
    model, params, image_np, ids_np = twins
    t_image, t_tokens = _torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = _jax_inputs(image_np, ids_np, n=1)
    patch, stride = (10, 16, 16), (5, 8, 8)

    # reference _compute_occlusion (visualizations.py:335-424), rank 0 of 1
    with torch.no_grad():
        sim, *_ = model(t_tokens, t_image)
        original = sim[0, 0].item()
    D, H, W = t_image.shape[-3:]
    heat = np.zeros((D, H, W))
    count = np.zeros((D, H, W))
    for d in range(0, D - patch[0] + 1, stride[0]):
        for h in range(0, H - patch[1] + 1, stride[1]):
            for w in range(0, W - patch[2] + 1, stride[2]):
                occluded = t_image.clone()
                occluded[:, :, d:d + patch[0], h:h + patch[1],
                         w:w + patch[2]] = -1
                with torch.no_grad():
                    sim, *_ = model(t_tokens, occluded)
                imp = max(original - sim[0, 0].item(), 0)
                heat[d:d + patch[0], h:h + patch[1], w:w + patch[2]] += imp
                count[d:d + patch[0], h:h + patch[1], w:w + patch[2]] += 1
    count[count == 0] = 1
    heat = heat / count
    heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)

    from ct_clip_ut_tpu.models.ctclip import encode_text_latents
    txt = encode_text_latents(params, SMALL_CLIP, j_tokens)[0]
    occ = OcclusionConfig(patch_size=patch, stride=stride, fill_value=-1.0,
                          threshold=0.0)
    mine = occ_mod.occlusion_heatmap(params, SMALL_CLIP, j_image, txt,
                                     occ=occ)
    np.testing.assert_allclose(mine, heat, atol=1e-3)


def test_occlusion_text_embeds_parity(twins):
    """The diff-embedding bypass mode against the REAL reference model:
    torch runs `model(None, occluded, text_embeds)` per window per pathology
    (visualizations.py:1037-1044, ctclip.py:107); ours scores both
    pathologies from ONE sweep (occlusion_heatmaps_multi) through
    diff_embedding_latent. Maps must agree <=1e-3."""
    import jax
    import jax.numpy as jnp

    model, params, image_np, ids_np = twins
    t_image, _ = _torch_inputs(image_np, ids_np, n=1)
    j_image, _ = _jax_inputs(image_np, ids_np, n=1)
    patch, stride = (10, 16, 16), (5, 8, 8)

    embeds_np = np.stack([
        np.asarray(jax.random.normal(jax.random.PRNGKey(7 + k),
                                     (SMALL_CLIP.dim_text,)), np.float32)
        for k in range(2)])

    D, H, W = t_image.shape[-3:]
    ref_maps = []
    for k in range(2):
        emb = torch.tensor(embeds_np[k]).unsqueeze(0)
        with torch.no_grad():
            sim, *_ = model(None, t_image, emb)
            original = sim[0, 0].item()
        heat = np.zeros((D, H, W))
        count = np.zeros((D, H, W))
        for d in range(0, D - patch[0] + 1, stride[0]):
            for h in range(0, H - patch[1] + 1, stride[1]):
                for w in range(0, W - patch[2] + 1, stride[2]):
                    occluded = t_image.clone()
                    occluded[:, :, d:d + patch[0], h:h + patch[1],
                             w:w + patch[2]] = -1
                    with torch.no_grad():
                        sim, *_ = model(None, occluded, emb)
                    imp = max(original - sim[0, 0].item(), 0)
                    heat[d:d + patch[0], h:h + patch[1],
                         w:w + patch[2]] += imp
                    count[d:d + patch[0], h:h + patch[1],
                          w:w + patch[2]] += 1
        count[count == 0] = 1
        heat = heat / count
        heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)
        ref_maps.append(heat)

    latents = jnp.stack([
        occ_mod.diff_embedding_latent(params, SMALL_CLIP,
                                      jnp.asarray(embeds_np[k]))
        for k in range(2)])
    occ = OcclusionConfig(patch_size=patch, stride=stride, fill_value=-1.0,
                          threshold=0.0)
    mine = occ_mod.occlusion_heatmaps_multi(params, SMALL_CLIP, j_image,
                                            latents, occ=occ)
    for k in range(2):
        np.testing.assert_allclose(mine[k], ref_maps[k], atol=1e-3)
