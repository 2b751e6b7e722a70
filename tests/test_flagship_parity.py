"""Flagship-GEOMETRY parity against the actual torch reference modules.

The torch-reference twins in tests/test_torch_reference_parity.py run at a
tiny config (32^3 volumes, 2 layers), so shape-dependent bugs at the REAL
deployment geometry — the 24^3 token grid, the 13,824-token VQ/flatten
path, 576-token spatial rows, the 294,912-wide latent flatten — would slip
through. The reference runs EXCLUSIVELY at this shape
(reference src/train_ctclip.py:19-37: dim 512, codebook 8192, image 480,
patch 20, temporal patch 10, 4+4 depth, dim_head 32, 8 heads, text 768,
dim_image 294912, dim_latent 512).

This module instantiates the genuine reference modules at that flagship
config on CPU, converts the weights through train/checkpoint.convert_ctclip,
and pins:

  * image/text latents <= 1e-5, sim <= 1e-4;
  * raw attention weights (layer 0, spatial + temporal) <= 1e-5;
  * one attribution map per gradient-free/gradient family — rollout,
    grad-CAM, IG (2 steps), occlusion (3 windows' scores) — <= 1e-3.

Everything is `slow`-marked: one torch forward+backward at this shape costs
minutes on a CPU worker. This is the regression gate for kernel/layout
changes (VERDICT round 3, item 2); run with `pytest -m slow -k flagship`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import test_torch_reference_parity as tp  # noqa: E402  (shims + drivers)
from ct_clip_ut_tpu.attribution import capture  # noqa: E402
from ct_clip_ut_tpu.attribution import integrated_gradients as ig_mod  # noqa: E402
from ct_clip_ut_tpu.attribution import occlusion as occ_mod  # noqa: E402
from ct_clip_ut_tpu.attribution import rollout  # noqa: E402
from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig,  # noqa: E402
                                   CTViTConfig)
from ct_clip_ut_tpu.models.ctclip import (ctclip_apply,  # noqa: E402
                                          encode_text_latents)
from ct_clip_ut_tpu.train.checkpoint import convert_ctclip  # noqa: E402

pytestmark = pytest.mark.slow

# the flagship layout, verbatim (reference train_ctclip.py:19-37)
FL_BERT = BertConfig()          # CXR-BERT geometry: 768 x 12 layers
FL_VIT = CTViTConfig(dim=512, codebook_size=8192, image_size=480,
                     patch_size=20, temporal_patch_size=10,
                     spatial_depth=4, temporal_depth=4,
                     dim_head=32, heads=8)
FL_CLIP = CTCLIPConfig(dim_text=768, dim_image=294912, dim_latent=512,
                       ctvit=FL_VIT, bert=FL_BERT)
GT, GH, GW = 24, 24, 24         # token grid (240/10, 480/20, 480/20)


@pytest.fixture(scope="module")
def twins_fl():
    ref_ctvit, ref_ctclip = tp._import_reference()
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    bert = BertModel(HFBertConfig(
        vocab_size=FL_BERT.vocab_size, hidden_size=FL_BERT.hidden_size,
        num_hidden_layers=FL_BERT.num_layers,
        num_attention_heads=FL_BERT.num_heads,
        intermediate_size=FL_BERT.intermediate_size,
        max_position_embeddings=FL_BERT.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    ctvit = ref_ctvit.CTViT(
        dim=512, codebook_size=8192, image_size=480, patch_size=20,
        temporal_patch_size=10, spatial_depth=4, temporal_depth=4,
        dim_head=32, heads=8)
    model = ref_ctclip.CTCLIP(
        text_encoder=bert, image_encoder=ctvit, dim_text=768,
        dim_image=294912, dim_latent=512)
    model.eval()

    params = convert_ctclip(
        {k: v.float() for k, v in model.state_dict().items()}, FL_CLIP)

    rng = np.random.RandomState(0)
    image_np = rng.randn(1, 1, 240, 480, 480).astype(np.float32)
    ids_np = rng.randint(0, FL_BERT.vocab_size, (1, 8))
    return model, params, image_np, ids_np


@pytest.fixture(scope="module")
def hook_run(twins_fl):
    """ONE shared torch forward+backward with the reference's hook capture
    (visualizations.py:140-272) — rollout / grad-CAM / raw-attention parity
    all read from this run."""
    model, params, image_np, ids_np = twins_fl
    t_image, t_tokens = tp._torch_inputs(image_np, ids_np, n=1)
    driver = tp._HookDriver(model)
    driver.run(t_tokens, t_image.requires_grad_())
    return driver


def test_flagship_latents_parity(twins_fl):
    model, params, image_np, ids_np = twins_fl
    t_image, t_tokens = tp._torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)

    with torch.no_grad():
        sim_t, img_lat_t, txt_lat_t, _, _ = model(t_tokens, t_image)

    out = ctclip_apply(params, capture.parity_cfg(FL_CLIP),
                       j_tokens, j_image)
    np.testing.assert_allclose(np.asarray(out.text_latents),
                               txt_lat_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.image_latents),
                               img_lat_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.sim_matrix),
                               sim_t.numpy(), atol=1e-4)


def test_flagship_raw_attention_parity(twins_fl, hook_run):
    """Layer-0 spatial [24, 8, 576, 576] and temporal [576, 8, 24, 24]
    attention weights — the raw-attention family's substrate
    (reference visualizations.py:570-639)."""
    model, params, image_np, ids_np = twins_fl
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)
    _, spatial, temporal = capture.score_and_weights(
        params, FL_CLIP, j_tokens, j_image)
    np.testing.assert_allclose(
        np.asarray(spatial[0]),
        hook_run.saved["spatial_attention_weights"][0].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(temporal[0]),
        hook_run.saved["temporal_attention_weights"][0].numpy(), atol=1e-5)


def test_flagship_rollout_parity(twins_fl, hook_run):
    model, params, image_np, ids_np = twins_fl
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)

    # reference spatial rollout (visualizations.py:795-814)
    spatial_rollouts = []
    for attn_block in hook_run.saved["spatial_attention_weights"]:
        for d in range(attn_block.shape[0]):
            r = tp._torch_rollout([attn_block[d]])
            spatial_rollouts.append(r.sum(dim=0).view(GH, GW).numpy())
    vol = np.stack(spatial_rollouts, axis=0)
    vol = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)

    # reference temporal rollout (visualizations.py:819-839)
    tw = hook_run.saved["temporal_attention_weights"]
    token_rollouts = [
        tp._torch_rollout([layer[tok] for layer in tw]).sum(dim=0)
        for tok in range(tw[0].shape[0])]
    tvol = torch.stack(token_rollouts).view(GH, GW, GT).permute(2, 0, 1)
    tvol = ((tvol - tvol.min()) / (tvol.max() - tvol.min() + 1e-8)).numpy()

    sp_mine, tm_mine = rollout.rollout_volumes(
        params, FL_CLIP, j_tokens, j_image)
    np.testing.assert_allclose(np.asarray(sp_mine), vol, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tm_mine), tvol, atol=1e-3)


def test_flagship_grad_cam_parity(twins_fl, hook_run):
    from ct_clip_ut_tpu.attribution import grad_cam
    model, params, image_np, ids_np = twins_fl
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)
    s = hook_run.saved

    def cam(features, grads, view, permute=None):
        w = grads.mean(dim=(0, 1))
        c = (features * w.view(1, 1, -1)).sum(dim=-1).relu().view(*view)
        if permute:
            c = c.permute(*permute)
        c = (c - c.min()) / (c.max() + 1e-8)
        return c.numpy()

    ref = {
        "spatial": cam(s["spatial_features"][-1], s["spatial_gradients"][-1],
                       (GT, GH, GW)),
        "temporal": cam(s["temporal_features"][-1],
                        s["temporal_gradients"][-1],
                        (GH, GW, GT), (2, 0, 1)),
    }
    mine = grad_cam.grad_cam_volumes(params, FL_CLIP, j_tokens, j_image,
                                     pairing="reference")
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(mine[k]), v, atol=1e-3,
                                   err_msg=f"flagship grad-cam '{k}'")


def test_flagship_ig_parity(twins_fl):
    """IG with 2 interpolation steps — the construction (baseline=1,
    relu(diff * avg-grads), q90 threshold, **0.05 contrast) is exact at any
    step count (reference visualizations.py:851-893); 2 steps bounds the
    torch side to two full backwards at flagship shape."""
    model, params, image_np, ids_np = twins_fl
    t_image, t_tokens = tp._torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)
    steps = 2

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

    mine = np.asarray(ig_mod.integrated_gradients(
        params, FL_CLIP, j_tokens, j_image, steps=steps, chunk=1))
    # at 55.3M voxels a handful of values straddle the q90 cut within float
    # rounding and flip to 0 on exactly one side (observed: 11 voxels,
    # 2e-5%) — those ties are excluded; everything else pins at 1e-3
    diff = np.abs(mine - ig)
    tie = (diff > 1e-3) & ((mine == 0.0) | (ig == 0.0))
    assert tie.mean() < 1e-4, f"non-tie mismatch fraction {tie.mean()}"
    keep = ~tie
    np.testing.assert_allclose(mine[keep], ig[keep], atol=1e-3)


def test_flagship_occlusion_scores_parity(twins_fl):
    """Three windows of the reference sweep geometry (patch 20x40x40 — a
    full 12,167-window torch sweep is ~2.6 h on CPU; scores parity per
    window is the property the heatmap assembly inherits,
    reference visualizations.py:370-392)."""
    model, params, image_np, ids_np = twins_fl
    t_image, t_tokens = tp._torch_inputs(image_np, ids_np, n=1)
    j_image, j_tokens = tp._jax_inputs(image_np, ids_np, n=1)

    coords = [(0, 0, 0), (10, 20, 20), (220, 440, 440)]
    patch = (20, 40, 40)
    with torch.no_grad():
        sim, *_ = model(t_tokens, t_image)
        ref_scores = [sim[0, 0].item()]
        for d, h, w in coords:
            occluded = t_image.clone()
            occluded[:, :, d:d + patch[0], h:h + patch[1],
                     w:w + patch[2]] = -1
            sim, *_ = model(t_tokens, occluded)
            ref_scores.append(sim[0, 0].item())

    txt = encode_text_latents(params, FL_CLIP, j_tokens)[0]
    from ct_clip_ut_tpu.config import OcclusionConfig
    occ = OcclusionConfig(patch_size=patch, stride=(10, 20, 20),
                          fill_value=-1.0, threshold=0.0)
    original, scores = occ_mod.occlusion_scores(
        params, FL_CLIP, j_image, txt,
        coords=jnp.asarray(coords, jnp.int32), occ=occ, chunk=1)
    got = [float(original)] + [float(s) for s in np.asarray(scores)]
    np.testing.assert_allclose(got, ref_scores, atol=1e-3)
