"""Sequence-parallel CT-ViT encoder vs the dense path.

Beyond-parity extension (SURVEY.md section 5): the spatial stage shards its
token-grid H axis over the mesh "model" axis — ring attention, CPB row
stripes, PEG halo exchange — and must reproduce the dense encoder's latents
and gradients on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.models.ctclip import encode_image_latents, init_ctclip
from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias,
                                        continuous_pos_bias_stripe)
from ct_clip_ut_tpu.parallel.sp_encoder import encode_image_latents_sp

CFG = CTCLIPConfig(
    dim_text=32, dim_image=4 * 8 * 8 * 32 // 4, dim_latent=24,
    ctvit=CTViTConfig(dim=32, codebook_size=64, image_size=64, patch_size=8,
                      temporal_patch_size=2, spatial_depth=2,
                      temporal_depth=2, dim_head=8, heads=2,
                      patch_embed_conv=False),
    bert=BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                    num_heads=2, intermediate_size=64))


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    params = init_ctclip(jax.random.PRNGKey(0), CFG)
    image = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 64, 64))
    return mesh, params, image


def test_cpb_stripe_matches_full_table():
    p = init_ctclip(jax.random.PRNGKey(0), CFG)
    cpb = p["visual_transformer"]["spatial_rel_pos_bias"]
    d1 = d2 = CFG.ctvit.patch_height
    full = continuous_pos_bias(cpb, d1, d2)
    for r0, m in ((0, 2), (2, 4), (6, 2)):
        stripe = continuous_pos_bias_stripe(cpb, d1, d2, r0, m)
        np.testing.assert_allclose(
            np.asarray(stripe), np.asarray(full[:, r0 * d2:(r0 + m) * d2]),
            atol=1e-6)


def test_blockwise_latents_match_dense(setup):
    """Single-chip blockwise spatial stage (streamed CPB column stripes) ==
    the dense encoder."""
    from ct_clip_ut_tpu.parallel.sp_encoder import \
        encode_image_latents_blockwise
    _, params, image = setup
    want, _ = encode_image_latents(params, CFG, image, freeze_vq=True)
    got = jax.jit(lambda p, im: encode_image_latents_blockwise(
        p, CFG, im, block=16))(params, image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_sp_latents_match_dense(setup):
    mesh, params, image = setup
    want, _ = encode_image_latents(params, CFG, image, freeze_vq=True)
    got = encode_image_latents_sp(params, CFG, image, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_sp_gradients_match_dense(setup):
    """d(loss)/d(spatial params + image) agree — halo exchange, ring
    attention and the CPB stripe are differentiable end-to-end."""
    mesh, params, image = setup

    def loss_sp(params, image):
        lat = encode_image_latents_sp(params, CFG, image, mesh)
        return (lat.astype(jnp.float32) ** 2).sum()

    def loss_dense(params, image):
        lat, _ = encode_image_latents(params, CFG, image, freeze_vq=True)
        return (lat.astype(jnp.float32) ** 2).sum()

    gs = jax.grad(loss_sp, argnums=(0, 1))(params, image)
    gd = jax.grad(loss_dense, argnums=(0, 1))(params, image)
    # spatial-stack params (the SP-specific machinery) + the image grad
    for sub in ("spatial", "spatial_rel_pos_bias", "to_patch_emb"):
        fr, _ = jax.tree_util.tree_flatten(gs[0]["visual_transformer"][sub])
        fd, _ = jax.tree_util.tree_flatten(gd[0]["visual_transformer"][sub])
        for a, b in zip(fr, fd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4, err_msg=sub)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               atol=5e-4, rtol=5e-4)
