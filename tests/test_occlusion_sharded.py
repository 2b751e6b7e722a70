"""Mesh-sharded occlusion equals the single-device sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   MeshConfig, OcclusionConfig)
from ct_clip_ut_tpu.attribution import occlusion as occ_mod
from ct_clip_ut_tpu.models import ctclip as ctclip_mod
from ct_clip_ut_tpu.parallel.mesh import make_mesh

SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


def test_sharded_occlusion_matches_single_device():
    params = ctclip_mod.init_ctclip(jax.random.PRNGKey(0), SMALL_CLIP)
    image = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 20, 32, 32))
    ids = jnp.asarray([[1, 5, 9]])
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 8, 8))

    latent = occ_mod.report_text_latent(params, SMALL_CLIP, tokens)
    coords = occ_mod.window_grid((20, 32, 32), occ.patch_size, occ.stride)
    assert coords.shape[0] == 27  # 3*3*3, indivisible by 8 -> pads

    orig_s, scores_s = occ_mod.occlusion_scores(
        params, SMALL_CLIP, image, latent, coords, occ=occ, chunk=4)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    orig_m, scores_m = occ_mod.occlusion_scores_sharded(
        params, SMALL_CLIP, image, latent, coords, mesh, occ=occ, chunk=4)

    np.testing.assert_allclose(float(orig_m), float(orig_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_m), np.asarray(scores_s),
                               rtol=1e-4, atol=1e-5)


def test_sharded_multi_occlusion_matches_single_device():
    """Window sharding x multi-pathology scoring composed: one sweep over
    the mesh 'data' axis scores K pathologies, equal to the single-device
    multi sweep."""
    params = ctclip_mod.init_ctclip(jax.random.PRNGKey(0), SMALL_CLIP)
    image = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 20, 32, 32))
    ids = jnp.asarray([[1, 5, 9]])
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 8, 8))

    latents = jnp.stack([
        occ_mod.report_text_latent(params, SMALL_CLIP, tokens),
        occ_mod.diff_embedding_latent(
            params, SMALL_CLIP,
            jax.random.normal(jax.random.PRNGKey(3), (32,)))])
    coords = occ_mod.window_grid((20, 32, 32), occ.patch_size, occ.stride)

    orig_s, scores_s = occ_mod.occlusion_scores_multi(
        params, SMALL_CLIP, image, latents, coords, occ=occ, chunk=4)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    orig_m, scores_m = occ_mod.occlusion_scores_multi_sharded(
        params, SMALL_CLIP, image, latents, coords, mesh, occ=occ, chunk=4)

    np.testing.assert_allclose(np.asarray(orig_m), np.asarray(orig_s),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_m), np.asarray(scores_s),
                               rtol=1e-4, atol=1e-5)
