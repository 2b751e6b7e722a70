"""GradCache chunked contrastive train step: full-batch InfoNCE objective at
microbatch memory (train/trainer.py:make_train_step_gradcache).

The pin here is EXACTNESS: plain gradient accumulation is invalid for the
reference's objective (the sim matrix couples the whole global batch,
reference ctclip.py:10-41 + CTClipTrainer.py:164-175), so the chunked step
must reproduce the single-pass step's loss, parameter update, and VQ EMA —
not approximate them. Dropout is disabled in these configs (the only
legitimate divergence: mask draws per microbatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   MeshConfig, TrainConfig, replace)
from ct_clip_ut_tpu.parallel import sharding
from ct_clip_ut_tpu.parallel.mesh import make_mesh
from ct_clip_ut_tpu.train import trainer as trainer_mod

KEY = jax.random.PRNGKey(0)

BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                  intermediate_size=64, max_position_embeddings=16,
                  hidden_dropout=0.0, attention_dropout=0.0)
VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                  temporal_patch_size=10, spatial_depth=1, temporal_depth=1,
                  dim_head=4, heads=4)
CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                    ctvit=VIT, bert=BERT)
TRAIN = TrainConfig(lr=1e-3, compute_dtype="float32")


def make_batch(key, b):
    k1, k2 = jax.random.split(key)
    image = jax.random.normal(k1, (b, 1, 20, 32, 32))
    ids = jax.random.randint(k2, (b, 8), 0, 64)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    return image, tokens


def sgd_state_and_step(cfg):
    """A train state over plain SGD: params_new = params - lr * grad, so a
    param diff IS a grad diff. Adam's first step is ~lr * sign(grad), which
    amplifies benign fp-reassociation noise on near-zero grads and would
    make an exact-equality pin meaningless."""
    import optax
    tx = optax.sgd(1e-3)
    params = trainer_mod.create_train_state(KEY, CLIP, cfg)[0].params
    state = trainer_mod.TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.fold_in(KEY, 0))
    return state, trainer_mod.make_train_step(CLIP, cfg, tx)


def _tree_allclose(a, b, rtol, atol):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def test_gradcache_matches_full_batch_step():
    image, tokens = make_batch(jax.random.PRNGKey(1), 4)

    state_f, step_f = sgd_state_and_step(TRAIN)
    state_f, loss_f = step_f(state_f, image, tokens)

    cfg_gc = replace(TRAIN, grad_accum=2)
    state_g, step_g = sgd_state_and_step(cfg_gc)
    state_g, loss_g = step_g(state_g, image, tokens)

    np.testing.assert_allclose(float(loss_f), float(loss_g),
                               rtol=1e-6, atol=1e-7)
    # updated params (incl. temperature grad routed through the loss head)
    _tree_allclose(state_f.params, state_g.params, rtol=2e-5, atol=1e-6)
    # VQ EMA: microbatch stats summed == full-batch stats
    vq_f = state_f.params["visual_transformer"]["vq"]
    vq_g = state_g.params["visual_transformer"]["vq"]
    np.testing.assert_allclose(np.asarray(vq_f.cluster_size),
                               np.asarray(vq_g.cluster_size),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vq_f.embed_avg),
                               np.asarray(vq_g.embed_avg),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_gradcache_sharded_matches_unsharded():
    """DP-sharded GradCache step == single-device GradCache step: the scan
    microbatch axis composes with GSPMD batch sharding."""
    cfg_gc = replace(TRAIN, grad_accum=2)
    image, tokens = make_batch(jax.random.PRNGKey(2), 8)

    state_1, step_1 = sgd_state_and_step(cfg_gc)
    state_1, loss_1 = step_1(state_1, image, tokens)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    state_m, step_m = sgd_state_and_step(cfg_gc)
    state_m = state_m._replace(
        params=sharding.shard_params(state_m.params, mesh),
        opt_state=jax.device_put(state_m.opt_state,
                                 sharding.replicated(mesh)))
    img_s = sharding.shard_batch(image, mesh)
    tok_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    state_m, loss_m = step_m(state_m, img_s, tok_s)

    np.testing.assert_allclose(float(loss_1), float(loss_m),
                               rtol=1e-5, atol=1e-6)
    _tree_allclose(jax.device_get(state_1.params),
                   jax.device_get(state_m.params), rtol=2e-5, atol=1e-6)


def test_gradcache_many_chunks_loss_decreases():
    """k=4 chunking trains: loss goes down over a few steps and the VQ EMA
    moves, with step semantics identical to the single-pass driver path."""
    cfg_gc = replace(TRAIN, grad_accum=4)
    state, tx = trainer_mod.create_train_state(KEY, CLIP, cfg_gc)
    step = trainer_mod.make_train_step(CLIP, cfg_gc, tx)
    image, tokens = make_batch(jax.random.PRNGKey(3), 8)

    cluster0 = np.asarray(state.params["visual_transformer"]["vq"].cluster_size)
    losses = []
    for _ in range(6):
        state, loss = step(state, image, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    cluster1 = np.asarray(state.params["visual_transformer"]["vq"].cluster_size)
    assert not np.allclose(cluster0, cluster1)
    assert int(state.step) == 6


def test_gradcache_with_remat_matches_full_batch_step():
    """grad_accum composes with per-layer remat (the flagship training
    config): scan-of-vjp over jax.checkpoint'd layers still reproduces the
    plain full-batch step."""
    import optax

    clip_r = replace(CLIP, ctvit=replace(VIT, remat=True))
    image, tokens = make_batch(jax.random.PRNGKey(4), 4)
    tx = optax.sgd(1e-3)

    def fresh(cfg, clip):
        params = trainer_mod.create_train_state(KEY, clip, cfg)[0].params
        return trainer_mod.TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=jax.random.fold_in(KEY, 0))

    step_f = trainer_mod.make_train_step(CLIP, TRAIN, tx)
    state_f, loss_f = step_f(fresh(TRAIN, CLIP), image, tokens)

    cfg_gc = replace(TRAIN, grad_accum=2)
    step_g = trainer_mod.make_train_step(clip_r, cfg_gc, tx)
    state_g, loss_g = step_g(fresh(cfg_gc, clip_r), image, tokens)

    np.testing.assert_allclose(float(loss_f), float(loss_g),
                               rtol=1e-6, atol=1e-7)
    _tree_allclose(state_f.params, state_g.params, rtol=2e-5, atol=1e-6)
