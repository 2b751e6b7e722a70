"""Training step, multi-device sharding, and zero-shot scoring tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   MeshConfig, TrainConfig)
from ct_clip_ut_tpu.models import ctclip as ctclip_mod
from ct_clip_ut_tpu.infer import zeroshot as zs
from ct_clip_ut_tpu.parallel import sharding
from ct_clip_ut_tpu.parallel.mesh import make_mesh
from ct_clip_ut_tpu.train import trainer as trainer_mod

KEY = jax.random.PRNGKey(0)

SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)
TRAIN = TrainConfig(lr=1e-3, compute_dtype="float32")


def make_batch(key, b):
    k1, k2 = jax.random.split(key)
    image = jax.random.normal(k1, (b, 1, 20, 32, 32))
    ids = jax.random.randint(k2, (b, 8), 0, 64)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    return image, tokens


def test_train_step_reduces_loss_and_updates_vq():
    state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)
    image, tokens = make_batch(jax.random.PRNGKey(1), 4)

    cluster0 = np.asarray(state.params["visual_transformer"]["vq"].cluster_size)
    losses = []
    for _ in range(8):
        state, loss = step(state, image, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # VQ EMA ran (cluster sizes moved)
    cluster1 = np.asarray(state.params["visual_transformer"]["vq"].cluster_size)
    assert not np.allclose(cluster0, cluster1)
    assert int(state.step) == 8


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_train_step_sharded_8dev():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    state = state._replace(
        params=sharding.shard_params(state.params, mesh),
        opt_state=jax.device_put(state.opt_state, sharding.replicated(mesh)))
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)

    image, tokens = make_batch(jax.random.PRNGKey(2), 8)
    image = sharding.shard_batch(image, mesh)
    tokens = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}

    state, loss = step(state, image, tokens)
    assert np.isfinite(float(loss))

    # global contrastive semantics: sim matrix is [8, 8] over the global batch
    out = ctclip_mod.ctclip_apply(
        jax.device_get(state.params), SMALL_CLIP,
        jax.device_get(tokens), jax.device_get(image))
    assert out.sim_matrix.shape == (8, 8)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_sharded_loss_matches_single_device():
    """DP sharding must not change the math."""
    mesh = make_mesh(MeshConfig(data=8, model=1))
    state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)
    image, tokens = make_batch(jax.random.PRNGKey(3), 8)

    _, loss_single = step(state, image, tokens)

    state2, _ = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    state2 = state2._replace(
        params=sharding.shard_params(state2.params, mesh),
        opt_state=jax.device_put(state2.opt_state, sharding.replicated(mesh)))
    image_s = sharding.shard_batch(image, mesh)
    tokens_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    _, loss_sharded = step(state2, image_s, tokens_s)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-5)


def test_zeroshot_hoisting_is_scoring_exact():
    """Batched scoring with hoisted image latents == the reference's
    per-pathology full-forward loop (CTClipInference.py:158-178)."""
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    image = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 20, 32, 32))

    n_path = 3
    rs = np.random.RandomState(0)
    prompt_ids = jnp.asarray(rs.randint(0, 64, (2 * n_path, 8)))
    prompt_tokens = {"input_ids": prompt_ids,
                     "attention_mask": jnp.ones_like(prompt_ids)}

    # ours
    prompt_latents = ctclip_mod.encode_text_latents(params, SMALL_CLIP, prompt_tokens)
    probs = zs.zeroshot_probs(params, SMALL_CLIP, image, prompt_latents,
                              compute_dtype="float32")

    # reference-style: per pathology, full forward with the 2-prompt pair,
    # per-sample diagonal, softmax([present, absent])
    want = np.zeros((2, n_path))
    for j in range(n_path):
        pair = {k: v[2 * j:2 * j + 2] for k, v in prompt_tokens.items()}
        out = ctclip_mod.ctclip_apply(params, SMALL_CLIP, pair, image)
        sim_present = np.asarray(out.image_latents @ out.text_latents[0::1][0:1].T
                                 * out.temperature)
        # present/absent split of the text latents (reference validate_prompts)
        txt = np.asarray(out.text_latents)
        img = np.asarray(out.image_latents)
        temp = float(out.temperature)
        for b in range(2):
            present = img[b] @ txt[0] * temp
            absent = img[b] @ txt[1] * temp
            e = np.exp([present, absent] - max(present, absent))
            want[b, j] = e[0] / e.sum()

    np.testing.assert_allclose(np.asarray(probs)[:, :n_path], want, atol=1e-5)


def test_zeroshot_sharded_matches_single_device():
    """DP-sharded zero-shot scoring over the 8-device mesh == the
    single-device batched scorer (the reference's DDP eval semantics,
    CTClipInference.py:59,79-88)."""
    mesh = make_mesh(MeshConfig(data=8, model=1))
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    image = jax.random.normal(jax.random.PRNGKey(4), (8, 1, 20, 32, 32))

    rs = np.random.RandomState(0)
    prompt_ids = jnp.asarray(rs.randint(0, 64, (6, 8)))
    prompt_tokens = {"input_ids": prompt_ids,
                     "attention_mask": jnp.ones_like(prompt_ids)}
    prompt_latents = ctclip_mod.encode_text_latents(params, SMALL_CLIP,
                                                    prompt_tokens)

    single = zs.zeroshot_probs(params, SMALL_CLIP, image, prompt_latents,
                               compute_dtype="float32")
    sharded = zs.zeroshot_probs_sharded(params, SMALL_CLIP, image,
                                        prompt_latents, mesh,
                                        compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-6)

    # 4x2 mesh (DP x TP) agrees too
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    sharded2 = zs.zeroshot_probs_sharded(params, SMALL_CLIP, image,
                                         prompt_latents, mesh2,
                                         compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(sharded2), np.asarray(single),
                               atol=1e-5)

    # indivisible batches pad internally (short final loader batch, batch 1
    # on a wide axis) — real rows unchanged, pads sliced off
    for b in (3, 1):
        sharded_b = zs.zeroshot_probs_sharded(params, SMALL_CLIP, image[:b],
                                              prompt_latents, mesh,
                                              compute_dtype="float32")
        assert sharded_b.shape[0] == b
        np.testing.assert_allclose(np.asarray(sharded_b),
                                   np.asarray(single[:b]), atol=1e-6)


def test_metrics_shapes():
    from ct_clip_ut_tpu.utils import metrics as M
    rs = np.random.RandomState(1)
    preds = rs.rand(32, 4)
    targets = (rs.rand(32, 4) > 0.5).astype(np.float32)
    m = M.calculate_metrics(preds, targets, ["a", "b", "c", "d"])
    for k in ("macro_f1", "micro_f1", "sample_f1", "mean_roc_auc", "mAP",
              "label_accuracy"):
        assert np.isfinite(m[k]), k
    assert len(m["per_class_f1"]) == 4


def test_save_metrics_writes_table(tmp_path):
    from ct_clip_ut_tpu.utils import metrics as M
    rs = np.random.RandomState(2)
    preds = rs.rand(16, 2)
    targets = (rs.rand(16, 2) > 0.5).astype(np.float32)
    m = M.calculate_metrics(preds, targets, ["x", "y"])
    M.save_metrics([m], ["x", "y"], tmp_path)
    text = (tmp_path / "metrics.txt").read_text()
    assert "Mean ROC-AUC" in text and "x" in text


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_train_step_tp_mesh_params_match_single_device():
    """Single-pass train step on a ("data","model")=(4,2) mesh produces the
    SAME parameter update as a single device — at the PARAM level, not just
    the loss. The loss-only check above passed for a whole round while TP
    PEG gradients were silently scaled 2x by the grouped-conv GSPMD bug
    (ops/layers._peg_weight_grads_taps); this pins the update itself. SGD
    so a param diff IS a grad diff (Adam's first step amplifies benign fp
    noise on near-zero grads)."""
    import optax

    cfg = TrainConfig(lr=1e-3, compute_dtype="float32")
    tx = optax.sgd(1e-3)
    image, tokens = make_batch(jax.random.PRNGKey(5), 8)

    def fresh_state():
        params = trainer_mod.create_train_state(KEY, SMALL_CLIP, cfg)[0].params
        return trainer_mod.TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=jax.random.fold_in(KEY, 0))

    step = trainer_mod.make_train_step(SMALL_CLIP, cfg, tx)
    state_1, loss_1 = step(fresh_state(), image, tokens)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    state_m = fresh_state()
    state_m = state_m._replace(
        params=sharding.shard_params(state_m.params, mesh),
        opt_state=jax.device_put(state_m.opt_state,
                                 sharding.replicated(mesh)))
    img_s = sharding.shard_batch(image, mesh)
    tok_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    state_m, loss_m = step(state_m, img_s, tok_s)

    np.testing.assert_allclose(float(loss_1), float(loss_m),
                               rtol=1e-5, atol=1e-6)
    flat_1, _ = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_1.params))
    flat_m, _ = jax.tree.flatten(jax.device_get(state_m.params))
    for (path, a), b in zip(flat_1, flat_m):
        if np.asarray(a).size == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))
