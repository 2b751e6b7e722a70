"""Fully-sharded data parallelism (ZeRO-3 semantics via GSPMD).

Params, grads, and Adam moments live sharded over the "data" mesh axis at
rest (parallel/sharding.py fsdp_param_specs / opt_state_specs); the train
step's math must be IDENTICAL to plain DP — GSPMD only changes where the
all-gathers/reduce-scatters happen. Beyond reference parity: the reference
is plain DDP (full replica per GPU, src/utils/CTClipTrainer.py:62-69).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   MeshConfig, TrainConfig)
from ct_clip_ut_tpu.models.ctclip import init_ctclip
from ct_clip_ut_tpu.parallel import sharding
from ct_clip_ut_tpu.parallel.mesh import make_mesh
from ct_clip_ut_tpu.train import trainer as trainer_mod

KEY = jax.random.PRNGKey(0)

# dropout off so the GradCache-vs-single-pass equality below is exact
# (per-microbatch fold_in draws are GradCache's one legitimate divergence)
SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16,
                        hidden_dropout=0.0, attention_dropout=0.0)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)
TRAIN = TrainConfig(lr=1e-3, compute_dtype="float32", fsdp=True)


def make_batch(key, b):
    k1, k2 = jax.random.split(key)
    image = jax.random.normal(k1, (b, 1, 20, 32, 32))
    ids = jax.random.randint(k2, (b, 8), 0, 64)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    return image, tokens


@pytest.fixture
def tiny_fsdp(monkeypatch):
    """Shard every divisible leaf: the small test model is below the
    production _FSDP_MIN_SIZE threshold."""
    monkeypatch.setattr(sharding, "_FSDP_MIN_SIZE", 0)


def test_fsdp_specs_shard_flagship_params_without_allocating():
    """Spec rule on the real flagship shapes via eval_shape (no memory):
    every large leaf picks up a "data" axis on a divisible dim, TP ("model")
    placements are preserved, and Adam moments mirror their param."""
    from bench import flagship_cfg
    import optax
    cfg = flagship_cfg()
    shapes = jax.eval_shape(lambda k: init_ctclip(k, cfg), KEY)
    specs = sharding.fsdp_param_specs(shapes, data_size=4)

    flat = jax.tree_util.tree_flatten_with_path((shapes, specs))[0]
    n_leaves = len(flat) // 2
    leaves = jax.tree_util.tree_leaves(shapes)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert len(leaves) == len(spec_leaves) and n_leaves == len(leaves)
    n_data = 0
    for leaf, spec in zip(leaves, spec_leaves):
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        if "data" in entries:
            n_data += 1
            i = entries.index("data")
            assert leaf.shape[i] % 4 == 0
            assert leaf.size >= sharding._FSDP_MIN_SIZE
        elif leaf.size >= sharding._FSDP_MIN_SIZE and leaf.ndim:
            # only legitimately skipped when no free dim divides
            free = [d for e, d in zip(entries, leaf.shape) if e is None]
            assert not any(d % 4 == 0 for d in free), (leaf.shape, spec)
    # the model has real mass to shard
    assert n_data >= 20

    # TP placements survive: the visual projection keeps "model" on dim 0
    vis = specs["to_visual_latent"]["w"]
    assert vis[0] == "model" and "data" in tuple(vis)

    # Adam moments follow their param exactly
    tx = optax.adam(1e-3)
    opt_shapes = jax.eval_shape(tx.init, shapes)
    opt_specs = sharding.opt_state_specs(opt_shapes, fsdp_data_size=4)
    assert opt_specs[0].mu["to_visual_latent"]["w"] == vis
    assert opt_specs[0].nu["to_visual_latent"]["w"] == vis


def _fsdp_state(mesh, train_cfg):
    state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, train_cfg)
    return trainer_mod.shard_train_state(state, mesh, fsdp=True), tx


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_fsdp_train_step_matches_unsharded(tiny_fsdp):
    mesh = make_mesh(MeshConfig(data=8, model=1))
    image, tokens = make_batch(jax.random.PRNGKey(1), 8)

    ref_state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)
    ref_losses = []
    for _ in range(2):
        ref_state, loss = step(ref_state, image, tokens)
        ref_losses.append(float(loss))

    state, tx2 = _fsdp_state(mesh, TRAIN)
    # at least one leaf is genuinely sharded over data at rest
    w = state.params["to_visual_latent"]["w"]
    assert "data" in jax.tree_util.tree_leaves(
        [tuple(w.sharding.spec)], is_leaf=lambda x: isinstance(x, tuple))[0]
    shard_rows = w.addressable_shards[0].data.shape
    assert np.prod(shard_rows) == w.size // 8, (shard_rows, w.shape)

    step_f = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx2)
    img_s = sharding.shard_batch(image, mesh)
    tok_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    losses = []
    for _ in range(2):
        state, loss = step_f(state, img_s, tok_s)
        losses.append(float(loss))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.params["to_visual_latent"]["w"], np.float32),
        np.asarray(ref_state.params["to_visual_latent"]["w"], np.float32),
        rtol=1e-5, atol=1e-6)
    # the updated params are STILL fsdp-sharded (no silent re-replication)
    out_spec = tuple(state.params["to_visual_latent"]["w"].sharding.spec)
    assert "data" in out_spec, out_spec


def test_fsdp_composes_with_tp(tiny_fsdp):
    mesh = make_mesh(MeshConfig(data=4, model=2))
    image, tokens = make_batch(jax.random.PRNGKey(2), 8)

    ref_state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)
    _, ref_loss = step(ref_state, image, tokens)

    state, tx2 = _fsdp_state(mesh, TRAIN)
    w = state.params["to_visual_latent"]["w"]
    assert tuple(w.sharding.spec)[0] == "model"   # TP placement preserved
    step_f = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx2)
    img_s = sharding.shard_batch(image, mesh)
    tok_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    _, loss = step_f(state, img_s, tok_s)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_fsdp_gradcache_matches_single_pass(tiny_fsdp):
    cfg_gc = TrainConfig(lr=1e-3, compute_dtype="float32", grad_accum=2,
                         fsdp=True)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    image, tokens = make_batch(jax.random.PRNGKey(3), 16)

    ref_state, tx = trainer_mod.create_train_state(KEY, SMALL_CLIP, TRAIN)
    step = trainer_mod.make_train_step(SMALL_CLIP, TRAIN, tx)
    _, ref_loss = step(ref_state, image, tokens)

    state, tx2 = _fsdp_state(mesh, cfg_gc)
    step_gc = trainer_mod.make_train_step(SMALL_CLIP, cfg_gc, tx2)
    img_s = sharding.shard_batch(image, mesh)
    tok_s = {k: sharding.shard_batch(v, mesh) for k, v in tokens.items()}
    _, loss = step_gc(state, img_s, tok_s)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)


def test_msgpack_load_restores_fsdp_sharding(tiny_fsdp, tmp_path):
    """flax from_bytes returns host numpy leaves; load_model must re-place
    them on the live state's shardings or a restored FSDP/TP run silently
    continues replicated."""
    trainer = trainer_mod.CTClipTrainer(
        SMALL_CLIP, TRAIN, tokenizer=None, train_data=[], valid_data=[],
        results_folder=str(tmp_path))
    w = trainer.state.params["to_visual_latent"]["w"]
    spec0 = tuple(w.sharding.spec)
    assert "data" in spec0   # fsdp actually sharded it
    from ct_clip_ut_tpu.train import checkpoint as ckpt
    ckpt.save_checkpoint(tmp_path / "ckpt.msgpack", trainer.state)
    trainer.load_model(tmp_path / "ckpt.msgpack")
    w1 = trainer.state.params["to_visual_latent"]["w"]
    assert tuple(w1.sharding.spec) == spec0, (spec0, tuple(w1.sharding.spec))
    np.testing.assert_array_equal(np.asarray(w1, np.float32),
                                  np.asarray(w, np.float32))


def test_fsdp_multiprocess_requires_sharded_checkpoints(monkeypatch):
    """msgpack saves gather the full state onto process 0 — impossible when
    FSDP means no process holds every shard. The trainer must refuse at
    construction, not crash at the first epoch-end save."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="sharded_checkpoints"):
        trainer_mod.CTClipTrainer(
            SMALL_CLIP, TRAIN, tokenizer=None, train_data=[], valid_data=[],
            results_folder="/tmp/fsdp_guard_test")


def test_cli_fsdp_flag():
    from ct_clip_ut_tpu.scripts.train_ctclip import build_parser
    args = build_parser().parse_args(
        ["--data-train", "a", "--data-valid", "b", "--train-reports", "c",
         "--valid-reports", "d", "--valid-labels", "e",
         "--train-metadata", "f", "--valid-metadata", "g", "--fsdp"])
    assert args.fsdp is True
