"""Model-level parity and wiring tests (BERT vs HF torch, CT-ViT, CTCLIP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.models import bert as bert_mod
from ct_clip_ut_tpu.models import ctclip as ctclip_mod
from ct_clip_ut_tpu.models import ctvit as ctvit_mod
from ct_clip_ut_tpu.train import checkpoint as ckpt

KEY = jax.random.PRNGKey(0)

SMALL_BERT = BertConfig(vocab_size=100, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=24)

# tiny CT-ViT: 32^2 x 20 volume -> 4x4 spatial x 2 temporal grid
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=2,
                        temporal_depth=2, dim_head=4, heads=4)

SMALL_CLIP = CTCLIPConfig(
    dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
    ctvit=SMALL_VIT, bert=SMALL_BERT)


def hf_bert(cfg):
    import torch
    from transformers import BertConfig as HFConfig, BertModel
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    return BertModel(hf_cfg).eval()


def test_bert_parity_vs_hf():
    import torch
    model = hf_bert(SMALL_BERT)
    params = ckpt.convert_bert(model.state_dict(), SMALL_BERT)

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 100, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[0, 8:] = 0
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long()
                     ).last_hidden_state.numpy()
    got = bert_mod.bert_apply(params, SMALL_BERT, jnp.asarray(ids),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # CLS slice matches too (the piece CTCLIP consumes, reference ctclip.py:107)
    cls = bert_mod.bert_cls(params, SMALL_BERT, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(cls), want[:, 0, :], atol=2e-5)


def test_fused_conv_patch_embed_matches_reference_path():
    """LN-folded strided-conv patch embed == patchify + LN + Linear + LN."""
    p = ctvit_mod.init_ctvit(KEY, SMALL_VIT)
    # randomize LN params so the fold is actually exercised
    import jax
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    p["to_patch_emb"]["norm_in"]["gamma"] = (
        jax.random.normal(k1, p["to_patch_emb"]["norm_in"]["gamma"].shape) + 1.0)
    p["to_patch_emb"]["norm_in"]["beta"] = (
        jax.random.normal(k2, p["to_patch_emb"]["norm_in"]["beta"].shape))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 20, 32, 32))
    ref = ctvit_mod._patch_embed(p["to_patch_emb"],
                                 ctvit_mod.patchify(img, 8, 10))
    fused = ctvit_mod._patch_embed_conv(p["to_patch_emb"], img, 8, 10)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_patchify_matches_einops():
    from einops import rearrange
    rs = np.random.RandomState(1)
    img = rs.randn(2, 1, 20, 32, 32).astype(np.float32)
    got = ctvit_mod.patchify(jnp.asarray(img), patch=8, t_patch=10)
    want = rearrange(img, "b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)",
                     pt=10, p1=8, p2=8)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_ctvit_forward_shapes_and_ids():
    params = ctvit_mod.init_ctvit(KEY, SMALL_VIT)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 20, 32, 32))
    out = ctvit_mod.ctvit_apply(params, SMALL_VIT, img, return_weights=True)
    assert out.tokens.shape == (2, 2, 4, 4, 16)
    assert out.codebook_ids.shape == (2, 2, 4, 4)
    assert out.codebook_ids.dtype in (jnp.int32, jnp.int64)
    assert len(out.spatial_attn) == 2 and len(out.temporal_attn) == 2
    # spatial attention over (b t) batches of 16 tokens
    assert out.spatial_attn[0].shape == (4, 4, 16, 16)
    # temporal attention over (b h w) batches of 2 frames
    assert out.temporal_attn[0].shape == (32, 4, 2, 2)
    # quantized rows are unit-norm codebook entries
    norms = np.linalg.norm(np.asarray(out.tokens), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_ctvit_first_frame_path():
    cfg = ctvit_mod.CTViTConfig(
        dim=16, codebook_size=32, image_size=32, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=4, heads=4, model_type="ctgenerate")
    params = ctvit_mod.init_ctvit(KEY, cfg)
    # 1 + 2*k frames: first frame separate, rest in temporal patches of 2
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 9, 32, 32))
    out = ctvit_mod.ctvit_apply(params, cfg, img)
    assert out.codebook_ids.shape == (1, 1 + 4, 4, 4)


def test_ctclip_forward_and_loss():
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 20, 32, 32))
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 100, (2, 10)))
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    out = ctclip_mod.ctclip_apply(params, SMALL_CLIP, tokens, img)
    assert out.sim_matrix.shape == (2, 2)
    assert out.image_latents.shape == (2, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.image_latents), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.text_latents), axis=-1), 1.0, atol=1e-5)
    # sim = temp * cos in [-temp, temp]
    assert float(jnp.abs(out.sim_matrix).max()) <= float(out.temperature) + 1e-4

    # loss parity vs torch cross-entropy oracle (reference CTClipTrainer.py:164-175)
    import torch
    import torch.nn.functional as F
    sim_t = torch.from_numpy(np.asarray(out.sim_matrix))
    tgt = torch.arange(2)
    want = ((F.cross_entropy(sim_t, tgt) + F.cross_entropy(sim_t.t(), tgt)) / 2).item()
    got = float(ctclip_mod.contrastive_loss(out.sim_matrix))
    assert abs(got - want) < 1e-5


def test_ctclip_text_embeds_bypass():
    """Precomputed text-embedding bypass (reference ctclip.py:107)."""
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 20, 32, 32))
    embeds = jax.random.normal(jax.random.PRNGKey(5), (1, 32))
    out = ctclip_mod.ctclip_apply(params, SMALL_CLIP, None, img,
                                  text_embeds=embeds)
    assert out.sim_matrix.shape == (1, 1)


def test_ctclip_grad_flows_through_vq():
    """Straight-through VQ: image gradient for a sim score must be nonzero
    (the substrate for IG / occlusion / grad-cam)."""
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    ids = jnp.asarray([[1, 2, 3]])
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    img = jax.random.normal(jax.random.PRNGKey(6), (1, 1, 20, 32, 32))

    def score(im):
        return ctclip_mod.ctclip_apply(params, SMALL_CLIP, tokens, im).sim_matrix[0, 0]

    g = jax.grad(score)(img)
    assert g.shape == img.shape
    assert float(jnp.abs(g).sum()) > 0


def test_ctclip_checkpoint_roundtrip(tmp_path):
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    ckpt.save_checkpoint(tmp_path / "ck.msgpack", params)
    template = jax.tree.map(jnp.zeros_like, params)
    restored = ckpt.load_checkpoint(tmp_path / "ck.msgpack", template)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_roundtrip_and_reshard(tmp_path):
    """orbax sharded checkpoint: save a TrainState sharded over a 4x2 mesh
    (per-process shard writes, checkpoint.save_checkpoint_sharded), restore
    (a) onto the same shardings and (b) RESHARDED onto an 8x1 mesh — both
    bit-equal, (b) carrying the new placement. Covers the empty-leaf
    (null_kv) placeholder packing."""
    from ct_clip_ut_tpu.config import MeshConfig, TrainConfig
    from ct_clip_ut_tpu.parallel import sharding
    from ct_clip_ut_tpu.parallel.mesh import make_mesh
    from ct_clip_ut_tpu.train import trainer as trainer_mod

    state, _ = trainer_mod.create_train_state(KEY, SMALL_CLIP, TrainConfig())
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state = state._replace(
        params=sharding.shard_params(state.params, mesh),
        opt_state=jax.device_put(state.opt_state, sharding.replicated(mesh)))

    path = tmp_path / "ck.orbax"
    ckpt.save_checkpoint_sharded(path, state)

    def assert_equal(restored):
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert_equal(ckpt.load_checkpoint_sharded(path, state))

    mesh2 = make_mesh(MeshConfig(data=8, model=1))
    state2 = state._replace(
        params=jax.device_put(jax.tree.map(np.asarray, state.params),
                              sharding.param_shardings(state.params, mesh2)),
        opt_state=jax.device_put(jax.tree.map(np.asarray, state.opt_state),
                                 sharding.replicated(mesh2)))
    restored2 = ckpt.load_checkpoint_sharded(path, state2)
    assert_equal(restored2)
    leaf = restored2.params["visual_transformer"]["to_patch_emb"]["proj"]["w"]
    assert leaf.sharding.mesh.shape["data"] == 8
