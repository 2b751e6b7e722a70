"""torch->jax converter: consumes the reference's exact state_dict naming.

Builds a synthetic CTCLIP state dict with the reference's key layout
(HF BERT under text_transformer.*, CT-ViT Sequential/ModuleList indices,
custom-LayerNorm gamma + beta buffers, vq._codebook EMA buffers,
reference ctclip.py:44-68 heads) and checks conversion + a forward pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig,
                                   CTGenerateConfig, CTViTConfig,
                                   MaskGitConfig)
from ct_clip_ut_tpu.models import ctclip as ctclip_mod
from ct_clip_ut_tpu.train import checkpoint as ckpt

torch = pytest.importorskip("torch")

BERT = BertConfig(vocab_size=100, hidden_size=32, num_layers=1, num_heads=4,
                  intermediate_size=64, max_position_embeddings=24)
VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                  temporal_patch_size=10, spatial_depth=2, temporal_depth=2,
                  dim_head=4, heads=4)
CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                    ctvit=VIT, bert=BERT)


def t(*shape, seed=0):
    g = torch.Generator().manual_seed(seed + sum(shape))
    return torch.randn(*shape, generator=g)


def bert_sd(prefix, cfg):
    sd = {
        f"{prefix}embeddings.word_embeddings.weight": t(cfg.vocab_size, cfg.hidden_size),
        f"{prefix}embeddings.position_embeddings.weight": t(cfg.max_position_embeddings, cfg.hidden_size),
        f"{prefix}embeddings.token_type_embeddings.weight": t(cfg.type_vocab_size, cfg.hidden_size),
        f"{prefix}embeddings.LayerNorm.weight": torch.ones(cfg.hidden_size),
        f"{prefix}embeddings.LayerNorm.bias": torch.zeros(cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}"
        for name, shp in [("attention.self.query", (cfg.hidden_size, cfg.hidden_size)),
                          ("attention.self.key", (cfg.hidden_size, cfg.hidden_size)),
                          ("attention.self.value", (cfg.hidden_size, cfg.hidden_size)),
                          ("attention.output.dense", (cfg.hidden_size, cfg.hidden_size)),
                          ("intermediate.dense", (cfg.intermediate_size, cfg.hidden_size)),
                          ("output.dense", (cfg.hidden_size, cfg.intermediate_size))]:
            sd[f"{lp}.{name}.weight"] = t(*shp)
            sd[f"{lp}.{name}.bias"] = t(shp[0])
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[f"{lp}.{ln}.weight"] = torch.ones(cfg.hidden_size)
            sd[f"{lp}.{ln}.bias"] = torch.zeros(cfg.hidden_size)
    return sd


def attention_sd(prefix, dim, dim_head, heads, null_kv=0, dim_context=None):
    inner = dim_head * heads
    ctx = dim_context or dim
    return {
        f"{prefix}.norm.gamma": torch.ones(dim),
        f"{prefix}.norm.beta": torch.zeros(dim),        # frozen buffer
        f"{prefix}.context_norm.gamma": torch.ones(ctx),
        f"{prefix}.context_norm.beta": torch.zeros(ctx),
        f"{prefix}.to_q.weight": t(inner, dim),
        f"{prefix}.to_kv.weight": t(inner * 2, ctx),
        f"{prefix}.to_out.weight": t(dim, inner),
        f"{prefix}.q_scale": torch.ones(dim_head),
        f"{prefix}.k_scale": torch.ones(dim_head),
        f"{prefix}.null_kv": t(heads, 2 * null_kv, dim_head) if null_kv
        else torch.zeros(heads, 0, dim_head),
    }


def transformer_sd(prefix, cfg, depth, cross=False, dim_context=None):
    sd = {f"{prefix}.norm_out.gamma": torch.ones(cfg.dim),
          f"{prefix}.norm_out.beta": torch.zeros(cfg.dim)}
    inner_ff = int(4 * (2 / 3) * cfg.dim)
    for i in range(depth):
        lp = f"{prefix}.layers.{i}"
        sd[f"{lp}.0.dsconv.weight"] = t(cfg.dim, 1, 3, 3, 3)
        sd[f"{lp}.0.dsconv.bias"] = t(cfg.dim)
        sd.update(attention_sd(f"{lp}.1", cfg.dim, cfg.dim_head, cfg.heads))
        if cross:
            # cross-attention at ModuleList index 2, 2 null KV pairs, keys
            # from the T5 context dim (reference attention.py:306)
            sd.update(attention_sd(f"{lp}.2", cfg.dim, cfg.dim_head,
                                   cfg.heads, null_kv=2,
                                   dim_context=dim_context))
        sd[f"{lp}.3.0.weight"] = torch.ones(cfg.dim)
        sd[f"{lp}.3.0.bias"] = torch.zeros(cfg.dim)
        sd[f"{lp}.3.1.weight"] = t(inner_ff * 2, cfg.dim)
        sd[f"{lp}.3.4.weight"] = t(cfg.dim, inner_ff)
    return sd


def ctvit_sd(prefix, cfg):
    pd = cfg.patch_dim
    sd = {
        f"{prefix}to_patch_emb.1.weight": torch.ones(pd),
        f"{prefix}to_patch_emb.1.bias": torch.zeros(pd),
        f"{prefix}to_patch_emb.2.weight": t(cfg.dim, pd),
        f"{prefix}to_patch_emb.2.bias": t(cfg.dim),
        f"{prefix}to_patch_emb.3.weight": torch.ones(cfg.dim),
        f"{prefix}to_patch_emb.3.bias": torch.zeros(cfg.dim),
        # CPB: ModuleList [Seq(Linear, LeakyReLU), Seq(Linear, LeakyReLU), Linear]
        f"{prefix}spatial_rel_pos_bias.net.0.0.weight": t(cfg.dim, 2),
        f"{prefix}spatial_rel_pos_bias.net.0.0.bias": t(cfg.dim),
        f"{prefix}spatial_rel_pos_bias.net.1.0.weight": t(cfg.dim, cfg.dim),
        f"{prefix}spatial_rel_pos_bias.net.1.0.bias": t(cfg.dim),
        f"{prefix}spatial_rel_pos_bias.net.2.weight": t(cfg.heads, cfg.dim),
        f"{prefix}spatial_rel_pos_bias.net.2.bias": t(cfg.heads),
        # vq private codebook buffers (vector_quantize_pytorch layout, with
        # the leading num_codebooks=1 axis)
        f"{prefix}vq._codebook.embed": torch.nn.functional.normalize(
            t(1, cfg.codebook_size, cfg.dim), dim=-1),
        f"{prefix}vq._codebook.embed_avg": t(1, cfg.codebook_size, cfg.dim),
        f"{prefix}vq._codebook.cluster_size": torch.zeros(1, cfg.codebook_size),
    }
    sd.update(transformer_sd(f"{prefix}enc_spatial_transformer", cfg,
                             cfg.spatial_depth))
    sd.update(transformer_sd(f"{prefix}enc_temporal_transformer", cfg,
                             cfg.temporal_depth))
    return sd


def test_convert_reference_ctclip_state_dict():
    sd = {}
    sd.update(bert_sd("text_transformer.", BERT))
    sd.update(ctvit_sd("visual_transformer.", VIT))
    sd["to_text_latent.weight"] = t(CLIP.dim_latent, CLIP.dim_text)
    sd["to_visual_latent.weight"] = t(CLIP.dim_latent, CLIP.dim_image)
    sd["temperature"] = torch.tensor(1.0)
    # wrapped like the trainer saves it (reference CTClipTrainer.py:139-143)
    pkg = {"model": sd, "optim": {}}

    params = ckpt.convert_ctclip(pkg, CLIP)

    # converted weights preserved exactly (spot checks incl. transposes)
    np.testing.assert_allclose(
        np.asarray(params["to_text_latent"]["w"]),
        sd["to_text_latent.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(params["visual_transformer"]["vq"].embed),
        sd["visual_transformer.vq._codebook.embed"].numpy().reshape(-1, VIT.dim))
    peg_w = params["visual_transformer"]["spatial"]["layers"][0]["peg"]["w"]
    np.testing.assert_allclose(
        np.asarray(peg_w),
        sd["visual_transformer.enc_spatial_transformer.layers.0.0.dsconv.weight"]
        .numpy().transpose(2, 3, 4, 1, 0))

    # and the converted model actually runs
    image = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 20, 32, 32))
    ids = jnp.asarray([[1, 2, 3]])
    out = ctclip_mod.ctclip_apply(
        params, CLIP, {"input_ids": ids, "attention_mask": jnp.ones_like(ids)},
        image)
    assert np.isfinite(np.asarray(out.sim_matrix)).all()


# ---------------------------------------------------------------------------
# CTGenerate (`ctgenerate_filtered.pt`: ctvit.* + maskgit.*)
# ---------------------------------------------------------------------------

GEN_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=16, patch_size=8,
                      temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
                      dim_head=4, heads=4, model_type="ctgenerate")
MG = MaskGitConfig(dim=16, num_tokens=32, max_seq_len=64, heads=4, dim_head=4,
                   depth=2, dim_context=24)
GEN = CTGenerateConfig(ctvit=GEN_VIT, maskgit=MG)


def maskgit_sd(prefix, cfg):
    """Reference MaskGit naming (maskgit.py:21-38): token/pos embeddings,
    3D ContinuousPositionBias (hidden dim = dim_head), Transformer with
    cross-attention + 2 null KV, logits head WITH bias."""
    sd = {
        f"{prefix}token_emb.weight": t(cfg.num_tokens + 1, cfg.dim),
        f"{prefix}pos_emb.weight": t(cfg.max_seq_len, cfg.dim),
        f"{prefix}continuous_pos_bias.net.0.0.weight": t(cfg.dim_head, 3),
        f"{prefix}continuous_pos_bias.net.0.0.bias": t(cfg.dim_head),
        f"{prefix}continuous_pos_bias.net.1.0.weight": t(cfg.dim_head, cfg.dim_head),
        f"{prefix}continuous_pos_bias.net.1.0.bias": t(cfg.dim_head),
        f"{prefix}continuous_pos_bias.net.2.weight": t(cfg.heads, cfg.dim_head),
        f"{prefix}continuous_pos_bias.net.2.bias": t(cfg.heads),
        f"{prefix}to_logits.weight": t(cfg.num_tokens, cfg.dim),
        f"{prefix}to_logits.bias": t(cfg.num_tokens),
    }
    sd.update(transformer_sd(f"{prefix}transformer", cfg, cfg.depth,
                             cross=True, dim_context=cfg.dim_context))
    return sd


def test_convert_reference_ctgenerate_state_dict():
    from ct_clip_ut_tpu.models import ctgenerate as ctgen_mod
    from ct_clip_ut_tpu.models.ctgenerate import init_ctgenerate

    sd = {}
    sd.update(ctvit_sd("ctvit.", GEN_VIT))
    # ctgenerate-mode first-frame patch embed (reference ctvit.py:37-42)
    pd1 = GEN_VIT.first_frame_patch_dim
    sd["ctvit.to_patch_emb_first_frame.1.weight"] = torch.ones(pd1)
    sd["ctvit.to_patch_emb_first_frame.1.bias"] = torch.zeros(pd1)
    sd["ctvit.to_patch_emb_first_frame.2.weight"] = t(GEN_VIT.dim, pd1)
    sd["ctvit.to_patch_emb_first_frame.2.bias"] = t(GEN_VIT.dim)
    sd["ctvit.to_patch_emb_first_frame.3.weight"] = torch.ones(GEN_VIT.dim)
    sd["ctvit.to_patch_emb_first_frame.3.bias"] = torch.zeros(GEN_VIT.dim)
    sd.update(maskgit_sd("maskgit.", MG))

    params = ckpt.convert_ctgenerate({"model": sd}, GEN)

    # pytree structure matches init_ctgenerate (minus the T5 tower, which
    # lives in the HF checkpoint and converts separately)
    init_p = init_ctgenerate(jax.random.PRNGKey(0), GEN)
    init_p.pop("t5")
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(init_p))

    # spot checks incl. transposes and the cross-attn null KV pairs
    np.testing.assert_allclose(
        np.asarray(params["maskgit"]["to_logits"]["w"]),
        sd["maskgit.to_logits.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(params["maskgit"]["token_emb"]),
        sd["maskgit.token_emb.weight"].numpy())
    cross0 = params["maskgit"]["transformer"]["layers"][0]["cross_attn"]
    assert cross0["null_kv"].shape == (MG.heads, 4, MG.dim_head)
    assert cross0["to_kv"]["w"].shape == (MG.dim_context,
                                          2 * MG.heads * MG.dim_head)

    # and the converted pipeline runs: scan -> codebook ids -> MaskGit with
    # cross-attention -> per-keyword attention slices
    scan = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 5, 16, 16))
    text_embed = jax.random.normal(jax.random.PRNGKey(2), (1, 6, MG.dim_context))
    text_mask = jnp.ones((1, 6), bool)
    out = ctgen_mod.ctgenerate_apply(params, GEN, scan, text_embed, text_mask,
                                     {"kw": [1, 2]})
    assert out.codebook_ids.shape == (1, 3, 2, 2)      # first frame + 4/2
    assert out.cross_attention.shape == (1, MG.heads, 12, 6)
    assert out.kw_attention["kw"].shape == (1, MG.heads, 12, 2)
    assert np.isfinite(np.asarray(out.cross_attention)).all()
