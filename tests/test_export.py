"""StableHLO export roundtrip: serialized serving programs reproduce the
live jitted functions exactly (infer/export.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.infer import export as ex
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs
from ct_clip_ut_tpu.models.ctclip import encode_text_latents, init_ctclip

KEY = jax.random.PRNGKey(0)

SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


def test_export_roundtrip_matches_live(tmp_path):
    params = init_ctclip(KEY, SMALL_CLIP)
    scorer, prompter = ex.export_zeroshot(
        params, SMALL_CLIP, batch=2, depth=20, n_pathologies=3,
        prompt_len=8, compute_dtype="float32", platforms=("cpu",))
    ex.save_exported(tmp_path / "art", scorer, prompter, SMALL_CLIP)

    # artifacts exist and the manifest carries the signatures
    assert (tmp_path / "art" / "zeroshot_scorer.shlo").stat().st_size > 0
    assert (tmp_path / "art" / "prompt_encoder.shlo").stat().st_size > 0
    import json
    man = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert man["platforms"] == ["cpu"]

    scorer2, prompter2 = ex.load_exported(tmp_path / "art")

    image = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 20, 32, 32),
                              jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2), (6, 8), 0, 64)
    mask = jnp.ones_like(ids)

    pl_live = encode_text_latents(
        params, SMALL_CLIP, {"input_ids": ids, "attention_mask": mask})
    pl_exp = prompter2.call(params, ids, mask)
    np.testing.assert_allclose(np.asarray(pl_exp), np.asarray(pl_live),
                               atol=1e-6, rtol=1e-6)

    want = zeroshot_probs(params, SMALL_CLIP, image, pl_live,
                          compute_dtype="float32")
    got = scorer2.call(params, image, jnp.asarray(pl_exp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_export_cli_parser():
    from ct_clip_ut_tpu.scripts.export_ctclip import build_parser
    args = build_parser().parse_args(
        ["--out", "/tmp/x", "--batch", "4", "--platform", "cpu"])
    assert args.batch == 4 and args.platform == "cpu"
    assert args.checkpoint is None


def test_export_ctgenerate_roundtrip(tmp_path):
    """The exported CTGenerate localizer reproduces the live fp32 batched
    forward exactly (bias table rides as an argument, the bias_cache
    serving pattern)."""
    from ct_clip_ut_tpu.config import (CTGenerateConfig, CTViTConfig,
                                       MaskGitConfig, T5EncoderConfig)
    from ct_clip_ut_tpu.models.ctgenerate import (ctgenerate_apply_batched,
                                                  init_ctgenerate)
    from ct_clip_ut_tpu.models.ctvit import token_grid_shape

    cfg = CTGenerateConfig(
        ctvit=CTViTConfig(dim=16, codebook_size=32, image_size=32,
                          patch_size=8, temporal_patch_size=2,
                          spatial_depth=1, temporal_depth=1, dim_head=4,
                          heads=4, model_type="ctgenerate"),
        maskgit=MaskGitConfig(dim=16, num_tokens=32, max_seq_len=2048,
                              heads=4, dim_head=4, depth=1, dim_context=32),
        t5=T5EncoderConfig(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                           d_ff=64, num_layers=1))
    params = init_ctgenerate(KEY, cfg)
    b, frames, tl = 2, 9, 6
    localizer = ex.export_ctgenerate(params, cfg, batch=b, frames=frames,
                                     text_len=tl, compute_dtype="float32",
                                     platforms=("cpu",))
    ex.save_exported_ctgenerate(tmp_path / "art", localizer, cfg)
    assert (tmp_path / "art" / "ctgenerate_localizer.shlo").stat().st_size > 0

    loc2 = ex.load_exported_ctgenerate(tmp_path / "art")
    scans = jax.random.normal(jax.random.PRNGKey(3), (b, 1, frames, 32, 32))
    emb = jax.random.normal(jax.random.PRNGKey(4), (b, tl, 32))
    mask = jnp.ones((b, tl), bool)
    t, h, w = token_grid_shape(cfg.ctvit, (frames, 32, 32))
    n = t * h * w
    bias = jnp.zeros((cfg.maskgit.heads, n, n), jnp.float32)  # unused: n<4096

    fm, cross, ids = loc2.call(params, bias, scans, emb, mask)
    want = ctgenerate_apply_batched(params, cfg, scans, emb, mask,
                                    compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(fm), np.asarray(want.feature_map),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cross),
                               np.asarray(want.cross_attention),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(want.codebook_ids))
