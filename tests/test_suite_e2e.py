"""End-to-end driver tests: attribution suite + zero-shot inference over a
fabricated dataset with a hash tokenizer (no network)."""

import numpy as np
import pytest

import jax

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   OcclusionConfig, PreprocessConfig)
from ct_clip_ut_tpu.attribution.suite import AttributionContext, Visualizations
from ct_clip_ut_tpu.data import nifti
from ct_clip_ut_tpu.data.datasets import InferenceDataset
from ct_clip_ut_tpu.data.loader import DataLoader, ShardedSampler
from ct_clip_ut_tpu.infer.zeroshot import CTClipInference
from ct_clip_ut_tpu.models.ctclip import init_ctclip

SMALL_BERT = BertConfig(vocab_size=256, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=8, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


class HashTokenizer:
    """Deterministic stand-in for BertTokenizer (zero-egress test env)."""

    def __call__(self, texts, return_tensors="np", padding="max_length",
                 truncation=True, max_length=32):
        if isinstance(texts, str):
            texts = [texts]
        max_length = min(max_length, 32)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [101] + [hash(w) % 200 + 5 for w in t.split()][:max_length - 2] + [102]
            ids[i, :len(toks)] = np.asarray(toks) % 256
            mask[i, :len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def fake_env(tmp_path_factory):
    import pandas as pd
    tmp = tmp_path_factory.mktemp("ds")
    data = tmp / "volumes"
    data.mkdir()
    rs = np.random.RandomState(0)
    names = []
    for i in range(2):
        name = f"valid_{i}_a_1.nii.gz"
        nifti.write_nii(data / name,
                        rs.randint(0, 2000, (24, 24, 20)).astype(np.float32))
        names.append(name)
    pd.DataFrame({"VolumeName": names,
                  "Findings_EN": ["normal lungs", "pleural effusion seen"],
                  "Impressions_EN": ["ok", "effusion"]}).to_csv(
        tmp / "reports.csv", index=False)
    pd.DataFrame({"VolumeName": names, "RescaleSlope": [1, 1],
                  "RescaleIntercept": [-1024, -1024],
                  "XYSpacing": ["[0.75, 0.75]"] * 2,
                  "ZSpacing": [1.5] * 2}).to_csv(tmp / "metadata.csv", index=False)
    labels = pd.DataFrame(np.eye(2, 18, dtype=int),
                          columns=[f"p{i}" for i in range(18)])
    labels.insert(0, "VolumeName", names)
    labels.to_csv(tmp / "labels.csv", index=False)

    cfg = PreprocessConfig(target_shape_hwd=(32, 32, 16))
    ds = InferenceDataset(data, tmp / "reports.csv", tmp / "metadata.csv",
                          tmp / "labels.csv", num_samples=5,
                          preprocess_cfg=cfg)
    params = init_ctclip(jax.random.PRNGKey(0), SMALL_CLIP)
    return tmp, ds, params


def test_zeroshot_driver_end_to_end(fake_env, tmp_path):
    tmp, ds, params = fake_env
    dl = DataLoader(ds, batch_size=1, num_workers=2,
                    sampler=ShardedSampler(len(ds), shuffle=False,
                                           drop_last=False), drop_last=False)
    inf = CTClipInference(params, SMALL_CLIP, HashTokenizer(), dl,
                          results_folder=tmp_path / "results",
                          zero_shot=True)
    metrics, preds, targets = inf.infer()
    assert preds.shape == (2, 18) and targets.shape == (2, 18)
    assert np.isfinite(preds).all()
    # metrics.txt written
    found = list((tmp_path / "results").rglob("metrics.txt"))
    assert found and "Mean ROC-AUC" in found[0].read_text()


def test_attribution_suite_all_methods(fake_env, tmp_path):
    tmp, ds, params = fake_env
    ctx = AttributionContext(
        params=params, cfg=SMALL_CLIP, tokenizer=HashTokenizer(),
        data=[ds[0]], render_gifs=False, text_max_length=16)
    vis = Visualizations(ctx, tmp_path / "results")
    occ = OcclusionConfig(patch_size=(8, 16, 16), stride=(8, 16, 16))
    vis.visualize(raw_attention_maps=True, attention_rollout=True,
                  integrated_gradients=True, grad_cam=True,
                  occlusion={"occ": occ})

    root = tmp_path / "results"
    for sub, count in [("raw_attention_grids", 2), ("attention_rollout", 2),
                       ("integrated_gradients", 1), ("grad_cam", 6),
                       ("occlusion", 1)]:
        files = list((root / sub).rglob("*.npy"))
        assert len(files) == count, (sub, files)
        for f in files:
            arr = np.load(f, allow_pickle=True)
            assert np.isfinite(np.asarray(arr, np.float32)).all()


def test_attribution_gif_rendering(fake_env, tmp_path):
    tmp, ds, params = fake_env
    ctx = AttributionContext(
        params=params, cfg=SMALL_CLIP, tokenizer=HashTokenizer(),
        data=[ds[0]], render_gifs=True, text_max_length=16)
    vis = Visualizations(ctx, tmp_path / "results")
    vis.visualize(attention_rollout=True)
    gifs = list((tmp_path / "results" / "attention_rollout").rglob("*.gif"))
    assert len(gifs) == 2
    assert all(g.stat().st_size > 1000 for g in gifs)


def test_occlusion_text_embeds_renders_combined_figure(fake_env, tmp_path):
    """The multi-pathology path renders the combined per-pathology
    [scan | heatmap | overlay] animation (reference
    visualize_pathology_heatmaps, visualizations.py:495-567)."""
    from ct_clip_ut_tpu.config import PATHOLOGIES
    tmp, ds, params = fake_env
    rs = np.random.RandomState(3)
    diff_embeds = {p: rs.randn(32).astype(np.float32) for p in PATHOLOGIES}
    ctx = AttributionContext(
        params=params, cfg=SMALL_CLIP, tokenizer=HashTokenizer(),
        data=[ds[0]], render_gifs=True, text_max_length=16,
        diff_embeds=diff_embeds)
    vis = Visualizations(ctx, tmp_path / "results")
    image, text, labels, name, path = ds[0]
    occ = OcclusionConfig(patch_size=(8, 16, 16), stride=(8, 16, 16))
    vis.occlusion(np.asarray(image)[None], vis._tokenize(text), labels, name,
                  path, occ=occ, use_text_embeds=True)
    combined = list((tmp_path / "results" / "occlusion")
                    .rglob("*pathology_heatmaps.gif"))
    assert len(combined) == 1
    assert combined[0].stat().st_size > 1000


def test_occlusion_text_embeds_suite_path(fake_env, tmp_path):
    """use_text_embeds mode: one sweep over all positive pathologies
    (reference visualizations.py:1037-1044 re-sweeps per pathology)."""
    from ct_clip_ut_tpu.config import PATHOLOGIES
    tmp, ds, params = fake_env
    rs = np.random.RandomState(3)
    diff_embeds = {p: rs.randn(32).astype(np.float32) for p in PATHOLOGIES}
    ctx = AttributionContext(
        params=params, cfg=SMALL_CLIP, tokenizer=HashTokenizer(),
        data=[ds[0]], render_gifs=False, text_max_length=16,
        diff_embeds=diff_embeds)
    vis = Visualizations(ctx, tmp_path / "results")
    image, text, labels, name, path = ds[0]
    occ = OcclusionConfig(patch_size=(8, 16, 16), stride=(8, 16, 16))
    heatmaps = vis.occlusion(
        np.asarray(image)[None], vis._tokenize(text), labels, name, path,
        occ=occ, use_text_embeds=True)
    positives = [p for p, l in zip(PATHOLOGIES, labels.tolist()) if l == 1.0]
    assert set(heatmaps) == set(positives) and positives
    for h in heatmaps.values():
        assert h.shape == tuple(np.asarray(image).squeeze().shape)
        assert np.isfinite(h).all()
    # artifact dict written like the reference (allow_pickle dict .npy)
    saved = list((tmp_path / "results" / "occlusion").rglob("*_heatmaps.npy"))
    assert saved


def test_diff_embedding_pipeline(fake_env, tmp_path):
    from ct_clip_ut_tpu.attribution.embedding_arithmetic import (
        compute_diff_embeddings, load_diff_embeddings, save_diff_embeddings)
    tmp, ds, params = fake_env
    reports = ["normal lungs ok", "effusion present", "opacity noted",
               "clear study"]
    labels = np.asarray([[0, 1], [1, 0], [1, 1], [0, 0]])
    embeds = compute_diff_embeddings(params, SMALL_CLIP, HashTokenizer(),
                                     reports, labels,
                                     pathologies=["a", "b"], max_length=16)
    assert set(embeds) == {"a", "b"}
    assert embeds["a"].shape == (32,)
    save_diff_embeddings(embeds, tmp_path / "diff.npy")
    back = load_diff_embeddings(tmp_path / "diff.npy")
    np.testing.assert_allclose(back["a"], embeds["a"])


def test_load_real_reference_diff_embeddings():
    """The genuine committed resource (reference
    src/resources/pathology_diff_embeddings.npy, built by
    notebooks/embedding_arithmetic.ipynb) loads through our loader with the
    documented schema — 17 pathologies (the 18 minus 'Lung nodule', as the
    reference shipped it), 768-d float32 — and a vector pushes through
    diff_embedding_latent to a finite unit-norm latent."""
    import os

    path = "/root/reference/src/resources/pathology_diff_embeddings.npy"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference resource not mounted")
    import jax
    import jax.numpy as jnp
    from ct_clip_ut_tpu.attribution.embedding_arithmetic import \
        load_diff_embeddings
    from ct_clip_ut_tpu.attribution.occlusion import diff_embedding_latent
    from ct_clip_ut_tpu.config import (PATHOLOGIES, BertConfig, CTCLIPConfig,
                                       CTViTConfig)
    from ct_clip_ut_tpu.models.ctclip import init_ctclip

    embeds = load_diff_embeddings(path)
    assert len(embeds) == 17
    assert set(embeds) <= set(PATHOLOGIES)
    for v in embeds.values():
        assert v.shape == (768,) and v.dtype == np.float32

    cfg = CTCLIPConfig(dim_text=768, dim_image=4 * 4 * 16, dim_latent=8,
                       ctvit=CTViTConfig(dim=16, codebook_size=32,
                                         image_size=32, patch_size=8,
                                         temporal_patch_size=10,
                                         spatial_depth=1, temporal_depth=1,
                                         dim_head=4, heads=4),
                       bert=BertConfig(hidden_size=768, num_layers=1,
                                       num_heads=4, intermediate_size=64))
    params = init_ctclip(jax.random.PRNGKey(0), cfg)
    lat = diff_embedding_latent(params, cfg,
                                jnp.asarray(embeds["Cardiomegaly"]))
    lat = np.asarray(lat)
    assert lat.shape == (8,) and np.isfinite(lat).all()
    np.testing.assert_allclose(np.linalg.norm(lat), 1.0, atol=1e-5)
