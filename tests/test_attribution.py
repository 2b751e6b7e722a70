"""Attribution suite: parity vs naive serial implementations of the
reference algorithms (visualizations.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   OcclusionConfig)
from ct_clip_ut_tpu.attribution import (capture, grad_cam,
                                        integrated_gradients as ig_mod,
                                        occlusion as occ_mod,
                                        raw_attention, rollout)
from ct_clip_ut_tpu.models import ctclip as ctclip_mod

KEY = jax.random.PRNGKey(0)

SMALL_BERT = BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=2,
                        temporal_depth=2, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


@pytest.fixture(scope="module")
def setup():
    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    image = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 20, 32, 32))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 8)))
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    return params, tokens, image


# ---------------------------------------------------------------------------
# rollout
# ---------------------------------------------------------------------------

def rollout_oracle(attn_layers, head_fusion="mean", discard_ratio=0.0,
                   use_residual=True):
    """Direct numpy transcription of reference visualizations.py:707-743."""
    n = attn_layers[0].shape[-1]
    result = np.eye(n)
    for attn in attn_layers:
        a = attn.mean(axis=0) if head_fusion == "mean" else attn.max(axis=0)
        if discard_ratio > 0:
            flat = a.reshape(a.shape[0], -1)
            k = flat.shape[1] - int(flat.shape[1] * discard_ratio)
            thresh = np.sort(flat, axis=1)[:, -k].min(axis=0)
            # reference: per-row topk min => threshold per row
            thresh = np.partition(flat, -k, axis=1)[:, -k:].min(axis=1, keepdims=True)
            a = np.where(a >= thresh, a, 0.0)
        a = a / (a.sum(axis=-1, keepdims=True) + 1e-8)
        if use_residual:
            a = a + np.eye(n)
            a = a / a.sum(axis=-1, keepdims=True)
        result = a @ result
    return result


@pytest.mark.parametrize("fusion", ["mean", "max"])
def test_rollout_matrix_parity(fusion):
    rs = np.random.RandomState(3)
    layers = np.abs(rs.rand(3, 4, 6, 6)).astype(np.float32)
    got = rollout.rollout_matrix(jnp.asarray(layers), head_fusion=fusion)
    want = rollout_oracle([layers[i] for i in range(3)], head_fusion=fusion)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rollout_volumes_shapes(setup):
    params, tokens, image = setup
    sp, tm = rollout.rollout_volumes(params, SMALL_CLIP, tokens, image)
    # spatial: L*D slices of (h, w); L=2 layers, D=2 temporal patches
    assert sp.shape == (2 * 2, 4, 4)
    assert tm.shape == (2, 4, 4)
    assert float(sp.min()) >= 0 and float(sp.max()) <= 1 + 1e-6
    # upsampled to scan shape
    sp_map, tm_map = rollout.rollout_maps(params, SMALL_CLIP, tokens, image)
    assert sp_map.shape == (20, 32, 32) and tm_map.shape == (20, 32, 32)

    # the pipelined worklist yields the same pairs, in order
    pairs = list(rollout.rollout_maps_pipelined(
        params, SMALL_CLIP, [(tokens, image)] * 3))
    assert len(pairs) == 3
    for sp_p, tm_p in pairs:
        np.testing.assert_array_equal(sp_p, sp_map)
        np.testing.assert_array_equal(tm_p, tm_map)


# ---------------------------------------------------------------------------
# raw attention
# ---------------------------------------------------------------------------

def test_raw_attention_maps(setup):
    params, tokens, image = setup
    sp, tm = raw_attention.raw_attention_maps(params, SMALL_CLIP, tokens, image)
    assert sp.shape == (2, 4, 2, 4, 4)   # [layers, heads, D, h, w]
    assert tm.shape == (2, 4, 2, 4, 4)   # [layers, heads, t, h, w]

    # parity with direct math from the returned weights
    _, spatial_w, _ = capture.score_and_weights(params, SMALL_CLIP, tokens, image)
    attn0 = np.asarray(spatial_w[0])     # [D, heads, hw, hw]
    head = 1
    received = attn0[:, head].mean(axis=1)          # [D, hw]
    vol = received.reshape(2, 4, 4)
    vol = (vol - vol.min()) / (vol.max() + 1e-8)
    np.testing.assert_allclose(np.asarray(sp[0, head]), vol, atol=1e-5)


# ---------------------------------------------------------------------------
# integrated gradients
# ---------------------------------------------------------------------------

def test_ig_matches_serial_loop(setup):
    params, tokens, image = setup
    got = ig_mod.integrated_gradients(params, SMALL_CLIP, tokens, image,
                                      steps=6, chunk=2)

    # naive serial transcription of reference visualizations.py:851-893
    baseline = np.ones_like(np.asarray(image))
    diff = np.asarray(image) - baseline

    def score(img):
        s, _ = capture.similarity_score(params, SMALL_CLIP, tokens, img)
        return s

    grads = []
    for alpha in np.linspace(0, 1, 6):
        g = jax.grad(score)(jnp.asarray(baseline + alpha * diff))
        grads.append(np.asarray(g))
    avg = np.stack(grads).mean(axis=0)
    ig = np.maximum(diff * avg, 0.0)[0, 0]
    ig = (ig - ig.min()) / (ig.max() + 1e-8)
    q = np.quantile(ig, 0.90)
    ig = np.where(ig >= q, ig, 0.0)
    ig = ig ** 0.05
    ig = ig / (ig.max() + 1e-8)

    assert got.shape == (20, 32, 32)
    np.testing.assert_allclose(np.asarray(got), ig, atol=1e-3)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_ig_sharded_matches_serial(setup):
    """Riemann steps sharded over the 8-device data axis == the serial scan
    (same linspace, fp32 sums reassociated only across devices); also the
    padded case where steps is not a multiple of n_dev * chunk."""
    from ct_clip_ut_tpu.config import MeshConfig
    from ct_clip_ut_tpu.parallel.mesh import make_mesh
    params, tokens, image = setup
    mesh = make_mesh(MeshConfig(data=8, model=1))
    for steps, chunk in ((16, 2), (6, 2), (50, 5)):
        want = ig_mod.integrated_gradients(params, SMALL_CLIP, tokens, image,
                                           steps=steps, chunk=chunk)
        got = ig_mod.integrated_gradients_sharded(
            params, SMALL_CLIP, tokens, image, mesh,
            steps=steps, chunk=chunk)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                   err_msg=f"steps={steps} chunk={chunk}")


def test_ig_pack_roundtrip_and_overflow_fallback():
    """_ig_pack + _ig_densify_np reproduce the dense map exactly (f16
    value rounding aside); when the survivor count exceeds the sized
    buffer, the dense fallback path returns the exact map."""
    import numpy as np

    from ct_clip_ut_tpu.attribution.integrated_gradients import (
        _ig_densify_np, _ig_pack)

    t, h, w, pd = 2, 4, 4, 8 * 8 * 8
    rng = np.random.RandomState(0)
    ig = rng.rand(t, h, w, pd).astype(np.float32)
    ig[ig < 0.9] = 0.0                      # ~10% survivors
    ig_j = jnp.asarray(ig)
    n = ig.size
    shape = (1, 1, t * 8, h * 8, w * 8)

    class TinyVit:
        patch_size, temporal_patch_size = 8, 8

    class TinyCfg:
        ctvit = TinyVit()

    k = int(n * 0.15)
    packed, vals, m = _ig_pack(ig_j, k)
    assert int(m) <= k
    got = _ig_densify_np(TinyCfg, shape, packed, vals, m, ig_j)
    from ct_clip_ut_tpu.models.ctvit import unpatchify_np
    want = unpatchify_np(ig.astype(np.float16).astype(np.float32), 8, 8)
    np.testing.assert_array_equal(got, want)

    # overflow: k smaller than the survivor count -> dense fallback
    k_small = int(m) - 3
    packed2, vals2, m2 = _ig_pack(ig_j, k_small)
    assert int(m2) > k_small
    got2 = _ig_densify_np(TinyCfg, shape, packed2, vals2, m2, ig_j)
    want2 = unpatchify_np(ig, 8, 8)
    np.testing.assert_array_equal(got2, want2)


def test_ig_pipelined_matches_serial_calls(setup):
    """The pipelined multi-map driver yields exactly the per-call maps, in
    order (the overlap only reorders host fetches, never math)."""
    params, tokens, image = setup
    image2 = image * 0.5 + 0.1
    items = [(tokens, image), (tokens, image2), (tokens, image)]
    want = [ig_mod.integrated_gradients(params, SMALL_CLIP, tk, im,
                                        steps=4, chunk=2)
            for tk, im in items]
    got = list(ig_mod.integrated_gradients_pipelined(
        params, SMALL_CLIP, items, steps=4, chunk=2))
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)


# ---------------------------------------------------------------------------
# grad-cam
# ---------------------------------------------------------------------------

def test_grad_cam_volumes(setup):
    params, tokens, image = setup
    cams = grad_cam.grad_cam_volumes(params, SMALL_CLIP, tokens, image)
    assert set(cams) == {"spatial", "temporal", "spatial_ff", "temporal_ff",
                         "combined", "vq"}
    for k, v in cams.items():
        assert v.shape == (2, 4, 4), k
        assert np.isfinite(np.asarray(v)).all(), k
        assert float(v.min()) >= 0.0 - 1e-6, k

    # reference vs aligned pairing must differ (multi-layer model)
    aligned = grad_cam.grad_cam_volumes(params, SMALL_CLIP, tokens, image,
                                        pairing="aligned")
    assert not np.allclose(np.asarray(cams["spatial"]),
                           np.asarray(aligned["spatial"]))

    maps = grad_cam.grad_cam_maps(params, SMALL_CLIP, tokens, image)
    assert maps["combined"].shape == (20, 32, 32)


def test_capture_grads_match_autodiff_of_residual_stream(setup):
    """Injection gradients equal d score / d activation: validated against
    d score / d image chain — perturbing the tap by eps changes the score by
    eps . grad (first order)."""
    params, tokens, image = setup
    name = "vq.features"
    score0, feats, grads = capture.score_captures_and_grads(
        params, SMALL_CLIP, tokens, image, [name])
    g = grads[name]

    eps = 1e-3
    direction = jnp.sign(g)  # ascend
    from ct_clip_ut_tpu.ops.taps import Taps
    taps = Taps(inject={name: eps * direction})
    score1, _ = capture.similarity_score(params, SMALL_CLIP, tokens, image,
                                         taps=taps)
    predicted = float(score0) + eps * float(jnp.abs(g).sum())
    assert abs(float(score1) - predicted) < 5e-3 * max(1.0, abs(predicted))


# ---------------------------------------------------------------------------
# occlusion
# ---------------------------------------------------------------------------

def test_occlusion_matches_serial_reference(setup):
    params, tokens, image = setup
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 8, 8),
                          threshold=0.0)

    text_latent = occ_mod.report_text_latent(params, SMALL_CLIP, tokens)
    got = occ_mod.occlusion_heatmap(params, SMALL_CLIP, image, text_latent,
                                    occ=occ, chunk=4)

    # naive serial transcription of reference visualizations.py:335-424
    # (on the same bit-stable parity config the implementation uses —
    # conv patch-embed lowering varies across batching contexts and flips
    # VQ argmax near the random-weight codebook's tiny margins)
    img = np.asarray(image)
    D, H, W = img.shape[-3:]
    pcfg = capture.parity_cfg(SMALL_CLIP)

    def full_score(x):
        out = ctclip_mod.ctclip_apply(params, pcfg, tokens, jnp.asarray(x))
        return float(out.sim_matrix[0, 0])

    orig = full_score(img)
    heat = np.zeros((D, H, W))
    count = np.zeros((D, H, W))
    for d in range(0, D - 10 + 1, 5):
        for h in range(0, H - 16 + 1, 8):
            for w in range(0, W - 16 + 1, 8):
                occluded = img.copy()
                occluded[:, :, d:d + 10, h:h + 16, w:w + 16] = -1
                s = full_score(occluded)
                imp = max(orig - s, 0.0)
                heat[d:d + 10, h:h + 16, w:w + 16] += imp
                count[d:d + 10, h:h + 16, w:w + 16] += 1
    count[count == 0] = 1
    heat = heat / count
    heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)

    assert got.shape == (D, H, W)
    np.testing.assert_allclose(np.asarray(got), heat, atol=1e-4)


def test_occlusion_multi_matches_singles(setup):
    """One multi-pathology sweep == K independent single sweeps."""
    params, tokens, image = setup
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(10, 16, 16))
    latents = jnp.stack([
        occ_mod.report_text_latent(params, SMALL_CLIP, tokens),
        occ_mod.diff_embedding_latent(
            params, SMALL_CLIP, jax.random.normal(jax.random.PRNGKey(3), (32,))),
    ])
    multi = occ_mod.occlusion_heatmaps_multi(params, SMALL_CLIP, image,
                                             latents, occ=occ, chunk=4)
    for k in range(2):
        single = occ_mod.occlusion_heatmap(params, SMALL_CLIP, image,
                                           latents[k], occ=occ, chunk=4)
        np.testing.assert_allclose(multi[k], single, atol=1e-5)


def test_occlusion_frame_sparse_matches_dense_shortcut(setup):
    """The frame-sparse spatial recompute (cached clean stack + per-window
    dirty-slice re-run, occlusion.py module notes) scores every window the
    same as re-running the full spatial stack per window. Volume is 6
    token-frames deep so the dirty slices have real dynamic offsets and
    clamp at both volume edges."""
    params, tokens, _ = setup
    image = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 60, 32, 32))
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(10, 8, 8),
                          threshold=0.0)
    coords = occ_mod.window_grid(image.shape[-3:], occ.patch_size, occ.stride)
    assert coords.shape[0] == 54
    text_latent = occ_mod.report_text_latent(params, SMALL_CLIP, tokens)

    orig_d, dense = occ_mod.occlusion_scores(
        params, SMALL_CLIP, image, text_latent, coords, occ=occ, chunk=4,
        frame_sparse=False)
    orig_s, sparse = occ_mod.occlusion_scores(
        params, SMALL_CLIP, image, text_latent, coords, occ=occ, chunk=4,
        frame_sparse=True)
    np.testing.assert_allclose(float(orig_s), float(orig_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=1e-5)


def test_occlusion_frame_sparse_unaligned_stride(setup):
    """Unaligned temporal stride (origins straddle an extra frame): the
    conservative kblk+clamp geometry still reproduces the dense scores."""
    params, tokens, _ = setup
    image = jax.random.normal(jax.random.PRNGKey(10), (1, 1, 50, 32, 32))
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 16, 16),
                          threshold=0.0)
    coords = occ_mod.window_grid(image.shape[-3:], occ.patch_size, occ.stride)
    text_latent = occ_mod.report_text_latent(params, SMALL_CLIP, tokens)
    _, dense = occ_mod.occlusion_scores(
        params, SMALL_CLIP, image, text_latent, coords, occ=occ, chunk=4,
        frame_sparse=False)
    _, sparse = occ_mod.occlusion_scores(
        params, SMALL_CLIP, image, text_latent, coords, occ=occ, chunk=4,
        frame_sparse=True)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=1e-5)


def test_occlusion_diff_embed_latent_matches_bypass(setup):
    params, tokens, image = setup
    embed = jax.random.normal(jax.random.PRNGKey(7), (32,))
    lat = occ_mod.diff_embedding_latent(params, SMALL_CLIP, embed)
    out = ctclip_mod.ctclip_apply(params, SMALL_CLIP, None, image,
                                  text_embeds=embed[None])
    np.testing.assert_allclose(np.asarray(lat),
                               np.asarray(out.text_latents[0]), atol=1e-6)


def test_host_upsample_matches_device_resize():
    """upsample_to_host is a bit-faithful (<=1e-5) twin of the jitted
    jax.image.resize trilinear path (upsampling, incl. non-integer
    ratios; downscale anti-aliasing is out of scope — attribution maps
    only expand grid -> volume)."""
    import numpy as np
    from ct_clip_ut_tpu.attribution.capture import upsample_to, upsample_to_host
    rs = np.random.RandomState(3)
    for src, dst in [((4, 6, 5), (9, 24, 17)), ((8, 8, 8), (11, 8, 64)),
                     ((96, 24, 24), (240, 480, 480))]:
        v = rs.rand(*src).astype(np.float32)
        want = np.asarray(upsample_to(v, dst))
        got = upsample_to_host(v, dst)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_occlusion_slabbed_matches_single_dispatch(setup):
    """Host-level slabbing (watchdog-safe dispatch) reproduces the one-call
    sweep exactly, including the padded remainder slab."""
    params, tokens, image = setup
    occ = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 8, 8),
                          threshold=0.0)
    coords = occ_mod.window_grid(image.shape[-3:], occ.patch_size, occ.stride)
    assert coords.shape[0] > 13  # several slabs incl. a ragged tail
    text_latent = occ_mod.report_text_latent(params, SMALL_CLIP, tokens)

    o_ref, s_ref = occ_mod.occlusion_scores_multi(
        params, SMALL_CLIP, image, text_latent[None], coords, occ=occ, chunk=4)
    o_slab, s_slab = occ_mod.occlusion_scores_slabbed(
        params, SMALL_CLIP, image, text_latent[None], coords, occ=occ,
        chunk=4, slab=13)
    np.testing.assert_allclose(np.asarray(o_slab).ravel(),
                               np.asarray(o_ref).ravel(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_slab), np.asarray(s_ref),
                               atol=1e-6)
