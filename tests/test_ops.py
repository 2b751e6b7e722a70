"""Numerical parity of NN primitives vs torch oracles (reference
src/utils/attention.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import AttentionConfig, TransformerConfig
from ct_clip_ut_tpu.ops import attention as attn_mod
from ct_clip_ut_tpu.ops import layers, posbias, transformer, vq

import oracles

KEY = jax.random.PRNGKey(0)


def test_layernorm_bias_frozen():
    p = layers.init_layernorm(16, bias=False)
    p = {"gamma": jax.random.normal(KEY, (16,)) + 1.0}
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    got = layers.layernorm(p, jnp.asarray(x))
    want = oracles.layernorm_oracle(oracles.to_np(p), x, bias=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layernorm_with_bias():
    k1, k2 = jax.random.split(KEY)
    p = {"gamma": jax.random.normal(k1, (16,)) + 1.0,
         "beta": jax.random.normal(k2, (16,))}
    x = np.random.RandomState(1).randn(3, 5, 16).astype(np.float32)
    got = layers.layernorm(p, jnp.asarray(x))
    want = oracles.layernorm_oracle(oracles.to_np(p), x, bias=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_l2norm():
    x = np.random.RandomState(2).randn(4, 8).astype(np.float32)
    got = layers.l2norm(jnp.asarray(x))
    import torch.nn.functional as F
    import torch
    want = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_feedforward_parity():
    dim = 24
    inner = int(4 * (2 / 3) * dim)
    p = layers.init_feedforward(KEY, dim, inner)
    x = np.random.RandomState(3).randn(2, 7, dim).astype(np.float32)
    got = layers.feedforward(p, jnp.asarray(x))
    want = oracles.feedforward_oracle(oracles.to_np(p), x).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_peg_parity(causal):
    dim = 8
    p = layers.init_peg(KEY, dim)
    video_shape = (2, 3, 4, 4)
    x = np.random.RandomState(4).randn(2 * 3, 16, dim).astype(np.float32)
    got = layers.peg(p, jnp.asarray(x), video_shape, causal=causal)
    want = oracles.peg_oracle(oracles.to_np(p), x, video_shape, causal).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_peg_temporal_layout_reshape():
    """The temporal transformer feeds ((b h w), t, d); PEG must raw-reshape it
    to (b, t, h, w, d) bit-for-bit like the reference (attention.py:69)."""
    dim = 4
    p = layers.init_peg(KEY, dim)
    b, t_, h, w = 1, 3, 2, 2
    x = np.random.RandomState(5).randn(b * h * w, t_, dim).astype(np.float32)
    got = layers.peg(p, jnp.asarray(x), (b, t_, h, w), causal=True)
    want = oracles.peg_oracle(oracles.to_np(p), x, (b, t_, h, w), True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.shape == x.shape


def test_continuous_pos_bias_parity():
    p = posbias.init_continuous_pos_bias(KEY, dim=32, heads=8, num_dims=2)
    got = posbias.continuous_pos_bias(p, 5, 5)
    want = oracles.cpb_oracle(oracles.to_np(p), (5, 5)).numpy()
    assert got.shape == (8, 25, 25)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_continuous_pos_bias_3d():
    p = posbias.init_continuous_pos_bias(KEY, dim=16, heads=4, num_dims=3)
    got = posbias.continuous_pos_bias(p, 3, 4, 4)
    want = oracles.cpb_oracle(oracles.to_np(p), (3, 4, 4)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_alibi_parity():
    got = posbias.alibi_bias(8, 6, 6)
    want = oracles.alibi_oracle(8, 6, 6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    got = posbias.alibi_bias(6, 4, 9)  # non-pow2 heads, i != j
    want = oracles.alibi_oracle(6, 4, 9).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_attention_self_parity():
    cfg = AttentionConfig(dim=32, dim_head=8, heads=4)
    p = attn_mod.init_attention(KEY, cfg)
    x = np.random.RandomState(6).randn(2, 10, 32).astype(np.float32)
    bias = np.random.RandomState(7).randn(4, 10, 10).astype(np.float32)
    got, w = attn_mod.attention(p, cfg, jnp.asarray(x), attn_bias=jnp.asarray(bias))
    want, want_w = oracles.attention_oracle(oracles.to_np(p), cfg, x, attn_bias=bias)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)
    np.testing.assert_allclose(w, want_w.numpy(), atol=1e-5)


def test_attention_cross_nullkv_mask_parity():
    cfg = AttentionConfig(dim=32, dim_context=48, dim_head=8, heads=4, num_null_kv=2)
    p = attn_mod.init_attention(KEY, cfg)
    rs = np.random.RandomState(8)
    x = rs.randn(2, 6, 32).astype(np.float32)
    ctx = rs.randn(2, 9, 48).astype(np.float32)
    mask = rs.rand(2, 9) > 0.3
    got, w = attn_mod.attention(p, cfg, jnp.asarray(x), context=jnp.asarray(ctx),
                                mask=jnp.asarray(mask))
    want, want_w = oracles.attention_oracle(oracles.to_np(p), cfg, x,
                                            context=ctx, mask=mask)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)
    np.testing.assert_allclose(w, want_w.numpy(), atol=1e-5)
    assert w.shape == (2, 4, 6, 9 + 2)


def test_attention_causal_alibi_parity():
    cfg = AttentionConfig(dim=16, dim_head=4, heads=4, causal=True)
    p = attn_mod.init_attention(KEY, cfg)
    x = np.random.RandomState(9).randn(1, 7, 16).astype(np.float32)
    got, w = attn_mod.attention(p, cfg, jnp.asarray(x))
    want, want_w = oracles.attention_oracle(oracles.to_np(p), cfg, x)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)
    # causal: no attention to the future
    assert np.allclose(np.triu(np.asarray(w)[0, 0], k=1), 0.0, atol=1e-7)


def test_vq_cosine_lookup_and_ste():
    state = vq.init_vq(KEY, codebook_size=64, dim=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    out, idx, new_state = vq.vq_apply(state, x, freeze=True)
    # value equals the selected normalized codebook row
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(state.embed)[np.asarray(idx)], atol=1e-6)
    # frozen: state unchanged
    assert new_state is state
    # straight-through: d sum(out) / d x == ones
    g = jax.grad(lambda z: vq.vq_apply(state, z, freeze=True)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)
    # nearest is really argmax cosine sim
    sims = np.asarray(layersafe_norm(x).reshape(-1, 8)) @ np.asarray(state.embed).T
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), sims.argmax(-1))


def layersafe_norm(x):
    return layers.l2norm(x)


def test_vq_ema_update_moves_codebook():
    state = vq.init_vq(KEY, codebook_size=16, dim=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 4))
    _, _, new_state = vq.vq_apply(state, x, freeze=False)
    assert not np.allclose(np.asarray(new_state.embed), np.asarray(state.embed))
    # rows stay unit-norm
    norms = np.linalg.norm(np.asarray(new_state.embed), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_transformer_returns_weights_and_residual_wiring():
    cfg = TransformerConfig(dim=16, depth=2, dim_head=4, heads=4,
                            dim_context=8, has_cross_attn=True,
                            peg=True, peg_causal=True)
    p = transformer.init_transformer(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8))
    out, aux = transformer.transformer(
        p, cfg, x, video_shape=(2, 3, 2, 2), context=ctx, return_weights=True)
    assert out.shape == x.shape
    assert len(aux.self_attn) == 2 and len(aux.cross_attn) == 2
    assert aux.self_attn[0].shape == (2, 4, 12, 12)
    assert aux.cross_attn[0].shape == (2, 4, 12, 5 + 2)  # 2 null kv
    # rows of attention sum to 1
    np.testing.assert_allclose(np.asarray(aux.self_attn[0]).sum(-1), 1.0, atol=1e-5)


def test_transformer_remat_matches_plain():
    from ct_clip_ut_tpu.config import replace
    cfg = TransformerConfig(dim=16, depth=2, dim_head=4, heads=4,
                            peg=True, peg_causal=True)
    p = transformer.init_transformer(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 12, 16))
    out_plain, _ = transformer.transformer(p, cfg, x, video_shape=(2, 3, 2, 2))
    out_remat, _ = transformer.transformer(p, replace(cfg, remat=True), x,
                                           video_shape=(2, 3, 2, 2))
    np.testing.assert_allclose(np.asarray(out_remat), np.asarray(out_plain),
                               atol=1e-6)
    # grads agree too
    g1 = jax.grad(lambda x: transformer.transformer(
        p, cfg, x, video_shape=(2, 3, 2, 2))[0].sum())(x)
    g2 = jax.grad(lambda x: transformer.transformer(
        p, replace(cfg, remat=True), x, video_shape=(2, 3, 2, 2))[0].sum())(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


def test_transformer_taps_capture_and_inject():
    from ct_clip_ut_tpu.ops.taps import Taps
    cfg = TransformerConfig(dim=8, depth=2, dim_head=4, heads=2)
    p = transformer.init_transformer(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 8))

    taps = Taps(capture={"0.attn_out", "1.ff_out"})
    out, _ = transformer.transformer(p, cfg, x, taps=taps)
    assert set(taps.collected) == {"0.attn_out", "1.ff_out"}

    # gradient via zero-injection == hook register_hook gradient
    def score(inj):
        tp = Taps(inject={"1.ff_out": inj})
        o, _ = transformer.transformer(p, cfg, x, taps=tp)
        return (o ** 2).sum()

    g = jax.grad(score)(jnp.zeros_like(taps.collected["1.ff_out"]))
    assert g.shape == x.shape
    assert float(jnp.abs(g).sum()) > 0
    # injection of zeros must not change the forward value
    tp0 = Taps(inject={"1.ff_out": jnp.zeros_like(taps.collected["1.ff_out"])})
    out0, _ = transformer.transformer(p, cfg, x, taps=tp0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out), atol=0)


@pytest.mark.parametrize("causal", [True, False])
def test_peg_residual_grad_mesh_safe(causal):
    """The PEG weight grad must be identical on a multi-axis mesh and a
    single device. XLA autodiff gets this WRONG (jax 0.9.0): the weight grad
    of a feature_group_count>1 conv comes back multiplied by the size of
    every mesh axis the conv is not partitioned over (2x on ("data","model")
    =(4,2); dense convs unaffected) — which would scale every PEG gradient
    in TP training. peg_residual therefore routes through the custom VJP
    with a grouped-conv-free weight grad (_peg_weight_grads_taps)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dim = 16
    p = layers.init_peg(KEY, dim)
    video_shape = (8, 2, 4, 4)
    x = jnp.asarray(
        np.random.RandomState(7).randn(8, 2 * 4 * 4, dim).astype(np.float32))

    def loss(p_, x_):
        return (layers.peg_residual(p_, x_, video_shape, causal=causal)
                .astype(jnp.float32) ** 2).sum()

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    g_single, gx_single = gfn(p, x)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    p_s = jax.device_put(p, NamedSharding(mesh, P()))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_mesh, gx_mesh = gfn(p_s, x_s)

    np.testing.assert_allclose(np.asarray(g_mesh["w"]),
                               np.asarray(g_single["w"]), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_mesh["b"]),
                               np.asarray(g_single["b"]), rtol=2e-5, atol=1e-5)
    # the input grad rides a grouped conv APPLICATION in the custom bwd
    # (safe — only the grouped-conv weight grad is GSPMD-broken) — pin it
    np.testing.assert_allclose(np.asarray(gx_mesh), np.asarray(gx_single),
                               rtol=2e-5, atol=1e-5)


def test_grouped_conv_gspmd_bug_canary():
    """Canary for the upstream bug the previous test works around: XLA
    autodiff of a grouped conv under a (4,2) mesh scales the weight grad by
    the unused model-axis size. WHEN THIS TEST FAILS after a jax upgrade,
    the bug is fixed upstream — drop _peg_weight_grads_taps and let
    peg_residual use plain autodiff again (it is ~1.3 ms/layer faster on
    v5e, see ops/layers.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dim = 16
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, dim)) * 0.1
    x = jax.random.normal(KEY, (8, 2, 4, 4, dim))

    def loss(w_, v):
        out = jax.lax.conv_general_dilated(
            v, w_, window_strides=(1, 1, 1),
            padding=((2, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=dim)
        return (out ** 2).sum()

    gfn = jax.jit(jax.grad(loss))
    g_single = np.asarray(gfn(w, x))

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    g_mesh = np.asarray(gfn(jax.device_put(w, NamedSharding(mesh, P())),
                            jax.device_put(x, NamedSharding(mesh, P("data")))))
    ratio = np.abs(g_mesh).max() / np.abs(g_single).max()
    assert abs(ratio - 2.0) < 1e-3, (
        f"grouped-conv GSPMD grad ratio {ratio}: if this is now ~1.0 the "
        "upstream bug is fixed — remove the PEG custom-VJP workaround")


def test_peg_backward_single_device_default():
    """On a single-device process peg_residual defaults to plain autodiff
    for the backward (the GSPMD grouped-conv mis-scale needs a mesh axis the
    conv is unpartitioned over, so one device can never hit it; autodiff is
    ~1.3 ms/layer faster on v5e) — and that default must produce the same
    gradients as the mesh-safe custom VJP. The suite's own process holds 8
    virtual devices (conftest), so the 1-device default runs in a clean
    subprocess."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
assert jax.device_count() == 1, jax.devices()
from ct_clip_ut_tpu.ops.layers import (peg_residual, init_peg,
                                       _peg_conv_residual)
p = init_peg(jax.random.PRNGKey(0), 16)
x = jax.random.normal(jax.random.PRNGKey(1), (2, 4 * 3 * 3, 16), jnp.float32)
vs = (2, 4, 3, 3)
loss_default = lambda pp: (peg_residual(pp, x, vs) ** 2).sum()
g_default = jax.grad(loss_default)(p)
f_safe = _peg_conv_residual(True)
loss_safe = lambda pp: (
    f_safe(x.reshape(2, 4, 3, 3, 16), pp["w"], pp["b"]) ** 2).sum()
g_safe = jax.grad(loss_safe)(p)
for k in g_default:
    err = float(jnp.abs(g_default[k] - g_safe[k]).max())
    assert err < 1e-4, (k, err)
print("OK")
"""
    env = dict(__import__("os").environ)
    env.pop("XLA_FLAGS", None)           # no forced 8-device CPU backend
    env.pop("CTCLIP_PEG_BWD", None)      # exercise the DEFAULT selection
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0 and "OK" in res.stdout, (
        res.stdout, res.stderr[-2000:])
