"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels run
compiled on TPU — see bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import AttentionConfig
from ct_clip_ut_tpu.ops import attention as A
from ct_clip_ut_tpu.ops.pallas_attention import cosine_attention_fused
from ct_clip_ut_tpu.ops.pallas_vq import vq_nearest_pallas
from ct_clip_ut_tpu.ops.layers import l2norm

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("with_bias", [True, False])
def test_pallas_attention_matches_xla(with_bias):
    cfg = AttentionConfig(dim=64, dim_head=16, heads=4)
    p = A.init_attention(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 24, 64))
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, 24, 24))
            if with_bias else None)

    ref, _ = A.attention(p, cfg, x, attn_bias=bias, return_weights=False,
                         use_pallas=False)

    # drive the kernel directly in interpret mode (use_pallas auto-path is
    # TPU-only)
    b, n, _ = x.shape
    from ct_clip_ut_tpu.ops.layers import layernorm, linear
    xn = layernorm(p["norm"], x)
    q = linear(p["to_q"], xn)
    kv = linear(p["to_kv"], x)
    k, v = jnp.split(kv, 2, axis=-1)

    def heads(t):
        return t.reshape(b, n, 4, 16).transpose(0, 2, 1, 3).reshape(b * 4, n, 16)

    out = cosine_attention_fused(heads(q), heads(k), heads(v),
                                 p["q_scale"], p["k_scale"], bias,
                                 4, cfg.scale, True)
    out = out.reshape(b, 4, n, 16).transpose(0, 2, 1, 3).reshape(b, n, 64)
    out = linear(p["to_out"], out)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_ff_matches_xla():
    from ct_clip_ut_tpu.ops import layers as L
    dim, inner = 64, int(4 * 2 / 3 * 64)
    p = L.init_feedforward(KEY, dim, inner)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, dim))
    ref = L.feedforward(p, x, use_pallas=False)

    from ct_clip_ut_tpu.ops.pallas_ff import geglu_ff_fused
    w = p["proj_in"]["w"]
    got = geglu_ff_fused(x.reshape(-1, dim), p["norm"]["gamma"],
                         p["norm"]["beta"], w[:, :inner], w[:, inner:],
                         p["proj_out"]["w"], True).reshape(2, 10, dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # grads flow through the custom VJP
    def loss(x):
        return (geglu_ff_fused(x, p["norm"]["gamma"], p["norm"]["beta"],
                               w[:, :inner], w[:, inner:],
                               p["proj_out"]["w"], True) ** 2).sum()
    g = jax.grad(loss)(x.reshape(-1, dim))
    g_ref = jax.grad(lambda x: (L.feedforward(
        p, x.reshape(2, 10, dim), use_pallas=False) ** 2).sum())(x.reshape(-1, dim))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_pallas_attention_block_matches_xla():
    from ct_clip_ut_tpu.ops.pallas_attn_block import (attention_block_fused,
                                                      _xla_reference_block)
    cfg = AttentionConfig(dim=32, dim_head=8, heads=4)
    p = A.init_attention(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 32))
    bias = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16))

    ref, _ = A.attention(p, cfg, x, attn_bias=bias, return_weights=False,
                         use_pallas=False)
    # the block kernel includes the to_out projection (pre-residual output);
    # weights pass full-width: wq/wk/wv [D, h*dh], wo [h*dh, D]
    d, h, dh = 32, 4, 8
    wq = p["to_q"]["w"]
    wk = p["to_kv"]["w"][:, :h * dh]
    wv = p["to_kv"]["w"][:, h * dh:]
    wo = p["to_out"]["w"]
    got = attention_block_fused(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                p["q_scale"], p["k_scale"], bias,
                                cfg.scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # the XLA twin used for backward matches too
    twin = _xla_reference_block(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                p["q_scale"], p["k_scale"], bias, cfg.scale)
    np.testing.assert_allclose(np.asarray(twin), np.asarray(ref), atol=2e-5)

    # grads through the custom VJP match the plain XLA path
    def loss_fused(x):
        return (attention_block_fused(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                      p["q_scale"], p["k_scale"], bias,
                                      cfg.scale, True) ** 2).sum()
    def loss_ref(x):
        return (A.attention(p, cfg, x, attn_bias=bias, return_weights=False,
                            use_pallas=False)[0] ** 2).sum()
    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_pallas_attention_packed_matches_xla():
    from ct_clip_ut_tpu.ops.pallas_attn_packed import (
        attention_block_packed, packed_attention_xla)
    cfg = AttentionConfig(dim=32, dim_head=8, heads=4)
    p = A.init_attention(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 12, 32))  # short seq

    ref, _ = A.attention(p, cfg, x, return_weights=False, use_pallas=False)
    wq = p["to_q"]["w"]
    wk = p["to_kv"]["w"][:, :32]
    wv = p["to_kv"]["w"][:, 32:]
    wo = p["to_out"]["w"]

    # XLA twin (backward / off-TPU forward path)
    twin = packed_attention_xla(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                p["q_scale"], p["k_scale"], cfg.scale)
    np.testing.assert_allclose(np.asarray(twin), np.asarray(ref), atol=2e-5)

    # kernel (interpret mode)
    got = attention_block_packed(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                 p["q_scale"], p["k_scale"], cfg.scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # grads through the custom VJP match the plain per-head path
    def loss_fused(x):
        return (attention_block_packed(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                       p["q_scale"], p["k_scale"], cfg.scale,
                                       True) ** 2).sum()

    def loss_ref(x):
        return (A.attention(p, cfg, x, return_weights=False,
                            use_pallas=False)[0] ** 2).sum()

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_pallas_vq_matches_argmax():
    d, c = 32, 2048
    codebook = l2norm(jax.random.normal(KEY, (c, d)))
    tokens = l2norm(jax.random.normal(jax.random.PRNGKey(1), (300, d)))
    got = vq_nearest_pallas(tokens, codebook, tm=128, tc=512, interpret=True)
    want = jnp.argmax(tokens @ codebook.T, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_vq_tie_breaking_first_wins():
    d = 16
    base = l2norm(jnp.ones((1, d)))
    codebook = jnp.concatenate([base, -base, base], axis=0)  # dup at 0 and 2
    codebook = jnp.concatenate([codebook] + [-base] * 1021, axis=0)  # 1024 rows
    tokens = base
    got = vq_nearest_pallas(tokens, codebook, tm=8, tc=256, interpret=True)
    assert int(got[0]) == 0  # first maximal code, not the duplicate at 2


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("t", [5, 8])  # t=5 -> TB=1; t=8 -> TB=4 (f32)
def test_pallas_peg_matches_xla(causal, t):
    from ct_clip_ut_tpu.ops import layers as L
    from ct_clip_ut_tpu.ops.pallas_peg import peg_fused
    dim, (b, h, w) = 128, (2, 4, 4)
    p = L.init_peg(KEY, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t * h * w, dim))
    ref = L.peg(p, x, (b, t, h, w), causal=causal) + x

    v = x.reshape(b, t, h, w, dim)
    got = peg_fused(v, p["w"].reshape(27, dim), p["b"], causal,
                    True).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # grads through the custom VJP match the conv formulation
    def loss_fused(v):
        return (peg_fused(v, p["w"].reshape(27, dim), p["b"], causal,
                          True) ** 2).sum()

    def loss_ref(v):
        xf = v.reshape(b, t * h * w, dim)
        return ((L.peg(p, xf, (b, t, h, w), causal=causal) + xf) ** 2).sum()

    g1 = jax.grad(loss_fused)(v)
    g2 = jax.grad(loss_ref)(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_pallas_block_kernel_under_tensor_parallel_shard_map():
    """TP ("model"-axis) x Pallas interplay: head-shard the fused attention
    block exactly the way parallel/sharding.py lays it out under GSPMD —
    wq/wk/wv column-sharded, wo row-sharded, bias head-sharded — run the
    kernel per shard (interpret mode on the virtual mesh), psum the
    row-sharded output projection, and require equality with the unsharded
    XLA reference."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ct_clip_ut_tpu.ops.pallas_attn_block import (_xla_reference_block,
                                                      attention_block_fused)

    tp = 4
    heads, dh, d, n, rows = 8, 16, 128, 32, 2
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    x = jax.random.normal(ks[0], (rows, n, d))
    gamma = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    wq = jax.random.normal(ks[2], (d, heads * dh)) / np.sqrt(d)
    wk = jax.random.normal(ks[3], (d, heads * dh)) / np.sqrt(d)
    wv = jax.random.normal(ks[4], (d, heads * dh)) / np.sqrt(d)
    wo = jax.random.normal(ks[5], (heads * dh, d)) / np.sqrt(heads * dh)
    qs = jnp.abs(jax.random.normal(ks[6], (dh,))) + 0.5
    ksc = jnp.abs(jax.random.normal(ks[7], (dh,))) + 0.5
    bias = jax.random.normal(jax.random.PRNGKey(8), (heads, n, n))

    ref = _xla_reference_block(x, gamma, wq, wk, wv, wo, qs, ksc, bias, 8.0)

    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp), ("data", "model"))

    @jax.jit
    def tp_apply(x, gamma, wq, wk, wv, wo, qs, ksc, bias):
        def shard_fn(x, gamma, wq, wk, wv, wo, qs, ksc, bias):
            out = attention_block_fused(x, gamma, wq, wk, wv, wo, qs, ksc,
                                        bias, 8.0, True)  # interpret
            return jax.lax.psum(out, "model")

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(None, "model"), P(None, "model"),
                      P(None, "model"), P("model", None), P(), P(),
                      P("model", None, None)),
            out_specs=P(), check_vma=False,
        )(x, gamma, wq, wk, wv, wo, qs, ksc, bias)

    got = tp_apply(x, gamma, wq, wk, wv, wo, qs, ksc, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pallas_geglu_ff_under_tensor_parallel_shard_map():
    """Same interplay check for the fused GEGLU FF kernel: hidden dim
    column-sharded in (value/gate), row-sharded out, psum."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ct_clip_ut_tpu.ops.pallas_ff import _xla_reference, geglu_ff_fused

    tp = 4
    d, inner, n, rows = 128, 256, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    x = jax.random.normal(ks[0], (rows, n, d))
    gamma = jax.random.normal(ks[1], (d,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (d,)) * 0.1
    wv = jax.random.normal(ks[3], (d, inner)) / np.sqrt(d)
    wg = jax.random.normal(ks[4], (d, inner)) / np.sqrt(d)
    w2 = jax.random.normal(ks[5], (inner, d)) / np.sqrt(inner)

    ref = _xla_reference(x, gamma, beta, wv, wg, w2)

    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp), ("data", "model"))

    @jax.jit
    def tp_apply(x, gamma, beta, wv, wg, w2):
        def shard_fn(x, gamma, beta, wv, wg, w2):
            flat = x.reshape(-1, x.shape[-1])
            out = geglu_ff_fused(flat, gamma, beta, wv, wg, w2, True)
            return jax.lax.psum(out.reshape(x.shape), "model")

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "model"), P(None, "model"),
                      P("model", None)),
            out_specs=P(), check_vma=False,
        )(x, gamma, beta, wv, wg, w2)

    got = tp_apply(x, gamma, beta, wv, wg, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_residual_fusion_matches_external_add():
    """residual=True (the +x rides the kernel's output write) equals
    out + x across kernels (interpret mode) and the XLA fallback paths."""
    from ct_clip_ut_tpu.ops import layers as L
    cfg = AttentionConfig(dim=64, dim_head=16, heads=4)
    p = A.init_attention(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 64))

    out, _ = A.attention(p, cfg, x, return_weights=False, use_pallas=False)
    res, _ = A.attention(p, cfg, x, return_weights=False, use_pallas=False,
                         residual=True)
    np.testing.assert_allclose(np.asarray(res), np.asarray(out + x), atol=1e-6)

    from ct_clip_ut_tpu.ops.pallas_attn_block import attention_block_fused
    from ct_clip_ut_tpu.ops.pallas_attn_packed import attention_block_packed
    wq = p["to_q"]["w"]
    wk = p["to_kv"]["w"][:, :64]
    wv = p["to_kv"]["w"][:, 64:]
    wo = p["to_out"]["w"]
    base = attention_block_fused(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                 p["q_scale"], p["k_scale"], None,
                                 cfg.scale, True, False)
    fused = attention_block_fused(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                  p["q_scale"], p["k_scale"], None,
                                  cfg.scale, True, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base + x),
                               atol=2e-5)

    basep = attention_block_packed(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                   p["q_scale"], p["k_scale"], cfg.scale,
                                   True, False)
    fusedp = attention_block_packed(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                    p["q_scale"], p["k_scale"], cfg.scale,
                                    True, True)
    np.testing.assert_allclose(np.asarray(fusedp), np.asarray(basep + x),
                               atol=2e-5)

    from ct_clip_ut_tpu.ops.pallas_ff import geglu_ff_fused
    fp = L.init_feedforward(KEY, 64, 128)
    w = fp["proj_in"]["w"]
    x2 = x.reshape(-1, 64)
    b0 = geglu_ff_fused(x2, fp["norm"]["gamma"], fp["norm"]["beta"],
                        w[:, :128], w[:, 128:], fp["proj_out"]["w"], True)
    b1 = geglu_ff_fused(x2, fp["norm"]["gamma"], fp["norm"]["beta"],
                        w[:, :128], w[:, 128:], fp["proj_out"]["w"], True,
                        True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0 + x2), atol=2e-5)

    # XLA fallback of the public feedforward wrapper honors residual too
    ff0 = L.feedforward(fp, x, use_pallas=False)
    ff1 = L.feedforward(fp, x, use_pallas=False, residual=True)
    np.testing.assert_allclose(np.asarray(ff1), np.asarray(ff0 + x), atol=1e-6)

    # grads flow through the residual-fused custom VJPs
    g = jax.grad(lambda x: float(0) + (attention_block_packed(
        x, p["norm"]["gamma"], wq, wk, wv, wo, p["q_scale"], p["k_scale"],
        cfg.scale, True, True) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: ((attention_block_packed(
        x, p["norm"]["gamma"], wq, wk, wv, wo, p["q_scale"], p["k_scale"],
        cfg.scale, True, False) + x) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_pallas_patch_embed_matches_conv_formulation():
    """Fused patch-embed kernel (interpret) == the XLA conv formulation ==
    the explicit patchify+LN+Linear+LN path; grads flow via the XLA twin."""
    from ct_clip_ut_tpu.models import ctvit as V
    from ct_clip_ut_tpu.ops.pallas_patch_embed import (_xla_twin,
                                                       patch_embed_fused)

    patch, t_patch, dim = 4, 2, 128
    b, T, H, W = 2, 6, 16, 16
    key = jax.random.PRNGKey(11)
    patch_dim = t_patch * patch * patch
    p = {
        "norm_in": {"gamma": jax.random.normal(key, (patch_dim,)) * 0.2 + 1.0,
                    "beta": jax.random.normal(jax.random.PRNGKey(12),
                                              (patch_dim,)) * 0.1},
        "proj": {"w": jax.random.normal(jax.random.PRNGKey(13),
                                        (patch_dim, dim)) / 8.0,
                 "b": jax.random.normal(jax.random.PRNGKey(14), (dim,)) * 0.1},
        "norm_out": {"gamma": jax.random.normal(jax.random.PRNGKey(15),
                                                (dim,)) * 0.2 + 1.0,
                     "beta": jax.random.normal(jax.random.PRNGKey(16),
                                               (dim,)) * 0.1},
    }
    img = jax.random.normal(jax.random.PRNGKey(17), (b, 1, T, H, W))

    ref = V._patch_embed(p, V.patchify(img, patch, t_patch))

    gamma = p["norm_in"]["gamma"]
    w = p["proj"]["w"]
    wg = (w * gamma[:, None]).reshape(1, t_patch, patch, patch, dim)
    s1 = (w * gamma[:, None]).sum(axis=0)
    bias = p["norm_in"]["beta"] @ w + p["proj"]["b"]
    k1d = wg.reshape(t_patch * patch, patch, dim).transpose(1, 0, 2)

    twin = _xla_twin(img, k1d, s1, bias, p["norm_out"]["gamma"],
                     p["norm_out"]["beta"], patch, t_patch)
    np.testing.assert_allclose(np.asarray(twin), np.asarray(ref), atol=2e-5)

    got = patch_embed_fused(img, k1d, s1, bias, p["norm_out"]["gamma"],
                            p["norm_out"]["beta"], patch, t_patch, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g1 = jax.grad(lambda im: (patch_embed_fused(
        im, k1d, s1, bias, p["norm_out"]["gamma"], p["norm_out"]["beta"],
        patch, t_patch, True) ** 2).sum())(img)
    g2 = jax.grad(lambda im: (V._patch_embed(
        p, V.patchify(im, patch, t_patch)) ** 2).sum())(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)

    # parameter grads: the residual-based backward (saved conv/moments +
    # Pallas dkw kernel, interpret mode) vs full autodiff through the twin
    def loss_fused(k1d_, s1_, b1_, g2_, b2_):
        return (patch_embed_fused(img, k1d_, s1_, b1_, g2_, b2_,
                                  patch, t_patch, True) ** 2).sum()

    def loss_twin(k1d_, s1_, b1_, g2_, b2_):
        return (_xla_twin(img, k1d_, s1_, b1_, g2_, b2_,
                          patch, t_patch) ** 2).sum()

    args = (k1d, s1, bias, p["norm_out"]["gamma"], p["norm_out"]["beta"])
    gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    gt = jax.grad(loss_twin, argnums=tuple(range(5)))(*args)
    for name, a, b2_ in zip(("kw", "s1", "b1", "g2", "b2"), gf, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2_),
                                   atol=1e-3, err_msg=name)


@pytest.mark.parametrize("residual", [False, True])
def test_pallas_ff_backward_all_grads(residual):
    """Fused FF backward (interpret): grads w.r.t. ALL inputs — x, LN
    gamma/beta, both in-projections, out-projection — match the XLA twin."""
    from ct_clip_ut_tpu.ops.pallas_ff import _xla_reference, geglu_ff_fused
    dim, inner, n = 64, 96, 40   # n not a tile multiple: exercises padding
    ks = jax.random.split(jax.random.PRNGKey(21), 6)
    x = jax.random.normal(ks[0], (n, dim))
    gamma = jax.random.normal(ks[1], (dim,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (dim,)) * 0.1
    wv = jax.random.normal(ks[3], (dim, inner)) / 8.0
    wg = jax.random.normal(ks[4], (dim, inner)) / 8.0
    w2 = jax.random.normal(ks[5], (inner, dim)) / 10.0

    def loss_fused(x, gamma, beta, wv, wg, w2):
        return (geglu_ff_fused(x, gamma, beta, wv, wg, w2, True,
                               residual) ** 2).sum()

    def loss_ref(x, gamma, beta, wv, wg, w2):
        return (_xla_reference(x, gamma, beta, wv, wg, w2, residual) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, gamma, beta, wv, wg, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, gamma, beta, wv, wg, w2)
    for a, b, name in zip(g1, g2, ["x", "gamma", "beta", "wv", "wg", "w2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("residual", [False, True])
def test_pallas_attn_block_backward_all_grads(with_bias, residual):
    """Fused attention-block backward (interpret): grads w.r.t. every input
    (x, LN gamma, Wq/Wk/Wv/Wo, qs/ks scales, bias) match the XLA twin."""
    from ct_clip_ut_tpu.ops.pallas_attn_block import (_xla_reference_block,
                                                      attention_block_fused)
    ks = jax.random.split(jax.random.PRNGKey(6), 9)
    d, h, dh, n, r = 32, 4, 8, 16, 3
    x = jax.random.normal(ks[0], (r, n, d))
    gamma = jax.random.normal(ks[1], (d,)) * 0.2 + 1.0
    wq = jax.random.normal(ks[2], (d, h * dh)) / 5
    wk = jax.random.normal(ks[3], (d, h * dh)) / 5
    wv = jax.random.normal(ks[4], (d, h * dh)) / 5
    wo = jax.random.normal(ks[5], (h * dh, d)) / 5
    qs = jnp.abs(jax.random.normal(ks[6], (dh,))) + 0.5
    ksc = jnp.abs(jax.random.normal(ks[7], (dh,))) + 0.5
    bias = jax.random.normal(ks[8], (h, n, n)) if with_bias else None

    args = (x, gamma, wq, wk, wv, wo, qs, ksc)
    nd = tuple(range(8))
    g1 = jax.grad(lambda *a: (attention_block_fused(
        *a, bias, 8.0, True, residual) ** 2).sum(), argnums=nd)(*args)
    g2 = jax.grad(lambda *a: (_xla_reference_block(
        *a, bias, 8.0, residual) ** 2).sum(), argnums=nd)(*args)
    for a, b, nm in zip(g1, g2, ["x", "gamma", "wq", "wk", "wv", "wo",
                                 "qs", "ks"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-4, err_msg=nm)
    if with_bias:
        gb1 = jax.grad(lambda b: (attention_block_fused(
            *args, b, 8.0, True, residual) ** 2).sum())(bias)
        gb2 = jax.grad(lambda b: (_xla_reference_block(
            *args, b, 8.0, residual) ** 2).sum())(bias)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   atol=5e-3, rtol=1e-4)


@pytest.mark.parametrize("residual", [False, True])
def test_pallas_packed_backward_all_grads(residual):
    """Packed attention backward (interpret): all grads match the packed
    XLA twin, including when b is not a multiple of the row block."""
    from ct_clip_ut_tpu.ops.pallas_attn_packed import (attention_block_packed,
                                                       packed_attention_xla)
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    d, h, dh, n, b = 32, 4, 8, 12, 6   # b=6 -> r=2 blocking
    x = jax.random.normal(ks[0], (b, n, d))
    gamma = jax.random.normal(ks[1], (d,)) * 0.2 + 1.0
    wq = jax.random.normal(ks[2], (d, h * dh)) / 5
    wk = jax.random.normal(ks[3], (d, h * dh)) / 5
    wv = jax.random.normal(ks[4], (d, h * dh)) / 5
    wo = jax.random.normal(ks[5], (h * dh, d)) / 5
    qs = jnp.abs(jax.random.normal(ks[6], (dh,))) + 0.5
    ksc = jnp.abs(jax.random.normal(ks[7], (dh,))) + 0.5

    args = (x, gamma, wq, wk, wv, wo, qs, ksc)
    nd = tuple(range(8))
    g1 = jax.grad(lambda *a: (attention_block_packed(
        *a, 8.0, True, residual) ** 2).sum(), argnums=nd)(*args)
    g2 = jax.grad(lambda *a: (packed_attention_xla(
        *a, 8.0, residual) ** 2).sum(), argnums=nd)(*args)
    for a, b_, nm in zip(g1, g2, ["x", "gamma", "wq", "wk", "wv", "wo",
                                  "qs", "ks"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3,
                                   rtol=1e-4, err_msg=nm)


@pytest.mark.parametrize("causal", [True, False])
def test_pallas_peg_weight_grads_match_xla(causal):
    """The single-pass PEG tap accumulator (interpret) reproduces XLA's
    depthwise-conv weight and bias grads."""
    from ct_clip_ut_tpu.ops.layers import _peg_conv_residual_impl
    from ct_clip_ut_tpu.ops.pallas_peg_bwd import peg_weight_grads
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    b, t, h, w, c = 2, 5, 6, 7, 16
    v = jax.random.normal(ks[0], (b, t, h, w, c))
    wt = jax.random.normal(ks[1], (3, 3, 3, 1, c)) / 5.0
    bias = jax.random.normal(ks[2], (c,)) * 0.1
    g = jax.random.normal(ks[3], (b, t, h, w, c))

    dw, db = peg_weight_grads(v, g, causal=causal, interpret=True)
    _, vjp = jax.vjp(
        lambda w_, b_: _peg_conv_residual_impl(v, w_, b_, causal), wt, bias)
    dw_ref, db_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_peg_residual_custom_vjp_matches_autodiff(causal):
    """peg_residual's custom VJP (conv-transpose dx + tap-accumulator dw)
    equals plain XLA autodiff of the same composition for every input."""
    from ct_clip_ut_tpu.ops.layers import (_peg_conv_residual,
                                           _peg_conv_residual_impl)
    ks = jax.random.split(jax.random.PRNGKey(12), 4)
    b, t, h, w, c = 2, 4, 5, 6, 16
    v = jax.random.normal(ks[0], (b, t, h, w, c))
    wt = jax.random.normal(ks[1], (3, 3, 3, 1, c)) / 5.0
    bias = jax.random.normal(ks[2], (c,)) * 0.1

    f = _peg_conv_residual(causal)
    g1 = jax.grad(lambda *a: (f(*a) ** 2).sum(), argnums=(0, 1, 2))(
        v, wt, bias)
    g2 = jax.grad(
        lambda *a: (_peg_conv_residual_impl(*a, causal) ** 2).sum(),
        argnums=(0, 1, 2))(v, wt, bias)
    for a, b_, nm in zip(g1, g2, ["v", "w", "b"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   rtol=1e-4, err_msg=nm)


# ---------------------------------------------------------------------------
# fused q-row-stripe kernel (the CTGenerate MaskGit serving route)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("with_bias,residual,b",
                         [(True, True, 2),    # batch-inside variant
                          (True, False, 2),
                          (True, True, 1),    # per-item grid variant
                          (False, True, 2)])  # no-bias -> per-item grid
def test_pallas_qrows_matches_dense(with_bias, residual, b):
    """attention_qrows_fused (interpret) == the dense cosine-attention op:
    same full-row softmax, fp32 scores, k/v from pre-norm x. b=2 with bias
    routes the batch-inside kernel (shared bias stripes); b=1 / no-bias
    route the per-item grid."""
    from ct_clip_ut_tpu.ops.pallas_attn_qrows import attention_qrows_fused
    cfg = AttentionConfig(dim=64, dim_head=16, heads=4)
    p = A.init_attention(KEY, cfg)
    n = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, cfg.dim))
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, n, n)) * 0.4
            if with_bias else None)
    ref, _ = A.attention(p, cfg, x, attn_bias=bias, return_weights=False,
                         use_pallas=False, residual=residual)
    wkv = p["to_kv"]["w"]
    got = attention_qrows_fused(
        x, p["norm"]["gamma"], p["to_q"]["w"], wkv[:, :cfg.inner_dim],
        wkv[:, cfg.inner_dim:], p["to_out"]["w"], p["q_scale"], p["k_scale"],
        bias, cfg.scale, 16, True, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_pallas_qrows_backward_all_grads():
    """The custom VJP (XLA dense-twin recompute) gradients equal autodiff of
    the dense attention op for every input."""
    from ct_clip_ut_tpu.ops.pallas_attn_qrows import attention_qrows_fused
    cfg = AttentionConfig(dim=64, dim_head=16, heads=4)
    p = A.init_attention(KEY, cfg)
    b, n = 2, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, cfg.dim))
    bias = jax.random.normal(jax.random.PRNGKey(2), (4, n, n)) * 0.4
    wkv = p["to_kv"]["w"]

    def loss_k(x, wq, wk, wv, wo, qs, ks, bias):
        out = attention_qrows_fused(x, p["norm"]["gamma"], wq, wk, wv, wo,
                                    qs, ks, bias, cfg.scale, 16, True, True)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_d(x, wq, wk, wv, wo, qs, ks, bias):
        p2 = dict(p)
        p2["to_q"] = {"w": wq}
        p2["to_kv"] = {"w": jnp.concatenate([wk, wv], axis=-1)}
        p2["to_out"] = {"w": wo}
        p2["q_scale"], p2["k_scale"] = qs, ks
        out = A.attention(p2, cfg, x, attn_bias=bias, return_weights=False,
                          use_pallas=False, residual=True).out
        return (out.astype(jnp.float32) ** 2).sum()

    args = (x, p["to_q"]["w"], wkv[:, :cfg.inner_dim], wkv[:, cfg.inner_dim:],
            p["to_out"]["w"], p["q_scale"], p["k_scale"], bias)
    gk = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    gd = jax.grad(loss_d, argnums=tuple(range(8)))(*args)
    for a, b_, nm in zip(gk, gd, "x wq wk wv wo qs ks bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4,
                                   rtol=5e-4, err_msg=nm)


# ---------------------------------------------------------------------------
# fused BERT encoder layer (the text-tower train-step kernel)
# ---------------------------------------------------------------------------

def _bert_layer_args(key, d=128, f=256, heads=4, b=2, n=16, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, n, d)).astype(dtype)
    mask = np.zeros((b, n), np.float32)
    mask[1, n - 3:] = np.finfo(np.float32).min      # padded keys on row 1
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) / np.sqrt(d)
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.1
    wo = jax.random.normal(ks[3], (d, d)) / np.sqrt(d)
    bo = jax.random.normal(ks[4], (d,)) * 0.1
    g1 = 1.0 + jax.random.normal(ks[5], (d,)) * 0.1
    be1 = jax.random.normal(ks[6], (d,)) * 0.1
    w1 = jax.random.normal(ks[7], (d, f)) / np.sqrt(d)
    b1 = jax.random.normal(ks[8], (f,)) * 0.1
    w2 = jax.random.normal(ks[9], (f, d)) / np.sqrt(f)
    b2 = jax.random.normal(ks[10], (d,)) * 0.1
    g2 = 1.0 + jax.random.normal(ks[11], (d,)) * 0.1
    be2 = jnp.zeros((d,))
    return (x, jnp.asarray(mask), wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2,
            b2, g2, be2)


def test_pallas_bert_layer_matches_xla():
    from ct_clip_ut_tpu.ops.pallas_bert_layer import (bert_layer_fused,
                                                      bert_layer_xla)
    args = _bert_layer_args(jax.random.PRNGKey(5))
    x, mask, *w = args
    want = bert_layer_xla(x, mask, *w, 4, 1e-12)
    got = bert_layer_fused(x, mask, jnp.zeros(3, jnp.int32), *w,
                           4, 1e-12, 0.0, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pallas_bert_layer_backward_all_grads():
    """Fused backward (interpret) == XLA-twin autodiff for x and every
    weight/bias/LN parameter."""
    from ct_clip_ut_tpu.ops.pallas_bert_layer import (bert_layer_fused,
                                                      bert_layer_xla)
    args = _bert_layer_args(jax.random.PRNGKey(6))
    x, mask, *w = args
    seeds = jnp.zeros(3, jnp.int32)

    def loss_k(x, *w):
        out = bert_layer_fused(x, mask, seeds, *w, 4, 1e-12, 0.0, 0.0,
                               False, True)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_t(x, *w):
        out = bert_layer_xla(x, mask, *w, 4, 1e-12)
        return (out.astype(jnp.float32) ** 2).sum()

    argnums = tuple(range(1 + len(w)))
    gk = jax.grad(loss_k, argnums=argnums)(x, *w)
    gt = jax.grad(loss_t, argnums=argnums)(x, *w)
    names = "x wqkv bqkv wo bo g1 be1 w1 b1 w2 b2 g2 be2".split()
    for a, b_, nm in zip(gk, gt, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3, err_msg=nm)


def test_pallas_bert_layer_dropout():
    """Train-mode dropout: deterministic per seed, distinct across seeds,
    and the custom-VJP gradient matches a finite difference THROUGH the
    same masks (forward and backward regenerate identical masks).

    TPU-only: the Pallas interpreter's prng_random_bits is a zeros stub on
    CPU (probed 2026-08-20), so this runs in the on-chip drive
    (tools/drive_bert_kernel.py) and skips in the CPU suite."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU hardware PRNG required (interpreter stubs it)")
    from ct_clip_ut_tpu.ops.pallas_bert_layer import bert_layer_fused
    args = _bert_layer_args(jax.random.PRNGKey(7))
    x, mask, *w = args
    seeds = jnp.asarray([11, 22, 33], jnp.int32)

    def f(x):
        return bert_layer_fused(x, mask, seeds, *w, 4, 1e-12, 0.25, 0.25,
                                True, False)

    out1, out2 = f(x), f(x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = bert_layer_fused(x, mask, jnp.asarray([99, 98, 97], jnp.int32),
                            *w, 4, 1e-12, 0.25, 0.25, True, False)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 1e-3

    # fd methodology (measured on-chip 2026-08-21): Mosaic runs 'fp32'
    # dots at DEFAULT precision (bf16 passes), so the kernel forward
    # carries ~5e-3 relative rounding that is NOT smooth in the input —
    # a small-eps fd is rounding jitter (the same check against the
    # true-fp32 CPU twin passes at 2e-4). Large eps (0.1) lifts the signal
    # above the jitter at ~1% curvature cost; reductions in host float64.
    r = np.asarray(jax.random.normal(jax.random.PRNGKey(3), x.shape),
                   np.float64)
    g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32)
                                   * jnp.asarray(r, jnp.float32)))(x)
    v = jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.1
    op = np.asarray(f(x + v), np.float64)
    om = np.asarray(f(x - v), np.float64)
    fd = ((op - om) * r).sum()
    analytic = 2.0 * (np.asarray(g, np.float64)
                      * np.asarray(v, np.float64)).sum()
    np.testing.assert_allclose(float(fd), float(analytic), rtol=1.5e-1)


def test_bert_apply_fused_wiring_matches_xla():
    """The routing wiring (QKV concat order, mask rows, LN params) drives
    bert_layer_fused to the same numbers as the XLA bert_apply path."""
    from ct_clip_ut_tpu.config import BertConfig
    from ct_clip_ut_tpu.models.bert import bert_apply, init_bert
    from ct_clip_ut_tpu.ops.pallas_bert_layer import bert_layer_fused

    cfg = BertConfig(vocab_size=64, hidden_size=128, num_layers=2,
                     num_heads=4, intermediate_size=256,
                     max_position_embeddings=32)
    params = init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    att = jnp.ones((2, 16), jnp.int32).at[1, 13:].set(0)

    want = bert_apply(params, cfg, ids, att)   # CPU: XLA path

    # replicate the embedding stage, then the fused layers (interpret)
    e = params["embeddings"]
    from ct_clip_ut_tpu.ops.layers import layernorm
    x = (jnp.take(e["word"], ids, axis=0) + e["position"][None, :16]
         + jnp.take(e["token_type"], jnp.zeros_like(ids), axis=0))
    x = layernorm(e["ln"], x, eps=cfg.layer_norm_eps)
    mask_row = (1.0 - att.astype(jnp.float32)) * np.finfo(np.float32).min
    for layer in params["layers"]:
        wqkv = jnp.concatenate([layer["q"]["w"], layer["k"]["w"],
                                layer["v"]["w"]], axis=1)
        bqkv = jnp.concatenate([layer["q"]["b"], layer["k"]["b"],
                                layer["v"]["b"]])
        x = bert_layer_fused(
            x, mask_row, jnp.zeros(3, jnp.int32), wqkv, bqkv,
            layer["attn_out"]["w"], layer["attn_out"]["b"],
            layer["attn_ln"]["gamma"], layer["attn_ln"]["beta"],
            layer["ffn_in"]["w"], layer["ffn_in"]["b"],
            layer["ffn_out"]["w"], layer["ffn_out"]["b"],
            layer["ffn_ln"]["gamma"], layer["ffn_ln"]["beta"],
            cfg.num_heads, cfg.layer_norm_eps, 0.0, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
