"""Pipeline-parallel transformer stack vs the dense path.

Beyond-parity extension: GPipe schedule over a ppermute ring
(parallel/pipeline.py) — each device holds depth/n_stages layers — must
reproduce the dense `ops/transformer.transformer` output and gradients on
the virtual 8-device CPU mesh, including under per-layer remat and with a
tighter-than-stages microbatch split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ct_clip_ut_tpu.config import TransformerConfig
from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias,
                                        init_continuous_pos_bias)
from ct_clip_ut_tpu.ops.transformer import init_transformer, transformer
from ct_clip_ut_tpu.parallel.pipeline import transformer_pipelined

TCFG = TransformerConfig(dim=32, depth=4, dim_head=8, heads=2,
                         peg=True, peg_causal=True)
B, T, H, W = 4, 2, 4, 4              # spatial-stack layout: rows = B*T
VIDEO = (B, T, H, W)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    params = init_transformer(jax.random.PRNGKey(0), TCFG)
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(2), dim=16,
                                   heads=TCFG.heads)
    bias = continuous_pos_bias(cpb, H, W)
    x = jax.random.normal(jax.random.PRNGKey(1), (B * T, H * W, TCFG.dim),
                          jnp.float32)
    return mesh, params, x, bias


def _dense(params, x, bias, cfg=TCFG):
    out, _ = transformer(params, cfg, x, video_shape=VIDEO, attn_bias=bias,
                         return_weights=False, deterministic=True)
    return out


def test_pipelined_matches_dense(setup):
    mesh, params, x, bias = setup
    want = _dense(params, x, bias)
    got = transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias,
                                video_shape=VIDEO)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_more_microbatches(setup):
    """M > n_stages (smaller bubble) and M < rows both reproduce dense."""
    mesh, params, x, bias = setup
    want = _dense(params, x, bias)
    for m in (2, 4):
        got = transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias,
                                    video_shape=VIDEO, microbatches=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5, err_msg=f"M={m}")


def test_pipelined_no_peg_no_bias():
    """The plain stack (no PEG, no positional bias) pipelines too —
    video_shape becomes optional exactly when cfg.peg is off."""
    cfg = TransformerConfig(dim=32, depth=4, dim_head=8, heads=2, peg=False)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    params = init_transformer(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 6, cfg.dim), jnp.float32)
    want, _ = transformer(params, cfg, x, return_weights=False,
                          deterministic=True)
    got = transformer_pipelined(params, cfg, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_dp_composition(setup):
    """data_axis shards the microbatch rows over "data" while layers
    pipeline over "pipe" — a true DPxPP composition, still equal to dense."""
    mesh, params, x, bias = setup
    want = _dense(params, x, bias)
    got = transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias,
                                video_shape=VIDEO, data_axis="data",
                                microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_gradients_match_dense(setup):
    """d(loss)/d(params, x) through the full schedule (scan + ppermute +
    psum + the stacked-param gather) equals dense autodiff."""
    mesh, params, x, bias = setup

    def loss_pp(params, x):
        out = transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias,
                                    video_shape=VIDEO)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_dense(params, x):
        return (_dense(params, x, bias).astype(jnp.float32) ** 2).sum()

    gp = jax.grad(loss_pp, argnums=(0, 1))(params, x)
    gd = jax.grad(loss_dense, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_pipelined_remat_matches(setup):
    """cfg.remat checkpoints each layer body inside the stage scan; values
    and grads are unchanged."""
    mesh, params, x, bias = setup
    import dataclasses
    rcfg = dataclasses.replace(TCFG, remat=True)

    def loss(params, x, cfg):
        out = transformer_pipelined(params, cfg, x, mesh, attn_bias=bias,
                                    video_shape=VIDEO)
        return (out.astype(jnp.float32) ** 2).sum()

    v0, g0 = jax.value_and_grad(loss)(params, x, TCFG)
    v1, g1 = jax.value_and_grad(loss)(params, x, rcfg)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pipelined_validation_errors(setup):
    mesh, params, x, bias = setup
    with pytest.raises(ValueError, match="microbatches"):
        transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias,
                              video_shape=VIDEO, microbatches=3)
    cfg6 = TransformerConfig(dim=32, depth=6, dim_head=8, heads=2)
    p6 = init_transformer(jax.random.PRNGKey(5), cfg6)
    with pytest.raises(ValueError, match="divisible"):
        transformer_pipelined(p6, cfg6, x, mesh)
    with pytest.raises(ValueError, match="video_shape"):
        transformer_pipelined(params, TCFG, x, mesh, attn_bias=bias)
