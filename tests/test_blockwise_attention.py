"""Blockwise (online-softmax) attention vs the dense op — forward, grads,
bias_fn CPB column stripes, and the no-[n, n]-intermediate guarantee."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import AttentionConfig
from ct_clip_ut_tpu.ops.attention import attention, init_attention
from ct_clip_ut_tpu.ops.attention_blockwise import blockwise_cosine_attention
from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias,
                                        continuous_pos_bias_col_stripe,
                                        init_continuous_pos_bias)

CFG = AttentionConfig(dim=64, dim_head=16, heads=4, num_null_kv=0,
                      causal=False, dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    params = init_attention(jax.random.PRNGKey(0), CFG)
    b, n = 3, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, CFG.dim))
    bias = jax.random.normal(jax.random.PRNGKey(2), (CFG.heads, n, n)) * 0.4
    return params, x, bias


@pytest.mark.parametrize("residual", [False, True])
def test_blockwise_matches_dense(setup, residual):
    params, x, bias = setup
    want = attention(params, CFG, x, attn_bias=bias, residual=residual,
                     return_weights=False, use_pallas=False).out
    got = jax.jit(lambda p, xx, bb: blockwise_cosine_attention(
        p, CFG, xx, block=16, attn_bias=bb, residual=residual))(
            params, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_blockwise_gradients_match_dense(setup):
    params, x, bias = setup

    def loss_b(params, x):
        out = blockwise_cosine_attention(params, CFG, x, block=16,
                                         attn_bias=bias, residual=True)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_d(params, x):
        out = attention(params, CFG, x, attn_bias=bias, residual=True,
                        return_weights=False, use_pallas=False).out
        return (out.astype(jnp.float32) ** 2).sum()

    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(params, x)
    gd = jax.jit(jax.grad(loss_d, argnums=(0, 1)))(params, x)
    fb, _ = jax.tree_util.tree_flatten(gb)
    fd, _ = jax.tree_util.tree_flatten(gd)
    for a, b in zip(fb, fd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_cpb_col_stripe_matches_full_table():
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(3), 32, CFG.heads)
    d1 = d2 = 8
    full = continuous_pos_bias(cpb, d1, d2)
    for c0, m in ((0, 2), (3, 4), (6, 2)):
        stripe = continuous_pos_bias_col_stripe(cpb, d1, d2, c0, m)
        np.testing.assert_allclose(
            np.asarray(stripe), np.asarray(full[:, :, c0 * d2:(c0 + m) * d2]),
            atol=1e-6)


def test_cpb_col_stripe3_matches_full_table():
    """3D column stripes — including MULTI-ROW blocks (col_len > 1), where
    a (d1, col_len) axis-order bug in the final reshape would hide at
    col_len == 1 — equal the dense 3D table slices; also via a precomputed
    offset table (the scan-hoisted form)."""
    from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias_col_stripe3,
                                            cpb_offset_table)
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(4), 32, CFG.heads,
                                   num_dims=3)
    d1, d2, d3 = 4, 2, 3
    full = continuous_pos_bias(cpb, d1, d2, d3)
    table = cpb_offset_table(cpb, (d1, d2, d3))
    for c0, m in ((0, 2), (1, 3), (3, 1)):
        want = full[:, :, c0 * d2 * d3:(c0 + m) * d2 * d3]
        got = continuous_pos_bias_col_stripe3(cpb, d1, d2, d3, c0, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        got_t = continuous_pos_bias_col_stripe3(None, d1, d2, d3, c0, m,
                                                table=table)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want),
                                   atol=1e-6)


def test_blockwise_bias_fn_cpb(setup):
    """bias_fn streaming CPB column stripes == dense bias table — the full
    [heads, n, n] CPB never exists on this path."""
    params, x, _ = setup
    d1 = d2 = 8                      # n = 64 grid tokens
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(3), 32, CFG.heads)
    full = continuous_pos_bias(cpb, d1, d2)
    block = 16                       # 2 grid rows per key block

    def bias_fn(col0):
        return continuous_pos_bias_col_stripe(
            cpb, d1, d2, col0 // d2, block // d2)

    want = attention(params, CFG, x, attn_bias=full, return_weights=False,
                     use_pallas=False).out
    got = jax.jit(lambda p, xx: blockwise_cosine_attention(
        p, CFG, xx, block=block, bias_fn=bias_fn))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_blockwise_memory_no_dense_scores(setup):
    """No intermediate anywhere (including the scan body) may carry an
    [.., n, n] score matrix when bias comes through bias_fn. n != dim so
    the check cannot be fooled by [b, n, dim] activations."""
    from test_ring_attention import _all_eqn_shapes

    params, _, _ = setup
    d1, d2 = 20, 8
    n = d1 * d2        # 160: != dim (64), != 2*inner_dim (128) — no aliasing
    x = jax.random.normal(jax.random.PRNGKey(9), (2, n, CFG.dim))
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(3), 32, CFG.heads)
    block = 32

    def bias_fn(col0):
        return continuous_pos_bias_col_stripe(
            cpb, d1, d2, col0 // d2, block // d2)

    jaxpr = jax.make_jaxpr(lambda p, xx: blockwise_cosine_attention(
        p, CFG, xx, block=block, bias_fn=bias_fn))(params, x)
    shapes = _all_eqn_shapes(jaxpr.jaxpr)
    assert any(s[-2:] == (n, block) for s in shapes if len(s) >= 2)
    for s in shapes:
        assert not (len(s) >= 2 and s[-1] == n and s[-2] == n), s


# ---------------------------------------------------------------------------
# query-row-block path (the MaskGit long-context serving route)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("q_block", [16, 24])   # 24 does not divide n=64
def test_qrows_matches_dense(setup, residual, q_block):
    """blockwise_cosine_attention_qrows == dense, including the padded-q
    tail when q_block does not divide n."""
    from ct_clip_ut_tpu.ops.attention_blockwise import \
        blockwise_cosine_attention_qrows
    params, x, bias = setup
    want = attention(params, CFG, x, attn_bias=bias, residual=residual,
                     return_weights=False, use_pallas=False).out
    got = jax.jit(lambda p, xx, bb: blockwise_cosine_attention_qrows(
        p, CFG, xx, q_block=q_block, attn_bias=bb, residual=residual))(
            params, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_cpb_row_stripe3_matches_full_table():
    """3D ROW stripes equal the dense table's row slices (multi-row blocks
    included); out-of-range rows (q padding) come back all-zero."""
    from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias_row_stripe3,
                                            cpb_offset_table)
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(4), 32, CFG.heads,
                                   num_dims=3)
    d1, d2, d3 = 4, 2, 3
    full = continuous_pos_bias(cpb, d1, d2, d3)
    table = cpb_offset_table(cpb, (d1, d2, d3))
    for r0, m in ((0, 2), (1, 3), (3, 1)):
        want = full[:, r0 * d2 * d3:(r0 + m) * d2 * d3, :]
        got = continuous_pos_bias_row_stripe3(cpb, d1, d2, d3, r0, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        got_t = continuous_pos_bias_row_stripe3(None, d1, d2, d3, r0, m,
                                                table=table)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want),
                                   atol=1e-6)
    # padded rows past the grid: finite bias (legal offsets still select
    # table rows; the qrows path drops those query rows' outputs entirely)
    over = continuous_pos_bias_row_stripe3(cpb, d1, d2, d3, d1, 2)
    assert np.isfinite(np.asarray(over)).all()


def test_qrows_bias_row_fn_cpb(setup):
    """bias_row_fn streaming 3D CPB row stripes == dense bias — the
    MaskGit routing (models/maskgit.py), full table never materialized."""
    from ct_clip_ut_tpu.ops.attention_blockwise import \
        blockwise_cosine_attention_qrows
    from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias_row_stripe3,
                                            cpb_offset_table)
    params, x, _ = setup
    d1, d2, d3 = 8, 2, 4             # n = 64 grid tokens
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(3), 32, CFG.heads,
                                   num_dims=3)
    full = continuous_pos_bias(cpb, d1, d2, d3)
    q_block = 16                     # 2 grid rows per query block
    table = cpb_offset_table(cpb, (d1, d2, d3))

    def bias_row_fn(row0):
        return continuous_pos_bias_row_stripe3(
            None, d1, d2, d3, row0 // (d2 * d3), q_block // (d2 * d3),
            table=table)

    want = attention(params, CFG, x, attn_bias=full, return_weights=False,
                     use_pallas=False).out
    got = jax.jit(lambda p, xx: blockwise_cosine_attention_qrows(
        p, CFG, xx, q_block=q_block, bias_row_fn=bias_row_fn))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_qrows_memory_no_dense_scores(setup):
    """The q-rows scan body carries [.., q_block, n] scores only — never
    [.., n, n]."""
    from test_ring_attention import _all_eqn_shapes

    from ct_clip_ut_tpu.ops.attention_blockwise import \
        blockwise_cosine_attention_qrows
    from ct_clip_ut_tpu.ops.posbias import (continuous_pos_bias_row_stripe3,
                                            cpb_offset_table)
    params, _, _ = setup
    d1, d2, d3 = 20, 2, 4
    n = d1 * d2 * d3   # 160: != dim (64), != 2*inner_dim (128)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, n, CFG.dim))
    cpb = init_continuous_pos_bias(jax.random.PRNGKey(3), 32, CFG.heads,
                                   num_dims=3)
    q_block = 32
    table = cpb_offset_table(cpb, (d1, d2, d3))

    def bias_row_fn(row0):
        return continuous_pos_bias_row_stripe3(
            None, d1, d2, d3, row0 // (d2 * d3), q_block // (d2 * d3),
            table=table)

    jaxpr = jax.make_jaxpr(lambda p, xx: blockwise_cosine_attention_qrows(
        p, CFG, xx, q_block=q_block, bias_row_fn=bias_row_fn))(params, x)
    shapes = _all_eqn_shapes(jaxpr.jaxpr)
    assert any(s[-2:] == (q_block, n) for s in shapes if len(s) >= 2)
    for s in shapes:
        assert not (len(s) >= 2 and s[-1] == n and s[-2] == n), s
