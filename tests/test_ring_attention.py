"""Ring attention (sequence parallelism over the token axis) vs the dense op.

The reference has no sequence parallelism at all (SURVEY.md section 5); the
ring path is a beyond-parity extension and must agree with the dense
QK-normalized attention (reference semantics attention.py:121-178) to fp32
summation-order tolerance — forward AND gradients, bias and no-bias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ct_clip_ut_tpu.config import AttentionConfig
from ct_clip_ut_tpu.ops.attention import attention, init_attention
from ct_clip_ut_tpu.parallel.ring_attention import ring_cosine_attention

CFG = AttentionConfig(dim=64, dim_head=16, heads=4, num_null_kv=0,
                      causal=False, dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    params = init_attention(jax.random.PRNGKey(0), CFG)
    b, n = 4, 32                       # n_loc = 8 per model-axis device
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, CFG.dim))
    bias = jax.random.normal(jax.random.PRNGKey(2), (CFG.heads, n, n)) * 0.3
    return mesh, params, x, bias


def _ring_fn(mesh, with_bias, residual):
    in_specs = (P(), P("data", "model", None),
                P(None, "model", None) if with_bias else None)
    def f(params, x, bias):
        return ring_cosine_attention(params, CFG, x, "model",
                                     attn_bias=bias, residual=residual)
    if not with_bias:
        f_nb = lambda params, x: ring_cosine_attention(
            params, CFG, x, "model", attn_bias=None, residual=residual)
        return shard_map(f_nb, mesh=mesh, in_specs=in_specs[:2],
                         out_specs=P("data", "model", None), check_vma=False)
    return shard_map(f, mesh=mesh, in_specs=in_specs,
                     out_specs=P("data", "model", None), check_vma=False)


@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("residual", [False, True])
def test_ring_matches_dense_forward(setup, with_bias, residual):
    mesh, params, x, bias = setup
    want = attention(params, CFG, x, attn_bias=bias if with_bias else None,
                     return_weights=False, use_pallas=False,
                     residual=residual).out

    ring = _ring_fn(mesh, with_bias, residual)
    args = (params, x, bias) if with_bias else (params, x)
    got = jax.jit(ring)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_matches_dense_gradients(setup):
    """d/d(params, x) of a scalar loss agree between ring and dense — the
    ppermute ring is differentiable end-to-end (training-ready)."""
    mesh, params, x, bias = setup
    ring = _ring_fn(mesh, True, True)

    def loss_ring(params, x):
        return (ring(params, x, bias).astype(jnp.float32) ** 2).sum()

    def loss_dense(params, x):
        out = attention(params, CFG, x, attn_bias=bias, residual=True,
                        return_weights=False, use_pallas=False).out
        return (out.astype(jnp.float32) ** 2).sum()

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(params, x)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(params, x)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    flat_d, _ = jax.tree_util.tree_flatten(gd)
    for a, b in zip(flat_r, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def _all_eqn_shapes(jaxpr):
    """Shapes of every intermediate across the jaxpr and all nested jaxprs
    (shard_map / scan / cond bodies), not just the top level."""
    def as_jaxpr(p):
        # params hold either a raw Jaxpr (has .eqns) or a ClosedJaxpr
        # (has .jaxpr); unwrap both
        if hasattr(p, "eqns"):
            return p
        inner = getattr(p, "jaxpr", None)
        return inner if inner is not None and hasattr(inner, "eqns") else None

    shapes = []
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            if hasattr(v, "aval") and hasattr(v.aval, "shape"):
                shapes.append(v.aval.shape)
        for p in eqn.params.values():
            for q in (p if isinstance(p, (list, tuple)) else (p,)):
                qj = as_jaxpr(q)
                if qj is not None:
                    shapes += _all_eqn_shapes(qj)
    return shapes


def test_ring_memory_is_blockwise(setup):
    """No intermediate anywhere in the program (including the shard_map and
    fori_loop bodies) may carry a PER-DEVICE [.., n, n] score matrix: the
    ring exists so the peak score block is [n_loc, n_loc]."""
    mesh, params, x, bias = setup
    n = x.shape[1]
    n_loc = n // mesh.shape["model"]
    ring = _ring_fn(mesh, True, False)
    jaxpr = jax.make_jaxpr(lambda p, xx, bb: ring(p, xx, bb))(params, x, bias)
    shapes = _all_eqn_shapes(jaxpr.jaxpr)
    # sanity: the recursion actually reaches the score blocks
    assert any(s[-2:] == (n_loc, n_loc) for s in shapes if len(s) >= 2), \
        "recursion failed to reach the shard_map/loop body"
    for s in shapes:
        assert not (len(s) >= 2 and s[-1] == n and s[-2] == n), s
    assert n_loc * mesh.shape["model"] == n
