"""Expert-parallel MoE FF (parallel/moe.py): dense-FF equivalence, EP
sharding equality on the virtual mesh, capacity semantics, stack wiring.

The reference has no MoE — this is a beyond-parity framework capability, so
the oracle is the module's own dense GEGLU FF (ops/layers.py:136-169), which
IS reference-pinned (tests/test_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.config import MeshConfig, TransformerConfig
from ct_clip_ut_tpu.ops.layers import feedforward, init_feedforward
from ct_clip_ut_tpu.ops.transformer import init_transformer, transformer
from ct_clip_ut_tpu.parallel import sharding
from ct_clip_ut_tpu.parallel.mesh import make_mesh
from ct_clip_ut_tpu.parallel.moe import init_moe_ff, moe_feedforward

DIM, INNER, E = 16, 24, 4


def _moe_params(key, identical=False):
    p = init_moe_ff(key, DIM, INNER, E)
    if identical:
        dense = init_feedforward(jax.random.fold_in(key, 7), DIM, INNER)
        p = dict(p)
        p["norm"] = dense["norm"]
        p["experts"] = {
            "w_in": jnp.broadcast_to(dense["proj_in"]["w"], (E, DIM, 2 * INNER)),
            "w_out": jnp.broadcast_to(dense["proj_out"]["w"], (E, INNER, DIM)),
        }
        return p, dense
    return p, None


def test_identical_experts_match_dense_ff():
    """With identical experts, normalized gates, and drop-free capacity the
    MoE is algebraically the dense FF: sum_j gate_j * ff(h) = ff(h)."""
    key = jax.random.PRNGKey(0)
    moe, dense = _moe_params(key, identical=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, DIM))
    want = feedforward(dense, x)
    for top_k in (1, 2):
        # group_size: default (one row), sub-row groups, multi-row groups —
        # all drop-free groupings must reproduce the dense FF
        for gs in (None, 4, 6, 24):
            got, aux = moe_feedforward(moe, x, top_k=top_k,
                                       capacity_factor=float(E),
                                       group_size=gs)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"top_k={top_k} gs={gs}")
            assert np.isfinite(float(aux))


def test_ep_sharded_matches_single_device():
    """Experts sharded over "model", tokens over "data" — the GSPMD EP path
    must reproduce the unsharded routing bit-for-bit-ish (fp32 tolerance)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    key = jax.random.PRNGKey(2)
    moe, _ = _moe_params(key)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 6, DIM))

    fn = lambda p, x: moe_feedforward(p, x, top_k=2, capacity_factor=2.0)
    want, want_aux = jax.jit(fn)(moe, x)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = sharding.param_specs(moe)
    assert specs["experts"]["w_in"] == jax.sharding.PartitionSpec(
        "model", None, None), "EP sharding rule missing"
    moe_s = sharding.shard_params(moe, mesh)
    x_s = sharding.shard_batch(x, mesh)
    got, got_aux = jax.jit(fn)(moe_s, x_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(got_aux), float(want_aux), atol=1e-5)


def test_capacity_bounds_expert_load():
    """capacity_factor small enough forces drops: dropped tokens produce a
    zero FF delta (residual-only), and no expert serves > capacity tokens."""
    key = jax.random.PRNGKey(4)
    moe, _ = _moe_params(key, identical=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, DIM))
    # top_k=1, t=16, E=4: capacity_factor .25 -> capacity 1 -> <=4 served
    out, _ = moe_feedforward(moe, x, top_k=1, capacity_factor=0.25)
    nonzero = np.asarray(jnp.any(jnp.abs(out[0]) > 1e-9, axis=-1))
    assert nonzero.sum() <= 4, f"served {nonzero.sum()} tokens at capacity 4"
    assert nonzero.sum() >= 1


def test_moe_transformer_stack_grads():
    """TransformerConfig.moe_experts wires routed FF into the stack; the aux
    loss is returned and gradients reach router + experts + attention."""
    cfg = TransformerConfig(dim=DIM, depth=2, dim_head=4, heads=2,
                            ff_mult=2.0, moe_experts=E, moe_top_k=2)
    params = init_transformer(jax.random.PRNGKey(6), cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 10, DIM))

    def loss_fn(p):
        out, aux = transformer(p, cfg, x)
        return jnp.sum(out ** 2) + 0.01 * aux.moe_aux

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    g_router = grads["layers"][0]["ff"]["router"]["w"]
    g_exp = grads["layers"][0]["ff"]["experts"]["w_in"]
    g_attn = grads["layers"][0]["self_attn"]["to_q"]["w"]
    for g in (g_router, g_exp, g_attn):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0

    # remat path agrees with the plain path (same rng-free forward)
    cfg_r = TransformerConfig(dim=DIM, depth=2, dim_head=4, heads=2,
                              ff_mult=2.0, moe_experts=E, moe_top_k=2,
                              remat=True)
    out_p, aux_p = transformer(params, cfg, x)
    out_r, aux_r = transformer(params, cfg_r, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p), atol=1e-5)
    np.testing.assert_allclose(float(aux_r.moe_aux), float(aux_p.moe_aux),
                               atol=1e-6)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_moe_ctclip_train_step_and_gradcache():
    """The MoE CT-ViT variant trains end-to-end: the aux loss reaches the
    single-pass step, and the GradCache chunked step reproduces it exactly
    (equal microbatches -> full-batch aux == mean of microbatch auxes)."""
    from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                       TrainConfig)
    from ct_clip_ut_tpu.train import trainer as trainer_mod

    cfg = CTCLIPConfig(
        dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
        ctvit=CTViTConfig(dim=16, codebook_size=32, image_size=32,
                          patch_size=8, temporal_patch_size=10,
                          spatial_depth=1, temporal_depth=1,
                          dim_head=4, heads=4, moe_experts=2),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=16,
                        hidden_dropout=0.0, attention_dropout=0.0))
    tc = TrainConfig(lr=1e-3, compute_dtype="float32")
    state, tx = trainer_mod.create_train_state(jax.random.PRNGKey(0), cfg, tc)
    step = trainer_mod.make_train_step(cfg, tc, tx)

    b = 4
    image = jax.random.normal(jax.random.PRNGKey(1), (b, 1, 20, 32, 32))
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, 8), 0, 64)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones((b, 8), jnp.int32)}

    # snapshot before the step: the jitted step donates its input state
    r0 = np.asarray(state.params["visual_transformer"]["spatial"]["layers"][0][
        "ff"]["router"]["w"])
    new_state, loss = step(state, image, tokens)
    assert np.isfinite(float(loss))
    # the router moved: aux-loss grads reached the MoE params
    r1 = np.asarray(new_state.params["visual_transformer"]["spatial"][
        "layers"][0]["ff"]["router"]["w"])
    assert np.abs(r1 - r0).max() > 0.0

    # GradCache vs single-pass. The microbatch dispatch groups can't be
    # bit-identical to the full-batch group (different einsum reduction
    # extents), so grads agree to fp32 rounding, not bitwise — compare under
    # SGD (drift = lr * grad diff), where Adam's sign-like first step would
    # amplify 1e-7 grad noise to lr scale. aux_w=0 pins the routed FF path
    # tightly; with the aux on, each microbatch is its own GShard dispatch
    # group and the quadratic aux differs at O(routing variance) scale
    # (trainer.py comment).
    import optax

    def step_params(train_cfg):
        tx = optax.sgd(1e-3)
        st, _ = trainer_mod.create_train_state(jax.random.PRNGKey(0), cfg,
                                               train_cfg)
        st = st._replace(opt_state=tx.init(st.params))
        new, loss = trainer_mod.make_train_step(cfg, train_cfg, tx)(
            st, image, tokens)
        return new.params, float(loss)

    for aux_w, tol in ((0.0, 1e-6), (0.01, 1e-3)):
        p1, l1 = step_params(TrainConfig(lr=1e-3, compute_dtype="float32",
                                         moe_aux_weight=aux_w))
        p2, l2 = step_params(TrainConfig(lr=1e-3, compute_dtype="float32",
                                         grad_accum=2, moe_aux_weight=aux_w))
        np.testing.assert_allclose(l2, l1, atol=max(tol, 1e-5))
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()) if a.size else 0.0,
            p2, p1)
        assert max(jax.tree.leaves(d)) < tol, \
            f"param drift {max(jax.tree.leaves(d))} at aux_w={aux_w}"


def test_aux_loss_is_one_under_uniform_router():
    """GShard aux = E * sum_e me*ce; with a zeroed router me is uniform so
    aux == 1 exactly, independent of assignment skew."""
    key = jax.random.PRNGKey(8)
    moe, _ = _moe_params(key)
    moe = dict(moe)
    moe["router"] = {"w": jnp.zeros_like(moe["router"]["w"])}
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, DIM))
    _, aux = moe_feedforward(moe, x, top_k=2)
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-6)
