"""Optimizer factory: schedule shape, bf16 first moment, reference parity.

Reference: src/utils/optimizer.py:14-54 (constant-lr Adam/AdamW with the
ndim>=2 decay mask). The schedule / mu_dtype extensions default OFF so the
reference behavior is unchanged (pinned below).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ct_clip_ut_tpu.train.optimizer import get_optimizer, make_lr_schedule


def _params():
    return {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}


def test_constant_schedule_matches_plain_adam():
    """Defaults reproduce the reference optimizer exactly."""
    params = _params()
    grads = jax.tree.map(lambda p: 0.1 * p, params)
    tx0 = get_optimizer(lr=1e-3, wd=0.0, max_grad_norm=0.5)
    tx1 = get_optimizer(lr=1e-3, wd=0.0, max_grad_norm=0.5,
                        warmup_steps=0, decay_steps=0, mu_dtype=None)
    s0, s1 = tx0.init(params), tx1.init(params)
    u0, _ = tx0.update(grads, s0, params)
    u1, _ = tx1.update(grads, s1, params)
    for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warmup_cosine_schedule_shape():
    sched = make_lr_schedule(1e-3, warmup_steps=10, decay_steps=90,
                             end_lr_frac=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # monotone decay after the peak, ending at lr * end_lr_frac
    assert float(sched(50)) < 1e-3
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    # warmup-only: linear ramp then constant
    ramp = make_lr_schedule(1e-3, warmup_steps=4)
    np.testing.assert_allclose(float(ramp(2)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(ramp(100)), 1e-3, rtol=1e-6)
    # no schedule at all: plain float passthrough
    assert make_lr_schedule(1e-3) == 1e-3


def test_bf16_mu_halves_moment_memory():
    params = _params()
    tx = get_optimizer(lr=1e-3, wd=0.0, mu_dtype="bfloat16")
    state = tx.init(params)
    adam_states = [s for s in jax.tree.leaves(
        state, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")]
    assert adam_states, "no adam state found in the chain"
    for s in adam_states:
        for leaf in jax.tree.leaves(s.mu):
            assert leaf.dtype == jnp.bfloat16
        for leaf in jax.tree.leaves(s.nu):   # nu stays fp32
            assert leaf.dtype == jnp.float32
    # an update still works and stays finite
    grads = jax.tree.map(lambda p: 0.1 * p, params)
    updates, _ = tx.update(grads, state, params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(updates))


def test_wd_decay_mask_still_excludes_biases():
    """AdamW path: ndim>=2 decay mask (reference optimizer.py:4-12) with a
    schedule composed in."""
    params = _params()
    grads = jax.tree.map(jnp.zeros_like, params)  # isolate the decay term
    tx = get_optimizer(lr=1e-2, wd=0.1, warmup_steps=0, decay_steps=0)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0    # decayed
    np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)  # masked
