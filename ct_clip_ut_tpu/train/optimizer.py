"""Optimizer factory (optax).

Reference: src/utils/optimizer.py:14-54 — wd == 0 gives plain Adam; otherwise
AdamW with weight decay applied only to parameters of ndim >= 2 (biases,
norms, scales are excluded). The trainer default is wd=0.0, lr=1.25e-5,
betas=(0.9, 0.99), eps=1e-8 (reference CTClipTrainer.py:50-52), i.e. Adam.

Gradient clipping (clip_grad_norm_ 0.5, reference CTClipTrainer.py:199-200)
is composed into the same optax chain.

Beyond parity (both default off, so the reference schedule is bit-for-bit):
  * warmup_steps / decay_steps — linear warmup to lr then cosine decay to
    lr * end_lr_frac, the standard large-batch contrastive recipe (the
    reference trains at constant lr on small effective batches);
  * mu_dtype — store Adam's first moment in bf16, halving its HBM
    footprint (nu stays fp32: second moments underflow in bf16 long before
    first moments lose meaningful precision).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(lr: float,
                     warmup_steps: int = 0,
                     decay_steps: int = 0,
                     end_lr_frac: float = 0.0):
    """Constant lr unless warmup/decay requested. decay_steps counts AFTER
    warmup; end value is lr * end_lr_frac."""
    if warmup_steps <= 0 and decay_steps <= 0:
        return lr
    if decay_steps <= 0:   # warmup then constant
        return optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps > 0 else lr,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 0),
        decay_steps=max(warmup_steps, 0) + decay_steps,
        end_value=lr * end_lr_frac)


def get_optimizer(lr: float = 1e-4,
                  wd: float = 1e-4,
                  betas: Tuple[float, float] = (0.9, 0.99),
                  eps: float = 1e-8,
                  max_grad_norm: Optional[float] = None,
                  warmup_steps: int = 0,
                  decay_steps: int = 0,
                  end_lr_frac: float = 0.0,
                  mu_dtype: Optional[str] = None) -> optax.GradientTransformation:
    txs = []
    if max_grad_norm is not None:
        txs.append(optax.clip_by_global_norm(max_grad_norm))

    sched = make_lr_schedule(lr, warmup_steps, decay_steps, end_lr_frac)
    mu = jnp.dtype(mu_dtype) if mu_dtype else None
    if wd == 0:
        txs.append(optax.adam(sched, b1=betas[0], b2=betas[1], eps=eps,
                              mu_dtype=mu))
    else:
        def decay_mask(params):
            # weight decay only for ndim >= 2 (reference optimizer.py:4-12)
            return jax.tree.map(lambda p: p.ndim >= 2, params)
        txs.append(optax.adamw(sched, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=wd, mask=decay_mask,
                               mu_dtype=mu))
    return optax.chain(*txs)
