"""Optimizer factory (optax).

Reference: src/utils/optimizer.py:14-54 — wd == 0 gives plain Adam; otherwise
AdamW with weight decay applied only to parameters of ndim >= 2 (biases,
norms, scales are excluded). The trainer default is wd=0.0, lr=1.25e-5,
betas=(0.9, 0.99), eps=1e-8 (reference CTClipTrainer.py:50-52), i.e. Adam.

Gradient clipping (clip_grad_norm_ 0.5, reference CTClipTrainer.py:199-200)
is composed into the same optax chain.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import optax


def get_optimizer(lr: float = 1e-4,
                  wd: float = 1e-4,
                  betas: Tuple[float, float] = (0.9, 0.99),
                  eps: float = 1e-8,
                  max_grad_norm: Optional[float] = None) -> optax.GradientTransformation:
    txs = []
    if max_grad_norm is not None:
        txs.append(optax.clip_by_global_norm(max_grad_norm))

    if wd == 0:
        txs.append(optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps))
    else:
        def decay_mask(params):
            # weight decay only for ndim >= 2 (reference optimizer.py:4-12)
            return jax.tree.map(lambda p: p.ndim >= 2, params)
        txs.append(optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=wd, mask=decay_mask))
    return optax.chain(*txs)
