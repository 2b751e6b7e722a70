"""Hook-free activation capture and gradient injection.

The reference attribution suite captures intermediate feature maps and their
gradients with torch forward hooks + tensor.register_hook
(reference src/utils/visualizations.py:140-263). Hooks don't exist in a traced
functional program, so we thread a `Taps` object through the forward instead:

  * capture: any tensor passed through `taps.tap(name, x)` whose name is
    requested is recorded into `taps.collected` — because the forward is
    traced, the collected dict becomes part of the jitted output pytree;
  * inject: a zero tensor can be added at a tap point; differentiating the
    scalar objective w.r.t. the injected zeros yields exactly the gradient
    the reference's register_hook would have delivered (d score / d activation)
    without perturbing the forward value.

Standard tap names (scope prefixes "spatial."/"temporal." in CT-ViT):
  {scope}{i}.attn_out   — self-attention block output, pre-residual
  {scope}{i}.ff_out     — feed-forward block output, pre-residual
  vq.features           — straight-through quantized tokens
  vq.input              — pre-VQ encoder output [b, n, d] (GradCache train
                          step derives chunked VQ-EMA stats from it)
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Union

import jax

Array = jax.Array


class Taps:
    def __init__(self,
                 capture: Union[bool, Iterable[str]] = False,
                 inject: Optional[Dict[str, Array]] = None):
        self.capture_all = capture is True
        self.capture = frozenset(capture) if not isinstance(capture, bool) else frozenset()
        self.inject = dict(inject or {})
        self.collected: Dict[str, Array] = {}

    def wants(self, name: str) -> bool:
        return self.capture_all or name in self.capture

    def tap(self, name: str, x: Array) -> Array:
        if name in self.inject:
            x = x + self.inject[name].astype(x.dtype)
        if self.wants(name):
            self.collected[name] = x
        return x


NULL_TAPS = Taps()
