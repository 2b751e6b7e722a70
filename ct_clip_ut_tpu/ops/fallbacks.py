"""Runtime visibility for kernel-path fallbacks.

The fused Pallas kernels have shape/VMEM eligibility gates (packed attention
needs an even batch, the block kernel caps score VMEM, the qrows kernel needs
n % q_block == 0 and a VMEM budget). A caller that silently routes off a
kernel can hide a large deopt inside an unchanged headline number — so every
gate records a counter here and logs the first occurrence per (site, reason).
`bench.py` reports the counters in its extras (kernel_fallbacks) so a silent
deopt can't hide in a bench run.
"""

from __future__ import annotations

import logging
from collections import Counter

_log = logging.getLogger("ct_clip_ut_tpu.kernels")
_counts: Counter = Counter()
_logged: set = set()


def note_fallback(site: str, reason: str) -> None:
    """Record (and debug-log once per site/reason) a kernel-path fallback.
    Called at TRACE time (inside jit), so counts are per compiled program,
    not per executed step — what matters is that the deopt is visible."""
    key = f"{site}:{reason}"
    _counts[key] += 1
    if key not in _logged:
        _logged.add(key)
        _log.debug("kernel fallback at %s: %s", site, reason)


def fallback_counts() -> dict:
    """Snapshot of fallback counters keyed 'site:reason'."""
    return dict(_counts)


def reset_fallback_counts() -> None:
    _counts.clear()
    _logged.clear()
