"""Minimal xplane.pb parser for TPU op-level profiles.

The tensorboard_plugin_profile converter in this image is broken two ways
(protobuf descriptor mismatch, and its _pywrap_profiler fallback lacks
xspace_to_tools_data), so the profile tools parse the XSpace proto
directly via the tensorflow.tsl copy of xplane_pb2 and aggregate the
"XLA Ops" line by op kind.
"""

from __future__ import annotations

import collections
import glob
import re


def op_summary(trace_dir: str, top: int = 35):
    """Print per-op-kind device self time from the newest xplane.pb under
    trace_dir; returns {op_kind: total_ms} for the 'XLA Ops' line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not xs:
        print("no xplane.pb under", trace_dir)
        return {}
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())

    result = {}
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            kind = collections.Counter()
            n = collections.Counter()
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "?")
                k = re.sub(r"\.\d+", "", nm.split(" = ")[0].lstrip("%"))
                kind[k] += ev.duration_ps / 1e9           # -> ms
                n[k] += 1
            total = sum(kind.values())
            print(f"{'op kind':64s} {'self_ms':>9s} {'%':>6s} {'count':>7s}")
            for k, ms in kind.most_common(top):
                print(f"{k[:64]:64s} {ms:9.2f} {100 * ms / total:6.1f} "
                      f"{n[k]:7d}")
            print(f"total XLA-Ops device time: {total:.1f} ms "
                  f"(all traced executions)")
            result = dict(kind)
    return result
