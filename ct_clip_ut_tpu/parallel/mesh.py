"""Device mesh construction and multi-host runtime init.

Replaces the reference's NCCL process-group bring-up
(Accelerator + InitProcessGroupKwargs(backend="nccl", timeout=36000s),
reference CTClipTrainer.py:62-69). On TPU, `jax.distributed.initialize`
wires the hosts and XLA routes collectives over ICI within a slice / DCN
across slices; a `Mesh` with ("data", "model") axes is the single handle
the rest of the framework needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def initialize_runtime(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None,
                       auto: bool = True) -> None:
    """Multi-host bring-up. With every arg None on a Cloud TPU pod slice the
    coordinator is auto-detected from the TPU metadata (jax.distributed
    semantics); explicitly single-process (num_processes == 1) is a no-op."""
    if num_processes == 1:
        return
    if num_processes is None and coordinator_address is None and not auto:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh. With cfg=None, all devices go to the
    data axis (pure DP — the reference's only strategy, SURVEY.md 2.2)."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    n = cfg.data * cfg.model
    if n != len(devices):
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices).reshape(cfg.data, cfg.model)
    return Mesh(grid, axis_names=cfg.axis_names)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    data = mesh.shape["data"]
    if global_batch % data:
        raise ValueError(f"global batch {global_batch} not divisible by data={data}")
    return global_batch // data
