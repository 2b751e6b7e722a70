"""CT preprocessing chain: HU transform, spacing resample, clamp/scale,
crop/pad.

Reference: src/utils/preprocess.py:20-151. For "ctclip":
raw [H, W, D] voxels -> HU via metadata RescaleSlope/Intercept -> permute to
[D, H, W] -> trilinear resample to (1.5, 0.75, 0.75) mm spacing -> clamp
[-1000, 1000] HU, /1000 -> center-crop / symmetric-pad to (480, 480, 240)
in (H, W, D) order with pad -1 -> [1, 240, 480, 480]. For "ctgenerate":
clamp/scale then trilinear resize to (201, 128, 128).

This module is jittable JAX (trilinear == torch F.interpolate
align_corners=False, verified in tests). Per-sample input shapes vary, so the
loader runs it on the host CPU backend by default to avoid TPU recompiles;
the fused C++ path (native/) is the production loader.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PreprocessConfig

Array = jax.Array

_cpu = None


def _cpu_device():
    global _cpu
    if _cpu is None:
        _cpu = jax.devices("cpu")[0]
    return _cpu


def _lerp_axis(vol: Array, out_size: int, axis: int) -> Array:
    in_size = vol.shape[axis]
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo).astype(vol.dtype)
    a = jnp.take(vol, lo, axis=axis)
    b = jnp.take(vol, hi, axis=axis)
    shape = [1] * vol.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a * (1.0 - w) + b * w


def resize_trilinear(vol: Array, new_shape: Tuple[int, int, int]) -> Array:
    """Trilinear resample of a [D, H, W] volume at half-pixel centers WITHOUT
    anti-aliasing — exact torch F.interpolate(mode='trilinear',
    align_corners=False) semantics (reference preprocess.py:20-37).
    jax.image.resize is NOT equivalent: it low-pass-filters on downsampling."""
    vol = jnp.asarray(vol, jnp.float32)
    for axis in range(3):
        if vol.shape[axis] != new_shape[axis]:
            vol = _lerp_axis(vol, new_shape[axis], axis)
    return vol


def spacing_resample_shape(shape_dhw, current_spacing, target_spacing):
    """int(dim * current/target) per axis (reference preprocess.py:33-35)."""
    return tuple(int(shape_dhw[i] * current_spacing[i] / target_spacing[i])
                 for i in range(3))


def crop_and_pad(vol_hwd: Array, target_shape: Tuple[int, int, int],
                 pad_value: float = -1.0) -> Array:
    """Center crop / symmetric pad an [H, W, D] volume per axis
    (reference preprocess.py:39-82)."""
    out = vol_hwd
    for i in range(3):
        size, target = out.shape[i], target_shape[i]
        if size > target:
            start = (size - target) // 2
            out = jax.lax.slice_in_dim(out, start, start + target, axis=i)
        elif size < target:
            before = (target - size) // 2
            after = target - size - before
            pads = [(0, 0, 0)] * 3
            pads[i] = (before, after, 0)
            out = jax.lax.pad(out, jnp.asarray(pad_value, out.dtype), pads)
    return out


def process_volume(raw_hwd: np.ndarray, slope: float, intercept: float,
                   z_spacing: float, xy_spacing: float,
                   model_type: str = "ctclip",
                   cfg: PreprocessConfig = PreprocessConfig(),
                   device=None) -> np.ndarray:
    """Full chain on one raw voxel grid (reference process_file,
    preprocess.py:84-151). Input is the NIfTI [H, W, D] array; returns
    [1, D, H, W] float32.

    Runs on the host CPU backend by default (shapes vary per sample)."""
    dev = device if device is not None else _cpu_device()
    with jax.default_device(dev):
        vol = jnp.asarray(raw_hwd, jnp.float32)
        vol = slope * vol + intercept                     # HU
        vol = jnp.transpose(vol, (2, 0, 1))               # [D, H, W]

        if model_type == "ctclip":
            new_shape = spacing_resample_shape(
                vol.shape, (z_spacing, xy_spacing, xy_spacing),
                cfg.target_spacing)
            vol = resize_trilinear(vol, new_shape)

        vol = jnp.clip(vol, cfg.hu_min, cfg.hu_max) / cfg.hu_max

        if model_type == "ctclip":
            vol = jnp.transpose(vol, (1, 2, 0))           # [H, W, D]
            vol = crop_and_pad(vol, cfg.target_shape_hwd, cfg.pad_value)
            vol = jnp.transpose(vol, (2, 0, 1))           # [D, H, W]
        elif model_type == "ctgenerate":
            vol = resize_trilinear(vol, cfg.ctgenerate_shape)

        return np.asarray(vol)[None]                      # [1, D, H, W]


def parse_xy_spacing(raw: str) -> float:
    """First element of the stringified spacing list, parsed exactly like the
    reference (`row["XYSpacing"].iloc[0][1:][:-2].split(",")[0]`,
    preprocess.py:112): works for '[a, b]'-style strings."""
    return float(str(raw)[1:][:-2].split(",")[0])


def process_file(file_path, file_name, metadata_df, model_type: str = "ctclip",
                 cfg: PreprocessConfig = PreprocessConfig(),
                 use_native: Optional[bool] = None) -> Optional[np.ndarray]:
    """CSV-metadata-driven wrapper (reference preprocess.py:84-151). Returns
    [1, D, H, W] float32 or None on read/metadata failure.

    use_native: route through the fused C++ chain (native/preprocess.cpp);
    None = auto (native when the library builds/loads)."""
    from .nifti import read_nii_data

    raw = read_nii_data(file_path)
    if raw is None:
        print(f"Read failure for {file_path}.")
        return None

    row = metadata_df[metadata_df["VolumeName"] == file_name]
    if row.empty:
        print(f"No metadata found for {file_name}.")
        return None
    try:
        slope = float(row["RescaleSlope"].iloc[0])
        intercept = float(row["RescaleIntercept"].iloc[0])
        xy_spacing = parse_xy_spacing(row["XYSpacing"].iloc[0])
        z_spacing = float(row["ZSpacing"].iloc[0])
    except Exception as e:  # noqa: BLE001 — parity with reference behavior
        print(f"Error processing metadata for {file_name}: {e}")
        return None

    raw = np.asarray(raw, np.float32)
    if use_native is None or use_native:
        from .. import native
        if native.available():
            if model_type == "ctclip":
                return native.preprocess_ctclip(
                    raw, slope, intercept, z_spacing, xy_spacing,
                    target_spacing=cfg.target_spacing,
                    target_shape_hwd=cfg.target_shape_hwd,
                    hu_min=cfg.hu_min, hu_max=cfg.hu_max,
                    pad_value=cfg.pad_value)
            if model_type == "ctgenerate":
                return native.preprocess_ctgenerate(
                    raw, slope, intercept, out_shape=cfg.ctgenerate_shape,
                    hu_min=cfg.hu_min, hu_max=cfg.hu_max)
        if use_native:
            raise RuntimeError("native preprocessing requested but unavailable")

    return process_volume(raw, slope, intercept,
                          z_spacing, xy_spacing, model_type, cfg)
