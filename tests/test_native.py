"""Native C++ fused preprocessing: parity with the JAX path + speed sanity."""

import time

import numpy as np
import pytest

from ct_clip_ut_tpu import native
from ct_clip_ut_tpu.config import PreprocessConfig
from ct_clip_ut_tpu.data import preprocess as pp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain / lib build failed")


def test_native_ctclip_parity():
    rs = np.random.RandomState(0)
    raw = rs.randint(-100, 3000, (60, 60, 40)).astype(np.float32)
    slope, intercept, z_sp, xy_sp = 1.0, -1024.0, 3.0, 1.5
    cfg = PreprocessConfig(target_shape_hwd=(96, 96, 64))

    want = pp.process_volume(raw, slope, intercept, z_sp, xy_sp, "ctclip", cfg)
    got = native.preprocess_ctclip(raw, slope, intercept, z_sp, xy_sp,
                                   target_spacing=cfg.target_spacing,
                                   target_shape_hwd=cfg.target_shape_hwd)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_native_ctclip_pad_branch():
    """Small volume -> pure padding territory."""
    rs = np.random.RandomState(1)
    raw = rs.randint(0, 1000, (20, 20, 10)).astype(np.float32)
    cfg = PreprocessConfig(target_shape_hwd=(64, 64, 48))
    want = pp.process_volume(raw, 1.0, 0.0, 1.5, 0.75, "ctclip", cfg)
    got = native.preprocess_ctclip(raw, 1.0, 0.0, 1.5, 0.75,
                                   target_shape_hwd=cfg.target_shape_hwd)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # padded voxels are exactly -1
    assert (got == -1.0).any()


def test_native_ctgenerate_parity():
    rs = np.random.RandomState(2)
    raw = rs.randint(-100, 3000, (50, 50, 30)).astype(np.float32)
    cfg = PreprocessConfig(ctgenerate_shape=(21, 32, 32))
    want = pp.process_volume(raw, 1.0, -1024.0, 1.0, 1.0, "ctgenerate", cfg)
    got = native.preprocess_ctgenerate(raw, 1.0, -1024.0,
                                       out_shape=cfg.ctgenerate_shape)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_native_full_size_speed():
    """Flagship-size preprocessing should be well under a second."""
    rs = np.random.RandomState(3)
    raw = rs.randint(-100, 3000, (512, 512, 300)).astype(np.float32)
    t0 = time.perf_counter()
    out = native.preprocess_ctclip(raw, 1.0, -1024.0, 1.0, 0.7)
    dt = time.perf_counter() - t0
    assert out.shape == (1, 240, 480, 480)
    assert np.isfinite(out).all()
    print(f"native flagship preprocess: {dt*1000:.0f} ms")
    assert dt < 5.0  # generous bound; typical ~0.2-0.5 s
