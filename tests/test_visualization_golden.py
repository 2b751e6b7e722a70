"""Golden-artifact regression tests for the rendering/metrics layer.

The GIF panel layouts and the metrics.txt format are the artifact contract
(the reference's consumers diff them run-to-run); the implementations were
rewritten in round 5 (utils/visualizations.py shared animator, metrics.py
restructure), so these tests pin the artifacts themselves:

  * metrics.txt from a fixed prediction matrix must match the committed
    golden byte-for-byte;
  * rendered GIFs must be structurally exact (frame count = depth, pixel
    size = figsize * dpi) and byte-stable across two in-process renders
    (deterministic rendering — a layout drift cannot hide in noise).
"""

from pathlib import Path

import numpy as np
import pytest

from ct_clip_ut_tpu.utils import metrics as M
from ct_clip_ut_tpu.utils import visualizations as V

GOLDEN = Path(__file__).parent / "golden"
PATHS = [f"p{i}" for i in range(6)]


def _fixed_metrics():
    rs = np.random.RandomState(0)
    targets = rs.randint(0, 2, (24, 6))
    targets[:, 5] = 0                      # single-class column -> NaN AUROC
    preds = np.clip(targets * 0.6 + rs.rand(24, 6) * 0.5, 0, 1)
    return preds, targets


def test_metrics_txt_matches_golden(tmp_path):
    preds, targets = _fixed_metrics()
    m = M.calculate_metrics(preds, targets, PATHS)
    M.save_metrics([m], PATHS, tmp_path)
    got = (tmp_path / "metrics.txt").read_text()
    golden = (GOLDEN / "metrics_golden.txt").read_text()
    assert got == golden, "metrics.txt drifted from the reference layout"


def _gif_info(path):
    from PIL import Image
    with Image.open(path) as im:
        return im.n_frames, im.size


@pytest.mark.parametrize("flags,panels", [
    (None, 3),
    ({"overlay": True}, 1),
])
def test_overlay_gif_structure_and_stability(tmp_path, flags, panels):
    rs = np.random.RandomState(1)
    image = rs.rand(4, 24, 24).astype(np.float32)
    heat = np.clip(rs.rand(4, 24, 24) * 1.2 - 0.2, 0, 1).astype(np.float32)
    a, b = tmp_path / "a.gif", tmp_path / "b.gif"
    for out in (a, b):
        V.visualize_overlay(image, heat, "scan", "Method", out,
                            display_flags=flags)
    frames, size = _gif_info(a)
    assert frames == 4
    assert size == (600 * panels, 600)     # figsize (6*panels, 6) at dpi 100
    assert a.read_bytes() == b.read_bytes()


def test_attention_grid_gif_structure(tmp_path):
    rs = np.random.RandomState(2)
    vols = rs.rand(2, 3, 4, 8, 8).astype(np.float32)   # [L, H, D, h, w]
    out = tmp_path / "grid.gif"
    V.visualize_attention_grid_gif(vols, "scan", out)
    frames, size = _gif_info(out)
    assert frames == 4
    assert size == (400 * 2, 300 * 3)      # figsize (4L, 3H) at dpi 100


def test_pathology_heatmaps_gif_structure(tmp_path):
    rs = np.random.RandomState(3)
    image = rs.rand(3, 16, 16).astype(np.float32)
    heatmaps = {"Cardiomegaly": np.clip(rs.rand(3, 16, 16), 0, 1),
                "Atelectasis": np.clip(rs.rand(3, 16, 16), 0, 1)}
    out = tmp_path / "path.gif"
    V.visualize_pathology_heatmaps(image, heatmaps, out,
                                   pathologies=list(heatmaps))
    frames, size = _gif_info(out)
    assert frames == 3
    assert size == (1200, 800)             # figsize (12, 4*n) at dpi 100
