"""End-to-end test of the weights-arrival drill (ctclip-parity-drill).

Fabricates a REAL reference torch checkpoint — the genuine
/root/reference/src modules at the small parity geometry, state dict saved
as a .pt exactly like the reference trainer does (CTClipTrainer.py:139-143)
— plus a tiny on-disk valid split, then runs the drill twice: first
producing converted params + AUROC table + attribution maps, then diffing a
second run against the first's maps (the --reference-maps machinery, which
is what the real ctclip_v2.pt arrival will exercise against the reference's
saved outputs). The tokenizer/preprocess injections are the established
zero-egress test pattern (tests/test_suite_e2e.py).

The flagship-geometry drill (same CLI, reference-flagship checkpoint) is
slow-marked at the bottom.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_torch_reference_parity as tp  # noqa: E402  (shims + geometry)
from ct_clip_ut_tpu.config import PreprocessConfig  # noqa: E402
from ct_clip_ut_tpu.data import nifti  # noqa: E402
from ct_clip_ut_tpu.scripts import parity_drill  # noqa: E402


class Vocab64Tokenizer:
    """Hash tokenizer bounded to the tiny BERT's 64-token vocabulary."""

    def __call__(self, texts, return_tensors="np", padding="max_length",
                 truncation=True, max_length=32):
        if isinstance(texts, str):
            texts = [texts]
        max_length = min(max_length, 16)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros_like(ids)
        for i, t in enumerate(texts):
            toks = [1] + [hash(w) % 60 + 2
                          for w in t.split()][:max_length - 2] + [2]
            ids[i, :len(toks)] = np.asarray(toks) % 64
            mask[i, :len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _write_torch_checkpoint(path, flagship=False):
    """Reference modules -> state dict -> .pt (what the drill consumes)."""
    ref_ctvit, ref_ctclip = tp._import_reference()
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    if flagship:
        from test_flagship_parity import FL_BERT as B
        bert = BertModel(HFBertConfig(
            vocab_size=B.vocab_size, hidden_size=B.hidden_size,
            num_hidden_layers=B.num_layers, num_attention_heads=B.num_heads,
            intermediate_size=B.intermediate_size,
            max_position_embeddings=B.max_position_embeddings,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
        ctvit = ref_ctvit.CTViT(
            dim=512, codebook_size=8192, image_size=480, patch_size=20,
            temporal_patch_size=10, spatial_depth=4, temporal_depth=4,
            dim_head=32, heads=8)
        model = ref_ctclip.CTCLIP(text_encoder=bert, image_encoder=ctvit,
                                  dim_text=768, dim_image=294912,
                                  dim_latent=512)
    else:
        bert = BertModel(HFBertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0))
        ctvit = ref_ctvit.CTViT(
            dim=tp.DIM, codebook_size=32, image_size=tp.IMG,
            patch_size=tp.PATCH, temporal_patch_size=tp.T_PATCH,
            spatial_depth=2, temporal_depth=2, dim_head=tp.DIM_HEAD,
            heads=tp.HEADS)
        model = ref_ctclip.CTCLIP(
            text_encoder=bert, image_encoder=ctvit, dim_text=32,
            dim_image=tp.GH * tp.GW * tp.DIM, dim_latent=8)
    model.eval()
    torch.save({k: v.float() for k, v in model.state_dict().items()},
               str(path))


SMALL_ARCH = {
    "dim_text": 32, "dim_image": tp.GH * tp.GW * tp.DIM, "dim_latent": 8,
    "ctvit": {"dim": tp.DIM, "codebook_size": 32, "image_size": tp.IMG,
              "patch_size": tp.PATCH, "temporal_patch_size": tp.T_PATCH,
              "spatial_depth": 2, "temporal_depth": 2,
              "dim_head": tp.DIM_HEAD, "heads": tp.HEADS},
    "bert": {"vocab_size": 64, "hidden_size": 32, "num_layers": 1,
             "num_heads": 4, "intermediate_size": 64,
             "max_position_embeddings": 16},
}


def _write_valid_split(tmp, depth=20, hw=32):
    import pandas as pd
    data = tmp / "volumes"
    data.mkdir()
    rs = np.random.RandomState(0)
    names = []
    for i in range(2):
        name = f"valid_{i}_a_1.nii.gz"
        nifti.write_nii(data / name,
                        rs.randint(0, 2000, (hw, hw, depth))
                        .astype(np.float32))
        names.append(name)
    pd.DataFrame({"VolumeName": names,
                  "Findings_EN": ["normal lungs", "pleural effusion seen"],
                  "Impressions_EN": ["ok", "effusion"]}).to_csv(
        tmp / "reports.csv", index=False)
    pd.DataFrame({"VolumeName": names, "RescaleSlope": [1, 1],
                  "RescaleIntercept": [-1024, -1024],
                  "XYSpacing": ["[0.75, 0.75]"] * 2,
                  "ZSpacing": [1.5] * 2}).to_csv(tmp / "metadata.csv",
                                                 index=False)
    labels = pd.DataFrame(np.eye(2, 18, dtype=int),
                          columns=[f"p{i}" for i in range(18)])
    labels.insert(0, "VolumeName", names)
    labels.to_csv(tmp / "labels.csv", index=False)
    return data


def test_parity_drill_end_to_end(tmp_path):
    pt = tmp_path / "ctclip_small.pt"
    _write_torch_checkpoint(pt)
    data = _write_valid_split(tmp_path)
    arch = tmp_path / "arch.json"
    arch.write_text(json.dumps(SMALL_ARCH))

    def drill_args(out, extra=()):
        return parity_drill.build_parser().parse_args([
            "--checkpoint", str(pt), "--out", str(out),
            "--data-valid", str(data),
            "--valid-reports", str(tmp_path / "reports.csv"),
            "--valid-labels", str(tmp_path / "labels.csv"),
            "--valid-metadata", str(tmp_path / "metadata.csv"),
            "--arch-json", str(arch), "--num-samples", "1",
            "--occlusion-patch", "10", "16", "16", *extra])

    pp = PreprocessConfig(target_shape_hwd=(32, 32, 20))
    report = parity_drill.run_drill(drill_args(tmp_path / "run1"),
                                    tokenizer=Vocab64Tokenizer(),
                                    preprocess_cfg=pp)
    assert report["convert"]["status"] == "ok"
    assert report["convert"]["parameters"] > 0
    assert (tmp_path / "run1" / "converted.msgpack").exists()
    assert report["zeroshot"]["status"] == "ok"
    assert report["zeroshot"]["n_scans"] == 2
    assert report["zeroshot"]["auroc_mean"] is not None
    assert report["maps"]["status"] == "ok" and report["maps"]["n_maps"] > 0
    assert report["diff"]["status"] == "skipped"
    assert (tmp_path / "run1" / "drill_report.json").exists()

    # second run diffs against the first's maps: same checkpoint, same
    # data -> every map identical (the real arrival diffs against the
    # reference's saved maps through exactly this path)
    report2 = parity_drill.run_drill(
        drill_args(tmp_path / "run2",
                   ("--reference-maps", str(tmp_path / "run1" / "maps"))),
        tokenizer=Vocab64Tokenizer(), preprocess_cfg=pp)
    assert report2["diff"]["status"] == "ok"
    assert report2["diff"]["n_compared"] == report["maps"]["n_maps"]
    assert report2["diff"]["max_abs_diff"] == 0.0
    assert report2["diff"]["within_tolerance"] is True
    assert not report2["diff"]["missing_in_reference"]


def test_parity_drill_convert_only(tmp_path):
    """A bare --checkpoint run still converts and reports the skips."""
    pt = tmp_path / "ctclip_small.pt"
    _write_torch_checkpoint(pt)
    arch = tmp_path / "arch.json"
    arch.write_text(json.dumps(SMALL_ARCH))
    args = parity_drill.build_parser().parse_args([
        "--checkpoint", str(pt), "--out", str(tmp_path / "out"),
        "--arch-json", str(arch)])
    report = parity_drill.run_drill(args)
    assert report["convert"]["status"] == "ok"
    assert report["zeroshot"]["status"] == "skipped"
    assert report["maps"]["status"] == "skipped"
    assert report["diff"]["status"] == "skipped"


@pytest.mark.slow
def test_parity_drill_flagship_geometry(tmp_path):
    """The drill at the REAL deployment geometry: a flagship reference
    torch checkpoint (480^3 / 24^3 grid / full 768x12 BERT) through
    convert + zero-shot + the cheap attribution methods on one scan —
    the exact command the real ctclip_v2.pt will run, minus scale of data.
    (~10 min CPU; the full map-parity bars live in test_flagship_parity.)"""
    pt = tmp_path / "ctclip_fl.pt"
    _write_torch_checkpoint(pt, flagship=True)
    data = _write_valid_split(tmp_path, depth=240, hw=480)

    class FlagshipTokenizer(Vocab64Tokenizer):
        def __call__(self, texts, **kw):
            out = super().__call__(texts, **kw)
            return out  # ids < 64 are valid rows of the 30522-vocab BERT

    args = parity_drill.build_parser().parse_args([
        "--checkpoint", str(pt), "--out", str(tmp_path / "out"),
        "--data-valid", str(data),
        "--valid-reports", str(tmp_path / "reports.csv"),
        "--valid-labels", str(tmp_path / "labels.csv"),
        "--valid-metadata", str(tmp_path / "metadata.csv"),
        "--num-valid-samples", "1", "--num-samples", "1",
        "--batch-size", "1",
        "--methods", "attention_rollout", "grad_cam"])
    report = parity_drill.run_drill(args, tokenizer=FlagshipTokenizer())
    assert report["convert"]["status"] == "ok"
    assert report["convert"]["parameters"] > 100_000_000   # flagship scale
    assert report["zeroshot"]["status"] == "ok"
    assert report["maps"]["status"] == "ok" and report["maps"]["n_maps"] >= 7
