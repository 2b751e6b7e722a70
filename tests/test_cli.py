"""CLI entry points: parsers accept the documented flags (no model build)."""

import pytest

from ct_clip_ut_tpu.scripts import (analyze_dataset, convert_checkpoint,
                                    embedding_arithmetic, inference_ctclip,
                                    inference_ctgenerate, train_ctclip)


def test_train_parser():
    args = train_ctclip.build_parser().parse_args([
        "--data-train", "/d/t", "--data-valid", "/d/v",
        "--train-reports", "r.csv", "--valid-reports", "v.csv",
        "--valid-labels", "l.csv", "--train-metadata", "m.csv",
        "--valid-metadata", "vm.csv", "--batch-size", "8",
        "--num-epochs", "15", "--save-best-model",
        "--moe-experts", "8", "--moe-aux-weight", "0.02"])
    assert args.batch_size == 8 and args.save_best_model
    assert args.lr == 1.25e-5 and args.wd == 0.0  # reference defaults
    assert args.moe_experts == 8 and args.moe_aux_weight == 0.02
    # dense reference-parity model by default
    assert train_ctclip.build_parser().parse_args([
        "--data-train", "t", "--data-valid", "v", "--train-reports", "r",
        "--valid-reports", "vr", "--valid-labels", "l",
        "--train-metadata", "m", "--valid-metadata", "vm"]).moe_experts == 0


def test_train_rejects_indivisible_grad_accum():
    """batch_size % grad_accum != 0 fails at parse time (the GradCache step
    would assert at trace time — surface it before any model build)."""
    with pytest.raises(SystemExit):
        train_ctclip.main([
            "--data-train", "/d/t", "--data-valid", "/d/v",
            "--train-reports", "r.csv", "--valid-reports", "v.csv",
            "--valid-labels", "l.csv", "--train-metadata", "m.csv",
            "--valid-metadata", "vm.csv", "--batch-size", "8",
            "--grad-accum", "3"])


def test_inference_parser():
    args = inference_ctclip.build_parser().parse_args([
        "--data-valid", "/d/v", "--valid-reports", "v.csv",
        "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
        "--checkpoint", "ck.pt", "--zero-shot",
        "--visualize", "occlusion", "grad_cam"])
    assert args.zero_shot and args.visualize == ["occlusion", "grad_cam"]
    assert not args.occlusion_text_embeds

    args = inference_ctclip.build_parser().parse_args([
        "--data-valid", "/d/v", "--valid-reports", "v.csv",
        "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
        "--checkpoint", "ck.pt", "--visualize", "occlusion",
        "--occlusion-text-embeds", "--occlusion-prompt", "panel",
        "--diff-embeds", "diff.npy"])
    assert args.occlusion_text_embeds and args.occlusion_prompt == "panel"


def test_inference_parser_mesh_flags():
    args = inference_ctclip.build_parser().parse_args([
        "--data-valid", "/d/v", "--valid-reports", "v.csv",
        "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
        "--checkpoint", "ck.pt", "--zero-shot",
        "--mesh-data", "4", "--mesh-model", "2"])
    assert args.mesh_data == 4 and args.mesh_model == 2
    # defaults: no mesh requested -> driver passes mesh=None
    args = inference_ctclip.build_parser().parse_args([
        "--data-valid", "/d/v", "--valid-reports", "v.csv",
        "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
        "--checkpoint", "ck.pt"])
    assert args.mesh_data is None and args.mesh_model == 1
    assert args.num_processes is None and not args.multihost


def test_inference_parser_quantize_ff():
    base = ["--data-valid", "/d/v", "--valid-reports", "v.csv",
            "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
            "--checkpoint", "ck.pt"]
    args = inference_ctclip.build_parser().parse_args(
        base + ["--zero-shot", "--quantize-ff"])
    assert args.quantize_ff
    assert not inference_ctclip.build_parser().parse_args(base).quantize_ff
    # forward-only: gradient-based attribution is rejected before any
    # checkpoint/jax work (main()'s fast-fail validation)
    with pytest.raises(SystemExit):
        inference_ctclip.main(base + ["--quantize-ff",
                                      "--visualize", "grad_cam"])
    with pytest.raises(SystemExit):
        inference_ctclip.main(base + ["--quantize-ff", "--visualize",
                                      "integrated_gradients", "occlusion"])


def test_inference_parser_rejects_unknown_method():
    with pytest.raises(SystemExit):
        inference_ctclip.build_parser().parse_args([
            "--data-valid", "v", "--valid-reports", "r", "--valid-labels", "l",
            "--valid-metadata", "m", "--checkpoint", "c",
            "--visualize", "not_a_method"])


def test_ctgenerate_parser():
    args = inference_ctgenerate.build_parser().parse_args([
        "--data-valid", "/d", "--valid-reports", "r.csv",
        "--valid-labels", "l.csv", "--valid-metadata", "m.csv",
        "--checkpoint", "g.pt"])
    assert args.num_valid_samples == 1  # reference default
    assert args.generate is None

    gen = inference_ctgenerate.build_parser().parse_args([
        "--checkpoint", "g.pt", "--generate", "a small lung nodule",
        "--generate-steps", "6"])
    assert gen.generate == ["a small lung nodule"]
    assert gen.generate_steps == 6 and gen.data_valid is None


def test_ctgenerate_cli_mode_validation():
    """Localization mode without the data flags, and --generate without a
    prompt, both fail fast in the parser."""
    import pytest
    with pytest.raises(SystemExit):
        inference_ctgenerate.main(["--checkpoint", "g.pt"])
    with pytest.raises(SystemExit):
        inference_ctgenerate.main(["--checkpoint", "g.pt", "--generate"])


def test_embedding_arithmetic_parser():
    args = embedding_arithmetic.build_parser().parse_args([
        "--reports", "r.csv", "--labels", "l.csv", "--checkpoint", "c.pt"])
    assert args.out.endswith("pathology_diff_embeddings.npy")


def test_analyze_dataset_on_reference_labels(tmp_path):
    import pandas as pd
    names = ["a.nii.gz", "b.nii.gz"]
    df = pd.DataFrame({"VolumeName": names, "p0": [1, 0], "p1": [1, 1]})
    df.to_csv(tmp_path / "labels.csv", index=False)
    pd.DataFrame({"VolumeName": names,
                  "Findings_EN": ["clear lungs", "effusion noted"],
                  "Impressions_EN": ["ok", "followup"]}).to_csv(
        tmp_path / "reports.csv", index=False)
    stats = analyze_dataset.analyze(tmp_path / "labels.csv",
                                    tmp_path / "reports.csv")
    assert stats["num_volumes"] == 2
    assert stats["label_prevalence"]["p1"] == 1.0
    assert stats["num_reports"] == 4
