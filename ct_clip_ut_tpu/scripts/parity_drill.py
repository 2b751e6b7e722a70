"""Weights-arrival drill: one command from a torch checkpoint to the full
accuracy-parity artifact set.

`ctclip_v2.pt` (the reference's released flagship checkpoint) is not in this
environment; BASELINE.md defines the accuracy-parity bar as "convert it, run
zero-shot AUROC on the CT-RATE valid split, diff attribution maps against
the reference's outputs". This CLI is that bar as ONE tested command
(reference entry: src/inference_ctclip.py:17-59), so the day the weights
appear nothing has to be assembled by hand:

    ctclip-parity-drill --checkpoint ctclip_v2.pt --out drill_out \
        --data-valid /data/valid --valid-reports reports.csv \
        --valid-labels labels.csv --valid-metadata metadata.csv \
        --reference-maps /path/to/reference_results

Stages — each runs when its inputs are present and records a skip reason
when they are not, so a bare `--checkpoint` still produces a useful report:

  convert    torch .pt -> native params; writes <out>/converted.msgpack
  zeroshot   AUROC/F1/accuracy table over the valid split (metrics.txt +
             ROC/PR plots, the reference's metrics recipe, utils/metrics.py)
  maps       all 5 attribution methods over the first --num-samples scans,
             .npy maps saved in the reference artifact layout
  diff       per-file max-abs-diff of our .npy maps vs the reference's
             saved maps (--reference-maps, matched by file name)

Everything lands in <out>/drill_report.json. End-to-end test (fabricated
flagship-geometry torch checkpoint through the real converter):
tests/test_parity_drill.py.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="torch ctclip_v2.pt (or already-converted .msgpack)")
    p.add_argument("--out", required=True, help="drill output directory")
    p.add_argument("--data-valid", default=None)
    p.add_argument("--valid-reports", default=None)
    p.add_argument("--valid-labels", default=None)
    p.add_argument("--valid-metadata", default=None)
    p.add_argument("--reference-maps", default=None,
                   help="directory tree of the reference's saved .npy maps; "
                        "ours are diffed against same-named files")
    p.add_argument("--tokenizer",
                   default="microsoft/BiomedVLP-CXR-BERT-specialized")
    p.add_argument("--num-valid-samples", type=int, default=500,
                   help="zero-shot eval size (reference default 500)")
    p.add_argument("--num-samples", type=int, default=2,
                   help="scans for the attribution-map stage")
    p.add_argument("--methods", nargs="*",
                   default=["raw_attention_maps", "attention_rollout",
                            "integrated_gradients", "grad_cam", "occlusion"],
                   choices=["raw_attention_maps", "attention_rollout",
                            "integrated_gradients", "grad_cam", "occlusion"],
                   help="attribution methods for the maps stage")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--preprocess-cache", default=None)
    p.add_argument("--diff-embeds", default=None,
                   help="pathology_diff_embeddings.npy: occlusion runs the "
                        "diff-embedding panel mode when given")
    p.add_argument("--map-tolerance", type=float, default=1e-3,
                   help="per-map max-abs-diff bar for the diff stage")
    p.add_argument("--occlusion-patch", nargs=3, type=int, default=None,
                   metavar=("D", "H", "W"),
                   help="occlusion window size (default: the reference's "
                        "20 40 40)")
    p.add_argument("--occlusion-stride", nargs=3, type=int, default=None,
                   metavar=("D", "H", "W"))
    p.add_argument("--arch-json", default=None,
                   help="JSON overrides for the model geometry (tests drive "
                        "tiny checkpoints through the same code path); "
                        "default is the reference flagship layout")
    p.add_argument("--render-gifs", action="store_true",
                   help="also render overlay GIFs (maps stage saves .npy "
                        "always; GIFs are slow on CPU)")
    return p


def _model_cfg(arch_json):
    from ..config import BertConfig, CTCLIPConfig, CTViTConfig
    if not arch_json:
        # the reference flagship layout (train_ctclip.py:19-37)
        return CTCLIPConfig(ctvit=CTViTConfig(dim_head=32))
    spec = json.loads(Path(arch_json).read_text())
    vit = CTViTConfig(**spec.get("ctvit", {}))
    bert = BertConfig(**spec.get("bert", {}))
    top = {k: v for k, v in spec.items() if k not in ("ctvit", "bert")}
    return CTCLIPConfig(ctvit=vit, bert=bert, **top)


def run_drill(args, tokenizer=None, preprocess_cfg=None) -> dict:
    """Drill implementation. `tokenizer`/`preprocess_cfg` exist for
    injection in zero-egress tests (hash tokenizer, tiny volumes — the
    established suite_e2e pattern); the CLI passes neither."""
    import jax
    import numpy as np

    from ..train import checkpoint as ckpt

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {}
    model_cfg = _model_cfg(args.arch_json)

    # ---- stage 1: convert -------------------------------------------------
    params = ckpt.load_ctclip_params(args.checkpoint, model_cfg)
    converted = out_dir / "converted.msgpack"
    ckpt.save_checkpoint(converted, params)
    params = jax.device_put(params)
    report["convert"] = {
        "status": "ok",
        "leaves": len(jax.tree.leaves(params)),
        "parameters": int(sum(np.prod(a.shape)
                              for a in jax.tree.leaves(params))),
        "converted": str(converted),
    }

    have_data = all((args.data_valid, args.valid_reports, args.valid_labels,
                     args.valid_metadata))
    ds = None
    if have_data:
        from ..data.datasets import InferenceDataset
        if tokenizer is None:
            from transformers import BertTokenizer
            tokenizer = BertTokenizer.from_pretrained(args.tokenizer,
                                                      do_lower_case=True)
        ds_kw = {} if preprocess_cfg is None else {
            "preprocess_cfg": preprocess_cfg}
        ds = InferenceDataset(args.data_valid, args.valid_reports,
                              args.valid_metadata, args.valid_labels,
                              num_samples=args.num_valid_samples,
                              cache_dir=args.preprocess_cache, **ds_kw)

    # ---- stage 2: zero-shot AUROC ----------------------------------------
    if ds is None:
        report["zeroshot"] = {
            "status": "skipped",
            "reason": "pass --data-valid/--valid-reports/--valid-labels/"
                      "--valid-metadata for the AUROC table"}
    else:
        from ..data.loader import DataLoader, ShardedSampler
        from ..infer.zeroshot import CTClipInference
        dl = DataLoader(ds, batch_size=args.batch_size,
                        sampler=ShardedSampler(len(ds), shuffle=False,
                                               drop_last=False),
                        num_workers=2, drop_last=False)
        inf = CTClipInference(params, model_cfg, tokenizer, dl,
                              results_folder=out_dir / "zeroshot",
                              zero_shot=True)
        m, preds, targets = inf.zeroshot()
        from ..config import PATHOLOGIES
        auroc = {p: (None if a != a else round(float(a), 4))
                 for p, a in zip(PATHOLOGIES, m["roc_aucs"])}
        mean = m["mean_roc_auc"]
        report["zeroshot"] = {
            "status": "ok", "n_scans": int(len(preds)),
            "auroc": auroc,
            "auroc_mean": None if mean != mean else round(float(mean), 4),
            "metrics_dir": str(inf.results_folder),
        }

    # ---- stage 3: attribution maps ---------------------------------------
    if ds is None:
        report["maps"] = {"status": "skipped",
                          "reason": "needs the valid split (same flags as "
                                    "zeroshot)"}
    else:
        from ..attribution.suite import AttributionContext, Visualizations
        diff_embeds = None
        if args.diff_embeds:
            from ..attribution.embedding_arithmetic import \
                load_diff_embeddings
            diff_embeds = load_diff_embeddings(args.diff_embeds)

        class _Head:     # first --num-samples scans of the valid split
            def __iter__(self):
                for i in range(min(args.num_samples, len(ds))):
                    yield ds[i]

        ctx = AttributionContext(params=params, cfg=model_cfg,
                                 tokenizer=tokenizer, data=_Head(),
                                 diff_embeds=diff_embeds,
                                 render_gifs=args.render_gifs)
        maps_dir = out_dir / "maps"
        vis = Visualizations(ctx, maps_dir)
        methods = {m: True for m in args.methods}
        if "occlusion" in methods:
            occ_kw = {}
            if diff_embeds:
                occ_kw["use_text_embeds"] = True
            if args.occlusion_patch:
                from ..config import OcclusionConfig
                occ_kw["occ"] = OcclusionConfig(
                    patch_size=tuple(args.occlusion_patch),
                    stride=tuple(args.occlusion_stride
                                 or args.occlusion_patch))
            if occ_kw:
                methods["occlusion"] = occ_kw
        vis.visualize(**methods)
        saved = sorted(str(p.relative_to(maps_dir))
                       for p in maps_dir.rglob("*.npy"))
        report["maps"] = {"status": "ok", "dir": str(maps_dir),
                         "n_maps": len(saved), "files": saved}

    # ---- stage 4: diff vs reference maps ---------------------------------
    if not args.reference_maps:
        report["diff"] = {"status": "skipped",
                          "reason": "pass --reference-maps with the "
                                    "reference run's saved .npy maps"}
    elif report["maps"]["status"] != "ok":
        report["diff"] = {"status": "skipped", "reason": "maps stage did "
                                                         "not run"}
    else:
        ref_root = Path(args.reference_maps)
        # key maps by (method-dir, file name): both trees use the
        # reference's artifact layout (<method>/<run-idx>/<name>.npy), and
        # the same file name legitimately recurs across methods (e.g.
        # *_spatial.npy in raw_attention_grids AND attention_rollout)
        method_dirs = {"raw_attention_grids", "attention_rollout",
                       "integrated_gradients", "grad_cam", "occlusion"}

        def key(p: Path):
            method = next((pp.name for pp in p.parents
                           if pp.name in method_dirs), "")
            return (method, p.name)

        ref_by_name = {key(p): p for p in ref_root.rglob("*.npy")}
        diffs, missing = {}, []
        for rel in report["maps"]["files"]:
            ours_p = Path(report["maps"]["dir"]) / rel
            ref_p = ref_by_name.get(key(ours_p))
            if ref_p is None:
                missing.append(ours_p.name)
                continue
            ours = np.load(ours_p, allow_pickle=True)
            ref = np.load(ref_p, allow_pickle=True)
            if ours.dtype == object:     # occlusion's dict-of-heatmaps
                ours, ref = ours.item(), ref.item()
                d = max((float(np.abs(np.asarray(ours[k], np.float32)
                                      - np.asarray(ref[k], np.float32)).max())
                         for k in ours if k in ref), default=float("nan"))
            else:
                d = float(np.abs(np.asarray(ours, np.float32)
                                 - np.asarray(ref, np.float32)).max())
            diffs["/".join(key(ours_p))] = round(d, 6)
        worst = max(diffs.values()) if diffs else None
        report["diff"] = {
            "status": "ok" if diffs else "no-overlap",
            "n_compared": len(diffs), "missing_in_reference": missing,
            "max_abs_diff": worst, "tolerance": args.map_tolerance,
            "within_tolerance": (worst is not None
                                 and worst <= args.map_tolerance),
            "per_map": diffs,
        }

    (out_dir / "drill_report.json").write_text(json.dumps(report, indent=2))
    return report


def main(argv=None):
    args = build_parser().parse_args(argv)
    report = run_drill(args)
    for stage, info in report.items():
        status = info.get("status")
        extra = info.get("reason", "")
        if stage == "zeroshot" and status == "ok":
            extra = f"mean AUROC {info['auroc_mean']}"
        if stage == "diff" and status == "ok":
            extra = (f"max abs diff {info['max_abs_diff']} "
                     f"(tol {info['tolerance']})")
        print(f"[drill] {stage}: {status} {extra}".rstrip())
    print(f"[drill] report -> {Path(args.out) / 'drill_report.json'}")


if __name__ == "__main__":
    main()
