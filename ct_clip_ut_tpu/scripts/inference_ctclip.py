"""CTCLIP zero-shot evaluation + attribution entry point.

Mirrors reference src/inference_ctclip.py (:43-59). Example:

    python -m ct_clip_ut_tpu.scripts.inference_ctclip \
        --data-valid /data/valid --valid-reports reports/valid_reports.csv \
        --valid-labels labels/valid_labels.csv \
        --valid-metadata metadata/valid_metadata.csv \
        --checkpoint ctclip_v2.pt --zero-shot \
        --visualize occlusion grad_cam
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-valid", required=True)
    p.add_argument("--valid-reports", required=True)
    p.add_argument("--valid-labels", required=True)
    p.add_argument("--valid-metadata", required=True)
    p.add_argument("--results-folder", default="./results/valid/ctclip")
    p.add_argument("--diff-embeds", default=None,
                   help="pathology_diff_embeddings.npy for occlusion bypass")
    p.add_argument("--checkpoint", required=True,
                   help="torch ctclip_v2.pt or native .msgpack")
    p.add_argument("--tokenizer", default="microsoft/BiomedVLP-CXR-BERT-specialized")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--num-valid-samples", type=int, default=10)
    p.add_argument("--preprocess-cache", default=None,
                   help="dir for preprocessed-volume .npy cache")
    p.add_argument("--zero-shot", action="store_true")
    p.add_argument("--visualize", nargs="*", default=[],
                   choices=["raw_attention_maps", "attention_rollout",
                            "integrated_gradients", "grad_cam", "occlusion"])
    p.add_argument("--occlusion-text-embeds", action="store_true",
                   help="occlusion in the diff-embedding bypass mode: ONE "
                        "window sweep scores every positive pathology "
                        "(requires --diff-embeds; reference "
                        "visualizations.py:1037-1044 re-sweeps per pathology)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize the multi-process JAX runtime before "
                        "device queries (pod-slice eval)")
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (default: all devices)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size; data*model must "
                        "equal the device count")
    p.add_argument("--occlusion-prompt", default="",
                   help="tag recorded in occlusion artifact filenames")
    p.add_argument("--quantize-ff", action="store_true",
                   help="serve the visual transformer's GEGLU FFs W8A8 "
                        "(halves FF weight memory vs bf16, ~0.5%% block "
                        "error; forward-only, so incompatible with "
                        "gradient-based attribution; measured ~7%% faster "
                        "than bf16 in isolation — a memory lever, see "
                        "ops/pallas_ff_int8.py)")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.occlusion_text_embeds:
        # fail in milliseconds, not after the checkpoint load + zero-shot pass
        if "occlusion" not in args.visualize:
            parser.error("--occlusion-text-embeds requires "
                         "--visualize occlusion")
        if not args.diff_embeds:
            parser.error("--occlusion-text-embeds requires --diff-embeds")
    if args.quantize_ff:
        grad_methods = {"integrated_gradients", "grad_cam"} & set(args.visualize)
        if grad_methods:
            parser.error("--quantize-ff is forward-only (the int8 kernel "
                         "raises under AD); drop " + ", ".join(sorted(grad_methods)))

    # multi-host bring-up must happen before the first jax device query
    if args.multihost or (args.num_processes or 0) > 1:
        from ..parallel.mesh import initialize_runtime
        initialize_runtime(coordinator_address=args.coordinator_address,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    import jax
    from transformers import BertTokenizer

    from ..attribution.suite import AttributionContext
    from ..config import CTCLIPConfig, CTViTConfig
    from ..data.datasets import InferenceDataset
    from ..data.loader import DataLoader, ShardedSampler
    from ..infer.zeroshot import CTClipInference
    from ..train import checkpoint as ckpt

    model_cfg = CTCLIPConfig(ctvit=CTViTConfig(dim_head=32))
    tokenizer = BertTokenizer.from_pretrained(args.tokenizer, do_lower_case=True)

    params = ckpt.load_ctclip_params(args.checkpoint, model_cfg)
    if args.quantize_ff:
        from ..ops.quant import quantize_ctclip_ff
        params = quantize_ctclip_ff(params)
    params = jax.device_put(params)

    ds = InferenceDataset(args.data_valid, args.valid_reports,
                          args.valid_metadata, args.valid_labels,
                          num_samples=args.num_valid_samples,
                          cache_dir=args.preprocess_cache)
    # per-process contiguous-interleaved shards (DistributedSampler pattern,
    # reference CTClipInference.py:59); single-process this is the identity
    dl = DataLoader(ds, batch_size=args.batch_size,
                    sampler=ShardedSampler(len(ds), shuffle=False,
                                           drop_last=False,
                                           num_shards=jax.process_count(),
                                           shard_index=jax.process_index()),
                    num_workers=args.num_workers, drop_last=False)

    diff_embeds = None
    if args.diff_embeds:
        from ..attribution.embedding_arithmetic import load_diff_embeddings
        diff_embeds = load_diff_embeddings(args.diff_embeds)

    mesh = None
    if args.mesh_data is not None or args.mesh_model != 1:
        from .train_ctclip import make_cli_mesh
        mesh = make_cli_mesh(args)

    ctx = AttributionContext(params=params, cfg=model_cfg,
                             tokenizer=tokenizer, data=ds,
                             diff_embeds=diff_embeds, mesh=mesh)
    visualize = {name: True for name in args.visualize}
    if "occlusion" in visualize and (args.occlusion_text_embeds
                                     or args.occlusion_prompt):
        visualize["occlusion"] = {
            "use_text_embeds": args.occlusion_text_embeds,
            "prompt": args.occlusion_prompt}
    inference = CTClipInference(
        params, model_cfg, tokenizer, dl,
        results_folder=args.results_folder,
        zero_shot=args.zero_shot,
        visualize=visualize,
        attribution_ctx=ctx,
        mesh=mesh)
    inference.infer()


if __name__ == "__main__":
    main()
