"""CTGenerate cross-attention pathology localization entry point.

Mirrors reference src/inference_ctgenerate.py + CTGenerateInference.py:
for each scan, encode to codebook ids, T5-encode the report, run MaskGit,
and render per-positive-pathology cross-attention heatmap GIFs.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-valid", default=None,
                   help="valid split (required unless --generate)")
    p.add_argument("--valid-reports", default=None)
    p.add_argument("--valid-labels", default=None)
    p.add_argument("--valid-metadata", default=None)
    p.add_argument("--generate", nargs="*", metavar="PROMPT", default=None,
                   help="GenerateCT mode: iteratively decode a CT token "
                        "grid per prompt with maskgit_generate (the "
                        "capability the reference carries the architecture "
                        "for but never runs; its released snapshot strips "
                        "the CT-ViT decoder weights, so the output is the "
                        "[t, h, w] codebook-id grid saved as .npy)")
    p.add_argument("--generate-steps", type=int, default=18,
                   help="MaskGIT decode iterations")
    p.add_argument("--generate-temperature", type=float, default=1.0)
    p.add_argument("--generate-frames", type=int, default=201,
                   help="target scan depth; the token grid is "
                        "(1+(frames-1)/tps, H/ps, W/ps)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--results-folder", default="./results/valid/ctgenerate")
    p.add_argument("--checkpoint", required=True,
                   help="torch ctgenerate_filtered.pt or native .msgpack")
    p.add_argument("--t5", default="google/t5-v1_1-base")
    p.add_argument("--num-valid-samples", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=1,
                   help="scans per forward (ctgenerate_apply_batched); the "
                        "reference drives scans one at a time")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="DP-shard batches over this many devices")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="serving dtype of the batched MaskGit stack "
                        "(bf16 default like zero-shot; float32 = "
                        "reference-parity numerics). Batch mode only — the "
                        "one-scan-per-forward path always runs fp32")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.generate is None:
        missing = [f for f in ("data_valid", "valid_reports", "valid_labels",
                               "valid_metadata") if getattr(args, f) is None]
        if missing:
            parser.error("localization mode needs --data-valid/"
                         "--valid-reports/--valid-labels/--valid-metadata "
                         "(or pass --generate PROMPT...)")
    elif not args.generate:
        parser.error("--generate needs at least one prompt")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import T5Tokenizer

    from ..config import PATHOLOGIES, CTGenerateConfig
    from ..data.datasets import InferenceDataset
    from ..models.ctgenerate import ctgenerate_apply, keyword_heatmap
    from ..models.t5 import T5TextConditioner
    from ..train import checkpoint as ckpt
    from ..utils.visualizations import visualize_overlay
    from ..attribution.capture import rot90_ct

    cfg = CTGenerateConfig()
    tokenizer = T5Tokenizer.from_pretrained(args.t5)

    if args.checkpoint.endswith(".pt"):
        from transformers import T5EncoderModel
        t5_sd = T5EncoderModel.from_pretrained(args.t5).state_dict()
        params = ckpt.convert_ctgenerate(
            ckpt.load_torch_checkpoint(args.checkpoint), cfg, t5_sd=t5_sd)
    else:
        from ..models.ctgenerate import init_ctgenerate
        template = init_ctgenerate(jax.random.PRNGKey(0), cfg)
        params = ckpt.load_checkpoint(args.checkpoint, template)
    params = jax.device_put(params)

    t5 = T5TextConditioner(params["t5"], cfg.t5, tokenizer)
    results = Path(args.results_folder)
    results.mkdir(parents=True, exist_ok=True)

    if args.generate is not None:
        # GenerateCT decode: report prompt -> T5 context -> iterative
        # MaskGIT confidence decode -> [t, h, w] codebook-id grid
        from ..models.ctvit import token_grid_shape
        from ..models.maskgit import maskgit_generate
        vit = cfg.ctvit
        grid = token_grid_shape(vit, (args.generate_frames, vit.image_size,
                                      vit.image_size))
        text_embed, text_mask = t5.encode(list(args.generate))
        ids = maskgit_generate(params["maskgit"], cfg.maskgit, text_embed,
                               grid, text_mask=text_mask,
                               steps=args.generate_steps,
                               temperature=args.generate_temperature,
                               rng=jax.random.PRNGKey(args.seed))
        ids = np.asarray(ids).reshape(len(args.generate), *grid)
        for i, prompt in enumerate(args.generate):
            slug = "_".join(prompt.lower().split())[:60]
            out = results / f"generated_{i}_{slug}_tokens.npy"
            np.save(out, ids[i])
            print(f"[generate] {out}  grid {grid}  "
                  f"unique tokens {len(np.unique(ids[i]))}")
        print(f"Generated {len(args.generate)} token grid(s) -> {results}")
        return

    ds = InferenceDataset(args.data_valid, args.valid_reports,
                          args.valid_metadata, args.valid_labels,
                          num_samples=args.num_valid_samples,
                          model_type="ctgenerate")

    mesh = None
    if args.mesh_data is not None:
        from ..config import MeshConfig
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(MeshConfig(data=args.mesh_data, model=1),
                         devices=jax.devices()[:args.mesh_data])

    def render(img, image_shape, scan_name, pathology, cross,
               video_patch_shape):
        # `img` is the per-scan rot90 volume, computed ONCE per scan
        heat = rot90_ct(keyword_heatmap(cross, video_patch_shape,
                                        image_shape[-3:]))
        visualize_overlay(
            img, heat, scan_name, "GenerateCT Attention",
            results / f"ctgenerate_{scan_name}_{pathology}.gif")
        np.save(results / f"ctgenerate_{scan_name}_{pathology}.npy", heat)

    start = time.time()
    bsz = max(1, args.batch_size)
    if bsz == 1 and mesh is None:
        # reference-parity path: one scan per forward
        for idx in range(len(ds)):
            image, text, labels, scan_name, path = ds[idx]
            positives = [p for p, l in zip(PATHOLOGIES, labels.tolist())
                         if l == 1.0]
            text_embed, text_mask = t5.encode(text)
            kw_idx = t5.get_token_indices(positives)
            out = ctgenerate_apply(params, cfg, jnp.asarray(image)[None],
                                   text_embed, text_mask, kw_idx)
            img = rot90_ct(np.asarray(image).squeeze())
            for pathology, cross in out.kw_attention.items():
                render(img, image.shape, scan_name, pathology, cross,
                       out.video_patch_shape)
    else:
        from ..models.ctgenerate import ctgenerate_apply_batched
        bias_cache = {}   # CPB table built once per grid shape (serving)
        for lo in range(0, len(ds), bsz):
            samples = [ds[i] for i in range(lo, min(lo + bsz, len(ds)))]
            images = np.stack([s[0] for s in samples])
            text_embed, text_mask = t5.encode([s[1] for s in samples])
            out = ctgenerate_apply_batched(params, cfg, jnp.asarray(images),
                                           text_embed, text_mask, mesh=mesh,
                                           bias_cache=bias_cache,
                                           compute_dtype=args.compute_dtype)
            cross_all = np.asarray(out.cross_attention)
            for i, (image, _, labels, scan_name, _) in enumerate(samples):
                positives = [p for p, l in zip(PATHOLOGIES, labels.tolist())
                             if l == 1.0]
                img = rot90_ct(np.asarray(image).squeeze())
                for pathology, idx in t5.get_token_indices(
                        positives, index=i).items():
                    render(img, image.shape, scan_name, pathology,
                           cross_all[i:i + 1][..., idx],
                           out.video_patch_shape)
    print(f"CTGENERATE inference completed in {time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
