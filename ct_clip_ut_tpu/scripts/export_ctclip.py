"""Export the serving programs to a StableHLO artifact directory.

Deployment path the reference lacks: `zeroshot_scorer.shlo` +
`prompt_encoder.shlo` (`--kind ctclip`) or `ctgenerate_localizer.shlo`
(`--kind ctgenerate`) + `manifest.json` run under any XLA serving runtime
(PJRT C API / IFRT) with no Python model code — pair with a converted
checkpoint for the weights (and, for ctgenerate, the per-checkpoint CPB
table from `models.ctgenerate.maskgit_bias_table`). Lowering for TPU works
from a CPU-only box.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=("ctclip", "ctgenerate"),
                   default="ctclip")
    p.add_argument("--checkpoint", default=None,
                   help="torch .pt or native .msgpack; omit for a "
                        "random-init export (shape/latency testing)")
    p.add_argument("--frames", type=int, default=201,
                   help="ctgenerate: scan depth of the exported program")
    p.add_argument("--text-len", type=int, default=64,
                   help="ctgenerate: padded T5 context length")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--depth", type=int, default=240)
    p.add_argument("--prompt-len", type=int, default=24)
    p.add_argument("--platform", default="tpu", choices=("tpu", "cpu"),
                   help="target platform for the lowered program")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from ..config import CTCLIPConfig, CTViTConfig
    from ..infer.export import export_zeroshot, save_exported
    from ..models.ctclip import init_ctclip
    from ..train import checkpoint as ckpt

    if args.kind == "ctgenerate":
        from ..config import CTGenerateConfig
        from ..infer.export import (export_ctgenerate,
                                    save_exported_ctgenerate)
        gcfg = CTGenerateConfig()
        if args.checkpoint:
            if args.checkpoint.endswith(".pt"):
                params = ckpt.convert_ctgenerate(
                    ckpt.load_torch_checkpoint(args.checkpoint), gcfg)
            else:
                from ..models.ctgenerate import init_ctgenerate
                params = ckpt.load_checkpoint(
                    args.checkpoint,
                    init_ctgenerate(jax.random.PRNGKey(0), gcfg))
        else:
            from ..models.ctgenerate import init_ctgenerate
            params = init_ctgenerate(jax.random.PRNGKey(0), gcfg)
        localizer = export_ctgenerate(
            params, gcfg, batch=args.batch, frames=args.frames,
            text_len=args.text_len, platforms=(args.platform,))
        save_exported_ctgenerate(
            args.out, localizer, gcfg,
            meta={"checkpoint": args.checkpoint or "random-init",
                  "batch": args.batch})
        print(f"exported ctgenerate localizer for {args.platform} "
              f"-> {args.out}")
        return

    cfg = CTCLIPConfig(ctvit=CTViTConfig(dim_head=32))
    if args.checkpoint:
        params = ckpt.load_ctclip_params(args.checkpoint, cfg)
    else:
        params = init_ctclip(jax.random.PRNGKey(0), cfg)

    scorer, prompter = export_zeroshot(
        params, cfg, batch=args.batch, depth=args.depth,
        prompt_len=args.prompt_len, platforms=(args.platform,))
    save_exported(args.out, scorer, prompter, cfg,
                  meta={"checkpoint": args.checkpoint or "random-init",
                        "batch": args.batch})
    print(f"exported zeroshot scorer + prompt encoder for "
          f"{args.platform} -> {args.out}")


if __name__ == "__main__":
    main()
