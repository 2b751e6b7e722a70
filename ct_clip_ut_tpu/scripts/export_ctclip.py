"""Export the CTCLIP serving programs to a StableHLO artifact directory.

Deployment path the reference lacks: `zeroshot_scorer.shlo` +
`prompt_encoder.shlo` + `manifest.json` run under any XLA serving runtime
(PJRT C API / IFRT) with no Python model code — pair with a converted
checkpoint for the weights. Lowering for TPU works from a CPU-only box.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="torch .pt or native .msgpack; omit for a "
                        "random-init export (shape/latency testing)")
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
