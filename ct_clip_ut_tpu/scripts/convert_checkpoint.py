"""Convert reference torch checkpoints to native msgpack pytrees.

Supports:
  * ctclip_v2.pt-style CTCLIP state dicts (reference CTClipTrainer.py:139-143)
  * ctgenerate_filtered.pt (CT-ViT + MaskGit; T5 from the HF checkpoint)

Example:
    python -m ct_clip_ut_tpu.scripts.convert_checkpoint \
        --kind ctclip --in ctclip_v2.pt --out ctclip_v2.msgpack
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["ctclip", "ctgenerate"], required=True)
    p.add_argument("--in", dest="inp", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--t5", default="google/t5-v1_1-base",
                   help="HF T5 weights for the ctgenerate text tower")
    args = p.parse_args(argv)

    from ..train import checkpoint as ckpt

    sd = ckpt.load_torch_checkpoint(args.inp)
    if args.kind == "ctclip":
        from ..config import CTCLIPConfig, CTViTConfig
        params = ckpt.convert_ctclip(sd, CTCLIPConfig(ctvit=CTViTConfig(dim_head=32)))
    else:
        from ..config import CTGenerateConfig
        t5_sd = None
        try:
            from transformers import T5EncoderModel
            t5_sd = T5EncoderModel.from_pretrained(args.t5).state_dict()
        except Exception as e:  # zero-egress environments
            print(f"T5 weights unavailable ({e}); converting without text tower")
        params = ckpt.convert_ctgenerate(sd, CTGenerateConfig(), t5_sd=t5_sd)

    ckpt.save_checkpoint(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
