"""Convert pretrained perceptual-loss weights to the framework's .npz form.

The reference relies on torchvision's VGG16 and the lpips package's learned
linear heads (reference: src/model/loss.py:32-40,79-111). This environment
has no egress, so the flow is: download the checkpoints on any machine,

    python scripts/convert_vgg.py --vgg vgg16-397923af.pth --out vgg16.npz
    python scripts/convert_vgg.py --lpips vgg.pth --lpips-out lpips_lin.npz

then point the framework at the artifacts:

    export DBW_VGG_WEIGHTS=/path/to/vgg16.npz
    export DBW_LPIPS_WEIGHTS=/path/to/lpips_lin.npz

(or set ``loss.vgg_weights`` in the model config). Without them the VGG
feature stack falls back to seeded random filters and eval columns are
labeled ``LPIPS_randvgg`` (losses/vgg.py).

- VGG .npz layout: w0..w12 (3,3,Cin,Cout) HWIO + b0..b12 (Cout,)
- LPIPS .npz layout: lin0..lin4 (C_i,) non-negative channel weights
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def convert_vgg(path, out):
    from dbw_tpu.losses.vgg import VGG16Features

    ws = VGG16Features.load_torch_state_dict(path)
    np.savez(
        out,
        **{f"w{i}": w for i, (w, _) in enumerate(ws)},
        **{f"b{i}": b for i, (_, b) in enumerate(ws)},
    )
    print(f"wrote {out}: {len(ws)} conv layers")


def convert_lpips(path, out):
    """Extract the 5 linear-head channel weights from an lpips-package
    checkpoint (keys like ``lin{i}.model.1.weight`` of shape (1, C, 1, 1))."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    lins = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                lins[f"lin{i}"] = (
                    sd[key].numpy().reshape(-1).clip(min=0.0).astype(np.float32)
                )
                break
        else:
            raise KeyError(f"no linear head {i} in {path}: {list(sd)[:8]}")
    np.savez(out, **lins)
    print(f"wrote {out}: " + ", ".join(f"lin{i}({len(lins[f'lin{i}'])})"
                                       for i in range(5)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vgg", help="torchvision vgg16 .pth checkpoint")
    p.add_argument("--out", default="vgg16.npz")
    p.add_argument("--lpips", help="lpips package vgg .pth checkpoint")
    p.add_argument("--lpips-out", default="lpips_lin.npz")
    args = p.parse_args()
    if not args.vgg and not args.lpips:
        p.error("nothing to do: pass --vgg and/or --lpips")
    if args.vgg:
        convert_vgg(args.vgg, args.out)
    if args.lpips:
        convert_lpips(args.lpips, args.lpips_out)


if __name__ == "__main__":
    main()
