"""Convert pretrained VGG16 + LPIPS linear weights to the .npz consumed by
nerfstudio_thermal_tpu.utils.lpips (set NS_LPIPS_WEIGHTS to the output).

The reference gets LPIPS through torchmetrics (which downloads
torchvision's VGG16 and the lpips linear heads at first use,
reference nerfstudio/models/nerfacto.py:253). This environment has no
egress, so conversion runs wherever the torch checkpoints already exist:

  python tools/convert_lpips_weights.py \
      --vgg16-pth  ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
      --lpips-pth  <site-packages>/lpips/weights/v0.1/vgg.pth \
      --out lpips_vgg16.npz

Either flag may be omitted if torchvision / the `lpips` package is importable
(the script then pulls the state dicts from them directly).

Output keys: conv{i}_kernel [kh,kw,cin,cout], conv{i}_bias [cout] for the 13
VGG16 convs in order, and lin{k}_weight [c] for the 5 LPIPS heads.
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def load_vgg16_state(pth: Path | None):
    if pth is not None:
        import torch

        return torch.load(pth, map_location="cpu", weights_only=True)
    try:
        import torchvision

        model = torchvision.models.vgg16(weights="IMAGENET1K_V1")
        return model.state_dict()
    except Exception as e:  # pragma: no cover
        sys.exit(f"need --vgg16-pth (torchvision unavailable: {e})")


def load_lpips_state(pth: Path | None):
    if pth is not None:
        import torch

        return torch.load(pth, map_location="cpu", weights_only=True)
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        return {
            f"lin{k}.model.1.weight": net.lins[k].model[1].weight.detach()
            for k in range(5)
        }
    except Exception as e:  # pragma: no cover
        sys.exit(f"need --lpips-pth (lpips package unavailable: {e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16-pth", type=Path, default=None)
    ap.add_argument("--lpips-pth", type=Path, default=None)
    ap.add_argument("--out", type=Path, default=Path("lpips_vgg16.npz"))
    args = ap.parse_args()

    vgg = load_vgg16_state(args.vgg16_pth)
    # torchvision names: features.{idx}.weight — conv indices in vgg16
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, idx in enumerate(conv_idx):
        w = np.asarray(vgg[f"features.{idx}.weight"])  # [cout, cin, kh, kw]
        b = np.asarray(vgg[f"features.{idx}.bias"])
        out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"conv{i}_bias"] = b

    lp = load_lpips_state(args.lpips_pth)
    for k in range(5):
        # lpips checkpoint key: lin{k}.model.1.weight, shape [1, c, 1, 1]
        key = f"lin{k}.model.1.weight"
        if key not in lp:
            key = f"lin{k}.weight"
        out[f"lin{k}_weight"] = np.asarray(lp[key]).reshape(-1)

    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays); "
          f"export NS_LPIPS_WEIGHTS={args.out.resolve()}")


if __name__ == "__main__":
    main()
