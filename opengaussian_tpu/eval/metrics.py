"""Image-quality metrics over render directories.

Counterpart of the reference's metrics.py (PSNR/SSIM/LPIPS over
renders/ vs gt/; results.json + per_view.json). LPIPS uses torch-cpu
torchvision weights when available (eval-only, never in the train path) and
is skipped otherwise.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from opengaussian_tpu.ops.ssim import ssim
from opengaussian_tpu.train.losses import psnr

_LPIPS = None


def lpips_fn():
    """Lazy VGG-LPIPS on torch CPU; returns None if unavailable (no weights
    in a zero-egress environment)."""
    global _LPIPS
    if _LPIPS is not None:
        return _LPIPS if _LPIPS != "unavailable" else None
    try:
        import torch
        import lpips  # type: ignore

        net = lpips.LPIPS(net="vgg")

        def f(a, b):
            ta = torch.from_numpy((a * 2 - 1).transpose(2, 0, 1)[None]).float()
            tb = torch.from_numpy((b * 2 - 1).transpose(2, 0, 1)[None]).float()
            with torch.no_grad():
                return float(net(ta, tb))

        _LPIPS = f
    except Exception:
        _LPIPS = "unavailable"
        return None
    return _LPIPS


def evaluate_dirs(renders_dir: str, gt_dir: str) -> dict:
    names = sorted(os.listdir(renders_dir))
    per_view = {"PSNR": {}, "SSIM": {}, "LPIPS": {}}
    lp = lpips_fn()
    for n in names:
        a = np.asarray(Image.open(os.path.join(renders_dir, n)), np.float32)[..., :3] / 255
        b = np.asarray(Image.open(os.path.join(gt_dir, n)), np.float32)[..., :3] / 255
        per_view["PSNR"][n] = float(psnr(jnp.asarray(a), jnp.asarray(b)))
        per_view["SSIM"][n] = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        if lp:
            per_view["LPIPS"][n] = lp(a, b)
    agg = {k: float(np.mean(list(v.values()))) for k, v in per_view.items() if v}
    return {"results": agg, "per_view": per_view}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = p.parse_args(argv)
    for mp in args.model_paths:
        full = {}
        test_dir = os.path.join(mp, "test")
        for method in sorted(os.listdir(test_dir)) if os.path.isdir(test_dir) else []:
            md = os.path.join(test_dir, method)
            out = evaluate_dirs(os.path.join(md, "renders"), os.path.join(md, "gt"))
            full[method] = out["results"]
            print(mp, method, out["results"])
        with open(os.path.join(mp, "results.json"), "w") as f:
            json.dump(full, f, indent=2)


if __name__ == "__main__":
    main()
