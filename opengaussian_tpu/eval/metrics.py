"""Image-quality metrics over render directories.

Counterpart of the reference's metrics.py (PSNR/SSIM/LPIPS over
renders/ vs gt/; results.json + per_view.json). LPIPS is the self-contained
JAX VGG16 port (eval/lpips.py, matching reference
lpipsPyTorch/modules/lpips.py semantics including its [0,1]-input quirk);
it loads vendored weights from a local npz and warns loudly when absent.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from opengaussian_tpu.ops.ssim import ssim
from opengaussian_tpu.train.losses import psnr


def lpips_fn():
    """The self-contained VGG-LPIPS (None when no local weights exist)."""
    from opengaussian_tpu.eval.lpips import get_lpips

    return get_lpips()


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
    # LPIPS stays in the results dict as None when weights are absent, so
    # downstream consumers can distinguish "metric unavailable" from
    # "not applicable" (the lpips module's warning promises null).
    agg = {k: (float(np.mean(list(v.values()))) if v else None) for k, v in per_view.items()}
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
