"""Render trained models: RGB + instance-feature maps per split.

Counterpart of the reference's render.py (render_set at render.py:33-86):
writes renders/, gt/, ins_feat1/, ins_feat2/ (and sam_mask/ colorizations
when sidecars exist) for the train and test splits.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _save(path, arr):
    Image.fromarray((np.clip(np.asarray(arr), 0, 1) * 255).astype(np.uint8)).save(path)


MASK_COLORS = None


def mask_colors(n, seed=42):
    """Deterministic mask colorization (reference train.py:47)."""
    global MASK_COLORS
    if MASK_COLORS is None or len(MASK_COLORS) < n:
        rng = np.random.default_rng(seed)
        MASK_COLORS = rng.integers(0, 256, (max(n, 500), 3)).astype(np.uint8)
    return MASK_COLORS[:n]


def render_set(out_dir, split, views, state, rcfg, bg, sam_level):
    import jax.numpy as jnp

    from opengaussian_tpu.render import render
    from opengaussian_tpu.utils.masks import decode_sam_level

    dirs = {k: os.path.join(out_dir, split, "ours", k)
            for k in ("renders", "gt", "ins_feat1", "ins_feat2", "sam_mask")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    for i, v in enumerate(views):
        out = render(v.camera, state, bg, 3, rcfg, render_color=True,
                     render_feat_map=True, origin_feat=True)
        name = f"{i:05d}.png"
        _save(os.path.join(dirs["renders"], name), out.render)
        _save(os.path.join(dirs["gt"], name), v.gt_image)
        _save(os.path.join(dirs["ins_feat1"], name), out.ins_feat[..., :3])
        _save(os.path.join(dirs["ins_feat2"], name), out.ins_feat[..., 3:6])
        if v.sam_mask is not None:
            ids = decode_sam_level(np.asarray(v.sam_mask), sam_level)
            cols = mask_colors(int(ids.max()) + 1)
            Image.fromarray(cols[ids]).save(os.path.join(dirs["sam_mask"], name))


def main(argv=None):
    import jax.numpy as jnp

    from opengaussian_tpu.config import Config
    from opengaussian_tpu.data.dataset import load_scene
    from opengaussian_tpu.models.loading import load_model
    from opengaussian_tpu.ops.rasterize import RasterizeConfig

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--images", default="images")
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--sam_level", type=int, default=3)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    args = p.parse_args(argv)

    scene = load_scene(args.source_path, images=args.images,
                       white_background=args.white_background,
                       eval_split=args.eval, resolution=args.resolution)
    state, kms, it = load_model(args.model_path, args.iteration)
    bg = jnp.asarray([1.0, 1.0, 1.0] if args.white_background else [0.0, 0.0, 0.0])
    rcfg = RasterizeConfig()
    if not args.skip_train:
        render_set(args.model_path, "train", scene.train_views, state, rcfg, bg,
                   args.sam_level)
    if not args.skip_test and scene.test_views:
        render_set(args.model_path, "test", scene.test_views, state, rcfg, bg,
                   args.sam_level)
    print(f"rendered iteration {it} to {args.model_path}")


if __name__ == "__main__":
    main()
