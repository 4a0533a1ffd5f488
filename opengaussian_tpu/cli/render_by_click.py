"""Click -> 3D object selection.

Counterpart of the reference's scripts/render_by_click.py: read the 6-D
instance feature at a clicked pixel from the saved feature-map PNGs
(ins_feat1/ins_feat2 written by cli/render.py; color = (feat+1)/2), find the
nearest coarse (root) codebook center by feature distance, then the nearest
leaf within that root, and render that leaf's splats as RGB with KNN outlier
removal + a >0.7 silhouette mask (reference scripts/render_by_click.py:
55-67, 142-161, 168-245).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def decode_feature_at(ins_feat1_png: str, ins_feat2_png: str, x: int, y: int) -> np.ndarray:
    a = np.asarray(Image.open(ins_feat1_png), np.float32)[..., :3] / 255.0
    b = np.asarray(Image.open(ins_feat2_png), np.float32)[..., :3] / 255.0
    feat = np.concatenate([a[y, x], b[y, x]]) * 2.0 - 1.0
    return feat.astype(np.float32)


def select_leaf_by_feature(feat6: np.ndarray, root_centers: np.ndarray,
                           leaf_centers: np.ndarray, leaf_num: int) -> int:
    """Nearest root (feature dims of the 9-D coarse centers), then nearest
    leaf among that root's slots."""
    # root centers store raw (unnormalized) features; the rendered feature
    # map encodes the L2-normalized feature, so compare normalized.
    rc = root_centers[:, :6]
    rcn = rc / (np.linalg.norm(rc, axis=1, keepdims=True) + 1e-12)
    root = int(np.argmin(np.linalg.norm(rcn - feat6[None], axis=1)))
    lc = leaf_centers[root * leaf_num : (root + 1) * leaf_num]
    lcn = lc / (np.linalg.norm(lc, axis=1, keepdims=True) + 1e-12)
    leaf = int(np.argmin(np.linalg.norm(lcn - feat6[None], axis=1)))
    return root * leaf_num + leaf


def main(argv=None):
    import jax.numpy as jnp

    from opengaussian_tpu.data.dataset import load_scene
    from opengaussian_tpu.models.loading import load_model
    from opengaussian_tpu.ops.knn import statistical_outlier_mask
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.render import render_selection

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--view", required=True, help="image index used for the click (e.g. 00005)")
    p.add_argument("--click", nargs=2, type=int, required=True, metavar=("X", "Y"))
    args = p.parse_args(argv)

    state, kms, it = load_model(args.model_path, args.iteration)
    assert kms is not None, "click selection needs trained codebooks"
    fdir = os.path.join(args.model_path, "train", "ours")
    feat = decode_feature_at(
        os.path.join(fdir, "ins_feat1", f"{args.view}.png"),
        os.path.join(fdir, "ins_feat2", f"{args.view}.png"),
        args.click[0], args.click[1],
    )
    k1 = kms.centers.shape[0]
    leaf_num = (kms.leaf_centers.shape[0] - 1) // k1
    leaf = select_leaf_by_feature(
        feat, np.asarray(kms.centers), np.asarray(kms.leaf_centers), leaf_num
    )
    print(f"click {args.click} -> leaf {leaf} (root {leaf // leaf_num})")

    member = (np.asarray(kms.leaf_cls_ids) == leaf) & np.asarray(state.alive)
    pts = np.asarray(state.means)[member]
    if len(pts) >= 10:
        keep = statistical_outlier_mask(pts)
        idxs = np.flatnonzero(member)
        member[idxs[~keep]] = False

    scene = load_scene(args.source_path, eval_split=False, resolution=args.resolution)
    rcfg = RasterizeConfig()
    out_dir = os.path.join(args.model_path, "click2obj", f"ours_{it}")
    os.makedirs(out_dir, exist_ok=True)
    member_j = jnp.asarray(member)
    for i, v in enumerate(scene.train_views):
        out = render_selection(v.camera, state, jnp.ones(3), member_j, rcfg)
        img = np.clip(np.asarray(out.cluster_imgs), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{v.image_name}_leaf{leaf}.png"))
    print(f"wrote selections to {out_dir}")


if __name__ == "__main__":
    main()
