"""Training-process observability: periodic PNG dumps + TB image grids.

Counterpart of the reference's in-loop artifact dumping
(reference train.py:502-566: renders/gt every 1000 iters — 100 in stage
2.2 — plus per-stage ins_feat halves, silhouette, colorized SAM mask and
pseudo features under model_path/train_process/) and its TensorBoard image
grids at test iterations (train.py:976-984). The reference reuses the train
step's tensors; the jitted steps here return only scalars, so the dump
re-renders the step's view once — one extra render per thousand steps.
"""

from __future__ import annotations

import os

import numpy as np


def _save_png(path: str, arr: np.ndarray):
    from PIL import Image

    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    img = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


_PALETTE = None


def mask_palette(n: int) -> np.ndarray:
    """[n+1, 3] colors; id 0 = black. Seeded like the reference's predefined
    mask colors (reference train.py:44-47, seed 42)."""
    global _PALETTE
    if _PALETTE is None or _PALETTE.shape[0] < n + 1:
        rng = np.random.default_rng(42)
        pal = rng.integers(0, 256, (max(n + 1, 512), 3)).astype(np.float32)
        pal[0] = 0.0
        _PALETTE = pal
    return _PALETTE[: n + 1]


def dump_frequency(stage: str) -> int:
    return 100 if stage == "2.2" else 1000  # reference train.py:504-506


def _render_sharded_dump(trainer, cam, stage: str, quant):
    """RGB + (optionally) instance-feature images via parallel/render, the
    splats staying device-sharded. Matches the single-device render() output
    fields the dump consumes (render / ins_feat / silhouette)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from opengaussian_tpu.ops.projection import build_cov3d
    from opengaussian_tpu.ops.sh import sh_to_rgb
    from opengaussian_tpu.parallel.render import render_sharded
    from opengaussian_tpu.render import RenderOutputs, encoded_ins_feat

    gs = trainer.state
    cov = build_cov3d(gs.scales, gs.quats)
    rgb = sh_to_rgb(3, gs.sh, gs.means, cam.cam_center)
    if stage == "0":
        payload, fbg = rgb, trainer.bg
    else:
        payload = jnp.concatenate(
            [rgb, encoded_ins_feat(gs, quant, origin_feat=False)], axis=-1
        )
        fbg = jnp.concatenate([trainer.bg] * 3)
    img, alpha, _d, _r, _l = render_sharded(
        trainer.mesh, cam, gs.means, cov, gs.opacity, payload, fbg,
        trainer.rcfg,
    )
    out = RenderOutputs(render=img[..., :3], alpha=alpha)
    if stage != "0":
        out = _dc.replace(out, ins_feat=img[..., 3:9], silhouette=alpha)
    return out


def dump_intermediate(trainer, it: int, stage: str, view_idx: int):
    """Save the reference's train_process/ artifact set for one view."""
    import jax.numpy as jnp

    from opengaussian_tpu.ops import kmeans as km
    from opengaussian_tpu.render import render

    b = trainer.bundle
    base = os.path.join(trainer.out_dir, "train_process")
    cam = b.camera(view_idx)
    orig_view = view_idx  # pseudo labels are indexed by the ORIGINAL view id
    if trainer.save_memory:
        from opengaussian_tpu.train.loop import bundle_window

        b = bundle_window(trainer.bundle, view_idx)
        cam = b.camera(0)
        view_idx = 0

    quant = None
    if stage == "2.1":
        quant = km.quantize(trainer.kms, trainer.state.ins_feat, "root")
    elif stage == "2.2":
        quant = km.quantize(trainer.kms, trainer.state.ins_feat, "leaf")
    if trainer.mesh is not None:
        # gather-free twin: one fused RGB(+feat) pass through the sharded
        # renderer instead of pulling the state to a single device
        out = _render_sharded_dump(trainer, cam, stage, quant)
    else:
        out = render(
            cam, trainer.state, trainer.bg, 3, trainer.rcfg,
            render_color=True, render_feat_map=stage != "0",
            quantized_feat=quant,
        )
    tag = f"{it:05d}"
    _save_png(os.path.join(base, "gt", tag + ".png"),
              np.asarray(b.gt_images[view_idx]))
    _save_png(os.path.join(base, "renders", tag + ".png"),
              np.asarray(out.render))
    if stage == "0":
        return
    sub = {"1": "stage1", "2.1": "stage2_1", "2.2": "stage2_2"}[stage]
    feat = np.asarray(out.ins_feat)
    _save_png(os.path.join(base, sub, "ins_feat", tag + ".png"), feat[..., :3])
    _save_png(os.path.join(base, sub, "ins_feat2", tag + ".png"), feat[..., 3:6])
    if stage != "1":
        _save_png(os.path.join(base, sub, "silhouette", tag + ".png"),
                  np.asarray(out.silhouette))
    sam = np.asarray(b.sam_ids[view_idx])
    if sam.max() > 0:
        pal = mask_palette(int(sam.max()))
        lvl = trainer.cfg.opt.sam_level
        _save_png(
            os.path.join(base, sub, f"gt_sam_mask_{lvl}", tag + ".png"),
            pal[sam] / 255.0,
        )
    if trainer.pseudo is not None:
        pf = np.asarray(trainer.pseudo.feat[orig_view])
        pdir = os.path.join(base, sub, "pseudo_ins_feat")
        _save_png(os.path.join(pdir, tag + "_1.png"), pf[..., :3])
        _save_png(os.path.join(pdir, tag + "_2.png"), pf[..., 3:6])


def tb_image_grids(trainer, images: list, gts: list, split: str,
                   first_test: bool):
    """TB image grids for up to 5 eval views (reference train.py:976-984)."""
    if trainer.tb is None:
        return
    for i, (img, gt) in enumerate(zip(images[:5], gts[:5])):
        arr = np.clip(np.asarray(img), 0, 1).transpose(2, 0, 1)[None]
        trainer.tb.add_images(f"{split}_view_{i}/render", arr,
                              global_step=trainer.iteration)
        if first_test:
            gt_arr = np.clip(np.asarray(gt), 0, 1).transpose(2, 0, 1)[None]
            trainer.tb.add_images(f"{split}_view_{i}/ground_truth", gt_arr,
                                  global_step=trainer.iteration)
