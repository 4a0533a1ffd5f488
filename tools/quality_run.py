"""Quality-parity artifact run (VERDICT r3 item 8; BASELINE configs[0] proxy).

No LeRF/ScanNet data exists in this environment, so this is the closest
provable stand-in for the reference's trained-scene quality bars
(reference scripts/train_lerf.sh:15, scripts/eval_scannet.py:157-165): a
structured synthetic scene with KNOWN ground truth — 4 colored blob objects,
GT images rendered from a known gaussian scene, per-view SAM masks derived
from the GT object silhouettes, and orthonormal per-object CLIP vectors —
trained through ALL FIVE STAGES, then scored on exactly the reference's
quality axes:

  * stage-0 PSNR on held-out views (image quality bar, metrics.py analog);
  * stage-2.2 loss trajectory (codebook training health);
  * point-level cluster purity of root and leaf codebooks vs the GT object
    of each splat (the ScanNet point-cloud mIoU analog);
  * stage-3 language retrieval: for each object's CLIP vector, does the
    best-scoring leaf's point set belong to that object, and what is the
    2D IoU of its silhouette against the GT object mask on held-out views
    (the LeRF text-query mIoU analog, compute_lerf_iou.py:50-59).

Writes QUALITY_r05.json at the repo root plus a side-by-side PNG.
Run on the chip: python tools/quality_run.py     (~20-40 min, mostly compile)
CPU smoke:       python tools/quality_run.py --fast
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OBJECTS = [  # center, base color
    ((-0.8, -0.5, 4.0), (1.0, 0.25, 0.2)),
    ((0.8, -0.5, 4.2), (0.2, 1.0, 0.3)),
    ((-0.8, 0.5, 3.8), (0.25, 0.4, 1.0)),
    ((0.8, 0.5, 4.0), (1.0, 0.9, 0.2)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="tiny CPU smoke (low iters, low res)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.fast:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data.dataset import Scene, View
    from opengaussian_tpu.models.gaussians import create_from_pcd
    from opengaussian_tpu.ops.projection import build_cov3d
    from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
    from opengaussian_tpu.ops.sh import sh_to_rgb
    from opengaussian_tpu.train.loop import Trainer

    t_start = time.time()
    W, H = (160, 120) if args.fast else (320, 240)
    n_views, n_test = (6, 2) if args.fast else (20, 4)
    n_gt = 600 if args.fast else 2400
    rng = np.random.default_rng(7)

    # -- GT scene with known per-splat object labels
    per = n_gt // len(OBJECTS)
    pts, cols, gt_obj = [], [], []
    for oi, (center, color) in enumerate(OBJECTS):
        p = rng.normal(0, 0.22, (per, 3)) + np.asarray(center)
        pts.append(p)
        cols.append(np.tile(color, (per, 1)) * rng.uniform(0.6, 1.0, (per, 1)))
        gt_obj.append(np.full(per, oi))
    pts = np.concatenate(pts).astype(np.float32)
    cols = np.concatenate(cols).astype(np.float32)
    gt_obj = np.concatenate(gt_obj)
    gt_state = create_from_pcd(pts, cols, capacity=n_gt, seed=1)
    gt_state = dataclasses.replace(
        gt_state,
        log_scales=gt_state.log_scales * 0 + np.log(0.05),
        logit_opacity=jnp.full((n_gt,), 2.5),
    )
    centers = np.asarray([c for c, _ in OBJECTS], np.float32)

    def pose(i, n):
        ang = 0.7 * (i / max(n - 1, 1) - 0.5)
        R = np.array(
            [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
             [np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([0.6 * np.sin(2 * ang), 0.1 * np.cos(3 * ang), 0.0],
                     np.float32)
        return R, t

    rcfg = RasterizeConfig(max_per_tile=256 if args.fast else 512, chunk=64)
    onehot_pay = jnp.asarray(
        (gt_obj[:, None] == np.arange(len(OBJECTS))).astype(np.float32))

    @jax.jit
    def gt_render(cam):
        rgb = sh_to_rgb(3, gt_state.sh, gt_state.means, cam.cam_center)
        cov = build_cov3d(gt_state.scales, gt_state.quats)
        o1 = rasterize(cam, gt_state.means, cov, gt_state.opacity, rgb,
                       jnp.zeros(3), rcfg)
        o2 = rasterize(cam, gt_state.means, cov, gt_state.opacity,
                       onehot_pay, jnp.zeros(len(OBJECTS)), rcfg)
        return o1.image, o2.image, o2.alpha

    views, gt_masks = [], []
    n_obj = len(OBJECTS)
    # CLIP table rows are indexed by ABSOLUTE level-3 mask id (see
    # utils/masks.clip_feat_slice); levels 0-2 are all-zero here so the
    # level-3 slice is rows [1, n_obj+1) — orthonormal unit vectors
    clip = np.zeros((n_obj + 1, 512), np.float32)
    for oi in range(n_obj):
        clip[oi + 1, oi] = 1.0
    for i in range(n_views + n_test):
        R, t = pose(i, n_views + n_test)
        cam = Camera.from_fov(R, t, 1.0, 0.8, W, H)
        img, ow, alpha = gt_render(cam)
        img = np.clip(np.asarray(img), 0, 1).astype(np.float32)
        covered = np.asarray(alpha) > 0.5
        obj = np.asarray(ow).argmax(-1)
        ids = np.where(covered, obj + 1, 0).astype(np.int16)  # 0 = void
        sam = np.zeros((4, H, W), np.int16)
        sam[3] = ids
        views.append(View(camera=cam, image_name=f"v{i:03d}", gt_image=img,
                          sam_mask=sam, clip_feats=clip))
        gt_masks.append(np.where(covered, obj, -1))

    # train/test interleave: every 5th view held out (llffhold style)
    test_idx = set(range(4, n_views + n_test, (n_views + n_test) // n_test))
    train_views = [v for i, v in enumerate(views) if i not in test_idx]
    test_views = [v for i, v in enumerate(views) if i in test_idx]
    test_masks = [gt_masks[i] for i in range(len(views)) if i in test_idx]

    # init: noisy sparse subsample, gray colors
    n_init = 300 if args.fast else 900
    ii = rng.choice(n_gt, n_init, replace=False)
    scene = Scene(
        train_views=train_views, test_views=test_views,
        points=pts[ii] + rng.normal(0, 0.04, (n_init, 3)).astype(np.float32),
        colors=np.full((n_init, 3), 0.5, np.float32),
        cameras_extent=2.0, source_path="synthetic_quality",
    )

    if args.fast:
        it0, it1, it21, it22 = 60, 90, 120, 160
        dense_until, k1, k2 = 40, n_obj, 2
    else:
        it0, it1, it21, it22 = 1400, 1900, 2200, 2600
        dense_until, k1, k2 = 1100, n_obj, 2
    ocfg = OptimizationConfig(
        iterations=it22, start_ins_feat_iter=it0, start_root_cb_iter=it1,
        start_leaf_cb_iter=it21, densify_from_iter=it0 // 4,
        densify_until_iter=dense_until, densification_interval=100,
        opacity_reset_interval=10 ** 6, densify_grad_threshold=0.0004,
        root_node_num=k1, leaf_node_num=k2, sam_level=3,
        leaf_update_fr=max(it22 // 20, 5),
    )
    out_dir = tempfile.mkdtemp(prefix="quality_r04_")
    tr = Trainer(scene, Config(model=ModelConfig(), opt=ocfg), out_dir,
                 rcfg=rcfg)
    print(f"[quality] init PSNR {tr.evaluate()['psnr']:.2f}", flush=True)

    # stage 0 -> PSNR checkpoint, then the rest
    tr.train(until=it0, log_every=max(it0 // 10, 10))
    m0 = tr.evaluate()
    print(f"[quality] stage-0 PSNR {m0['psnr']:.2f} "
          f"pts {int(tr.state.num_alive)}", flush=True)
    tr.train(until=it22, log_every=50)
    m_final = tr.evaluate()
    lang = tr.run_stage3()

    # -- cluster purity vs GT object (nearest blob center per alive splat)
    means = np.asarray(tr.state.means)
    alive = np.asarray(tr.state.alive)
    obj_of = np.argmin(
        ((means[:, None, :] - centers[None]) ** 2).sum(-1), axis=1)

    def purity(cls_ids, n_cls):
        cls = np.asarray(cls_ids)[: len(alive)]
        tot, pure = 0, 0
        for c in range(n_cls):
            m = alive & (cls == c)
            if m.sum() < 3:
                continue
            cnt = np.bincount(obj_of[m], minlength=n_obj)
            pure += cnt.max()
            tot += cnt.sum()
        return float(pure / max(tot, 1))

    root_purity = purity(tr.kms.cls_ids, k1)
    leaf_purity = purity(tr.kms.leaf_cls_ids, k1 * k2)

    # -- language retrieval + silhouette IoU (LeRF text-query analog),
    # scored through the REAL render_by_text path (VERDICT r4 item 2):
    # normalized cosine sim + MIN_OCCU gate + same-root candidate expansion
    # (dist < 0.9) -> union member mask -> KNN outlier removal ->
    # render_selection (better_vis) -> >0.7 silhouette, exactly
    # cli/render_by_text.py == reference render_lerf_by_text.py:102-115.
    from opengaussian_tpu.cli.render_by_text import select_leaves_by_text
    from opengaussian_tpu.ops.knn import statistical_outlier_mask
    from opengaussian_tpu.render import render_selection

    z = np.load(os.path.join(out_dir, "cluster_lang.npz"))
    lang_npz = dict(z)
    leaf_ids_arr = tr.kms.leaf_cls_ids
    leaf_ids_np = np.asarray(leaf_ids_arr)[: len(alive)]
    leaf_centers = np.asarray(tr.kms.leaf_centers)
    retrieval_hits, ious, diag = [], [], []
    for oi in range(n_obj):
        text_feat = clip[oi + 1]  # the object's own CLIP vector
        sel = select_leaves_by_text(text_feat, lang_npz, leaf_centers, k2)
        member = np.isin(leaf_ids_np, sel) & alive
        pts_sel = np.asarray(tr.state.means)[member]
        if len(pts_sel) >= 10:  # KNN statistical outlier removal (post_process)
            keep = statistical_outlier_mask(pts_sel)
            idxs = np.flatnonzero(member)
            member[idxs[~keep]] = False
        comp = np.bincount(obj_of[member], minlength=n_obj)
        hit = bool(member.sum() >= 3 and comp.argmax() == oi)
        retrieval_hits.append(hit)
        diag.append(dict(object=oi, selected_leaves=sel.tolist(),
                         n_points=int(member.sum()),
                         composition=comp.tolist(),
                         occu=[float(lang_npz["occu_count"][s]) for s in sel]))
        member_j = jnp.asarray(member)
        for tv, gt_m in zip(test_views, test_masks):
            out = render_selection(tv.camera, tr.state, jnp.ones(3),
                                   member_j, rcfg)
            sil = np.asarray(out.cluster_silhouettes) > 0.7
            gt_sil = gt_m == oi
            inter = (sil & gt_sil).sum()
            union = (sil | gt_sil).sum()
            ious.append(float(inter / max(union, 1)))

    traj = [dict(iteration=h["iteration"], loss=h["loss"],
                 root_id=h.get("root_id", -1))
            for h in tr.history if h["stage"] == "2.2"]
    # per-root disaggregation: stage 2.2 trains ONE root per step
    # (round-robin), so the flat trajectory reads as oscillation; per root
    # it is monotone-ish and codebook health becomes legible
    per_root = {}
    for h in traj:
        per_root.setdefault(h["root_id"], []).append(h["loss"])
    root_loss_table = {
        str(r): dict(n=len(v), first=round(v[0], 4), last=round(v[-1], 4),
                     mean=round(float(np.mean(v)), 4))
        for r, v in sorted(per_root.items())
    }
    result = dict(
        workload=dict(width=W, height=H, n_train=len(train_views),
                      n_test=len(test_views), n_gt_splats=n_gt,
                      objects=n_obj, k1=k1, k2=k2, iters=it22,
                      fast=bool(args.fast)),
        device=str(jax.devices()[0]),
        stage0_psnr=round(float(m0["psnr"]), 3),
        final_psnr=round(float(m_final["psnr"]), 3),
        final_l1=round(float(m_final["l1"]), 5),
        num_alive=int(tr.state.num_alive),
        stage22_loss_trajectory=traj,
        stage22_per_root_loss=root_loss_table,
        root_cluster_purity=round(root_purity, 4),
        leaf_cluster_purity=round(leaf_purity, 4),
        text_retrieval_acc=round(float(np.mean(retrieval_hits)), 3),
        text_query_miou=round(float(np.mean(ious)), 4),
        retrieval_diagnostics=diag,
        wall_s=round(time.time() - t_start, 1),
    )
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUALITY_r05.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)

    # side-by-side eyeball artifact
    from PIL import Image

    from opengaussian_tpu.train.loop import eval_view

    img, _p, _ = eval_view(tr.state, tr.test_bundle, jnp.int32(0), tr.bg,
                           tr.rcfg)
    side = np.concatenate([np.asarray(img), test_views[0].gt_image], axis=1)
    png = os.path.splitext(out_path)[0] + "_side_by_side.png"
    Image.fromarray((np.clip(side, 0, 1) * 255).astype(np.uint8)).save(png)
    print(f"wrote {out_path} and {png}", flush=True)


if __name__ == "__main__":
    main()
