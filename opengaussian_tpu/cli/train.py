"""Training CLI.

Equivalent of `python train.py` in the reference (reference train.py:1029-1064)
with the same flag names where they exist; per-scene presets via --preset.

Example:
    python -m opengaussian_tpu.cli.train -s /data/lerf_ovs/teatime -m out/teatime \
        --preset lerf/teatime --test_iterations 30000
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train OpenGaussian-TPU")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", default="")
    p.add_argument("--images", default="images")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--preset", default=None, help="config preset, e.g. lerf/teatime")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--start_ins_feat_iter", type=int, default=None)
    p.add_argument("--start_root_cb_iter", type=int, default=None)
    p.add_argument("--start_leaf_cb_iter", type=int, default=None)
    p.add_argument("--root_node_num", type=int, default=None)
    p.add_argument("--leaf_node_num", type=int, default=None)
    p.add_argument("--pos_weight", type=float, default=None)
    p.add_argument("--loss_weight", type=float, default=None)
    p.add_argument("--sam_level", type=int, default=None)
    p.add_argument("--frozen_init_pts", action="store_true", default=None)
    p.add_argument("--save_memory", action="store_true", default=None)
    p.add_argument("--lazy_load", action="store_true",
                   help="decode view pixels/sidecars from disk on access "
                        "(host RSS holds ~1 view, not V); implies "
                        "--save_memory")
    p.add_argument("--enable_multiview_sam_refinement", action="store_true",
                   default=None)
    p.add_argument("--random_background", action="store_true", default=None)
    p.add_argument("--leaf_update_fr", type=int, default=None)
    p.add_argument("--lambda_dssim", type=float, default=None)
    p.add_argument("--percent_dense", type=float, default=None)
    p.add_argument("--densification_interval", type=int, default=None)
    p.add_argument("--opacity_reset_interval", type=int, default=None)
    p.add_argument("--densify_from_iter", type=int, default=None)
    p.add_argument("--densify_until_iter", type=int, default=None)
    p.add_argument("--densify_grad_threshold", type=float, default=None)
    p.add_argument("--position_lr_init", type=float, default=None)
    p.add_argument("--position_lr_final", type=float, default=None)
    p.add_argument("--feature_lr", type=float, default=None)
    p.add_argument("--ins_feat_lr", type=float, default=None)
    p.add_argument("--opacity_lr", type=float, default=None)
    p.add_argument("--scaling_lr", type=float, default=None)
    p.add_argument("--rotation_lr", type=float, default=None)
    p.add_argument("--test_iterations", nargs="+", type=int, default=[30_000])
    p.add_argument("--save_iterations", nargs="+", type=int, default=None)
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard training over N devices (0 = single device)")
    p.add_argument("--port", type=int, default=0,
                   help="SIBR remote-viewer TCP port (0 = viewer off, like "
                        "the reference's disabled network_gui)")
    p.add_argument("--disable_intermediate_dumps", action="store_true",
                   help="skip the periodic train_process/ PNG dumps")
    return p


def main(argv=None):
    from opengaussian_tpu.config import PRESETS, Config, ModelConfig
    from opengaussian_tpu.data.dataset import load_scene
    from opengaussian_tpu.train.loop import Trainer

    args = build_parser().parse_args(argv)
    cfg = PRESETS.get(args.preset, Config()) if args.preset else Config()
    opt_over = {
        k: getattr(args, k)
        for k in (
            "iterations", "start_ins_feat_iter", "start_root_cb_iter",
            "start_leaf_cb_iter", "root_node_num", "leaf_node_num",
            "pos_weight", "loss_weight", "sam_level", "frozen_init_pts",
            "save_memory", "enable_multiview_sam_refinement",
            "random_background", "leaf_update_fr", "lambda_dssim",
            "percent_dense", "densification_interval",
            "opacity_reset_interval", "densify_from_iter",
            "densify_until_iter", "densify_grad_threshold",
            "position_lr_init", "position_lr_final", "feature_lr",
            "ins_feat_lr", "opacity_lr", "scaling_lr", "rotation_lr",
        )
        if getattr(args, k) is not None
    }
    if args.lazy_load:
        # lazy views require host-resident bundles (one-view device window)
        opt_over["save_memory"] = True
    cfg = Config(
        model=ModelConfig(
            source_path=args.source_path,
            model_path=args.model_path,
            images=args.images,
            resolution=args.resolution,
            white_background=args.white_background,
            eval=args.eval,
        ),
        opt=dataclasses.replace(cfg.opt, **opt_over),
        pipe=cfg.pipe,
    )
    out_dir = args.model_path or os.path.join("output", os.path.basename(args.source_path))

    print(f"Loading scene {args.source_path} ...", flush=True)
    scene = load_scene(
        args.source_path, args.images, args.white_background, args.eval,
        args.resolution, lazy=args.lazy_load,
    )
    print(
        f"{len(scene.train_views)} train / {len(scene.test_views)} test views, "
        f"{len(scene.points)} init points, extent {scene.cameras_extent:.2f}",
        flush=True,
    )
    mesh = None
    if args.mesh:
        from opengaussian_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)
        print(f"Sharding over {args.mesh} devices: {mesh}", flush=True)
    tr = Trainer(scene, cfg, out_dir, seed=args.seed, mesh=mesh)
    if args.port:
        tr.viewer_port = args.port
    if args.disable_intermediate_dumps:
        tr.save_intermediate = False
    if args.start_checkpoint:
        tr.restore_checkpoint(args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at iteration {tr.iteration}")

    o = cfg.opt
    save_iters = args.save_iterations or [o.start_ins_feat_iter, o.start_root_cb_iter,
                                          o.start_leaf_cb_iter, o.iterations]
    milestones = sorted(
        set(args.test_iterations) | set(save_iters) | set(args.checkpoint_iterations)
        | {o.iterations}
    )
    for ms in milestones:
        if ms <= tr.iteration:
            continue
        tr.train(until=min(ms, o.iterations))
        if ms in args.test_iterations:
            m = tr.evaluate()
            print(f"[ITER {tr.iteration}] eval PSNR {m['psnr']:.2f} L1 {m['l1']:.4f}")
        if ms in save_iters:
            print(f"[ITER {tr.iteration}] saving gaussians")
            tr.save()
        if ms in args.checkpoint_iterations:
            tr.save_checkpoint()
        if tr.iteration >= o.iterations:
            break

    if o.iterations > o.start_leaf_cb_iter:
        print("[Stage 3] language feature association ...", flush=True)
        tr.run_stage3()
    print("Training complete.")


if __name__ == "__main__":
    main()
