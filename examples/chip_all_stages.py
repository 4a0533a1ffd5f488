"""All-five-stage trainer smoke on the REAL chip.

Runs the full stage machine (0 -> 1 -> 2.1 -> 2.2 -> 3) on a tiny synthetic
COLMAP scene with SAM/CLIP sidecars, through the production TPU kernels —
the stages >= 1 exercise the 7-channel feature payload path the RGB-only
bench does not.

Measured on a TPU v5e (2026-08): all stages execute, eval PSNR finite,
stage-3 writes cluster_lang.npz. Run: PYTHONPATH=.:tests python
examples/chip_all_stages.py  (or via a sys.path wrapper under axon, where
PYTHONPATH can break the platform plugin).
"""
import sys, tempfile, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import numpy as np
from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
from opengaussian_tpu.data import dataset
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.train.loop import Trainer
from test_data import make_colmap_scene

root = tempfile.mkdtemp()
make_colmap_scene(root, n_views=5)
scene = dataset.load_scene(root)
tiny = OptimizationConfig(
    iterations=60, start_ins_feat_iter=15, start_root_cb_iter=30,
    start_leaf_cb_iter=45, densify_from_iter=5, densify_until_iter=12,
    densification_interval=5, opacity_reset_interval=1000,
    root_node_num=4, leaf_node_num=3, leaf_update_fr=5, sam_level=3,
)
out = tempfile.mkdtemp()
tr = Trainer(scene, Config(model=ModelConfig(), opt=tiny), out,
             rcfg=RasterizeConfig(max_per_tile=128, chunk=32,
                                  min_intersections=8192),
             autotune_budgets=False)
tr.train(until=60, log_every=15)
m = tr.evaluate()
print("stages seen:", sorted({h["stage"] for h in tr.history}))
print("final eval:", m)
r = tr.run_stage3()
print("stage3 result keys:", sorted(r.keys()) if isinstance(r, dict) else type(r))
assert {"0", "1", "2.1", "2.2"} <= {h["stage"] for h in tr.history}
assert np.isfinite(m["psnr"]) and m["psnr"] > 5
assert os.path.exists(os.path.join(out, "cluster_lang.npz"))
print("ALL STAGES ON CHIP OK")
