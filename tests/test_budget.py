"""Budget auto-tuning (ops/budget.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models.gaussians import create_from_pcd
from opengaussian_tpu.ops import budget
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from opengaussian_tpu.ops.projection import build_cov3d


def small_scene(n=400):
    rng = np.random.default_rng(3)
    pts = np.stack([rng.normal(0, 0.4, n), rng.normal(0, 0.3, n),
                    rng.uniform(2, 5, n)], -1).astype(np.float32)
    st = create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
                         capacity=n, seed=0)
    return dataclasses.replace(
        st, log_scales=jnp.full_like(st.log_scales, np.log(0.05)),
        logit_opacity=jnp.asarray(rng.normal(0, 1, n).astype(np.float32)),
    )


def test_tuned_config_shrinks_and_stays_exact():
    st = small_scene()
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 160, 120)
    base = RasterizeConfig(max_per_tile=512, chunk=32, min_intersections=4096)
    tuned = budget.tuned_config(base, st, [cam])
    assert tuned.max_per_tile <= base.max_per_tile
    assert tuned.max_intersections(st.capacity) <= base.max_intersections(st.capacity)
    cov = build_cov3d(st.scales, st.quats)
    pay = jnp.concatenate([st.sh_dc[:, 0], st.ins_feat[:, :0]], axis=-1)
    full = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), base)
    tun = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), tuned)
    assert int(tun.n_dropped) == 0 and int(tun.n_truncated) == 0
    np.testing.assert_allclose(np.asarray(tun.image), np.asarray(full.image),
                               rtol=1e-6, atol=1e-6)
