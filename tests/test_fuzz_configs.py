"""Config-fuzz parity: random scenes x random static budgets/odd image sizes
must agree between the XLA blend, the Pallas stream kernels (both backward
layouts), and the slow oracle. Catches budget-edge and padding bugs the
fixed-config tests never reach (last-chunk masks, non-multiple-of-16 images,
tiny per-tile caps that truncate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.ops.oracle import rasterize_oracle
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from tests.test_rasterize import make_cam, random_scene

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_fuzzed_config_parity(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 200))
    w = int(rng.integers(17, 80))
    h = int(rng.integers(17, 64))
    chunk = int(rng.choice([16, 32, 64]))
    kmul = int(rng.integers(2, 6))
    cam = make_cam(w, h)
    means, scales, quats, op, cols = random_scene(n, seed=seed)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray(rng.uniform(0, 1, 3).astype(np.float32))

    base = RasterizeConfig(max_per_tile=chunk * kmul, chunk=chunk,
                           min_intersections=8192, backend="xla")
    ref = rasterize(cam, means, cov, op, cols, bg, base)
    if int(ref.n_dropped) or int(ref.n_truncated):
        # budget too small for this draw: truncation must be flagged, not
        # silent — and all backends must agree on the flag
        pal = rasterize(cam, means, cov, op, cols, bg,
                        dataclasses.replace(base, backend="pallas"))
        assert int(pal.n_dropped) == int(ref.n_dropped)
        assert int(pal.n_truncated) == int(ref.n_truncated)
        return

    oracle = rasterize_oracle(cam, means, cov, op, cols, bg=bg)
    np.testing.assert_allclose(np.asarray(ref.image),
                               np.asarray(oracle["image"]),
                               atol=3e-5, rtol=1e-4)

    target = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))

    def grads(cfg):
        def loss(means, op, cols):
            out = rasterize(cam, means, cov, op, cols, bg, cfg)
            return jnp.sum((out.image - target) ** 2) + 0.03 * jnp.sum(out.alpha)
        return jax.grad(loss, argnums=(0, 1, 2))(means, op, cols)

    g_ref = grads(base)
    for layout in ("dense", "compact"):
        cfg = dataclasses.replace(base, backend="pallas", bwd_layout=layout)
        out = rasterize(cam, means, cov, op, cols, bg, cfg)
        np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                                   atol=3e-5, rtol=1e-4, err_msg=layout)
        for name, a, b in zip(("means", "op", "cols"), g_ref, grads(cfg)):
            a, b = np.asarray(a), np.asarray(b)
            s = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / s, a / s, atol=1e-3,
                                       err_msg=f"{layout}:{name}")


def test_banded_gradients_compact_layout():
    """rasterize_banded gradients (per-band custom VJP with nonzero tile
    offsets) must match the single-pass XLA gradients under the Pallas
    stream kernels with the compact backward layout — the one path where
    the compact writer runs with tile_lo > 0."""
    from opengaussian_tpu.ops.rasterize import rasterize_banded

    cam = make_cam(64, 64)
    means, scales, quats, op, cols = random_scene(150, seed=20)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    target = jnp.asarray(
        np.random.default_rng(20).uniform(size=(64, 64, 3)).astype(np.float32)
    )
    base = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=16384,
                           backend="xla")
    pcfg = dataclasses.replace(base, backend="pallas", bwd_layout="compact")

    def loss_single(means, op, cols):
        out = rasterize(cam, means, cov, op, cols, bg, base)
        return jnp.sum((out.image - target) ** 2) + 0.05 * jnp.sum(out.alpha)

    def loss_banded(means, op, cols):
        out = rasterize_banded(cam, means, cov, op, cols, bg, pcfg, bands=3)
        return jnp.sum((out.image - target) ** 2) + 0.05 * jnp.sum(out.alpha)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(means, op, cols)
    g_band = jax.grad(loss_banded, argnums=(0, 1, 2))(means, op, cols)
    for name, a, b in zip(("means", "op", "cols"), g_ref, g_band):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / s, a / s, atol=1e-3, err_msg=name)
