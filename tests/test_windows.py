"""Tile windowing (tile_windows / window_depth) — deep tiles on a shallow K.

The r5 deep-scene redesign: instead of growing max_per_tile to the deepest
tile (Mosaic compile cliffs beyond K~1024 and every tile's stream DMA moves
a full K-row window), the stream path splits deep tiles into consecutive
virtual tiles of <= K slots and composites them exactly outside the kernel
((a,T) o (a',T') = (a + T a', T T'), rasterize._fold_windows). These tests
pin exactness against the dense XLA blend at full depth, gradient flow
through the fold, truncation accounting, the tuner's window decision, and
the banded+windowed mesh combination.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.models.gaussians import create_from_pcd
from opengaussian_tpu.ops import budget
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from tests.test_rasterize import make_cam, random_scene

DEEP = RasterizeConfig(backend="xla", max_per_tile=768, chunk=32,
                       min_intersections=65536)
WIN = RasterizeConfig(backend="pallas", max_per_tile=64, chunk=32,
                      min_intersections=65536, tile_windows=12)


def deep_scene(n=500, seed=0):
    """Most splats concentrated on a few tiles -> per-tile depth ~n/4."""
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.normal(0, 0.08, n), rng.normal(0, 0.06, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    scales = np.exp(rng.normal(-3.0, 0.3, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    op = rng.uniform(0.05, 0.6, n).astype(np.float32)  # translucent: the
    # blend reaches deep slots before saturating
    pay = rng.uniform(size=(n, 3)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, quats, op, pay)))


def test_windowed_matches_dense_deep():
    means, scales, quats, op, pay = deep_scene()
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cam = make_cam(96, 64)
    ref = rasterize(cam, means, cov, op, pay, bg, DEEP)
    assert int(ref.n_truncated) == 0  # the dense config really covers it
    out = rasterize(cam, means, cov, op, pay, bg, WIN)
    assert int(out.n_truncated) == 0 and int(out.n_dropped) == 0
    # windows apply the T < 1e-4 early-stop to window-LOCAL transmittance:
    # the result sits between the reference-cutoff blend and the exact
    # uncut blend, within T_EPS = 1e-4 of either (see RasterizeConfig)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=6e-4, rtol=1e-3)


def test_windowed_matches_dense_sparse_scene():
    """A scene with NO deep tiles must be bit-equal through the window
    machinery (every tile gets one window)."""
    means, scales, quats, op, cols = random_scene(256, seed=1)
    cov = build_cov3d(scales, quats)
    bg = jnp.zeros(3)
    cam = make_cam(80, 64)
    cfg_p = dataclasses.replace(WIN, max_per_tile=256, tile_windows=4)
    cfg_r = dataclasses.replace(cfg_p, tile_windows=0)
    a = rasterize(cam, means, cov, op, cols, bg, cfg_p)
    b = rasterize(cam, means, cov, op, cols, bg, cfg_r)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.alpha), np.asarray(b.alpha),
                               atol=1e-6)


def test_windowed_gradients_match_dense():
    means, scales, quats, op, pay = deep_scene(n=300, seed=2)
    cov = build_cov3d(scales, quats)
    bg = jnp.zeros(3)
    cam = make_cam(64, 48)
    tgt = jnp.asarray(
        np.random.default_rng(1).uniform(size=(48, 64, 3)).astype(np.float32))

    def loss(inputs, cfg):
        m, o, p = inputs
        r = rasterize(cam, m, cov, o, p, bg, cfg)
        return jnp.sum(jnp.abs(r.image - tgt)) + jnp.sum(r.alpha)

    lw, gw = jax.value_and_grad(loss)((means, op, pay), WIN)
    ld, gd = jax.value_and_grad(loss)((means, op, pay), DEEP)
    # loss/grad gaps bounded by the windowed cutoff deviation (T_EPS-scale
    # per pixel; see RasterizeConfig.tile_windows)
    np.testing.assert_allclose(float(lw), float(ld), rtol=1e-3)
    for a, b, name in zip(gw, gd, ("means", "opac", "payload")):
        sc = float(jnp.abs(b).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   atol=2e-3, err_msg=f"grad: {name}")


def test_window_truncation_accounted():
    """Too few windows must surface in n_truncated (the trainer's re-probe
    trigger), never silently."""
    means, scales, quats, op, pay = deep_scene()
    cov = build_cov3d(scales, quats)
    cfg = dataclasses.replace(WIN, tile_windows=2)  # 2*64 << the deep need
    out = rasterize(make_cam(96, 64), means, cov, op, pay, jnp.zeros(3), cfg)
    assert int(out.n_truncated) > 0


def test_tuner_prefers_windows_over_deep_k(monkeypatch):
    """tuned_config on a deep scene with the stream backend caps K at
    WINDOW_K and allocates windows instead."""
    monkeypatch.setattr(budget, "WINDOW_K", 128)  # CPU-scale stand-in
    means, scales, quats, op, pay = deep_scene(n=800, seed=3)
    st = create_from_pcd(np.asarray(means), np.asarray(pay),
                         capacity=800, seed=0)
    st = dataclasses.replace(
        st, log_scales=jnp.log(scales), quats=quats,
        logit_opacity=jnp.log(op) - jnp.log1p(-op))
    base = RasterizeConfig(backend="pallas", max_per_tile=2048, chunk=32,
                           min_intersections=65536)
    cfg = budget.tuned_config(base, st, [make_cam(96, 64)])
    assert cfg.max_per_tile == 128
    assert cfg.tile_windows >= 2
    cov = build_cov3d(st.scales, st.quats)
    out = rasterize(make_cam(96, 64), st.means, cov, st.opacity, pay,
                    jnp.zeros(3), cfg)
    assert int(out.n_truncated) == 0 and int(out.n_dropped) == 0


def test_banded_plus_windowed_mesh():
    from opengaussian_tpu.parallel.mesh import make_mesh, shard_gaussians
    from opengaussian_tpu.parallel.render import render_sharded

    assert jax.device_count() == 8
    mesh = make_mesh(8)
    cam = make_cam(96, 64)
    means, scales, quats, op, pay = deep_scene(n=400, seed=4)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray([0.3, 0.2, 0.1])
    ref = rasterize(cam, means, cov, op, pay, bg, DEEP)
    cfg = dataclasses.replace(WIN, band_intersection_budget=32768)
    sh = shard_gaussians(mesh, (means, cov, op, pay))
    img, alpha, depth, radii, n_lost = jax.jit(
        lambda m, c, o, p: render_sharded(mesh, cam, m, c, o, p, bg, cfg)
    )(*sh)
    assert int(n_lost) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=2e-4)
