import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from tests.test_rasterize import make_cam, random_scene

XLA = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=16384, backend="xla")
PALLAS = dataclasses.replace(XLA, backend="pallas")


@pytest.mark.parametrize("seed,n", [(0, 60), (1, 300)])
def test_pallas_forward_matches_xla(seed, n):
    cam = make_cam(64, 48)
    means, scales, quats, op, cols = random_scene(n, seed=seed)
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.2, 0.1, 0.4])
    a = rasterize(cam, means, cov, op, cols, bg, XLA)
    b = rasterize(cam, means, cov, op, cols, bg, PALLAS)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha), atol=3e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=3e-4, rtol=1e-4)


def test_pallas_multichannel():
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(100, seed=2, channels=9)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray(np.linspace(0, 1, 9).astype(np.float32))
    a = rasterize(cam, means, cov, op, cols, bg, XLA)
    b = rasterize(cam, means, cov, op, cols, bg, PALLAS)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("bwd_layout", ["dense", "compact"])
def test_pallas_gradients_match_xla(bwd_layout):
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(120, seed=3)
    bg = jnp.array([0.1, 0.3, 0.2])
    target = jnp.asarray(
        np.random.default_rng(4).uniform(size=(32, 48, 3)).astype(np.float32)
    )

    def make_loss(cfg):
        def loss(means, scales, quats, op, cols):
            out = rasterize(cam, means, build_cov3d(scales, quats), op, cols, bg, cfg)
            return (
                jnp.sum((out.image - target) ** 2)
                + 0.05 * jnp.sum(out.alpha)
                + 0.01 * jnp.sum(out.depth)
            )
        return loss

    pallas = dataclasses.replace(PALLAS, bwd_layout=bwd_layout)
    args = (means, scales, quats, op, cols)
    g_xla = jax.grad(make_loss(XLA), argnums=tuple(range(5)))(*args)
    g_pal = jax.grad(make_loss(pallas), argnums=tuple(range(5)))(*args)
    for name, a, b in zip(("means", "scales", "quats", "op", "cols"), g_xla, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=1e-3, err_msg=f"grad mismatch: {name}"
        )


def test_compact_bwd_early_termination_and_sorted_reduce():
    """Stacked opaque splats early-stop most tiles mid-chunk-list — the
    compact layout must zero-write the skipped live chunks (unwritten
    garbage there would alias real splat ids). Also crosses the compact
    layout with the sorted_mxu reduction so both new backward paths compose."""
    cam = make_cam(32, 32)
    n = 80
    rng = np.random.default_rng(5)
    means = jnp.asarray(
        np.stack([rng.normal(0, 0.05, n), rng.normal(0, 0.05, n),
                  np.linspace(2, 4, n)], -1).astype(np.float32)
    )
    scales = jnp.full((n, 3), 0.3)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    op = jnp.full((n,), 0.97)
    cols = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))

    def make_loss(cfg):
        def loss(means, op, cols):
            out = rasterize(cam, means, build_cov3d(scales, quats), op, cols,
                            jnp.zeros(3), cfg)
            return jnp.sum((out.image - target) ** 2) + 0.05 * jnp.sum(out.alpha)
        return loss

    g_xla = jax.grad(make_loss(XLA), argnums=(0, 1, 2))(means, op, cols)
    for reduce_backend in ("scatter", "sorted_mxu"):
        cfg = dataclasses.replace(PALLAS, bwd_layout="compact",
                                  reduce_backend=reduce_backend)
        g_pal = jax.grad(make_loss(cfg), argnums=(0, 1, 2))(means, op, cols)
        for name, a, b in zip(("means", "op", "cols"), g_xla, g_pal):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(
                b / scale, a / scale, atol=1e-3,
                err_msg=f"grad mismatch: {name} ({reduce_backend})",
            )


def test_pallas_early_termination_heavy_overdraw():
    """Stacked opaque splats exercise the early-stop/freeze path."""
    cam = make_cam(32, 32)
    n = 80
    rng = np.random.default_rng(5)
    means = jnp.asarray(
        np.stack([rng.normal(0, 0.05, n), rng.normal(0, 0.05, n),
                  np.linspace(2, 4, n)], -1).astype(np.float32)
    )
    scales = jnp.full((n, 3), 0.3)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    op = jnp.full((n,), 0.97)
    cols = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    cov = build_cov3d(scales, quats)
    a = rasterize(cam, means, cov, op, cols, jnp.zeros(3), XLA)
    b = rasterize(cam, means, cov, op, cols, jnp.zeros(3), PALLAS)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image), atol=3e-5)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha), atol=3e-5)


def test_pallas_group_renders_match_xla():
    """Cluster renders vmap the DENSE-layout pallas kernel (the stream
    kernels' manual DMAs do not batch); both layouts must match the XLA
    scan blend."""
    from opengaussian_tpu.ops.rasterize import rasterize_groups

    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(150, seed=5)
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.05, 0.1, 0.15])
    rng = np.random.default_rng(0)
    member = jnp.asarray(rng.integers(0, 3, 150))
    opac_groups = jnp.where(
        member[None, :] == jnp.arange(3)[:, None], op[None, :], 0.0
    )
    a = rasterize_groups(cam, means, cov, opac_groups, cols, bg, XLA)
    b = rasterize_groups(cam, means, cov, opac_groups, cols, bg, PALLAS)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha),
                               atol=3e-5)


def test_sorted_segment_reduce_matches_scatter():
    """The sort+windowed-one-hot-MXU per-splat reduction (the replacement
    for the backward's segment_sum scatter, VERDICT r2 item 1) must match
    jax.ops.segment_sum bit-for-bit-close, including dropped out-of-range
    ids and ids on window boundaries."""
    import numpy as np

    from opengaussian_tpu.ops.rasterize_pallas import (
        WSEG,
        sorted_segment_reduce,
    )

    rng = np.random.default_rng(5)
    for R, n in [(3000, 700), (5000, WSEG * 2), (2000, 33)]:
        rows = jnp.asarray(rng.normal(0, 1, (R, 11)).astype(np.float32))
        # n = the drop sentinel for dead chunks; boundary ids stressed
        ids = rng.integers(0, n + 1, R)
        ids[:50] = np.clip([0, n - 1, WSEG - 1, WSEG, n], 0, n)[
            rng.integers(0, 5, 50)
        ]
        ids = jnp.asarray(ids.astype(np.int32))
        got = sorted_segment_reduce(rows, ids, n)
        want = jax.ops.segment_sum(rows, ids, num_segments=n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
