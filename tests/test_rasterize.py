import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.oracle import rasterize_oracle
from opengaussian_tpu.ops.projection import build_cov3d, project
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize

# tight_radius off: the oracle uses the classic 3-sigma rect, so radii
# match exactly; a separate test checks image equality with tight_radius on
CFG = RasterizeConfig(max_per_tile=512, chunk=32, min_intersections=16384,
                      tight_radius=False)


def random_scene(n, seed=0, spread=0.6, zmin=2.0, zmax=6.0, channels=3):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.normal(scale=spread, size=n),
            rng.normal(scale=spread, size=n),
            rng.uniform(zmin, zmax, size=n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.normal(-2.5, 0.4, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    op = rng.uniform(0.1, 0.95, size=n).astype(np.float32)
    cols = rng.uniform(size=(n, channels)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, quats, op, cols)))


def make_cam(w=80, h=60):
    return Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, w, h)


def test_binning_counts_match_rects():
    cam = make_cam()
    means, scales, quats, op, cols = random_scene(50, seed=1)
    proj = project(means, build_cov3d(scales, quats), cam)
    gx, gy = (cam.width + 15) // 16, (cam.height + 15) // 16
    bins = bin_gaussians(proj, gx, gy, 8192, 256)
    assert int(bins.n_dropped) == 0 and int(bins.n_truncated) == 0
    assert int(bins.total) == int(jnp.sum(proj.num_tiles))
    # total entries in the gather matrix == total intersections
    assert int(jnp.sum(bins.counts)) == int(bins.total)
    # every tile's splats must actually cover that tile, sorted by depth
    counts = np.asarray(bins.counts)
    idx = np.asarray(bins.gauss_idx)
    rmin = np.asarray(proj.rect_min)
    rmax = np.asarray(proj.rect_max)
    depth = np.asarray(proj.depth)
    for t in range(gx * gy):
        k = counts[t]
        if k == 0:
            continue
        tx, ty = t % gx, t // gx
        g = idx[t, :k]
        assert (rmin[g, 0] <= tx).all() and (tx < rmax[g, 0]).all()
        assert (rmin[g, 1] <= ty).all() and (ty < rmax[g, 1]).all()
        assert (np.diff(depth[g]) >= 0).all()


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 200), (2, 500)])
def test_forward_matches_oracle(seed, n):
    cam = make_cam()
    means, scales, quats, op, cols = random_scene(n, seed=seed)
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.3, 0.1, 0.6])
    ref = rasterize_oracle(cam, means, cov, op, cols, bg)
    out = rasterize(cam, means, cov, op, cols, bg, CFG)
    assert int(out.n_dropped) == 0 and int(out.n_truncated) == 0
    np.testing.assert_allclose(out.image, ref["image"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.alpha, ref["alpha"], atol=2e-5)
    np.testing.assert_allclose(out.depth, ref["depth"], atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(out.radii, ref["radii"])


def test_forward_multichannel_payload():
    """C-channel payload in one pass == per-3-channel oracle renders."""
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(100, seed=3, channels=9)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray(np.linspace(0.0, 1.0, 9).astype(np.float32))
    out = rasterize(cam, means, cov, op, cols, bg, CFG)
    for i in range(3):
        ref = rasterize_oracle(
            cam, means, cov, op, cols[:, 3 * i : 3 * i + 3], bg[3 * i : 3 * i + 3]
        )
        np.testing.assert_allclose(
            out.image[..., 3 * i : 3 * i + 3], ref["image"], atol=2e-5, rtol=1e-4
        )


def test_gradients_match_oracle():
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(120, seed=4)
    bg = jnp.array([0.2, 0.4, 0.1])
    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.uniform(size=(32, 48, 3)).astype(np.float32))

    def loss_fast(means, scales, quats, op, cols):
        out = rasterize(cam, means, build_cov3d(scales, quats), op, cols, bg, CFG)
        return (
            jnp.sum((out.image - target) ** 2)
            + 0.05 * jnp.sum(out.alpha)
            + 0.01 * jnp.sum(out.depth)
        )

    def loss_ref(means, scales, quats, op, cols):
        o = rasterize_oracle(cam, means, build_cov3d(scales, quats), op, cols, bg)
        return (
            jnp.sum((o["image"] - target) ** 2)
            + 0.05 * jnp.sum(o["alpha"])
            + 0.01 * jnp.sum(o["depth"])
        )

    args = (means, scales, quats, op, cols)
    g_fast = jax.grad(loss_fast, argnums=tuple(range(5)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for name, a, b in zip(("means", "scales", "quats", "op", "cols"), g_fast, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
        )


def test_tight_radius_image_exact():
    """The opacity-aware cutoff radius must not change a single pixel (it
    only removes splat-tile pairs whose alpha is provably < 1/255)."""
    import dataclasses

    cam = make_cam()
    means, scales, quats, op, cols = random_scene(300, seed=9)
    op = op * 0.5  # plenty of translucent splats
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.1, 0.2, 0.3])
    loose = rasterize(cam, means, cov, op, cols, bg, CFG)
    tight = rasterize(cam, means, cov, op, cols, bg,
                      dataclasses.replace(CFG, tight_radius=True))
    np.testing.assert_allclose(np.asarray(tight.image), np.asarray(loose.image),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tight.alpha), np.asarray(loose.alpha),
                               atol=1e-6)
    # and it does reduce work
    assert int(jnp.sum(tight.radii)) < int(jnp.sum(loose.radii))


def test_screen_tap_gradient_flows():
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(60, seed=6)
    tap = jnp.zeros((60, 2))

    def loss(tap):
        out = rasterize(
            cam, means, build_cov3d(scales, quats), op, cols,
            jnp.zeros(3), CFG, screen_tap=tap,
        )
        return jnp.sum(out.image**2)

    g = np.asarray(jax.grad(loss)(tap))
    assert np.isfinite(g).all()
    assert (np.abs(g).sum(axis=-1) > 0).any()


def test_jit_and_truncation_budgets():
    """Tiny budgets must not crash and must report drops."""
    cam = make_cam(32, 32)
    means, scales, quats, op, cols = random_scene(300, seed=7, spread=0.1)
    cfg = RasterizeConfig(max_per_tile=32, chunk=32, min_intersections=256,
                          intersection_multiple=1)
    f = jax.jit(
        lambda m, s, q, o, c: rasterize(cam, m, build_cov3d(s, q), o, c, jnp.zeros(3), cfg)
    )
    out = f(means, scales, quats, op, cols)
    assert np.isfinite(np.asarray(out.image)).all()
    assert int(out.n_truncated) > 0 or int(out.n_dropped) > 0


def test_banded_matches_single_pass():
    """rasterize_banded must be pixel-exact vs the single-pass render."""
    from opengaussian_tpu.ops.rasterize import rasterize_banded

    cam = make_cam(96, 80)
    means, scales, quats, op, cols = random_scene(200, seed=9)
    cov = build_cov3d(scales, quats)
    cfg = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    full = rasterize(cam, means, cov, op, cols, bg, cfg)
    banded = rasterize_banded(cam, means, cov, op, cols, bg, cfg, bands=3)
    np.testing.assert_allclose(np.asarray(banded.image), np.asarray(full.image),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(banded.alpha), np.asarray(full.alpha),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(banded.depth), np.asarray(full.depth),
                               rtol=1e-6, atol=1e-6)
