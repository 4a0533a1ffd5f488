import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import OptimizationConfig
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from opengaussian_tpu.parallel.mesh import make_mesh, replicate, shard_gaussians
from opengaussian_tpu.parallel.render import make_sharded_train_step, render_sharded
from tests.test_rasterize import make_cam, random_scene

CFG = RasterizeConfig(max_per_tile=256, chunk=32, min_intersections=16384)


def test_sharded_render_matches_single_device():
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    cam = make_cam(80, 64)
    means, scales, quats, op, cols = random_scene(256, seed=0)
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.1, 0.2, 0.3])

    ref = rasterize(cam, means, cov, op, cols, bg, CFG)

    sh_means, sh_cov, sh_op, sh_cols = shard_gaussians(mesh, (means, cov, op, cols))
    img, alpha = jax.jit(
        lambda m, c, o, p: render_sharded(mesh, cam, m, c, o, p, bg, CFG)
    )(sh_means, sh_cov, sh_op, sh_cols)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=3e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=3e-5)


def test_sharded_gradients_match_single_device():
    mesh = make_mesh(8)
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(128, seed=1)
    bg = jnp.zeros(3)
    target = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 48, 3)).astype(np.float32))

    def loss_single(means, cols):
        out = rasterize(cam, means, build_cov3d(scales, quats), op, cols, bg, CFG)
        return jnp.sum((out.image - target) ** 2)

    def loss_sharded(means, cols):
        img, _ = render_sharded(
            mesh, cam, means, build_cov3d(scales, quats), op, cols, bg, CFG
        )
        return jnp.sum((img - target) ** 2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(means, cols)
    sh_means, sh_cols = shard_gaussians(mesh, (means, cols))
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(sh_means, sh_cols)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    rng = np.random.default_rng(2)
    pts = np.stack([rng.normal(0, 0.5, 64), rng.normal(0, 0.4, 64),
                    rng.uniform(2.5, 5, 64)], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=128)
    adam = opt_mod.init(state.params())
    stats = G.DensifyStats.zeros(128)
    state = shard_gaussians(mesh, state)
    adam = opt_mod.AdamState(
        mu=shard_gaussians(mesh, adam.mu), nu=shard_gaussians(mesh, adam.nu),
        count=adam.count,
    )
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (48, 64, 3)).astype(np.float32))

    step = make_sharded_train_step(mesh, cam, CFG, OptimizationConfig(), 1.0)
    losses_seen = []
    for it in range(8):
        state, adam, loss, _ = step(state, adam, stats, gt, jnp.int32(it), jnp.zeros(3))
        losses_seen.append(float(loss))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]
    # params stayed sharded over the mesh
    shd = state.means.sharding
    assert len(shd.device_set) == 8
