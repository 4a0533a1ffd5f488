import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops.projection import (
    TILE,
    build_cov3d,
    project,
    quat_to_rotmat,
)


def make_cam(w=64, h=48, fov=0.8):
    return Camera.from_fov(np.eye(3), np.zeros(3), fov, fov, w, h)


def test_quat_identity():
    R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_z_rotation():
    # 90 degrees about z: w = cos(45), z = sin(45)
    s = np.sin(np.pi / 4)
    R = np.asarray(quat_to_rotmat(jnp.array([s, 0.0, 0.0, s])))
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_cov3d_isotropic():
    cov = build_cov3d(jnp.array([[0.5, 0.5, 0.5]]), jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(cov[0], 0.25 * np.eye(3), atol=1e-6)


def test_cov3d_rotation_invariant_trace():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 4))
    s = np.exp(rng.normal(size=(10, 3)) * 0.3)
    cov = np.asarray(build_cov3d(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(
        np.trace(cov, axis1=1, axis2=2), (s**2).sum(-1), rtol=1e-5
    )


def test_project_center_and_cull():
    cam = make_cam()
    means = jnp.array(
        [
            [0.0, 0.0, 5.0],  # straight ahead
            [0.0, 0.0, -5.0],  # behind camera -> culled
            [0.0, 0.0, 0.1],  # inside near plane -> culled
        ]
    )
    cov = build_cov3d(jnp.full((3, 3), 0.05), jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)))
    p = project(means, cov, cam)
    valid = np.asarray(p.valid)
    assert valid.tolist() == [True, False, False]
    # straight-ahead point lands at the principal point
    np.testing.assert_allclose(
        np.asarray(p.mean2d)[0], [(cam.width - 1) / 2, (cam.height - 1) / 2], atol=1e-4
    )
    assert np.asarray(p.radius)[0] > 0
    assert np.asarray(p.radius)[1] == 0
    # rect covers the tile containing the center
    cx_tile = int((cam.width - 1) / 2) // TILE
    rmin, rmax = np.asarray(p.rect_min)[0], np.asarray(p.rect_max)[0]
    assert rmin[0] <= cx_tile < rmax[0]
    assert np.asarray(p.num_tiles)[0] == (rmax[0] - rmin[0]) * (rmax[1] - rmin[1])


def test_project_pixel_position_matches_pinhole():
    cam = make_cam(w=100, h=80, fov=1.0)
    means = jnp.array([[0.3, -0.2, 2.0]])
    cov = build_cov3d(jnp.array([[0.01, 0.01, 0.01]]), jnp.array([[1.0, 0, 0, 0]]))
    p = project(means, cov, cam)
    fx, fy = float(cam.fx), float(cam.fy)
    expected = [fx * 0.3 / 2.0 + (100 - 1) / 2, fy * -0.2 / 2.0 + (80 - 1) / 2]
    np.testing.assert_allclose(np.asarray(p.mean2d)[0], expected, rtol=1e-5)


def test_screen_tap_gradient():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 5.0]])
    cov = build_cov3d(jnp.array([[0.05, 0.05, 0.05]]), jnp.array([[1.0, 0, 0, 0]]))

    def f(tap):
        p = project(means, cov, cam, screen_tap=tap)
        return jnp.sum(p.mean2d)

    g = jax.grad(f)(jnp.zeros((1, 2)))
    # d pix / d ndc = 0.5 * size
    np.testing.assert_allclose(
        np.asarray(g)[0], [cam.width * 0.5, cam.height * 0.5], rtol=1e-5
    )


def test_projection_differentiable():
    cam = make_cam()
    means = jnp.array([[0.2, 0.1, 3.0], [0.0, 0.0, 4.0]])
    scales = jnp.array([[0.05, 0.1, 0.02], [0.03, 0.03, 0.03]])
    quats = jnp.array([[1.0, 0.2, 0.0, 0.1], [1.0, 0, 0, 0]])

    def f(m, s, q):
        p = project(m, build_cov3d(s, q), cam)
        return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.depth)

    grads = jax.grad(f, argnums=(0, 1, 2))(means, scales, quats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
