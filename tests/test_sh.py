import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops import sh


def test_deg0_constant():
    coeffs = jnp.ones((5, 16, 3))
    dirs = jnp.array([[0.0, 0.0, 1.0]] * 5)
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(out, sh.C0, rtol=1e-6)


def test_rgb_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh.sh_dc_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)


def test_basis_count_and_values():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(10, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for deg in range(5):
        b = sh.sh_basis(deg, jnp.asarray(d))
        assert b.shape == (10, (deg + 1) ** 2)
    # hand-checked values at +z: all bands with x or y factors vanish
    bz = np.asarray(sh.sh_basis(2, jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(bz[0], sh.C0, rtol=1e-6)
    np.testing.assert_allclose(bz[1], 0.0, atol=1e-7)  # -C1*y
    np.testing.assert_allclose(bz[2], sh.C1, rtol=1e-6)  # C1*z
    np.testing.assert_allclose(bz[6], sh.C2[2] * 2.0, rtol=1e-6)  # zonal deg2


def test_sh_orthonormality():
    """Monte-Carlo check that the basis is orthonormal over the sphere
    (integral of Y_i Y_j = delta_ij), which pins every constant."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.asarray(sh.sh_basis(3, jnp.asarray(d)))  # [M, 16]
    gram = 4 * np.pi * (b.T @ b) / b.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sh_to_rgb_clamps():
    coeffs = -10.0 * jnp.ones((4, 16, 3))
    means = jnp.array([[1.0, 0.0, 0.0]] * 4)
    rgb = sh.sh_to_rgb(3, coeffs, means, jnp.zeros(3))
    assert (np.asarray(rgb) >= 0).all()
