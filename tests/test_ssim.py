"""SSIM banded-matmul formulation vs the direct depthwise-conv definition.

The MXU form (ops/ssim.py) must match the reference's conv2d SSIM
(reference utils/loss_utils.py:33-73) exactly up to float association:
outer(g,g) is separable and the banded Toeplitz matmul IS the zero-padded
'same' conv, so agreement is ~1e-6, not a loose statistical match.
"""

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops import ssim as S


def _filter2d_conv(img, kernel):
    """The direct 2D depthwise conv the reference uses (old ops/ssim.py)."""
    c = img.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        img[None], k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return out[0]


def _ssim_conv(img1, img2, window_size=11):
    w = S._window(window_size)
    mu1 = _filter2d_conv(img1, w)
    mu2 = _filter2d_conv(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_conv(img1 * img1, w) - mu1_sq
    s2 = _filter2d_conv(img2 * img2, w) - mu2_sq
    s12 = _filter2d_conv(img1 * img2, w) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def test_filter2d_matches_depthwise_conv():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (37, 53, 3)).astype(np.float32))
    got = S._filter2d(img)
    want = _filter2d_conv(img, S._window(11))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_ssim_matches_conv_form_and_grads():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (41, 47, 3)).astype(np.float32))
    b = jnp.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    v1, g1 = jax.value_and_grad(lambda x: S.ssim(x, b))(a)
    v2, g2 = jax.value_and_grad(lambda x: _ssim_conv(x, b))(a)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_ssim_identical_images_is_one():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (33, 39, 3)).astype(np.float32))
    assert float(S.ssim(a, a)) > 0.9999
