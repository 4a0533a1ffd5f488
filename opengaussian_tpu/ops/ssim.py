"""SSIM with the 11x11 Gaussian window (sigma=1.5).

jnp equivalent of the reference's conv2d-based SSIM
(reference utils/loss_utils.py:33-73): per-channel depthwise convolution,
C1=0.01^2, C2=0.03^2, 'same' padding (the reference pads by window_size//2).
Images are [H, W, C] in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Depthwise 'same' conv of [H,W,C] with [k,k]."""
    c = img.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]  # [k,k,1,1]
    k = jnp.tile(k, (1, 1, 1, c))  # feature_group_count=C
    x = img[None]  # [1,H,W,C]
    out = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    w = _window(window_size)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, w) - mu1_sq
    s2 = _filter2d(img2 * img2, w) - mu2_sq
    s12 = _filter2d(img1 * img2, w) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)
