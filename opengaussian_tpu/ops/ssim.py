"""SSIM with the 11x11 Gaussian window (sigma=1.5).

jnp equivalent of the reference's conv2d-based SSIM
(reference utils/loss_utils.py:33-73): per-channel depthwise convolution,
C1=0.01^2, C2=0.03^2, 'same' padding (the reference pads by window_size//2).
Images are [H, W, C] in [0, 1].

TPU mapping: the Gaussian window is exactly separable (outer(g, g)), and a
zero-padded 'same' 1D convolution equals multiplication by a banded Toeplitz
matrix, so each smoothing runs as TWO dense matmuls on the MXU —
[H,C,W] @ [W,W] then [H',C,H] @ [H,H] — instead of a 121-tap depthwise conv.
A 3-channel depthwise conv is the MXU's worst case (channels pad to the
128-lane tile, 121 scalar taps ride the VPU); measured on v5e at 648x484 the
conv formulation put a stage-0 train step at ~85 ms where the raw render
fwd+bwd is ~24 ms, and the banded-matmul SSIM removes ~28 ms of that (see
tools/stage_bench.py history). The matrices are numpy constants cached per
(length, window) and baked into the executable (~1.7 MB at W=648).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gauss1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = _gauss1d(window_size, sigma)
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _band_matrix(length: int, window_size: int = 11,
                 sigma: float = 1.5) -> np.ndarray:
    """[length, length] banded Toeplitz B with B[i, j] = g[j - i + half]:
    (B @ x)[i] = sum_j g[j-i+half] x[j] == zero-padded 'same' 1D conv."""
    g = _gauss1d(window_size, sigma)
    half = window_size // 2
    m = np.zeros((length, length), np.float32)
    for k, gk in enumerate(g):
        off = k - half
        idx = np.arange(max(0, -off), min(length, length - off))
        m[idx, idx + off] = gk
    return m


def _filter2d(img: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5) -> jnp.ndarray:
    """Depthwise 'same' Gaussian smoothing of [H,W,C] as two MXU matmuls."""
    h, w, _ = img.shape
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    t = jnp.einsum("hwc,vw->hvc", img, bw)  # smooth along W
    return jnp.einsum("hvc,uh->uvc", t, bh)  # smooth along H


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    mu1 = _filter2d(img1, window_size)
    mu2 = _filter2d(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, window_size) - mu1_sq
    s2 = _filter2d(img2 * img2, window_size) - mu2_sq
    s12 = _filter2d(img1 * img2, window_size) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)
