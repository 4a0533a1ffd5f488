"""Sequential front-to-back alpha compositing semantics, vectorized.

The classic diff-gaussian-rasterization blend loop (which the reference calls
through its CUDA submodule, SURVEY.md §2.1) walks splats front-to-back per
pixel with three data-dependent rules:

  1. alpha = min(0.99, opacity * exp(power)); skipped entirely if < 1/255,
  2. transmittance update T <- T * (1 - alpha),
  3. permanent early stop when the *candidate* update would bring
     T * (1 - alpha) below 1e-4 (the offending splat is NOT composited and T
     keeps its previous value).

A sequential loop is hostile to TPUs. This module computes identical
semantics with dense vector ops: within a chunk of K depth-ordered splats the
running transmittance is an (exclusive) cumulative product of (1 - alpha),
the first-failure early stop is a cumulative-max over the failure indicator,
and the frozen T value is recovered with a one-hot of the first failure.
A carry (T, done) threads the state across chunks, so callers can scan over
arbitrarily long splat lists with O(chunk) memory.

Used by: the naive oracle (single chunk over all N), the tile rasterizer
forward (lax.scan over chunks), and the backward replay.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class BlendCarry(NamedTuple):
    T: jnp.ndarray  # [..., P] running transmittance per pixel
    done: jnp.ndarray  # [..., P] bool, early-stop latched


def init_carry(shape) -> BlendCarry:
    return BlendCarry(T=jnp.ones(shape, jnp.float32), done=jnp.zeros(shape, bool))


def blend_chunk(alpha: jnp.ndarray, carry: BlendCarry):
    """Composite one depth-ordered chunk.

    Args:
      alpha: [..., K, P] raw alpha = opacity * exp(power) per (splat, pixel),
        BEFORE the 0.99 clamp (clamping happens here so gradients saturate
        exactly like the reference's min()).
      carry: per-pixel (T, done) state entering this chunk.

    Returns:
      (weights [..., K, P], new_carry) where weights are the compositing
      weights w = alpha * T_before, already masked by skip/early-stop rules.
      Final pixel value = sum_k w_k * color_k + T_final * background.
    """
    a = jnp.minimum(alpha, ALPHA_MAX)
    a = jnp.where(a >= ALPHA_MIN, a, 0.0)  # rule 1: skip tiny alphas

    factors = 1.0 - a
    # T after each splat, assuming every update inside the chunk lands.
    cum = jnp.cumprod(factors, axis=-2)
    t_in = carry.T[..., None, :]
    t_seq = t_in * cum  # [..., K, P] T after k
    excl = jnp.concatenate(
        [jnp.ones_like(cum[..., :1, :]), cum[..., :-1, :]], axis=-2
    )
    t_prev = t_in * excl  # T before k (exclusive cumulative product)

    active = a > 0.0
    fail = active & (t_seq < T_EPS)  # rule 3 candidate failures
    # done *before* k: carry.done OR any failure strictly earlier in the chunk
    fail_cum = jnp.cumsum(fail.astype(jnp.int32), axis=-2)
    fail_before = (fail_cum - fail.astype(jnp.int32)) > 0
    done_before = carry.done[..., None, :] | fail_before

    contrib = active & ~done_before & ~fail
    w = jnp.where(contrib, a * t_prev, 0.0)

    any_fail = jnp.any(fail, axis=-2)
    # T freezes at its value *before* the first failure.
    first_fail = fail & ~fail_before  # one-hot of the first failure
    t_at_freeze = jnp.sum(jnp.where(first_fail, t_prev, 0.0), axis=-2)
    t_no_fail = t_seq[..., -1, :]
    t_out = jnp.where(carry.done, carry.T, jnp.where(any_fail, t_at_freeze, t_no_fail))
    done_out = carry.done | any_fail
    return w, BlendCarry(T=t_out, done=done_out)


def alpha_from_conic(mean2d, conic, opacity, pix):
    """Evaluate raw per-pixel alpha for splats.

    mean2d [..., K, 2], conic [..., K, 3] (a,b,c), opacity [..., K],
    pix [..., P, 2] pixel centers -> alpha [..., K, P].

    power = -0.5*(a dx^2 + c dy^2) - b dx dy with d = mean2d - pix, exactly
    the quadratic form of the classic rasterizer.
    """
    dx = mean2d[..., 0:1] - pix[..., None, :, 0]  # [..., K, P]
    dy = mean2d[..., 1:2] - pix[..., None, :, 1]
    a = conic[..., 0:1]
    b = conic[..., 1:2]
    c = conic[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = opacity[..., None] * jnp.exp(jnp.minimum(power, 0.0))
    # positive power => behind-the-math degenerate conic; classic code skips.
    return jnp.where(power <= 0.0, alpha, 0.0)
