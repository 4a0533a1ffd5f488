"""Gaussian projection: 3D -> screen-space splats (EWA).

Vectorized jnp preprocessing stage of the rasterizer. Reproduces the math of
the classic diff-gaussian-rasterization `preprocess` kernel that the reference
consumes through its CUDA submodule (see SURVEY.md §2.1; settings struct at
reference gaussian_renderer/__init__.py:55-68):

  * covariance from quaternion+scale:   Sigma = (R S)(R S)^T
    (reference utils/general_utils.py:78-110 builds the same L = R @ S)
  * near-plane cull at z <= 0.2
  * EWA 2D covariance  cov2d = J W Sigma W^T J^T  with the fov-clamped
    Jacobian and the +0.3 pixel dilation on the diagonal
  * conic (inverse cov2d), 99%-confidence radius 3*sqrt(max eigenvalue)
  * pixel-space center via the centered pinhole mapping
  * 16x16 tile rectangle per splat

Everything is differentiable jnp on [N]-shaped arrays; integer tile data is
produced under stop_gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from opengaussian_tpu.cameras import Camera

NEAR_Z = 0.2
DILATION = 0.3
TILE = 16


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z), not necessarily normalized -> [..., 3, 3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """scales [N,3] (activated, positive), quats [N,4] -> Sigma [N,3,3].

    The 3x3 product is unrolled to elementwise VPU math: exact f32 (XLA
    would otherwise run the batched matmul in bf16 on the MXU, perturbing
    the conic/radius vs the f32 CUDA reference) and faster than tiny
    HIGHEST-precision MXU matmuls."""
    R = quat_to_rotmat(quats)
    L = R * scales[..., None, :]  # R @ diag(s)
    # Sigma = L @ L^T unrolled: [N,3,1,3] * [N,1,3,3] summed over the last
    # axis lowers to pure VPU multiply-adds (no tiny-matmul MXU pass)
    return jnp.sum(L[..., :, None, :] * L[..., None, :, :], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Projected:
    """Screen-space splats. All [N]-leading arrays."""

    mean2d: Any  # [N,2] pixel coords of the center
    depth: Any  # [N] camera-space z
    conic: Any  # [N,3] inverse 2D covariance (a, b, c): ax^2 + 2bxy + cy^2
    radius: Any  # [N] int32 pixel radius (0 => culled)
    cull_radius: Any  # [N] f32: beyond this distance alpha < 1/255 is
    # GUARANTEED (opacity-aware r_cut; +inf when opacity is unknown). Tiles
    # entirely beyond it receive provably zero contribution, so binning may
    # cull them exactly (ops/binning.py circle-tile test).
    rect_min: Any  # [N,2] int32 inclusive tile coords (x, y)
    rect_max: Any  # [N,2] int32 exclusive tile coords
    num_tiles: Any  # [N] int32 tiles touched (0 => culled)
    valid: Any  # [N] bool


def project(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
    screen_tap: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> Projected:
    """Project Gaussians to screen space.

    Args:
      means3d: [N,3] world-space centers.
      cov3d: [N,3,3] world-space covariances.
      camera: pinhole camera.
      screen_tap: optional [N,2] zeros added to the NDC xy position. Its
        gradient is the screen-space positional gradient the densification
        heuristic consumes (same convention as the reference's `means2D`
        zero-tensor tap whose grad is w.r.t. NDC; reference
        gaussian_renderer/__init__.py:45-49, train.py:597-598).
    """
    t = means3d @ camera.R_w2c.T + camera.t_w2c  # [N,3] camera space
    tz = t[..., 2]
    in_front = tz > NEAR_Z
    tz_safe = jnp.where(in_front, tz, 1.0)

    # fov-clamped point for the Jacobian (classic EWA guard band of 1.3).
    tanfovx = camera.tanfovx
    tanfovy = camera.tanfovy
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txz = jnp.clip(t[..., 0] / tz_safe, -limx, limx)
    tyz = jnp.clip(t[..., 1] / tz_safe, -limy, limy)

    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / tz_safe
    # J rows of the 2x3 perspective Jacobian at the clamped point.
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    W = camera.R_w2c  # world->cam rotation
    # M = J @ W : [N, 2, 3]
    M0 = j00[:, None] * W[0] + j02[:, None] * W[2]
    M1 = j11[:, None] * W[1] + j12[:, None] * W[2]
    M = jnp.stack([M0, M1], axis=-2)  # [N,2,3]
    # cov2d = M Sigma M^T unrolled to broadcasting multiply-adds (exact f32
    # on the VPU; XLA lowers small batched matmuls to bf16 MXU passes and
    # HIGHEST-precision ones to 3x slower multi-pass matmuls)
    MS = jnp.sum(M[..., :, None, :] * cov3d[..., None, :, :], axis=-1)  # [N,2,3]
    cov2d = jnp.sum(MS[..., :, None, :] * M[..., None, :, :], axis=-1)  # [N,2,2]
    c00 = cov2d[..., 0, 0] + DILATION
    c01 = cov2d[..., 0, 1]
    c11 = cov2d[..., 1, 1] + DILATION

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    lam1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    cull_radius = jnp.full_like(radius_f, 3.4e38)
    if opacities is not None:
        # Opacity-aware cutoff radius: beyond r_cut = sqrt(2*lam_max*
        # ln(255*opacity)) every pixel's alpha is provably < 1/255 (the
        # quadratic form q >= d^2 / (2*lam_max)), so the blend's skip rule
        # drops it anyway — shrinking the rect is pixel-exact while touching
        # far fewer tiles than the classic 3*sigma bound for translucent
        # splats. Splats with opacity <= 1/255 can never contribute.
        o = jnp.maximum(opacities, 0.0)
        can_hit = 255.0 * o >= 1.0
        r_cut = jnp.sqrt(
            2.0 * jnp.maximum(lam1, 0.0) * jnp.log(jnp.maximum(255.0 * o, 1.0))
        )
        radius_f = jnp.where(can_hit, jnp.minimum(radius_f, jnp.ceil(r_cut)), 0.0)
        cull_radius = jnp.where(can_hit, jnp.ceil(r_cut), 0.0)
        in_front = in_front & can_hit

    # pixel center via NDC (+ optional gradient tap in NDC coords)
    ndc_x = t[..., 0] / tz_safe / tanfovx
    ndc_y = t[..., 1] / tz_safe / tanfovy
    if screen_tap is not None:
        ndc_x = ndc_x + screen_tap[..., 0]
        ndc_y = ndc_y + screen_tap[..., 1]
    px = ((ndc_x + 1.0) * camera.width - 1.0) * 0.5
    py = ((ndc_y + 1.0) * camera.height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=-1)

    # tile rectangle (integer plumbing; not differentiated)
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    p = jax.lax.stop_gradient(mean2d)
    r = jax.lax.stop_gradient(radius_f)
    rx_min = jnp.clip(((p[..., 0] - r) / TILE).astype(jnp.int32), 0, grid_x)
    ry_min = jnp.clip(((p[..., 1] - r) / TILE).astype(jnp.int32), 0, grid_y)
    rx_max = jnp.clip(
        ((p[..., 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x
    )
    ry_max = jnp.clip(
        ((p[..., 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y
    )
    area = (rx_max - rx_min) * (ry_max - ry_min)
    valid = in_front & det_ok & (area > 0)
    radius_i = jnp.where(valid, r, 0.0).astype(jnp.int32)
    num_tiles = jnp.where(valid, area, 0).astype(jnp.int32)

    return Projected(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        radius=radius_i,
        cull_radius=jax.lax.stop_gradient(cull_radius),
        rect_min=jnp.stack([rx_min, ry_min], axis=-1),
        rect_max=jnp.stack([rx_max, ry_max], axis=-1),
        num_tiles=num_tiles,
        valid=valid,
    )


def clip_rect_rows(proj: Projected, row_lo, row_hi) -> Projected:
    """Restrict a projected table's tile rects to grid rows [row_lo, row_hi).

    Banded binning (parallel/render.py): each device clips the gathered
    table to its own tile rows BEFORE expansion, so its sorted stream holds
    only ~1/D of the frame's intersections and every per-slot binning phase
    (expand, gathers, sort, searchsorted) scales with the device count —
    the frame-replicated binning was the modeled scaling ceiling
    (tools/scaling_model.py: 33% -> 90% predicted 8-chip efficiency).

    Pixel-exact: slots outside the clipped rows belong to other devices'
    tile bands; each surviving slot runs the same circle-tile cull. row_lo /
    row_hi may be traced (they derive from jax.lax.axis_index). Splats whose
    rect misses the band get num_tiles=0 and are never expanded; their rect
    fields are left untouched (the expansion never reads them)."""
    ry_min = jnp.maximum(proj.rect_min[:, 1], row_lo)
    ry_max = jnp.minimum(proj.rect_max[:, 1], row_hi)
    h = jnp.maximum(ry_max - ry_min, 0)
    area = (proj.rect_max[:, 0] - proj.rect_min[:, 0]) * h
    num_tiles = jnp.where(proj.valid, area, 0).astype(jnp.int32)
    return Projected(
        mean2d=proj.mean2d,
        depth=proj.depth,
        conic=proj.conic,
        radius=proj.radius,
        cull_radius=proj.cull_radius,
        rect_min=jnp.stack(
            [proj.rect_min[:, 0], jnp.minimum(ry_min, ry_max)], axis=-1
        ),
        rect_max=jnp.stack([proj.rect_max[:, 0], ry_max], axis=-1),
        num_tiles=num_tiles,
        valid=proj.valid,
    )
