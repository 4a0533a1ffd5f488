"""Naive O(N * H * W) oracle rasterizer.

Test-only ground truth for the fast tile rasterizer. Materializes the full
[N, H*W] alpha matrix, globally depth-sorts, and composites with exactly the
semantics of ops/blend.py in a single chunk. It applies the same per-splat
tile-rectangle membership mask the tile rasterizer (and the classic CUDA
implementation) uses — a pixel only sees a splat whose tile rect covers the
pixel's tile — so outputs agree bit-for-bit-ish with the production path.

Matches the API contract recovered from the reference's call sites
(SURVEY.md §2.1): returns image, per-pixel accumulated alpha (1 - T_final),
premultiplied expected depth, and per-splat integer radii (0 => culled).
"""

from __future__ import annotations

import jax.numpy as jnp

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.projection import TILE, Projected, project


def rasterize_oracle(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    bg: jnp.ndarray,
    screen_tap: jnp.ndarray | None = None,
):
    """Render. colors [N, C], opacities [N], bg [C].

    Returns dict(image [H,W,C], alpha [H,W], depth [H,W], radii [N]).
    """
    H, W = camera.height, camera.width
    P = H * W
    proj: Projected = project(means3d, cov3d, camera, screen_tap=screen_tap)

    # stable global front-to-back order; culled splats pushed to the end
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opac = opacities[order]
    cols = colors[order]
    depths = proj.depth[order]
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    valid = proj.valid[order]

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)
    tile_x = (pix[:, 0] / TILE).astype(jnp.int32)
    tile_y = (pix[:, 1] / TILE).astype(jnp.int32)

    alpha = blend.alpha_from_conic(mean2d, conic, opac, pix)  # [N, P]
    in_rect = (
        (tile_x[None, :] >= rect_min[:, 0:1])
        & (tile_x[None, :] < rect_max[:, 0:1])
        & (tile_y[None, :] >= rect_min[:, 1:2])
        & (tile_y[None, :] < rect_max[:, 1:2])
        & valid[:, None]
    )
    alpha = jnp.where(in_rect, alpha, 0.0)

    w, carry = blend.blend_chunk(alpha, blend.init_carry((P,)))
    image = w.T @ cols + carry.T[:, None] * bg[None, :]  # [P, C]
    depth_img = w.T @ depths[:, None]  # premultiplied expected depth
    return dict(
        image=image.reshape(H, W, -1),
        alpha=(1.0 - carry.T).reshape(H, W),
        depth=depth_img.reshape(H, W),
        radii=proj.radius,
    )
