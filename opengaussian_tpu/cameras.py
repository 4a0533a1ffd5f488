"""Camera model.

Replaces the reference's `scene/cameras.py` + `utils/graphics_utils.py`
matrix plumbing (reference: scene/cameras.py:17-120, utils/graphics_utils.py:31-94)
with a single JAX pytree carrying the world-to-camera transform and pinhole
intrinsics in pixels. The reference moves full 4x4 view/projection matrices
around and converts NDC -> pixels as ``((ndc+1)*S-1)/2``; we keep the exact
same pixel mapping by using ``fx = W/(2 tan(fovx/2))``, ``cx = (W-1)/2`` (and
likewise for y), but express everything directly with intrinsics, which is
both simpler and supports per-frame K matrices (ScanNet-style datasets).

Convention: ``x_cam = R_w2c @ x_world + t_w2c`` with +z looking forward
(positive depth in front of the camera). This matches COLMAP and the
reference's ``getWorld2View2``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * np.arctan(pixels / (2.0 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera. Array fields are pytree leaves; H/W are static."""

    # dynamic (traced) fields
    R_w2c: Any  # [3,3]
    t_w2c: Any  # [3]
    fx: Any  # scalar, pixels
    fy: Any
    cx: Any
    cy: Any
    # static fields
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cam_center(self):
        # x_cam = R x + t  =>  center = -R^T t
        return -self.R_w2c.T @ self.t_w2c

    @property
    def tanfovx(self):
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self):
        return self.height / (2.0 * self.fy)

    def world_to_cam(self, pts):
        """[N,3] world -> [N,3] camera coordinates."""
        return pts @ self.R_w2c.T + self.t_w2c

    @staticmethod
    def from_fov(
        R_w2c: np.ndarray,
        t_w2c: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
    ) -> "Camera":
        """Matches the reference's centered-projection pixel mapping exactly:
        pix = ((ndc + 1) * S - 1) / 2 with ndc = x/(z*tan) ==> fx = S/(2 tan),
        cx = (S - 1)/2.
        """
        fx = fov2focal(fovx, width)
        fy = fov2focal(fovy, height)
        return Camera(
            R_w2c=jnp.asarray(R_w2c, jnp.float32),
            t_w2c=jnp.asarray(t_w2c, jnp.float32),
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32((width - 1) / 2.0),
            cy=jnp.float32((height - 1) / 2.0),
            width=int(width),
            height=int(height),
        )

    @staticmethod
    def from_K(
        R_w2c: np.ndarray, t_w2c: np.ndarray, K: np.ndarray, width: int, height: int
    ) -> "Camera":
        return Camera(
            R_w2c=jnp.asarray(R_w2c, jnp.float32),
            t_w2c=jnp.asarray(t_w2c, jnp.float32),
            fx=jnp.float32(K[0, 0]),
            fy=jnp.float32(K[1, 1]),
            cx=jnp.float32(K[0, 2]),
            cy=jnp.float32(K[1, 2]),
            width=int(width),
            height=int(height),
        )
