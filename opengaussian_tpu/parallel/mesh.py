"""Device mesh construction and sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.3); every distributed
capability here is net-new, built the JAX way: a named mesh +
NamedSharding/shard_map, with XLA emitting the collectives (no hand-written
NCCL analog).

Mesh layout for splatting: ONE axis `dev` used for two roles in different
phases of a step — Gaussians are sharded over `dev` for projection/SH/param
updates (model parallelism over the splat table), and image tiles are
sharded over `dev` for the blend (spatial parallelism). The phase switch is
an all_gather of the compact projected splats; its AD transpose
(reduce-scatter) routes per-Gaussian gradients back to their owner shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dev") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_gaussians(mesh: Mesh, tree, axis: str = "dev"):
    """Place every [N, ...] leaf sharded over its leading dim."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
