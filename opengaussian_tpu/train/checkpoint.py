"""Checkpoint save/restore.

Counterpart of the reference's torch.save((gaussians.capture(), iteration))
14-tuple (reference scene/gaussian_model.py:84-120, train.py:613-616), as a
flat .npz of the full training pytree: parameters, alive mask, Adam moments,
densification stats, codebook state, iteration. Legacy-upgrade behavior
(reference train.py:170-183: vanilla-3DGS 12-tuples get a fresh ins_feat) is
mirrored by `ensure_ins_feat`.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.models.gaussians import DensifyStats, GaussianState
from opengaussian_tpu.models.optimizer import AdamState
from opengaussian_tpu.ops.kmeans import KMeansState


def save(path: str, state: GaussianState, adam: AdamState, stats: DensifyStats,
         kmeans: KMeansState | None, iteration: int, extra: dict | None = None):
    tree = {
        "state": dataclasses.asdict(state),
        "adam": {"mu": adam.mu, "nu": adam.nu, "count": adam.count},
        "stats": dataclasses.asdict(stats),
        "kmeans": kmeans._asdict() if kmeans is not None else {},
        "iteration": np.int64(iteration),
        "extra": extra or {},
    }
    flat = {}

    def rec(prefix, d):
        if isinstance(d, dict):
            for k, v in d.items():
                rec(f"{prefix}/{k}", v)
        else:
            flat[prefix] = np.asarray(d)

    rec("", tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load(path: str):
    """-> (GaussianState, AdamState, DensifyStats, KMeansState | None, iteration)."""
    z = np.load(path, allow_pickle=False)
    nest: dict = {}
    for k in z.files:
        parts = k.strip("/").split("/")
        d = nest
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[k]) if z[k].ndim > 0 or z[k].dtype != np.int64 else z[k]
    st = GaussianState(**{k: jnp.asarray(v) for k, v in nest["state"].items()})
    adam = AdamState(
        mu={k: jnp.asarray(v) for k, v in nest["adam"]["mu"].items()},
        nu={k: jnp.asarray(v) for k, v in nest["adam"]["nu"].items()},
        count=jnp.asarray(nest["adam"]["count"]),
    )
    stats = DensifyStats(**{k: jnp.asarray(v) for k, v in nest["stats"].items()})
    km = None
    if nest.get("kmeans"):
        km = KMeansState(**{k: jnp.asarray(v) for k, v in nest["kmeans"].items()})
    it = int(np.asarray(nest["iteration"]))
    return st, adam, stats, km, it


def ensure_ins_feat(state: GaussianState, seed: int = 0) -> GaussianState:
    """Inject fresh U[0,1) instance features if absent/zero (legacy 3DGS
    checkpoints; reference train.py:170-183)."""
    if np.asarray(jnp.abs(state.ins_feat)).max() > 0:
        return state
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        state, ins_feat=jnp.asarray(rng.random(state.ins_feat.shape, np.float32))
    )
