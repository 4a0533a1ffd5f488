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


def _to_host(x):
    """np.asarray that also works for multi-host-sharded jax.Arrays: a leaf
    sharded over a multi-process mesh is not fully addressable, so each
    process all-gathers it once (tiled => the global value, not a
    per-process stack) before converting."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def save(path: str, state: GaussianState, adam: AdamState, stats: DensifyStats,
         kmeans: KMeansState | None, iteration: int, extra: dict | None = None):
    """Multi-host note: every process materializes the global tree (the
    gathers in _to_host are collective), but only process 0 writes the file
    — the out_dir is typically a shared filesystem."""
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
            flat[prefix] = _to_host(d)

    rec("", tree)
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **flat)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # don't let another process race ahead and load a half-written file
        multihost_utils.sync_global_devices("checkpoint_save")


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


_TORCH_GROUP_TO_FIELD = {
    # reference training_setup group names -> GaussianState fields
    # (reference scene/gaussian_model.py:216-224)
    "xyz": "means",
    "f_dc": "sh_dc",
    "f_rest": "sh_rest",
    "opacity": "logit_opacity",
    "scaling": "log_scales",
    "rotation": "quats",
    "ins_feat": "ins_feat",
}


def load_torch(path: str, seed: int = 0, capacity: int | None = None):
    """Load a reference `chkpnt*.pth` — torch.save((capture(), iteration))
    with capture() the 14-tuple of reference scene/gaussian_model.py:84-100 —
    into (GaussianState, AdamState, DensifyStats, iteration,
    spatial_lr_scale).

    Mirrors the reference's legacy upgrade (train.py:168-184): a vanilla-3DGS
    12-tuple (no ins_feat/ins_feat_q) gets a fresh U[0,1) ins_feat and a
    reset optimizer. This is what makes the scripted ScanNet recipe
    (scripts/train_scannet.sh:46-48: resume stages 1-3 from a stage-0
    checkpoint) runnable against reference artifacts.
    """
    import torch

    from opengaussian_tpu.models.gaussians import round_capacity

    model_params, iteration = torch.load(
        path, map_location="cpu", weights_only=False
    )

    def tonp(x):
        return np.ascontiguousarray(x.detach().cpu().numpy()) \
            if hasattr(x, "detach") else np.asarray(x)

    legacy = len(model_params) == 12
    if legacy:
        (sh_deg, xyz, f_dc, f_rest, scaling, rotation, opacity,
         max_radii2d, grad_accum, denom, opt_dict, lr_scale) = model_params
        rng = np.random.default_rng(seed)
        ins_feat = rng.random((tonp(xyz).shape[0], 6)).astype(np.float32)
        opt_dict = None  # reference replaces it with a fresh optimizer
    else:
        (sh_deg, xyz, f_dc, f_rest, scaling, rotation, opacity,
         ins_feat, _ins_feat_q, max_radii2d, grad_accum, denom,
         opt_dict, lr_scale) = model_params
        ins_feat = tonp(ins_feat)

    xyz = tonp(xyz).astype(np.float32)
    n = xyz.shape[0]
    cap = capacity or round_capacity(n)

    def pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    alive = np.zeros((cap,), bool)
    alive[:n] = True
    state = GaussianState(
        means=pad(xyz),
        sh_dc=pad(tonp(f_dc)),
        sh_rest=pad(tonp(f_rest)),
        log_scales=pad(tonp(scaling)),
        quats=pad(tonp(rotation)).at[n:, 0].set(1.0),
        logit_opacity=pad(tonp(opacity).reshape(n), fill=-10.0),
        ins_feat=pad(np.asarray(ins_feat, np.float32).reshape(n, -1)),
        alive=jnp.asarray(alive),
    )

    from opengaussian_tpu.models import optimizer as opt_mod

    adam = opt_mod.init(state.params())
    if opt_dict is not None:
        # torch Adam state_dict: param indices follow group insertion order
        idx_to_field = {}
        pi = 0
        for g in opt_dict["param_groups"]:
            field = _TORCH_GROUP_TO_FIELD.get(g.get("name", ""), None)
            for _ in g["params"]:
                idx_to_field[pi] = field
                pi += 1
        mu = dict(adam.mu)
        nu = dict(adam.nu)
        count = 0
        for pi, st in opt_dict.get("state", {}).items():
            field = idx_to_field.get(int(pi))
            if field is None:
                continue
            row_shape = (n,) + tuple(mu[field].shape[1:])
            mu[field] = pad(tonp(st["exp_avg"]).reshape(row_shape))
            nu[field] = pad(tonp(st["exp_avg_sq"]).reshape(row_shape))
            count = max(count, int(tonp(st["step"]).reshape(())))
        adam = opt_mod.AdamState(
            mu=mu, nu=nu, count=jnp.asarray(count, jnp.int32)
        )

    stats = DensifyStats(
        grad_accum=pad(tonp(grad_accum).reshape(n)),
        denom=pad(tonp(denom).reshape(n)),
        max_radii2d=pad(tonp(max_radii2d).reshape(n)),
    )
    return state, adam, stats, int(iteration), float(lr_scale)


def ensure_ins_feat(state: GaussianState, seed: int = 0) -> GaussianState:
    """Inject fresh U[0,1) instance features if absent/zero (legacy 3DGS
    checkpoints; reference train.py:170-183)."""
    if np.asarray(jnp.abs(state.ins_feat)).max() > 0:
        return state
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        state, ins_feat=jnp.asarray(rng.random(state.ins_feat.shape, np.float32))
    )
