"""Load trained models from saved artifacts (PLY + codebooks + lang npz).

Mirror of the inference-side loading in the reference's render scripts
(reference render.py:47-57, render_lerf_by_text.py:46-63).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.data.ply import load_gaussian_ply
from opengaussian_tpu.models.gaussians import GaussianState, round_capacity
from opengaussian_tpu.ops.kmeans import KMeansState
from opengaussian_tpu.utils.codebook import load_codebook


def state_from_arrays(d: dict, capacity: int | None = None) -> GaussianState:
    n = d["means"].shape[0]
    cap = capacity or round_capacity(n)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    alive = np.zeros(cap, bool)
    alive[:n] = True
    quats = np.zeros((cap, 4), np.float32)
    quats[:n] = d["quats"]
    quats[n:, 0] = 1.0
    return GaussianState(
        means=pad(d["means"]),
        sh_dc=pad(d["sh_dc"]),
        sh_rest=pad(d["sh_rest"]),
        log_scales=pad(d["log_scales"]),
        quats=jnp.asarray(quats),
        logit_opacity=jnp.asarray(
            np.concatenate([d["logit_opacity"], np.full(cap - n, -10.0, np.float32)])
        ),
        ins_feat=pad(d["ins_feat"]),
        alive=jnp.asarray(alive),
    )


def find_iteration(model_path: str, iteration: int = -1) -> int:
    pc = os.path.join(model_path, "point_cloud")
    iters = sorted(
        int(d.split("_")[1]) for d in os.listdir(pc) if d.startswith("iteration_")
    )
    return iters[-1] if iteration == -1 else iteration


def load_model(model_path: str, iteration: int = -1, k1: int = 64, k2: int = 5):
    """-> (GaussianState, KMeansState | None, iteration)."""
    it = find_iteration(model_path, iteration)
    pc_dir = os.path.join(model_path, f"point_cloud/iteration_{it}")
    d = load_gaussian_ply(os.path.join(pc_dir, "point_cloud.ply"))
    state = state_from_arrays(d)
    cap = state.capacity
    n = d["means"].shape[0]

    kms = None
    root_dir = os.path.join(pc_dir, "root_code_book")
    if os.path.exists(root_dir):
        centers, cls = load_codebook(root_dir)
        cls_full = np.zeros(cap, np.int32)
        cls_full[:n] = cls
        leaf_dir = os.path.join(pc_dir, "leaf_code_book")
        if os.path.exists(leaf_dir):
            leaf_centers, leaf_cls = load_codebook(leaf_dir)
            k2_eff = (leaf_centers.shape[0] - 1) // centers.shape[0]
        else:
            leaf_centers = np.zeros((centers.shape[0] * k2 + 1, 6), np.float32)
            leaf_cls = np.full(n, centers.shape[0] * k2, np.int64)
            k2_eff = k2
        leaf_full = np.full(cap, leaf_centers.shape[0] - 1, np.int32)
        leaf_full[:n] = leaf_cls
        kms = KMeansState(
            centers=jnp.asarray(centers, jnp.float32),
            cls_ids=jnp.asarray(cls_full),
            leaf_centers=jnp.asarray(leaf_centers, jnp.float32),
            leaf_cls_ids=jnp.asarray(leaf_full),
            leaf_sub_num=jnp.full((centers.shape[0],), k2_eff, jnp.int32),
        )
    return state, kms, it


def load_cluster_lang(model_path: str):
    z = np.load(os.path.join(model_path, "cluster_lang.npz"))
    return {k: z[k] for k in z.files}
