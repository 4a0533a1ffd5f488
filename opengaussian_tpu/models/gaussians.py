"""Gaussian parameter store: a sharded pytree with functional densification.

Replaces the reference's `GaussianModel` (reference scene/gaussian_model.py:
38-514) — an nn.Module mutated in place with per-group optimizer-state
surgery — with an immutable dataclass of arrays plus pure update functions.

TPU-first design decisions (SURVEY.md §7.1):
  * arrays are padded to a static capacity with an `alive` mask, so every
    train step compiles once; capacity grows host-side (rare recompile);
  * densify/clone/split/prune (reference scene/gaussian_model.py:452-508)
    is ONE jitted function: new splats are scattered into dead slots found
    with a stable argsort, overflow is dropped and reported;
  * Adam moment surgery (replace/cat/prune, reference
    scene/gaussian_model.py:357-427) becomes masked scatters of zeros.

Semantics preserved exactly: clone copies small high-gradient splats; split
resamples large ones into 2 children with scale/(0.8*2) and removes the
parent; prune drops low-opacity / oversized splats; all densification stats
reset after each event; reset_opacity clamps opacity to <=0.01 and zeroes its
moments.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops.projection import quat_to_rotmat
from opengaussian_tpu.ops.sh import rgb_to_sh

PARAM_FIELDS = (
    "means",
    "sh_dc",
    "sh_rest",
    "log_scales",
    "quats",
    "logit_opacity",
    "ins_feat",
)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    """All leaves are [N_cap, ...]; slots with alive=False are padding."""

    means: Any  # [N,3]
    sh_dc: Any  # [N,1,3]
    sh_rest: Any  # [N,(K-1),3]
    log_scales: Any  # [N,3]
    quats: Any  # [N,4] (w,x,y,z), unnormalized
    logit_opacity: Any  # [N]
    ins_feat: Any  # [N,6] continuous instance features
    alive: Any  # [N] bool

    # -- activations (reference scene/gaussian_model.py:40-61,122-169) --
    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def scales(self):
        return jnp.exp(self.log_scales)

    @property
    def opacity(self):
        # dead slots render as fully transparent
        return jnp.where(self.alive, jax.nn.sigmoid(self.logit_opacity), 0.0)

    @property
    def sh(self):
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)  # [N,K,3]

    def normalized_ins_feat(self, quantized: jnp.ndarray | None = None):
        """L2-normalized instance feature; pass the STE-quantized features to
        mimic get_ins_feat(origin=False) (reference gaussian_model.py:163-169)."""
        f = self.ins_feat if quantized is None else quantized
        # double-where keeps gradients NaN-free for all-zero rows (dead
        # padding slots): d||x||/dx at x=0 is NaN even under a zero cotangent
        sq = jnp.sum(f * f, axis=-1, keepdims=True)
        n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        return jnp.where(sq > 0, f / n, 0.0)

    def params(self) -> dict:
        return {k: getattr(self, k) for k in PARAM_FIELDS}

    def with_params(self, p: dict) -> "GaussianState":
        return dataclasses.replace(self, **p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyStats:
    """Screen-space gradient accumulation driving densification
    (reference scene/gaussian_model.py:510-514)."""

    grad_accum: Any  # [N] sum of ||d ndc||
    denom: Any  # [N] visible-step count
    max_radii2d: Any  # [N] running max of on-screen radius

    @staticmethod
    def zeros(n: int) -> "DensifyStats":
        return DensifyStats(
            grad_accum=jnp.zeros((n,), jnp.float32),
            denom=jnp.zeros((n,), jnp.float32),
            max_radii2d=jnp.zeros((n,), jnp.float32),
        )

    def update(self, screen_grad: jnp.ndarray, radii: jnp.ndarray) -> "DensifyStats":
        """screen_grad [N,2] = grad of loss w.r.t. the NDC screen tap;
        radii [N] int (0 => not visible)."""
        vis = radii > 0
        return DensifyStats(
            grad_accum=self.grad_accum
            + jnp.where(vis, jnp.linalg.norm(screen_grad, axis=-1), 0.0),
            denom=self.denom + vis.astype(jnp.float32),
            max_radii2d=jnp.maximum(self.max_radii2d, radii.astype(jnp.float32)),
        )


def round_capacity(n: int, multiple: int = 4096) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (scale init).
    Replaces simple-knn's distCUDA2, matching the fork's own CPU KDTree
    replacement (reference scene/gaussian_model.py:20-36). scipy's cKDTree
    is already native C with parallel queries; a bespoke C++ OpenMP
    grid-hash kNN was measured 2-10x SLOWER here (uniform grids lose to
    adaptive trees on the non-uniform densities of real SfM clouds), so it
    was dropped rather than shipped."""
    from scipy.spatial import KDTree

    d, _ = KDTree(points).query(points, k=k + 1, workers=-1)
    return (d[:, 1:] ** 2).mean(axis=1)


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 3,
    seed: int = 0,
    capacity: int | None = None,
) -> GaussianState:
    """Initialize from an SfM point cloud
    (reference scene/gaussian_model.py:181-209): scales from sqrt of KNN mean
    squared distance, identity rotations, opacity 0.1, ins_feat ~ U[0,1)."""
    n = points.shape[0]
    cap = capacity or round_capacity(n)
    k = (sh_degree + 1) ** 2
    rng = np.random.default_rng(seed)

    dist2 = np.maximum(knn_mean_sq_dist(points), 1e-7)
    log_scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    return GaussianState(
        means=pad(points.astype(np.float32)),
        sh_dc=pad(np.asarray(rgb_to_sh(colors.astype(np.float32)))[:, None, :]),
        sh_rest=pad(np.zeros((n, k - 1, 3), np.float32)),
        log_scales=pad(log_scales.astype(np.float32)),
        quats=pad(quats, fill=0.0).at[n:, 0].set(1.0),
        logit_opacity=pad(np.full((n,), float(inverse_sigmoid(jnp.float32(0.1))), np.float32),
                          fill=-10.0),
        ins_feat=pad(rng.random((n, 6), np.float32)),
        alive=jnp.asarray(alive),
    )


# ---------------------------------------------------------------------------
# densification (pure, jittable at fixed capacity)
# ---------------------------------------------------------------------------


def densify_and_prune(
    state: GaussianState,
    moments: tuple,  # (mu, nu): pytrees matching state.params()
    stats: DensifyStats,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,  # 0 => disabled (reference passes None)
    percent_dense: float,
):
    """One densify+prune event (reference scene/gaussian_model.py:452-508 and
    train.py:593-605). Returns (state, moments, stats, n_overflow)."""
    mu, nu = moments
    cap = state.capacity
    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    scales = jnp.exp(state.log_scales)
    max_scale = jnp.max(scales, axis=-1)

    hot = state.alive & (grads >= max_grad)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # --- allocate one dead slot per clone/split ---
    needs = clone_mask | split_mask
    dead_slots = jnp.argsort(state.alive.astype(jnp.int32), stable=True)  # dead first
    n_dead = cap - state.num_alive
    rank = jnp.cumsum(needs.astype(jnp.int32)) - 1
    fits = needs & (rank < n_dead)
    n_overflow = jnp.sum(needs) - jnp.sum(fits)
    src = jnp.arange(cap)  # source slot i -> child slot dest[i]
    dest = jnp.where(fits, dead_slots[jnp.clip(rank, 0, cap - 1)], cap)  # cap => drop

    # --- build child parameters ---
    # split children (and the parent rewrite) sample from N(0, scale) rotated
    # into world space (reference densify_and_split)
    eps = jax.random.normal(key, (2, cap, 3)) * scales[None]
    rot = quat_to_rotmat(state.quats)  # [cap,3,3]
    offs = jnp.einsum("nij,knj->kni", rot, eps)  # [2,cap,3]
    split_scales = jnp.log(scales / (0.8 * 2))

    child = state.params()
    child["means"] = jnp.where(
        split_mask[:, None], state.means + offs[1], state.means
    )
    child["log_scales"] = jnp.where(
        split_mask[:, None], split_scales, state.log_scales
    )

    def scatter(base, vals):
        return base.at[dest].set(vals, mode="drop")

    p = state.params()
    new_p = {k: scatter(p[k], child[k]) for k in PARAM_FIELDS}
    # rewrite split parents in place (sample 0 of 2)
    new_p["means"] = jnp.where(
        split_mask[:, None], state.means + offs[0], new_p["means"]
    )
    new_p["log_scales"] = jnp.where(
        split_mask[:, None], split_scales, new_p["log_scales"]
    )
    alive = state.alive.at[dest].set(fits, mode="drop")

    # --- optimizer moment surgery: children and split parents get zeros ---
    def fresh_moments(m):
        def per_leaf(x):
            zc = jnp.zeros_like(x)
            x = x.at[dest].set(zc, mode="drop")
            smask = split_mask.reshape((cap,) + (1,) * (x.ndim - 1))
            return jnp.where(smask, 0.0, x)

        return jax.tree.map(per_leaf, m)

    mu, nu = fresh_moments(mu), fresh_moments(nu)

    # --- prune (reference densify_and_prune tail) ---
    opac = jax.nn.sigmoid(new_p["logit_opacity"])
    prune = opac < min_opacity
    if max_screen_size:
        # Reference quirk preserved: densification_postfix zeroes max_radii2D
        # BEFORE the prune reads it (scene/gaussian_model.py:450,505), so the
        # screen-size condition never fires there; only the world-size check
        # (scale > 0.1 * extent) is live.
        big_ws = jnp.max(jnp.exp(new_p["log_scales"]), axis=-1) > 0.1 * extent
        prune = prune | big_ws
    alive = alive & ~prune

    new_state = dataclasses.replace(state, alive=alive, **new_p)
    return new_state, (mu, nu), DensifyStats.zeros(cap), n_overflow


def reset_opacity(state: GaussianState, moments: tuple):
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (reference scene/gaussian_model.py:300-303, train.py:604-605)."""
    mu, nu = moments
    new_logit = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(state.logit_opacity), 0.01)
    )
    mu = {**mu, "logit_opacity": jnp.zeros_like(mu["logit_opacity"])}
    nu = {**nu, "logit_opacity": jnp.zeros_like(nu["logit_opacity"])}
    return dataclasses.replace(state, logit_opacity=new_logit), (mu, nu)


def grow_capacity(tree, new_cap: int):
    """Host-side capacity growth: pad every [N_cap, ...] leaf. quats pad with
    identity w component; everything else pads with zeros."""

    def pad(x):
        x = np.asarray(x)
        out = np.zeros((new_cap,) + x.shape[1:], x.dtype)
        out[: x.shape[0]] = x
        return jnp.asarray(out)

    return jax.tree.map(pad, tree)
