"""Per-parameter-group Adam with the reference's learning-rate schedules.

The reference builds one torch Adam with seven param groups and mutates group
LRs every step (reference scene/gaussian_model.py:211-247). Here the
optimizer is a pure function over the GaussianState params pytree; the
per-leaf learning rates are computed from the iteration number and passed in,
so the whole update jits into the train step.

Torch-Adam semantics preserved: beta=(0.9, 0.999), eps=1e-15 added OUTSIDE
the sqrt, bias correction by a shared step count. Moment surgery for
densification lives in models/gaussians.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opengaussian_tpu.config import OptimizationConfig

BETA1, BETA2, EPS = 0.9, 0.999, 1e-15


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jnp.ndarray  # scalar int32


def init(params: dict) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def apply(params: dict, grads: dict, state: AdamState, lrs: dict) -> tuple[dict, AdamState]:
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - BETA1**t
    c2 = 1.0 - BETA2**t

    def upd(p, g, m, v, lr):
        m = BETA1 * m + (1.0 - BETA1) * g
        v = BETA2 * v + (1.0 - BETA2) * g * g
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + EPS)
        return p - step, m, v

    out = {
        k: upd(params[k], grads[k], state.mu[k], state.nu[k], lrs[k]) for k in params
    }
    new_p = {k: v[0] for k, v in out.items()}
    mu = {k: v[1] for k, v in out.items()}
    nu = {k: v[2] for k, v in out.items()}
    return new_p, AdamState(mu=mu, nu=nu, count=count)


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    """Log-linear interpolation with optional delayed warmup (the Plenoxels
    schedule the reference uses, utils/general_utils.py:29-62). `step` may be
    a traced scalar."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay * log_lerp
    return jnp.where(step < 0, 0.0, out)


def learning_rates(
    opt: OptimizationConfig, iteration, spatial_lr_scale: float
) -> dict:
    """Per-leaf LR pytree matching GaussianState.params().

    Reproduces the reference's groups (scene/gaussian_model.py:216-224) and
    its per-step updates (scene/gaussian_model.py:236-247): xyz on the
    exponential schedule scaled by the scene extent; ins_feat at 1e-4 during
    stage 2.1 (root codebook) and 1e-3 otherwise; frozen_init_pts zeroes the
    position LR (the reference detaches xyz instead,
    scene/gaussian_model.py:227-228).
    """
    it = jnp.asarray(iteration, jnp.float32)
    xyz_lr = expon_lr(
        it,
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    if opt.frozen_init_pts:
        xyz_lr = jnp.zeros_like(xyz_lr)
    in_stage21 = (it > opt.start_root_cb_iter) & (it <= opt.start_leaf_cb_iter)
    ins_lr = jnp.where(in_stage21, 1e-4, 1e-3)
    # Stage >= 1 freezes geometry/appearance by detaching them in the loss
    # (reference train.py:429-436); we zero their LRs instead.
    geo = jnp.where(it > opt.start_ins_feat_iter, 0.0, 1.0)
    return dict(
        means=xyz_lr * geo,
        sh_dc=opt.feature_lr * geo,
        sh_rest=opt.feature_lr / 20.0 * geo,
        logit_opacity=opt.opacity_lr * geo,
        log_scales=opt.scaling_lr * geo,
        quats=opt.rotation_lr * geo,
        ins_feat=ins_lr,
    )
