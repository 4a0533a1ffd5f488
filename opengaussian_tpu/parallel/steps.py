"""Sharded training steps for EVERY trainer stage (0 / 1 / 2.1 / 2.2).

Extends the stage-0-only sharded step of round 1 to the full five-stage
pipeline (VERDICT r1 §multi-chip): the expensive rasterization runs
Gaussian-sharded -> tile-sharded via parallel/render.render_sharded (AD
turns its all_gather into a reduce-scatter of per-Gaussian grads), while the
small [H, W]-sized loss math (SSIM window, SAM mask segment-sums, pseudo-
label L1/L2) runs on the replicated composited image — a few MB of ICI
traffic against the sharded hot path.

Semantics mirror the single-device steps in train/loop.py one-to-one:
stage 0 updates densification stats from the screen-space gradient tap and
radii; stages >= 1 freeze geometry via stop_gradient; stage 2.x quantize
ins_feat through the codebook with the straight-through estimator; stage 2.2
renders only the round-robin root cluster and skips the update when that
root is invisible (reference train.py:497).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops import kmeans as km
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.ops.sh import sh_to_rgb
from opengaussian_tpu.parallel.render import render_sharded
from opengaussian_tpu.train import losses
from opengaussian_tpu.utils import masks as masku


from opengaussian_tpu.render import encoded_ins_feat as _encoded_feat


def make_sharded_steps(mesh, rcfg: RasterizeConfig, ocfg,
                       spatial_lr_scale: float = 1.0, axis: str = "dev"):
    """-> namespace of jitted sharded steps: stage0, stage1, stage21,
    stage22, eval_render. Cameras are traced pytree args (one compile per
    image size, not per view)."""
    from opengaussian_tpu.train.loop import _freeze_geometry, _mask_sh

    def _rgb_pass(gs, camera, bg, tap):
        rgb = sh_to_rgb(3, gs.sh, gs.means, camera.cam_center)
        cov = build_cov3d(gs.scales, gs.quats)
        return render_sharded(
            mesh, camera, gs.means, cov, gs.opacity, rgb, bg, rcfg, axis,
            screen_tap=tap,
        )

    def _feat_pass(gs, camera, bg, rescale, quantized=None):
        feat = _encoded_feat(gs, quantized)
        cov = build_cov3d(gs.scales * rescale, gs.quats)
        fbg = jnp.concatenate([bg, bg])
        return render_sharded(
            mesh, camera, gs.means, cov, gs.opacity, feat, fbg, rcfg, axis
        )

    @jax.jit
    def stage0(state, adam, stats, camera: Camera, gt, alpha_mask,
               iteration, bg, has_alpha=False):
        """alpha_mask: [H,W] GT alpha or None. has_alpha: traced bool gating
        the mask loss per view (mirrors the single-device
        bundle.has_alpha[view_idx] gate — maskless views carry an all-ones
        placeholder that must NOT be regressed against)."""

        def loss_fn(params, tap):
            gs = _mask_sh(state.with_params(params), iteration)
            img, alpha, _depth, radii, n_lost = _rgb_pass(gs, camera, bg, tap)
            loss = losses.rgb_loss(img, gt, ocfg.lambda_dssim)
            if alpha_mask is not None:
                loss = loss + jnp.where(
                    has_alpha, jnp.mean((alpha - alpha_mask) ** 2), 0.0
                )
            return loss, (img, radii, n_lost)

        tap0 = jnp.zeros((state.capacity, 2))
        (loss, (img, radii, n_lost)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params(), tap0)
        lrs = opt_mod.learning_rates(ocfg, iteration, spatial_lr_scale)
        new_p, adam = opt_mod.apply(state.params(), grads[0], adam, lrs)
        stats = stats.update(grads[1], radii)
        aux = dict(image=img, psnr=losses.psnr(img, gt), n_lost=n_lost)
        return state.with_params(new_p), adam, stats, loss, aux

    @partial(jax.jit, static_argnames=("max_masks",))
    def stage1(state, adam, camera: Camera, sam, alpha_mask, iteration, bg,
               rescale, max_masks: int, has_alpha=False):
        def loss_fn(params):
            gs = state.with_params(_freeze_geometry(params))
            feat_img, sil_a, _d, _r, n_lost = _feat_pass(gs, camera, bg, rescale)
            sil = (sil_a > 0.7).astype(jnp.float32)
            masks, valid = masku.masks_onehot(sam, max_masks)
            means = masku.mask_feature_mean(feat_img, masks, image_mask=sil)
            l_coh = losses.cohesion_loss(feat_img, masks, valid, means)
            l_sep = losses.separation_loss(means, valid, iteration)
            loss = l_sep + ocfg.loss_weight * l_coh
            a_term, a_lost = _alpha_term(gs, camera, bg, alpha_mask, has_alpha)
            return loss + a_term, jnp.maximum(n_lost, a_lost)

        (loss, n_lost), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params()
        )
        lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
        new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
        return state.with_params(new_p), adam, loss, n_lost

    def _alpha_term(gs, camera, bg, alpha_mask, has_alpha):
        """-> (loss term, n_lost of the extra color pass) — the alpha pass
        renders under the same tuned budgets and must feed budget health."""
        if alpha_mask is None:
            return 0.0, jnp.int32(0)
        _i, alpha, _d, _r, lost = _rgb_pass(
            gs, camera, bg, jnp.zeros((gs.capacity, 2))
        )
        term = jnp.where(has_alpha, jnp.mean((alpha - alpha_mask) ** 2), 0.0)
        return term, lost

    @jax.jit
    def stage21(state, adam, kms, camera: Camera, pseudo_feat, alpha_mask,
                iteration, bg, rescale, has_alpha=False):
        def loss_fn(params):
            p = _freeze_geometry(params)
            q = km.quantize(kms, p["ins_feat"], "root")
            gs = state.with_params(p)
            feat_img, sil_a, _d, _r, n_lost = _feat_pass(gs, camera, bg, rescale, q)
            keep = (sil_a > 0.7).astype(jnp.float32)[..., None]
            loss = losses.l1_loss(feat_img, pseudo_feat, keep)
            a_term, a_lost = _alpha_term(gs, camera, bg, alpha_mask, has_alpha)
            return loss + a_term, jnp.maximum(n_lost, a_lost)

        (loss, n_lost), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params()
        )
        lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
        new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
        return state.with_params(new_p), adam, loss, n_lost

    @jax.jit
    def stage22(state, adam, kms, camera: Camera, pseudo_feat, root_id,
                root_visible, alpha_mask, iteration, bg, rescale,
                has_alpha=False):
        """Renders ONLY the selected root cluster (masked opacity — a splat
        with zero opacity does not alter transmittance, so this equals the
        reference's boolean-index re-launch) with leaf-quantized features."""
        member = (kms.cls_ids == root_id) & state.alive

        def loss_fn(params):
            p = _freeze_geometry(params)
            q = km.quantize(kms, p["ins_feat"], "leaf")
            gs = state.with_params(p)
            feat = _encoded_feat(gs, q)
            cov = build_cov3d(gs.scales * rescale, gs.quats)
            opac = jnp.where(member, gs.opacity, 0.0)
            fbg = jnp.concatenate([bg, bg])
            img, alpha, _d, _r, n_lost = render_sharded(
                mesh, camera, gs.means, cov, opac, feat, fbg, rcfg, axis
            )
            sil = (alpha > 0.7).astype(jnp.float32)[..., None]
            occur = (jnp.max(alpha) > 0.8) & (jnp.sum(member) >= 1)
            ok = occur & root_visible
            loss = losses.l2_loss(img, pseudo_feat, sil)
            a_term, a_lost = _alpha_term(gs, camera, bg, alpha_mask, has_alpha)
            loss = loss + a_term
            return jnp.where(ok, loss, 0.0), (ok, jnp.maximum(n_lost, a_lost))

        (loss, (ok, n_lost)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params()
        )
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
        new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
        return state.with_params(new_p), adam, loss, ok, n_lost

    @jax.jit
    def eval_render(state, camera: Camera, bg):
        img, alpha, depth, radii, n_lost = _rgb_pass(
            state, camera, bg, jnp.zeros((state.capacity, 2))
        )
        return img, alpha, depth

    return SimpleNamespace(
        stage0=stage0, stage1=stage1, stage21=stage21, stage22=stage22,
        eval_render=eval_render,
    )
