"""Five-stage training loop.

TPU-first rewrite of the reference trainer (reference train.py:157-635):
stage 0 3DGS pretrain -> stage 1 instance-feature learning -> stage 2.1
coarse codebook -> stage 2.2 fine codebook -> stage 3 language association
(train/lang.py). Differences by design:

  * every view's ground truth (images, decoded SAM ids, alpha masks, camera
    params) is preloaded into device-resident stacked arrays; the jitted
    step takes a view index and slices on device — no host->device transfer
    in the hot loop (the reference moves tensors per step via to_gpu/to_cpu,
    scene/cameras.py:94-107);
  * the iteration number is a traced scalar: LR schedules, SH-degree
    activation (coefficient masking instead of a growing eval degree), and
    stage-dependent loss constants compile once per stage;
  * densification/opacity-reset are separate jitted events on the padded
    state; "detach frozen params" becomes zero LRs + stop_gradient.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import Config
from opengaussian_tpu.data.dataset import Scene, View
from opengaussian_tpu.data.ply import save_gaussian_ply
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops import kmeans as km
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render, render_clusters
from opengaussian_tpu.train import checkpoint as ckpt
from opengaussian_tpu.train import losses
from opengaussian_tpu.train import pseudo as pseudo_mod
from opengaussian_tpu.utils import codebook as cb
from opengaussian_tpu.utils import masks as masku


# ---------------------------------------------------------------------------
# device-resident view bundle
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ViewBundle:
    R: Any  # [V,3,3]
    t: Any  # [V,3]
    fx: Any
    fy: Any
    cx: Any
    cy: Any
    gt_images: Any  # [V,H,W,3]
    alpha_masks: Any  # [V,H,W] (1.0 where no mask given)
    has_alpha: Any  # [V] bool
    sam_ids: Any  # [V,H,W] int32 (0 = no sidecar / invalid)
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    max_masks: int = dataclasses.field(metadata=dict(static=True))

    def camera(self, i) -> Camera:
        return Camera(
            R_w2c=self.R[i], t_w2c=self.t[i], fx=self.fx[i], fy=self.fy[i],
            cx=self.cx[i], cy=self.cy[i], width=self.width, height=self.height,
        )

    @property
    def num_views(self) -> int:
        return self.gt_images.shape[0]


def bundle_views(views: list[View], sam_level: int,
                 device: bool = True) -> ViewBundle:
    """device=True: all views resident in HBM (no transfers in the hot
    loop). device=False: the save_memory mode — arrays stay host numpy and
    the trainer streams ONE view's window to the device per step (the
    TPU-shaped equivalent of the reference's --save_memory to_gpu/to_cpu
    shuffling, reference scene/cameras.py:94-107, train.py:633-635)."""
    from opengaussian_tpu.data.lazy import LazyStack, is_lazy

    assert views, "no views"
    h, w = views[0].gt_image.shape[:2]
    for v in views:
        assert v.gt_image.shape[:2] == (h, w), "views must share a resolution"
    lazy = any(is_lazy(v.gt_image) for v in views)
    ids = []
    max_masks = 8
    for v in views:
        if v.sam_mask is not None:
            # lazy views decode here once (streaming — not retained)
            m = masku.decode_sam_level(np.asarray(v.sam_mask), sam_level)
            max_masks = max(max_masks, int(m.max()))
            if not lazy:
                ids.append(m.astype(np.int32))
        elif not lazy:
            ids.append(np.zeros((h, w), np.int32))
    max_masks = int(np.ceil(max_masks / 8) * 8)
    if lazy:
        # host RSS holds ONE view: the per-view stacks stay lazy; the
        # trainer's save_memory window (bundle_window) decodes one view per
        # step. Stage boundaries that np.asarray a full stack (pseudo
        # sweeps, the SAM refiner) still work via LazyStack.__array__ at a
        # transient spike.
        assert not device, "lazy scenes require save_memory (host bundles)"

        def _ids_loader(v):
            if v.sam_mask is None:
                return np.zeros((h, w), np.int32)
            return masku.decode_sam_level(
                np.asarray(v.sam_mask), sam_level).astype(np.int32)

        def _alpha_loader(v):
            if v.gt_alpha_mask is None:
                return np.ones((h, w), np.float32)
            return np.asarray(v.gt_alpha_mask, np.float32)

        return ViewBundle(
            R=np.stack([np.asarray(v.camera.R_w2c) for v in views]),
            t=np.stack([np.asarray(v.camera.t_w2c) for v in views]),
            fx=np.asarray([v.camera.fx for v in views], np.float32),
            fy=np.asarray([v.camera.fy for v in views], np.float32),
            cx=np.asarray([v.camera.cx for v in views], np.float32),
            cy=np.asarray([v.camera.cy for v in views], np.float32),
            gt_images=LazyStack(
                [lambda v=v: np.asarray(v.gt_image, np.float32)
                 for v in views], (h, w, 3), np.float32),
            alpha_masks=LazyStack(
                [lambda v=v: _alpha_loader(v) for v in views],
                (h, w), np.float32),
            has_alpha=np.asarray(
                [v.gt_alpha_mask is not None for v in views]),
            sam_ids=LazyStack(
                [lambda v=v: _ids_loader(v) for v in views],
                (h, w), np.int32),
            width=w, height=h, max_masks=max_masks,
        )
    conv = jnp.asarray if device else np.asarray
    return ViewBundle(
        R=conv(np.stack([np.asarray(v.camera.R_w2c) for v in views])),
        t=conv(np.stack([np.asarray(v.camera.t_w2c) for v in views])),
        fx=conv(np.asarray([v.camera.fx for v in views], np.float32)),
        fy=conv(np.asarray([v.camera.fy for v in views], np.float32)),
        cx=conv(np.asarray([v.camera.cx for v in views], np.float32)),
        cy=conv(np.asarray([v.camera.cy for v in views], np.float32)),
        gt_images=conv(np.stack([np.asarray(v.gt_image, np.float32) for v in views])),
        alpha_masks=conv(np.stack(
            [np.asarray(v.gt_alpha_mask if v.gt_alpha_mask is not None
                        else np.ones((h, w), np.float32), np.float32)
             for v in views]
        )),
        has_alpha=conv(np.asarray([v.gt_alpha_mask is not None for v in views])),
        sam_ids=conv(np.stack(ids)),
        width=w,
        height=h,
        max_masks=max_masks,
    )


def bundle_window(bundle: ViewBundle, vi: int) -> ViewBundle:
    """One-view device window of a host-resident bundle (save_memory)."""
    sl = lambda x: jnp.asarray(np.asarray(x[vi:vi + 1]))
    return ViewBundle(
        R=sl(bundle.R), t=sl(bundle.t), fx=sl(bundle.fx), fy=sl(bundle.fy),
        cx=sl(bundle.cx), cy=sl(bundle.cy), gt_images=sl(bundle.gt_images),
        alpha_masks=sl(bundle.alpha_masks), has_alpha=sl(bundle.has_alpha),
        sam_ids=sl(bundle.sam_ids), width=bundle.width, height=bundle.height,
        max_masks=bundle.max_masks,
    )


def _mask_sh(gs: G.GaussianState, iteration) -> G.GaussianState:
    """SH-degree warmup: degree rises every 1000 iters (reference
    train.py:255-256); inactive coefficients are masked to zero, which also
    blocks their gradients exactly like rendering at a lower degree."""
    deg = jnp.minimum(iteration // 1000, 3)
    n_active = (deg + 1) ** 2
    idx = jnp.arange(gs.sh_rest.shape[1]) + 1
    mask = (idx < n_active).astype(gs.sh_rest.dtype)
    return dataclasses.replace(gs, sh_rest=gs.sh_rest * mask[None, :, None])


def _freeze_geometry(params: dict) -> dict:
    out = dict(params)
    for k in params:
        if k != "ins_feat":
            out[k] = jax.lax.stop_gradient(params[k])
    return out


# ---------------------------------------------------------------------------
# jitted steps (one per stage)
# ---------------------------------------------------------------------------


def _stage0_body(state, adam, stats, bundle: ViewBundle, view_idx, iteration,
                 bg, spatial_lr_scale: float, rcfg: RasterizeConfig, ocfg):
    cam = bundle.camera(view_idx)
    gt = bundle.gt_images[view_idx]

    def loss_fn(params, tap):
        gs = _mask_sh(state.with_params(params), iteration)
        out = render(cam, gs, bg, 3, rcfg, screen_tap=tap)
        loss = losses.rgb_loss(out.render, gt, ocfg.lambda_dssim)
        loss = loss + jnp.where(
            bundle.has_alpha[view_idx],
            jnp.mean((out.alpha - bundle.alpha_masks[view_idx]) ** 2),
            0.0,
        )
        return loss, out

    tap0 = jnp.zeros((state.capacity, 2))
    (loss, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.params(), tap0
    )
    lrs = opt_mod.learning_rates(ocfg, iteration, spatial_lr_scale)
    new_p, adam = opt_mod.apply(state.params(), grads[0], adam, lrs)
    stats = stats.update(grads[1], out.radii)
    return (state.with_params(new_p), adam, stats, loss,
            losses.psnr(out.render, gt), out.n_lost)


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "spatial_lr_scale"),
         donate_argnums=(0, 1, 2))
def stage0_step(state, adam, stats, bundle: ViewBundle, view_idx, iteration, bg,
                spatial_lr_scale: float, rcfg: RasterizeConfig, ocfg):
    return _stage0_body(state, adam, stats, bundle, view_idx, iteration, bg,
                        spatial_lr_scale, rcfg, ocfg)


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "spatial_lr_scale"),
         donate_argnums=(0, 1, 2))
def stage0_block(state, adam, stats, bundle: ViewBundle, vis, its, bgs,
                 spatial_lr_scale: float, rcfg: RasterizeConfig, ocfg):
    """lax.scan over a block of stage-0 steps: ONE dispatch per block keeps
    the hot loop device-bound (per-dispatch latency through the remote
    tunnel otherwise dominates at small scenes)."""

    def body(carry, xs):
        st, ad, sa = carry
        vi, it, bg = xs
        st, ad, sa, loss, psnr, lost = _stage0_body(
            st, ad, sa, bundle, vi, it, bg, spatial_lr_scale, rcfg, ocfg
        )
        return (st, ad, sa), (loss, psnr, lost)

    (state, adam, stats), (ls, ps, lo) = jax.lax.scan(
        body, (state, adam, stats), (vis, its, bgs)
    )
    return state, adam, stats, ls[-1], ps[-1], jnp.max(lo)


def _alpha_mask_loss(out_alpha, bundle, view_idx):
    # per-view gate: maskless views carry an all-ones placeholder that must
    # not be regressed against (reference train.py:491 checks per camera)
    return jnp.where(
        bundle.has_alpha[view_idx],
        jnp.mean((out_alpha - bundle.alpha_masks[view_idx]) ** 2),
        0.0,
    )


def _stage1_body(state, adam, bundle: ViewBundle, view_idx, iteration, bg,
                 rescale_factor, rcfg: RasterizeConfig, ocfg,
                 with_alpha_loss: bool = False, frozen=None):
    cam = bundle.camera(view_idx)
    sam = bundle.sam_ids[view_idx]

    def loss_fn(params):
        gs = state.with_params(_freeze_geometry(params))
        out = render(
            cam, gs, bg, 3, rcfg,
            render_color=with_alpha_loss, render_feat_map=True,
            rescale_factor=rescale_factor, frozen=frozen,
        )
        sil = (out.silhouette > 0.7).astype(jnp.float32)
        masks, valid = masku.masks_onehot(sam, bundle.max_masks)
        means = masku.mask_feature_mean(out.ins_feat, masks, image_mask=sil)
        l_coh = losses.cohesion_loss(out.ins_feat, masks, valid, means)
        l_sep = losses.separation_loss(means, valid, iteration)
        loss = l_sep + ocfg.loss_weight * l_coh
        if with_alpha_loss:
            loss = loss + _alpha_mask_loss(out.alpha, bundle, view_idx)
        return loss, out.n_lost

    (loss, n_lost), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params()
    )
    lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
    new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
    return state.with_params(new_p), adam, loss, n_lost


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage1_step(state, adam, bundle: ViewBundle, view_idx, iteration, bg,
                rescale_factor, rcfg: RasterizeConfig, ocfg,
                with_alpha_loss: bool = False, frozen_all=None,
                plan_idx=None):
    """frozen_all: a [V, ...]-stacked FrozenPlan pytree (Trainer cache);
    sliced INSIDE the jit (plan_idx, defaulting to view_idx) — eager
    per-step slicing would cost one tunnel round trip per leaf."""
    fz = None
    if frozen_all is not None:
        pi = view_idx if plan_idx is None else plan_idx
        fz = jax.tree.map(lambda x: x[pi], frozen_all)
    return _stage1_body(state, adam, bundle, view_idx, iteration, bg,
                        rescale_factor, rcfg, ocfg, with_alpha_loss, fz)


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage1_block(state, adam, bundle: ViewBundle, vis, its, bgs, rescales,
                 rcfg: RasterizeConfig, ocfg, with_alpha_loss: bool = False,
                 frozen_all=None):
    def body(carry, xs):
        st, ad = carry
        vi, it, bg, rs = xs
        fz = (jax.tree.map(lambda x: x[vi], frozen_all)
              if frozen_all is not None else None)
        st, ad, loss, lost = _stage1_body(
            st, ad, bundle, vi, it, bg, rs, rcfg, ocfg, with_alpha_loss, fz
        )
        return (st, ad), (loss, lost)

    (state, adam), (ls, lo) = jax.lax.scan(
        body, (state, adam), (vis, its, bgs, rescales)
    )
    return state, adam, ls[-1], jnp.max(lo)


def _stage21_body(state, adam, kms, bundle: ViewBundle, view_idx, iteration, bg,
                  rescale_factor, pseudo_feat, rcfg: RasterizeConfig, ocfg,
                  with_alpha_loss: bool = False, frozen=None):
    """Coarse-codebook stage: L1(rendered quantized feat, pseudo feat) inside
    the rendered silhouette (reference train.py:464-473)."""
    cam = bundle.camera(view_idx)

    def loss_fn(params):
        p = _freeze_geometry(params)
        q = km.quantize(kms, p["ins_feat"], "root")
        gs = state.with_params(p)
        out = render(
            cam, gs, bg, 3, rcfg,
            render_color=with_alpha_loss, render_feat_map=True,
            quantized_feat=q, rescale_factor=rescale_factor, frozen=frozen,
        )
        keep = (out.silhouette > 0.7).astype(jnp.float32)[..., None]
        loss = losses.l1_loss(out.ins_feat, pseudo_feat, keep)
        if with_alpha_loss:
            loss = loss + _alpha_mask_loss(out.alpha, bundle, view_idx)
        return loss, out.n_lost

    (loss, n_lost), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params()
    )
    lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
    new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
    return state.with_params(new_p), adam, loss, n_lost


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage21_step(state, adam, kms, bundle: ViewBundle, view_idx, iteration, bg,
                 rescale_factor, pseudo_feat, rcfg: RasterizeConfig, ocfg,
                 with_alpha_loss: bool = False, frozen_all=None,
                 plan_idx=None):
    fz = None
    if frozen_all is not None:
        pi = view_idx if plan_idx is None else plan_idx
        fz = jax.tree.map(lambda x: x[pi], frozen_all)
    return _stage21_body(state, adam, kms, bundle, view_idx, iteration, bg,
                         rescale_factor, pseudo_feat, rcfg, ocfg,
                         with_alpha_loss, fz)


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage21_block(state, adam, kms, bundle: ViewBundle, vis, its, bgs,
                  rescales, pseudo_feat_all, rcfg: RasterizeConfig, ocfg,
                  with_alpha_loss: bool = False, frozen_all=None):
    def body(carry, xs):
        st, ad = carry
        vi, it, bg, rs = xs
        fz = (jax.tree.map(lambda x: x[vi], frozen_all)
              if frozen_all is not None else None)
        st, ad, loss, lost = _stage21_body(
            st, ad, kms, bundle, vi, it, bg, rs, pseudo_feat_all[vi],
            rcfg, ocfg, with_alpha_loss, fz,
        )
        return (st, ad), (loss, lost)

    (state, adam), (ls, lo) = jax.lax.scan(
        body, (state, adam), (vis, its, bgs, rescales)
    )
    return state, adam, ls[-1], jnp.max(lo)


def _stage22_body(state, adam, kms, bundle: ViewBundle, view_idx, iteration, bg,
                  rescale_factor, pseudo_feat, root_id, root_visible,
                  rcfg: RasterizeConfig, ocfg, with_alpha_loss: bool = False,
                  frozen=None):
    """Fine-codebook stage: render the selected coarse cluster with
    leaf-quantized features, L2 against the pseudo features inside the
    cluster silhouette (reference train.py:475-489). Skips the update when
    the root is invisible in this view (no_need_bk, train.py:497).

    frozen: the view's full-frame FrozenPlan. Root assignments are fixed
    during stage 2.2 (assign_root only runs in 2.1), so the single-root
    cluster render rides the shared plan as a masked-opacity blend
    (render_clusters' frozen note) instead of re-binning per step."""
    cam = bundle.camera(view_idx)

    def loss_fn(params):
        p = _freeze_geometry(params)
        q = km.quantize(kms, p["ins_feat"], "leaf")
        gs = state.with_params(p)
        out = render_clusters(
            cam, gs, bg, kms.cls_ids, root_id[None], rcfg,
            quantized_feat=q, rescale_factor=rescale_factor, min_points=1,
            frozen=frozen,
        )
        sil = (out.cluster_silhouettes[0] > 0.7).astype(jnp.float32)[..., None]
        ok = out.cluster_occur[0] & root_visible
        loss = losses.l2_loss(out.cluster_imgs[0], pseudo_feat, sil)
        n_lost = out.n_lost
        if with_alpha_loss:
            color = render(cam, gs, bg, 3, rcfg, frozen=frozen)
            loss = loss + _alpha_mask_loss(color.alpha, bundle, view_idx)
            n_lost = jnp.maximum(n_lost, color.n_lost)  # budget health
        return jnp.where(ok, loss, 0.0), (ok, n_lost)

    (loss, (ok, n_lost)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params()
    )
    lrs = opt_mod.learning_rates(ocfg, iteration, 1.0)
    grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
    new_p, adam = opt_mod.apply(state.params(), grads, adam, lrs)
    return state.with_params(new_p), adam, loss, ok, n_lost


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage22_step(state, adam, kms, bundle: ViewBundle, view_idx, iteration, bg,
                 rescale_factor, pseudo_feat, root_id, root_visible,
                 rcfg: RasterizeConfig, ocfg, with_alpha_loss: bool = False,
                 frozen_all=None, plan_idx=None):
    fz = None
    if frozen_all is not None:
        pi = view_idx if plan_idx is None else plan_idx
        fz = jax.tree.map(lambda x: x[pi], frozen_all)
    return _stage22_body(state, adam, kms, bundle, view_idx, iteration, bg,
                         rescale_factor, pseudo_feat, root_id, root_visible,
                         rcfg, ocfg, with_alpha_loss, fz)


@partial(jax.jit, static_argnames=("rcfg", "ocfg", "with_alpha_loss"),
         donate_argnums=(0, 1))
def stage22_block(state, adam, kms, bundle: ViewBundle, vis, its, bgs,
                  rescales, root_ids, pseudo_feat_all, cluster_occur,
                  rcfg: RasterizeConfig, ocfg, with_alpha_loss: bool = False,
                  frozen_all=None):
    def body(carry, xs):
        st, ad = carry
        vi, it, bg, rs, rid = xs
        fz = (jax.tree.map(lambda x: x[vi], frozen_all)
              if frozen_all is not None else None)
        st, ad, loss, _, lost = _stage22_body(
            st, ad, kms, bundle, vi, it, bg, rs, pseudo_feat_all[vi], rid,
            cluster_occur[vi, rid], rcfg, ocfg, with_alpha_loss, fz,
        )
        return (st, ad), (loss, lost)

    (state, adam), (ls, lo) = jax.lax.scan(
        body, (state, adam), (vis, its, bgs, rescales, root_ids)
    )
    return state, adam, ls[-1], jnp.max(lo)


@partial(jax.jit, static_argnames=("rcfg",))
def eval_view(state, bundle: ViewBundle, view_idx, bg, rcfg: RasterizeConfig):
    cam = bundle.camera(view_idx)
    out = render(cam, state, bg, 3, rcfg)
    img = jnp.clip(out.render, 0.0, 1.0)
    gt = bundle.gt_images[view_idx]
    return img, losses.psnr(img, gt), losses.l1_loss(img, gt)


# ---------------------------------------------------------------------------
# host-side trainer
# ---------------------------------------------------------------------------


class Trainer:
    def __init__(self, scene: Scene, cfg: Config, out_dir: str,
                 rcfg: RasterizeConfig | None = None, seed: int = 0,
                 autotune_budgets: bool = True, mesh=None):
        """mesh: a jax.sharding.Mesh routes every stage through the sharded
        steps in parallel/steps.py (Gaussian-sharded params, tile-sharded
        blend); None keeps the single-device path."""
        self.scene = scene
        self.cfg = cfg
        self.out_dir = out_dir
        self.mesh = mesh
        self._psteps = None
        self._psteps_key = None
        self._psweeps = None
        self._psweeps_key = None
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "cfg_args.json"), "w") as f:
            f.write(cfg.to_json())

        # sorted order is load-bearing for pseudo labels (train.py:673)
        self.train_views = sorted(scene.train_views, key=lambda v: v.image_name)
        self.save_memory = bool(cfg.opt.save_memory)
        self.bundle = bundle_views(
            self.train_views, cfg.opt.sam_level, device=not self.save_memory
        )
        # save_memory keeps the test views host-resident too (ADVICE r1:
        # device-resident test bundles defeated the mode for large test sets)
        self.test_bundle = (
            bundle_views(sorted(scene.test_views, key=lambda v: v.image_name),
                         cfg.opt.sam_level, device=not self.save_memory)
            if scene.test_views else None
        )
        self.rcfg = rcfg or RasterizeConfig()
        # worst-case ceiling for budget autotuning: re-probes (e.g. after a
        # drop warning) tune against THIS, not the current possibly-shrunk
        # rcfg, so budgets can grow back when the scene's load increases
        self._base_rcfg = self.rcfg
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
        )
        self.spatial_lr_scale = scene.cameras_extent

        self.state = G.create_from_pcd(
            np.asarray(scene.points, np.float32),
            np.asarray(scene.colors, np.float32),
            sh_degree=cfg.model.sh_degree,
            seed=seed,
        )
        self.adam = opt_mod.init(self.state.params())
        self.stats = G.DensifyStats.zeros(self.state.capacity)
        self.kms = km.KMeansState.create(
            self.state.capacity, cfg.opt.root_node_num, cfg.opt.leaf_node_num
        )
        self.pseudo: pseudo_mod.PseudoLabels | None = None
        if self.mesh is not None:
            self._reshard()
        self.any_alpha = bool(np.asarray(self.bundle.has_alpha).any())
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.iteration = 0
        self.root_id = 0
        self.autotune_budgets = autotune_budgets
        self._budgets_tuned = False
        # Frozen-geometry per-view binning plans (ops/rasterize.FrozenPlan):
        # past stage 0 only ins_feat trains, so the per-view sort order and
        # reduction order are loop-invariant — caching them removes the
        # expand/pack/sort/searchsorted chain AND the backward's by-id sort
        # from every stage-1/2.1 step (~2x at the ScanNet recipe shape,
        # tools/stage_bench.py). None = not built; False = tried and
        # disabled (budgets lost slots, or the memory cap).
        self.use_frozen_plans = True
        self._frozen_plans = None
        # device-memory cap for the stacked plans (bytes)
        self.frozen_plan_bytes_cap = 4 << 30
        self._last_lost = None  # budget-health scalar from the last stage-0 step
        self._last_view = 0
        self._tb_first_eval = True
        # periodic PNG dumps of the training process (reference
        # train.py:503 save_intermediate)
        self.save_intermediate = True
        # SIBR remote viewer (reference train.py:235-248; disabled unless a
        # port is given, matching the reference's commented-out init)
        self.viewer_port: int | None = None
        self._viewer_ready = False
        self._view_queue: list[int] = []
        self.history: list[dict] = []
        # TensorBoard scalars, like the reference's prepare_output_and_logger
        # (reference train.py:637-657,956-993); degrades to history-only when
        # torch/tensorboard is unavailable.
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(out_dir)
        except Exception:
            print("Tensorboard not available: not logging progress")

    # -- multi-chip routing --

    def _reshard(self):
        """(Re)place the training state sharded over the mesh — after init,
        capacity growth, or densification events that de-shard leaves."""
        from opengaussian_tpu.parallel.mesh import shard_gaussians

        self.state = shard_gaussians(self.mesh, self.state)
        self.adam = opt_mod.AdamState(
            mu=shard_gaussians(self.mesh, self.adam.mu),
            nu=shard_gaussians(self.mesh, self.adam.nu),
            count=self.adam.count,
        )
        self.stats = shard_gaussians(self.mesh, self.stats)

    def _sharded_steps(self):
        from opengaussian_tpu.parallel.steps import make_sharded_steps

        key = (self.rcfg, self.spatial_lr_scale)
        if self._psteps is None or self._psteps_key != key:
            self._psteps = make_sharded_steps(
                self.mesh, self.rcfg, self.cfg.opt, self.spatial_lr_scale
            )
            self._psteps_key = key
        return self._psteps

    def _run_single_sharded(self, it: int, stage: str):
        o = self.cfg.opt
        vi = self._last_view = self._next_view()
        bg = self._bg_for(stage)
        b = self.bundle
        cam = b.camera(vi)
        steps = self._sharded_steps()
        # jnp.asarray is a no-op for device-resident bundles and a single
        # H2D for host (save_memory) bundles — no D2H round trips
        alpha_mask = jnp.asarray(b.alpha_masks[vi]) if self.any_alpha else None
        has_alpha = jnp.asarray(b.has_alpha[vi])
        if stage == "0":
            (self.state, self.adam, self.stats, loss, aux) = steps.stage0(
                self.state, self.adam, self.stats, cam,
                jnp.asarray(b.gt_images[vi]), alpha_mask,
                jnp.int32(it), bg, has_alpha,
            )
            self._last_lost = aux["n_lost"]
        elif stage == "1":
            self.state, self.adam, loss, self._last_lost = steps.stage1(
                self.state, self.adam, cam, jnp.asarray(b.sam_ids[vi]),
                alpha_mask, jnp.int32(it), bg,
                jnp.float32(self._rescale_factor(it)),
                max_masks=b.max_masks, has_alpha=has_alpha,
            )
        elif stage == "2.1":
            self.state, self.adam, loss, self._last_lost = steps.stage21(
                self.state, self.adam, self.kms, cam,
                jnp.asarray(self.pseudo.feat[vi]), alpha_mask, jnp.int32(it),
                bg, jnp.float32(self._rescale_factor(it)),
                has_alpha=has_alpha,
            )
        else:
            root_vis = (
                jnp.bool_(bool(np.asarray(self.pseudo.cluster_occur)[vi, self.root_id]))
                if self.pseudo is not None and self.pseudo.cluster_occur is not None
                else jnp.bool_(True)
            )
            self.state, self.adam, loss, _, self._last_lost = steps.stage22(
                self.state, self.adam, self.kms, cam,
                jnp.asarray(self.pseudo.feat[vi]), jnp.int32(self.root_id),
                root_vis, alpha_mask, jnp.int32(it), bg,
                jnp.float32(self._rescale_factor(it)),
                has_alpha=has_alpha,
            )
        return loss

    # -- helpers --

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _next_view(self) -> int:
        if not self._view_queue:
            self._view_queue = list(self.rng.permutation(self.bundle.num_views))
        return int(self._view_queue.pop())

    def _stage(self, it: int) -> str:
        o = self.cfg.opt
        if it <= o.start_ins_feat_iter:
            return "0"
        if it <= o.start_root_cb_iter:
            return "1"
        if it <= o.start_leaf_cb_iter:
            return "2.1"
        return "2.2"

    def _tune_budgets(self):
        """Right-size the static binning budgets to the scene (ops/budget.py);
        runs once at training start and again after capacity growth (which
        recompiles the step anyway)."""
        if not self.autotune_budgets:
            return
        from opengaussian_tpu.ops import budget

        cams = [self.bundle.camera(i) for i in range(self.bundle.num_views)]
        new = budget.tuned_config(self._base_rcfg, self.state, cams,
                                  mesh=self.mesh)
        if new != self.rcfg:
            old_p = self.rcfg.max_intersections(self.state.capacity)
            new_p = new.max_intersections(self.state.capacity)
            print(f"[budget] intersections {old_p}->{new_p}, "
                  f"max_per_tile {self.rcfg.max_per_tile}->{new.max_per_tile}",
                  flush=True)
            self.rcfg = new
            if self._frozen_plans is not None:
                self._frozen_plans = None  # rebuild at the new budgets
        # a frame re-tune rebuilt rcfg from the base config, dropping any
        # group budgets — re-probe them if the coarse assignment exists
        if self.iteration + 1 > self.cfg.opt.start_root_cb_iter:
            self._tune_group_budgets()
        self._budgets_tuned = True

    def _tune_group_budgets(self):
        """Per-root budgets for the scan-mode group renders (stage 2.2,
        pseudo sweep 2, the stage-3 lang sweep): probed at each stage-2
        entry with the fresh coarse assignment, and re-probed with the frame
        budgets on drop warnings. A single root holds ~1/k1 of the scene, so
        these budgets are ~k1 x smaller than the frame's — every per-slot
        phase of the per-group binning scales with them. No-ops under a mesh
        (the sharded sweep twins blend per-group over the shared union
        binning) and when group_render='dense'."""
        if not self.autotune_budgets or self.mesh is not None:
            return
        if self.rcfg.group_render == "dense":
            return
        from opengaussian_tpu.ops import budget

        cams = [self.bundle.camera(i) for i in range(self.bundle.num_views)]
        new = budget.tuned_group_config(
            self.rcfg, self.state, cams, self.kms.cls_ids,
            self.cfg.opt.root_node_num,
        )
        if new != self.rcfg:
            print(f"[budget] group budgets P={new.group_intersection_budget} "
                  f"K={new.group_max_per_tile}", flush=True)
            self.rcfg = new

    def _maybe_grow(self):
        # geometry is about to change (densify path) — any frozen plans are
        # stale (they are only built past stage 0, but guard regardless)
        if self._frozen_plans is not None:
            self._frozen_plans = None
        frac = int(self.state.num_alive) / self.state.capacity
        if frac > 0.9:
            new_cap = G.round_capacity(int(self.state.capacity * 2))
            self.state = G.grow_capacity(self.state, new_cap)
            mu = G.grow_capacity(self.adam.mu, new_cap)
            nu = G.grow_capacity(self.adam.nu, new_cap)
            self.adam = opt_mod.AdamState(mu=mu, nu=nu, count=self.adam.count)
            self.stats = G.grow_capacity(self.stats, new_cap)
            self._budgets_tuned = False  # re-probe at the new scale
            self.kms = self.kms._replace(
                cls_ids=G.grow_capacity(self.kms.cls_ids, new_cap),
                leaf_cls_ids=jnp.concatenate([
                    self.kms.leaf_cls_ids,
                    jnp.full((new_cap - self.kms.leaf_cls_ids.shape[0],),
                             self.cfg.opt.root_node_num * self.cfg.opt.leaf_node_num,
                             jnp.int32),
                ]),
            )

    def _rescale_factor(self, it: int) -> float:
        """50% chance of a uniform rescale once past start_root_cb_iter
        (reference gaussian_renderer/__init__.py:121-124, train.py:347-350)."""
        if it <= self.cfg.opt.start_root_cb_iter:
            return 1.0
        if self.rng.random() > 0.5:
            return float(self.rng.random())
        return 1.0

    def _sweeps(self):
        """Mesh-sharded sweep functions (parallel/sweeps.py), memoized on the
        raster config / codebook geometry — None on a single device."""
        if self.mesh is None:
            return None
        from opengaussian_tpu.parallel.sweeps import make_sweep_fns

        o = self.cfg.opt
        key = (self.rcfg, o.root_node_num, o.leaf_node_num,
               self.bundle.max_masks)
        if self._psweeps is None or self._psweeps_key != key:
            self._psweeps = make_sweep_fns(
                self.mesh, self.rcfg, o.root_node_num, o.leaf_node_num,
                self.bundle.max_masks,
            )
            self._psweeps_key = key
        return self._psweeps

    def _ensure_frozen_plans(self):
        """Build (once) the stacked per-view FrozenPlan cache for stages
        1 / 2.1. Applies only off-mesh on the Pallas stream path; disabled
        if any view's build loses slots at the current budgets (the
        exactness precondition — FrozenPlan docstring) or the stack would
        exceed frozen_plan_bytes_cap."""
        if (not self.use_frozen_plans or self.mesh is not None
                or self._frozen_plans is False):
            return None
        if not (self.rcfg.use_pallas()
                and self.rcfg.pallas_input == "stream"):
            return None
        if self._frozen_plans is not None:
            return self._frozen_plans
        from opengaussian_tpu.ops.projection import build_cov3d
        from opengaussian_tpu.ops.rasterize import build_frozen_plan

        V = self.bundle.num_views
        n = self.state.capacity
        P = self.rcfg.max_intersections(n)
        # per view: g_sorted [P] + reduce perm/ids_pad [~NC*chunk] x2
        est = V * 4 * (P + 2 * (P + self.rcfg.max_per_tile * 8))
        if est > self.frozen_plan_bytes_cap:
            print(f"[frozen] plans disabled: ~{est >> 20} MB exceeds the "
                  f"{self.frozen_plan_bytes_cap >> 20} MB cap", flush=True)
            self._frozen_plans = False
            return None
        build = jax.jit(build_frozen_plan, static_argnames=("config",))
        cov3d = build_cov3d(self.state.scales, self.state.quats)
        t0 = time.time()
        plans = []
        for vi in range(V):
            plans.append(build(self.bundle.camera(vi), self.state.means,
                               cov3d, self.state.opacity, config=self.rcfg))
        # ONE host sync for the lossless check (a per-view int() would pay
        # the tunnel RTT V times)
        lost = int(sum(p.n_dropped + p.n_truncated for p in plans))
        if lost > 0:
            print(f"[frozen] plans disabled: builds lost {lost} slots at "
                  "the tuned budgets (would break superset exactness)",
                  flush=True)
            self._frozen_plans = False
            return None
        self._frozen_plans = jax.tree.map(
            lambda *xs: jnp.stack(xs), *plans)
        print(f"[frozen] built {V} view plans in {time.time() - t0:.1f}s",
              flush=True)
        return self._frozen_plans

    def _ensure_pseudo(self, mode: str):
        cams = [self.bundle.camera(i) for i in range(self.bundle.num_views)]
        self.pseudo = pseudo_mod.construct_pseudo_labels(
            self.state, cams, self.bundle.sam_ids, self.bg,
            self.bundle.max_masks, self.rcfg, mode=mode,
            cls_ids=self.kms.cls_ids, k1=self.cfg.opt.root_node_num,
            k2=self.cfg.opt.leaf_node_num, to_host=self.save_memory,
            sweep_fns=self._sweeps(),
        )
        if mode == "leaf" and self.pseudo.leaf_sub_num is not None:
            self.kms = self.kms._replace(leaf_sub_num=self.pseudo.leaf_sub_num)

    # -- main loop --

    # Block scheduling: scan several steps per dispatch. Measured on the
    # axon v5e, async dispatch already pipelines the per-step RPC latency
    # away (block vs single steady-state within 2%), while every distinct
    # scan length costs one extra remote compile (~1 min) — so the default
    # is single-step dispatch. Set e.g. (50, 10, 5) for environments where
    # host dispatch is the bottleneck (very fast steps or a loaded host);
    # distinct lengths compile separately, so the menu is kept tiny.
    BLOCK_SIZES: tuple = ()

    def _pre_events(self, it: int, stage: str):
        """Host-side events that must run BEFORE step `it` (one-shot
        refinement, pseudo-label sweeps, codebook reassignment, root-id
        round-robin) — reference train.py:265-355,393-426."""
        o = self.cfg.opt
        if (
            o.enable_multiview_sam_refinement
            and it == o.start_ins_feat_iter + 1
        ):
            self.refine_sam_masks()
        if it == o.start_root_cb_iter + 1:
            self._ensure_pseudo("root")
        if it == o.start_leaf_cb_iter + 1:
            self._ensure_pseudo("leaf")
        if stage == "2.1":
            if it % 200 == 1 or it == o.start_root_cb_iter + 1:
                self.kms = km.assign_root(
                    self.kms, self.state.ins_feat, self.state.means,
                    self.state.alive, o.pos_weight, self._next_key(),
                    init=(it == o.start_root_cb_iter + 1),
                )
                if it == o.start_root_cb_iter + 1:
                    self._tune_group_budgets()  # first real assignment
        elif stage == "2.2":
            if it % 50 == 1 or it == o.start_leaf_cb_iter + 1:
                self.kms = km.assign_leaf(
                    self.kms, self.state.ins_feat, self.state.alive,
                    jnp.int32(self.root_id), self._next_key(),
                    k2=o.leaf_node_num,
                    init=(it == o.start_leaf_cb_iter + 1),
                )
                if it == o.start_leaf_cb_iter + 1:
                    self._tune_group_budgets()  # stage-2.2 entry assignment

    def _has_pre_event(self, it: int, stage: str) -> bool:
        o = self.cfg.opt
        if it in (o.start_ins_feat_iter + 1, o.start_root_cb_iter + 1,
                  o.start_leaf_cb_iter + 1):
            return True
        if stage == "2.1" and it % 200 == 1:
            return True
        if stage == "2.2" and it % 50 == 1:
            return True
        return False

    def _has_post_event(self, it: int, stage: str, until: int,
                        log_every: int) -> bool:
        o = self.cfg.opt
        if it % log_every == 0 or it >= until:
            return True
        if stage == "0":
            if it < o.densify_until_iter and not o.frozen_init_pts:
                if it > o.densify_from_iter and it % o.densification_interval == 0:
                    return True
                if it % o.opacity_reset_interval == 0 or (
                    self.cfg.model.white_background and it == o.densify_from_iter
                ):
                    return True
        return False

    def _post_events(self, it: int, stage: str):
        """Densification / opacity-reset events AFTER step `it` (reference
        train.py:593-605)."""
        o = self.cfg.opt
        if stage != "0":
            return
        if it < o.densify_until_iter and not o.frozen_init_pts:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                self._maybe_grow()
                self.state, (mu, nu), self.stats, _ = G.densify_and_prune(
                    self.state, (self.adam.mu, self.adam.nu), self.stats,
                    self._next_key(), o.densify_grad_threshold, 0.005,
                    self.scene.cameras_extent,
                    20.0 if it > o.opacity_reset_interval else 0.0,
                    o.percent_dense,
                )
                self.adam = opt_mod.AdamState(mu, nu, self.adam.count)
            if it % o.opacity_reset_interval == 0 or (
                self.cfg.model.white_background and it == o.densify_from_iter
            ):
                self.state, (mu, nu) = G.reset_opacity(
                    self.state, (self.adam.mu, self.adam.nu)
                )
                self.adam = opt_mod.AdamState(mu, nu, self.adam.count)
            if self.mesh is not None:
                self._reshard()  # densify events may de-shard leaves

    def _block_len(self, it: int, stage: str, until: int, log_every: int) -> int:
        """Largest n such that steps it..it+n-1 form one dispatch: no pre
        event strictly inside, no post event except after the last step."""
        if not self.BLOCK_SIZES or self.save_memory or self.mesh is not None:
            return 1
        limit = min(self.BLOCK_SIZES[0], until - it + 1)
        n = 1
        while n < limit:
            j = it + n
            if self._stage(j) != stage or self._has_pre_event(j, stage):
                break
            if self._has_post_event(j - 1, stage, until, log_every):
                break
            n += 1
        for b in self.BLOCK_SIZES:
            if n >= b:
                return b
        return 1

    def _bg_for(self, stage: str):
        o = self.cfg.opt
        if o.random_background and stage == "0":
            return jnp.asarray(self.rng.random(3), jnp.float32)
        return self.bg

    def train(self, until: int | None = None, log_every: int = 200):
        o = self.cfg.opt
        until = until or o.iterations
        t_start = time.time()
        while self.iteration < until:
            if not self._budgets_tuned:
                self._tune_budgets()
            self._poll_viewer()
            it = self.iteration + 1
            stage = self._stage(it)
            if stage == "2.2" and (it - o.start_leaf_cb_iter) % o.leaf_update_fr == 0:
                self.root_id = (self.root_id + 1) % o.root_node_num
            self._pre_events(it, stage)

            n = self._block_len(it, stage, until, log_every)
            if n > 1:
                loss = self._run_block(it, stage, n)
            else:
                loss = self._run_single(it, stage)
            it_last = it + n - 1
            self.iteration = it_last
            self._post_events(it_last, stage)

            if self.save_intermediate:
                from opengaussian_tpu.train import observe

                if it_last % observe.dump_frequency(stage) == 0:
                    observe.dump_intermediate(self, it_last, stage,
                                              self._last_view)

            if it_last % log_every == 0 or it_last >= until:
                # Budget health: densification / opacity re-learning can
                # outgrow the tuned intersection budgets WITHIN a fixed
                # capacity (ADVICE r1) — when the last step dropped or
                # truncated intersections, warn and re-probe the budgets.
                if self._last_lost is not None and int(self._last_lost) > 0:
                    print(
                        f"[budget] WARNING: step {it_last} lost "
                        f"{int(self._last_lost)} intersections to the tuned "
                        f"budgets; re-probing", flush=True,
                    )
                    self._budgets_tuned = False
                    self._last_lost = None
                rec = dict(
                    iteration=it_last, stage=stage, loss=float(loss),
                    num_alive=int(self.state.num_alive),
                    elapsed=time.time() - t_start,
                )
                if stage == "2.2":
                    # stage 2.2 trains ONE root per step (round-robin), so
                    # the loss trajectory only reads per-root — tag the rec
                    rec["root_id"] = int(self.root_id)
                self.history.append(rec)
                if self.tb is not None:
                    self.tb.add_scalar("train_loss_patches/total_loss",
                                       rec["loss"], it_last)
                    self.tb.add_scalar("total_points", rec["num_alive"], it_last)
                    self.tb.add_scalar("iter_time",
                                       rec["elapsed"] / max(it_last, 1), it_last)
                print(
                    f"[it {it_last}] stage {stage} loss {rec['loss']:.5f} "
                    f"pts {rec['num_alive']} ({rec['elapsed']:.0f}s)",
                    flush=True,
                )

    def _run_single(self, it: int, stage: str):
        if self.mesh is not None:
            return self._run_single_sharded(it, stage)
        o = self.cfg.opt
        vi = self._last_view = self._next_view()
        bg = self._bg_for(stage)
        bundle, svi = self.bundle, vi
        if self.save_memory:
            # stream this view's window to the device (async H2D overlaps
            # with the previous step's compute)
            bundle, svi = bundle_window(self.bundle, vi), 0
        if stage == "0":
            self.state, self.adam, self.stats, loss, _psnr, self._last_lost = (
                stage0_step(
                    self.state, self.adam, self.stats, bundle,
                    jnp.int32(svi), jnp.int32(it), bg, self.spatial_lr_scale,
                    self.rcfg, o,
                )
            )
        elif stage == "1":
            self.state, self.adam, loss, self._last_lost = stage1_step(
                self.state, self.adam, bundle, jnp.int32(svi),
                jnp.int32(it), bg, jnp.float32(self._rescale_factor(it)),
                self.rcfg, o, self.any_alpha,
                frozen_all=self._ensure_frozen_plans(),
                plan_idx=jnp.int32(vi),
            )
        elif stage == "2.1":
            self.state, self.adam, loss, self._last_lost = stage21_step(
                self.state, self.adam, self.kms, bundle, jnp.int32(svi),
                jnp.int32(it), bg, jnp.float32(self._rescale_factor(it)),
                jnp.asarray(self.pseudo.feat[vi]), self.rcfg, o,
                self.any_alpha,
                frozen_all=self._ensure_frozen_plans(),
                plan_idx=jnp.int32(vi),
            )
        else:
            root_vis = (
                jnp.bool_(bool(np.asarray(self.pseudo.cluster_occur)[vi, self.root_id]))
                if self.pseudo is not None and self.pseudo.cluster_occur is not None
                else jnp.bool_(True)
            )
            # stage 2.2 intentionally does NOT use frozen plans: the
            # single-root masked blend over the full frozen stream measured
            # 17.0 ms where the fresh per-root scan re-binning at the small
            # group budgets measures 14.0 (tools/stage_bench.py A/B) — the
            # full-P walk costs more than the binning it saves
            self.state, self.adam, loss, _, self._last_lost = stage22_step(
                self.state, self.adam, self.kms, bundle, jnp.int32(svi),
                jnp.int32(it), bg, jnp.float32(self._rescale_factor(it)),
                jnp.asarray(self.pseudo.feat[vi]), jnp.int32(self.root_id),
                root_vis, self.rcfg, o, self.any_alpha,
            )
        return loss

    def _run_block(self, it: int, stage: str, n: int):
        """One scanned dispatch of n consecutive steps (no events inside)."""
        o = self.cfg.opt
        its = jnp.arange(it, it + n, dtype=jnp.int32)
        vis_host = [self._next_view() for _ in range(n)]
        self._last_view = vis_host[-1]
        vis = jnp.asarray(vis_host, jnp.int32)
        bgs = jnp.stack([self._bg_for(stage) for _ in range(n)])
        if stage == "0":
            self.state, self.adam, self.stats, loss, _psnr, self._last_lost = (
                stage0_block(
                    self.state, self.adam, self.stats, self.bundle, vis, its,
                    bgs, self.spatial_lr_scale, self.rcfg, o,
                )
            )
            return loss
        rescales = jnp.asarray(
            [self._rescale_factor(j) for j in range(it, it + n)], jnp.float32
        )
        if stage == "1":
            self.state, self.adam, loss, self._last_lost = stage1_block(
                self.state, self.adam, self.bundle, vis, its, bgs, rescales,
                self.rcfg, o, self.any_alpha,
                frozen_all=self._ensure_frozen_plans(),
            )
        elif stage == "2.1":
            self.state, self.adam, loss, self._last_lost = stage21_block(
                self.state, self.adam, self.kms, self.bundle, vis, its, bgs,
                rescales, self.pseudo.feat, self.rcfg, o, self.any_alpha,
                frozen_all=self._ensure_frozen_plans(),
            )
        else:
            # root-id round-robin advances inside the block
            root_ids = []
            rid = self.root_id
            for j in range(it, it + n):
                if j > it and (j - o.start_leaf_cb_iter) % o.leaf_update_fr == 0:
                    rid = (rid + 1) % o.root_node_num
                root_ids.append(rid)
            self.root_id = rid
            occur = (
                self.pseudo.cluster_occur
                if self.pseudo is not None and self.pseudo.cluster_occur is not None
                else jnp.ones((self.bundle.num_views, o.root_node_num), bool)
            )
            # no frozen plans for 2.2 (see _run_single's stage-2.2 note)
            self.state, self.adam, loss, self._last_lost = stage22_block(
                self.state, self.adam, self.kms, self.bundle, vis, its, bgs,
                rescales, jnp.asarray(root_ids, jnp.int32),
                self.pseudo.feat, occur, self.rcfg, o, self.any_alpha,
            )
        return loss

    # -- remote viewer (reference train.py:235-248) --

    def _poll_viewer(self):
        if self.viewer_port is None:
            return
        from opengaussian_tpu.viewer import network_gui

        if not self._viewer_ready:
            network_gui.init("127.0.0.1", self.viewer_port)
            self._viewer_ready = True
        network_gui.poll_and_render(
            self._viewer_render, self.cfg.model.source_path or self.out_dir
        )

    def _viewer_render(self, cam: dict, scale_mod: float) -> bytes:
        w, h = cam["width"], cam["height"]
        w2c = cam["w2c"]
        camera = Camera(
            R_w2c=jnp.asarray(w2c[:3, :3]), t_w2c=jnp.asarray(w2c[:3, 3]),
            fx=jnp.float32(w / (2.0 * np.tan(cam["fovx"] / 2.0))),
            fy=jnp.float32(h / (2.0 * np.tan(cam["fovy"] / 2.0))),
            cx=jnp.float32((w - 1) / 2.0), cy=jnp.float32((h - 1) / 2.0),
            width=w, height=h,
        )
        out = render(camera, self.state, self.bg, 3, self.rcfg,
                     scale_modifier=float(scale_mod))
        img = np.clip(np.asarray(out.render), 0.0, 1.0)
        return (img * 255).astype(np.uint8).tobytes()

    def refine_sam_masks(self):
        """One-shot batched cross-view SAM mask refinement; rewrites the
        bundle's SAM ids in place (refine/sam_refiner.py)."""
        from opengaussian_tpu.refine.sam_refiner import refine_sam_masks

        print("Applying multi-view SAM mask refinement...", flush=True)
        cams = [self.bundle.camera(i) for i in range(self.bundle.num_views)]
        trace = None
        if self.save_intermediate:
            from opengaussian_tpu.refine.introspect import RefinerTrace

            trace = RefinerTrace(self.out_dir)
        state = self.state
        sharded_fns = None
        if self.mesh is not None:
            # the state STAYS sharded: the refiner's device passes (depth
            # render, id votes, stage-2 accumulation) route through the
            # mesh-sharded twins; only the replicated per-view outputs
            # ([N, M] votes, [H, W, M] weights) reach the host graph-merge,
            # which every process runs redundantly-but-identically
            from opengaussian_tpu.parallel.refine import make_refiner_fns

            sharded_fns = make_refiner_fns(self.mesh, self.rcfg)
        refined = refine_sam_masks(
            state, cams, np.asarray(self.bundle.sam_ids), self.rcfg,
            trace=trace, sharded_fns=sharded_fns,
        )
        ids = np.maximum(refined, 0).astype(np.int32)  # -1 void -> 0 invalid
        new_max = int(np.ceil(max(int(ids.max()), 8) / 8) * 8)
        conv = np.asarray if self.save_memory else jnp.asarray
        self.bundle = dataclasses.replace(
            self.bundle, sam_ids=conv(ids), max_masks=new_max
        )
        print("Multi-view SAM mask refinement completed", flush=True)

    def run_stage3(self) -> dict:
        """Language association (reference train.py:622-631): requires the
        leaf codebook; saves cluster_lang.npz in the output dir."""
        from opengaussian_tpu.train import lang

        if self.pseudo is None or self.pseudo.cluster_occur is None:
            self._ensure_pseudo("leaf")
        tables = lang.clip_tables_from_views(self.train_views, self.cfg.opt.sam_level)
        sweeps = self._sweeps()
        return lang.associate_language(
            self.state, self.kms, self.bundle, self.pseudo, tables, self.bg,
            self.cfg.opt.root_node_num, self.cfg.opt.leaf_node_num, self.rcfg,
            out_path=os.path.join(self.out_dir, "cluster_lang.npz"),
            view_fn=sweeps.lang_view if sweeps is not None else None,
        )

    # -- evaluation / artifacts --

    def evaluate(self, max_views: int = 25) -> dict:
        bundle = self.test_bundle or self.bundle
        n = min(bundle.num_views, max_views)
        host = self.save_memory  # both bundles are host-resident in this mode
        psnrs, l1s, imgs, gts = [], [], [], []
        for i in range(n):
            b, j = (bundle_window(bundle, i), 0) if host else (bundle, i)
            if self.mesh is not None:
                # keep the eval render sharded — the single-device eval_view
                # would replicate the whole state per call under a mesh
                img, _alpha, _depth = self._sharded_steps().eval_render(
                    self.state, b.camera(j), self.bg
                )
                img = jnp.clip(img, 0.0, 1.0)
                gt_img = jnp.asarray(b.gt_images[j])
                p = losses.psnr(img, gt_img)
                l1 = losses.l1_loss(img, gt_img)
            else:
                img, p, l1 = eval_view(self.state, b, jnp.int32(j), self.bg,
                                       self.rcfg)
            psnrs.append(float(p))
            l1s.append(float(l1))
            if len(imgs) < 5:
                imgs.append(np.asarray(img))
                gts.append(np.asarray(b.gt_images[j]))
        m = dict(psnr=float(np.mean(psnrs)), l1=float(np.mean(l1s)), views=n)
        if self.tb is not None:
            from opengaussian_tpu.train import observe

            split = "test" if self.test_bundle else "train"
            observe.tb_image_grids(self, imgs, gts, split, self._tb_first_eval)
            self._tb_first_eval = False
            self.tb.add_scalar(f"{split}/loss_viewpoint - psnr", m["psnr"],
                               self.iteration)
            self.tb.add_scalar(f"{split}/loss_viewpoint - l1_loss", m["l1"],
                               self.iteration)
            op = np.asarray(self.state.opacity)[np.asarray(self.state.alive)]
            self.tb.add_histogram("scene/opacity_histogram", op, self.iteration)
        return m

    def save(self, tag: str | None = None):
        it = self.iteration
        pc_dir = os.path.join(self.out_dir, f"point_cloud/iteration_{it}")
        os.makedirs(pc_dir, exist_ok=True)
        save_gaussian_ply(os.path.join(pc_dir, "point_cloud.ply"), self.state)
        if it > self.cfg.opt.start_root_cb_iter:
            alive = np.asarray(self.state.alive)
            cb.save_codebook(
                os.path.join(pc_dir, "root_code_book"),
                np.asarray(self.kms.centers), np.asarray(self.kms.cls_ids)[alive],
            )
            if it > self.cfg.opt.start_leaf_cb_iter:
                cb.save_codebook(
                    os.path.join(pc_dir, "leaf_code_book"),
                    np.asarray(self.kms.leaf_centers),
                    np.asarray(self.kms.leaf_cls_ids)[alive],
                )

    def save_checkpoint(self):
        ckpt.save(
            os.path.join(self.out_dir, f"chkpnt{self.iteration}.npz"),
            self.state, self.adam, self.stats, self.kms, self.iteration,
        )

    def restore_checkpoint(self, path: str):
        if path.endswith(".pth"):
            # reference torch checkpoint (scripts/train_scannet.sh:46-48)
            (self.state, self.adam, self.stats, self.iteration,
             self.spatial_lr_scale) = ckpt.load_torch(path)
        else:
            self.state, self.adam, self.stats, kms, self.iteration = ckpt.load(path)
            if kms is not None:
                self.kms = kms
        self.state = ckpt.ensure_ins_feat(self.state)
        if self.state.capacity != self.kms.cls_ids.shape[0]:
            o = self.cfg.opt
            self.kms = km.KMeansState.create(
                self.state.capacity, o.root_node_num, o.leaf_node_num
            )
        self._budgets_tuned = False
        # Keep the mesh invariant: state/adam/stats live sharded whenever a
        # mesh is configured (matches __init__ and the post-densify path).
        if self.mesh is not None:
            self._reshard()
