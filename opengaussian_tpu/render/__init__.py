"""Render orchestration: GaussianState -> multi-mode outputs.

Functional equivalent of the reference's `render()` entry point
(reference gaussian_renderer/__init__.py:22-373), redesigned TPU-first:

  * RGB (from SH), the 6-D instance-feature map, its silhouette, and depth
    come out of at most TWO rasterizer calls — one for color at true scale,
    one 6-channel feature pass at the (probabilistically) rescaled scale —
    instead of the reference's four 3-channel launches;
  * coarse/leaf cluster renders share one projection + binning and vmap the
    blend over per-cluster opacity masks (`rasterize_groups`) instead of
    boolean-index re-launches per cluster;
  * the reference's data-dependent `continue` filters (cluster invisible,
    fewer than 100 splats, silhouette < 0.8) become validity flags on
    statically-shaped outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models.gaussians import GaussianState
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import (
    RasterizeConfig,
    RasterOut,
    rasterize,
    rasterize_groups,
    rasterize_scan_groups,
)
from opengaussian_tpu.ops.sh import sh_to_rgb

# Cluster-render semantic gates (reference gaussian_renderer/__init__.py:184,
# :248 and train.py occur checks). Shared with the mesh-sharded sweep twins
# (parallel/sweeps.py) so the two paths cannot drift.
COARSE_SCALE_LIMIT = 0.5  # better_vis coarse cluster scale cull
LEAF_SCALE_LIMIT = 0.1  # leaf-level scale cull
MIN_CLUSTER_POINTS = 100  # coarse cluster validity
OCCUR_SIL_THRESHOLD = 0.8  # silhouette peak for cluster_occur


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutputs:
    """Counterpart of the reference's 14-key dict
    (gaussian_renderer/__init__.py:360-373). None where a mode is off."""

    render: Any = None  # [H,W,3]
    alpha: Any = None  # [H,W]
    depth: Any = None  # [H,W]
    silhouette: Any = None  # [H,W] alpha of the rescaled feature pass
    ins_feat: Any = None  # [H,W,6]
    cluster_imgs: Any = None  # [G,H,W,6]
    cluster_silhouettes: Any = None  # [G,H,W]
    cluster_occur: Any = None  # [G] bool (max silhouette > 0.8)
    cluster_valid: Any = None  # [G] bool (rendered at all; replaces `continue`)
    screen_grad_tap: Any = None  # the [N,2] zeros whose grad is the densify signal
    visibility_filter: Any = None  # [N] bool
    radii: Any = None  # [N] int32
    n_lost: Any = None  # [] int32 dropped+truncated intersections (budget health)


def encoded_ins_feat(gs: GaussianState, quantized=None, origin_feat: bool = False):
    """(normalized feat + 1)/2, the color-slot encoding the reference uses
    (gaussian_renderer/__init__.py:129)."""
    q = None if origin_feat else quantized
    return (gs.normalized_ins_feat(q) + 1.0) / 2.0


def render(
    camera: Camera,
    gs: GaussianState,
    bg: jnp.ndarray,  # [3]
    active_sh_degree: int,
    config: RasterizeConfig = RasterizeConfig(),
    *,
    render_color: bool = True,
    render_feat_map: bool = False,
    origin_feat: bool = False,
    quantized_feat: jnp.ndarray | None = None,
    rescale_factor: jnp.ndarray | float = 1.0,
    screen_tap: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    frozen=None,
) -> RenderOutputs:
    """Main render path (stages 0-2.1 image-level passes).

    frozen: a per-view ops.rasterize.FrozenPlan built at scale_modifier /
    rescale_factor 1.0 under this camera + geometry — serves BOTH passes
    (at rescale 1 the color and feature covariances are identical, and a
    rescaled feature pass rides the superset plan; see FrozenPlan)."""
    scales = gs.scales * scale_modifier
    cov3d = build_cov3d(scales, gs.quats)
    opac = gs.opacity
    out = RenderOutputs()

    radii = None
    if render_color:
        rgb = sh_to_rgb(active_sh_degree, gs.sh, gs.means, camera.cam_center)
        r = rasterize(camera, gs.means, cov3d, opac, rgb, bg, config,
                      screen_tap, frozen=frozen)
        out = dataclasses.replace(
            out,
            render=r.image,
            alpha=r.alpha,
            depth=r.depth,
            radii=r.radii,
            visibility_filter=r.radii > 0,
            screen_grad_tap=screen_tap,
            n_lost=r.n_dropped + r.n_truncated,
        )
        radii = r.radii

    if render_feat_map:
        feat = encoded_ins_feat(gs, quantized_feat, origin_feat)
        cov3d_f = build_cov3d(scales * rescale_factor, gs.quats)
        fbg = jnp.concatenate([bg, bg])  # reference applies the same 3-ch bg
        rf = rasterize(camera, gs.means, cov3d_f, opac, feat, fbg, config,
                       frozen=frozen)
        lost = rf.n_dropped + rf.n_truncated
        out = dataclasses.replace(
            out, ins_feat=rf.image, silhouette=rf.alpha,
            n_lost=lost if out.n_lost is None else jnp.maximum(out.n_lost, lost),
        )
        if radii is None:
            out = dataclasses.replace(
                out, radii=rf.radii, visibility_filter=rf.radii > 0
            )
    return out


def render_clusters(
    camera: Camera,
    gs: GaussianState,
    bg: jnp.ndarray,
    cluster_ids: jnp.ndarray,  # [N] int cluster assignment
    group_ids: jnp.ndarray,  # [G] int: which cluster each group renders
    config: RasterizeConfig = RasterizeConfig(),
    *,
    quantized_feat: jnp.ndarray | None = None,
    origin_feat: bool = False,
    rescale_factor: jnp.ndarray | float = 1.0,
    extra_mask: jnp.ndarray | None = None,  # [N] bool pre_mask
    better_vis: bool = False,
    scale_limit: float = COARSE_SCALE_LIMIT,  # 0.5 coarse / 0.1 leaf
    min_points: int = MIN_CLUSTER_POINTS,
    payload_rgb: bool = False,  # seg_rgb mode: composite SH color instead
    active_sh_degree: int = 3,
    frozen=None,
) -> RenderOutputs:
    """Per-cluster feature/silhouette renders (stage 2.2 + pseudo-label sweeps
    + text/click selection).

    Matches reference gaussian_renderer/__init__.py:174-356: each group g
    renders only splats with cluster_ids == group_ids[g] (visible, optionally
    small-scale, optionally pre-masked); a group is `valid` when it kept at
    least `min_points` splats, `occur` when its silhouette peaks above 0.8.

    frozen: the per-view FULL-FRAME FrozenPlan (the same one stages 1/2.1
    use). A group render is a masked-opacity blend, and masked opacities are
    a subset of the plan's own — zeroed members hit the alpha < 1/255 rule-1
    skip exactly, so the shared frozen stream reproduces the per-group
    re-binning bit-for-bit (tests/test_frozen.py). Each group pays a
    full-stream walk, so this wins for small G (stage 2.2's G == 1) while
    the per-group scan re-binning stays the default for the k1-group sweeps.
    """
    scales = gs.scales
    cov3d = build_cov3d(scales * rescale_factor, gs.quats)
    if payload_rgb:
        payload = sh_to_rgb(active_sh_degree, gs.sh, gs.means, camera.cam_center)
        fbg = bg
    else:
        payload = encoded_ins_feat(gs, quantized_feat, origin_feat)
        fbg = jnp.concatenate([bg, bg])

    member = cluster_ids[None, :] == group_ids[:, None]  # [G, N]
    keep = member & gs.alive[None, :]
    if extra_mask is not None:
        keep = keep & extra_mask[None, :]
    if better_vis:
        keep = keep & jnp.all(scales < scale_limit, axis=-1)[None, :]
    return _render_groups(camera, gs, keep, payload, fbg, cov3d, config,
                          min_points, frozen=frozen)


def render_clusters_partition(
    camera: Camera,
    gs: GaussianState,
    bg: jnp.ndarray,
    cluster_ids: jnp.ndarray,  # [N] int cluster assignment
    group_ids: jnp.ndarray,  # [G] int: which cluster each group renders
    config: RasterizeConfig = RasterizeConfig(),
    *,
    quantized_feat: jnp.ndarray | None = None,
    origin_feat: bool = False,
    rescale_factor: jnp.ndarray | float = 1.0,
    better_vis: bool = False,
    scale_limit: float = COARSE_SCALE_LIMIT,
    min_points: int = MIN_CLUSTER_POINTS,
    proj=None,
    rank=None,
) -> RenderOutputs:
    """render_clusters for DISJOINT group_ids via ONE partition rasterize.

    Same contract as render_clusters (cluster_imgs/silhouettes/occur/valid),
    but all G groups share one binning/sort/kernel launch
    (ops/rasterize.rasterize_partition) — the per-group fixed render cost
    dominates the stage-3 lang sweep under the scan mode. Requires the
    group_ids to select DISJOINT clusters (always true for cluster
    partitions) and the Pallas stream path. Budgets: config.group_config()
    must cover the PARTITION's total intersections (for a root's k2 leaves
    that is the root's own load, which tuned_group_config sized groupP
    for). proj/rank: optional hoisted projection (masked internally) +
    depth rank, shared across e.g. a scan over roots."""
    from opengaussian_tpu.ops.rasterize import rasterize_partition

    gcfg = config.group_config()
    scales = gs.scales
    cov3d = build_cov3d(scales * rescale_factor, gs.quats)
    payload = encoded_ins_feat(gs, quantized_feat, origin_feat)
    fbg = jnp.concatenate([bg, bg])

    member = cluster_ids[None, :] == group_ids[:, None]  # [G, N]
    keep = member & gs.alive[None, :]
    if better_vis:
        keep = keep & jnp.all(scales < scale_limit, axis=-1)[None, :]
    counts = keep.sum(axis=-1)
    valid = counts >= min_points
    union = jnp.any(keep, axis=0)  # [N]
    group_of = jnp.argmax(keep, axis=0).astype(jnp.int32)  # disjoint: <= 1 hit
    opac = jnp.where(union, gs.opacity, 0.0)
    if proj is not None:
        proj = dataclasses.replace(
            proj,
            radius=jnp.where(union, proj.radius, 0),
            cull_radius=jnp.where(union, proj.cull_radius, 0.0),
            num_tiles=jnp.where(union, proj.num_tiles, 0),
            valid=proj.valid & union,
        )
    r = rasterize_partition(
        camera, gs.means, cov3d, opac, group_of, int(group_ids.shape[0]),
        payload, fbg, gcfg, proj=proj, rank=rank,
    )
    occur = jnp.max(r.alpha, axis=(1, 2)) > OCCUR_SIL_THRESHOLD
    return RenderOutputs(
        cluster_imgs=r.image,
        cluster_silhouettes=r.alpha,
        cluster_occur=occur & valid,
        cluster_valid=valid,
        radii=r.radii,
        visibility_filter=r.radii > 0,
        n_lost=r.n_dropped + r.n_truncated,
    )


def render_selection(
    camera: Camera,
    gs: GaussianState,
    bg: jnp.ndarray,
    select_mask: jnp.ndarray,  # [N] bool — e.g. union of text-matched leaves
    config: RasterizeConfig = RasterizeConfig(),
    *,
    payload_rgb: bool = True,
    active_sh_degree: int = 3,
    better_vis: bool = True,
    scale_limit: float = LEAF_SCALE_LIMIT,
    min_points: int = 10,
) -> RenderOutputs:
    """Render one explicit subset of splats (text/click 3D object selection;
    reference gaussian_renderer/__init__.py:276-356 with selected_leaf_id).
    KNN outlier post-processing is applied by the caller on the mask
    (ops/knn.statistical_outlier_mask), host-side."""
    if payload_rgb:
        payload = sh_to_rgb(active_sh_degree, gs.sh, gs.means, camera.cam_center)
        fbg = bg
    else:
        payload = encoded_ins_feat(gs)
        fbg = jnp.concatenate([bg, bg])
    keep = select_mask & gs.alive
    if better_vis:
        keep = keep & jnp.all(gs.scales < scale_limit, axis=-1)
    cov3d = build_cov3d(gs.scales, gs.quats)
    out = _render_groups(
        camera, gs, keep[None, :], payload, fbg, cov3d, config, min_points
    )
    return dataclasses.replace(
        out,
        cluster_imgs=out.cluster_imgs[0],
        cluster_silhouettes=out.cluster_silhouettes[0],
        cluster_occur=out.cluster_occur[0],
        cluster_valid=out.cluster_valid[0],
    )


def _render_groups(camera, gs, keep, payload, fbg, cov3d, config, min_points,
                   frozen=None):
    counts = keep.sum(axis=-1)
    valid = counts >= min_points

    opac = jnp.where(keep, gs.opacity[None, :], 0.0)
    if frozen is not None:
        # masked-opacity blend over the shared frozen full-frame stream (at
        # the FRAME budgets the plan was built with — group budgets do not
        # apply here); see render_clusters' frozen note
        def one(opac_g):
            r = rasterize(camera, gs.means, cov3d, opac_g, payload, fbg,
                          config, frozen=frozen)
            return (r.image, r.alpha, r.depth, r.radii, r.n_dropped,
                    r.n_truncated)

        if opac.shape[0] == 1:
            img, alpha, depth, radii, nd, nt = jax.tree.map(
                lambda x: x[None], one(opac[0]))
            radii, nd, nt = radii[0], nd[0], nt[0]
        else:
            _, (img, alpha, depth, radii, nd, nt) = jax.lax.scan(
                lambda c, o: (c, one(o)), None, opac)
            radii = jnp.max(radii, axis=0)
            nd, nt = jnp.sum(nd), jnp.sum(nt)
        r = RasterOut(image=img, alpha=alpha, depth=depth, radii=radii,
                      n_dropped=nd, n_truncated=nt)
    else:
        # group_render="scan" (the default via "auto"): per-group re-binning
        # on the stream path — see rasterize_scan_groups. "dense" keeps the
        # shared-binning vmapped twin.
        groups_fn = (rasterize_groups if config.group_render == "dense"
                     else rasterize_scan_groups)
        r = groups_fn(camera, gs.means, cov3d, opac, payload, fbg, config)
    occur = jnp.max(r.alpha, axis=(1, 2)) > OCCUR_SIL_THRESHOLD
    return RenderOutputs(
        cluster_imgs=r.image,
        cluster_silhouettes=r.alpha,
        cluster_occur=occur & valid,
        cluster_valid=valid,
        radii=r.radii,
        visibility_filter=r.radii > 0,
        n_lost=r.n_dropped + r.n_truncated,
    )
