import dataclasses

import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models.gaussians import create_from_pcd, inverse_sigmoid
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.refine.sam_refiner import refine_sam_masks, splat_id_votes
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import rasterize

CFG = RasterizeConfig(max_per_tile=64, chunk=32, min_intersections=4096)


def two_blob_scene():
    """Two spatially separated opaque blobs observed by two cameras."""
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.normal(0, 0.05, (40, 3)) + [-0.6, 0.0, 3.0],
        rng.normal(0, 0.05, (40, 3)) + [0.6, 0.0, 3.0],
    ]).astype(np.float32)
    cols = np.concatenate([
        np.tile([1.0, 0, 0], (40, 1)), np.tile([0, 0, 1.0], (40, 1))
    ]).astype(np.float32)
    st = create_from_pcd(pts, cols, capacity=128, seed=0)
    st = dataclasses.replace(
        st, logit_opacity=jnp.where(st.alive, inverse_sigmoid(jnp.float32(0.995)), -10.0)
    )
    cams = [
        Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 48),
        Camera.from_fov(np.eye(3), np.asarray([0.05, 0.0, 0.0]), 1.0, 0.8, 64, 48),
    ]
    return st, cams


def sam_from_silhouettes(st, cams):
    """Per-view SAM ids: left blob id, right blob id — with DIFFERENT local
    ids per view to exercise the cross-view sync. Gated by the rendered
    silhouette (uncovered pixels are void, like real SAM masks): the
    reference keeps every base-mask pixel above the 0.5 expansion threshold
    (init 1.0, sam_refinement_utils.py:928-940), so a mask painted over
    empty sky would survive refinement verbatim."""
    out = []
    for i, cam in enumerate(cams):
        r = rasterize(
            cam, st.means, build_cov3d(st.scales, st.quats), st.opacity,
            jnp.zeros((st.capacity, 1)), jnp.zeros(1), CFG,
        )
        sil = np.asarray(r.alpha) > 0.3
        ids = np.zeros((48, 64), np.int64)
        # left half of the image sees blob A, right half blob B
        if i == 0:
            ids[:, :32] = 1
            ids[:, 32:] = 2
        else:
            ids[:, :32] = 2  # swapped local ids in view 2
            ids[:, 32:] = 1
        out.append(np.where(sil, ids, 0))
    return np.stack(out)


def test_splat_votes_pick_correct_mask():
    st, cams = two_blob_scene()
    sam = sam_from_silhouettes(st, cams)
    out = rasterize(
        cams[0], st.means, build_cov3d(st.scales, st.quats), st.opacity,
        jnp.zeros((st.capacity, 1)), jnp.zeros(1), CFG,
    )
    depth = out.depth / jnp.maximum(out.alpha, 1e-6)
    votes, vis = splat_id_votes(st, cams[0], jnp.asarray(sam[0]), depth, 2, CFG)
    votes = np.asarray(votes)
    alive = np.asarray(st.alive)
    # left-blob splats vote id 1, right-blob vote id 2 (view 0)
    dom = votes.argmax(axis=1) + 1
    assert (dom[:40] == 1).mean() > 0.9
    assert (dom[40:80][votes[40:80].max(axis=1) > 0] == 2).mean() > 0.9
    assert np.asarray(vis)[alive].mean() > 0.5


def test_refine_cross_view_consistency_many_views():
    """Synthetic multi-view scene with known object ids: 4 objects, 6 views,
    per-view PERMUTED local SAM ids. After refinement each object's region
    must carry one global id consistently across all views (match rate >95%)
    — the quality bar of the reference's refiner
    (reference utils/sam_refinement_utils.py:1159-1302)."""
    rng = np.random.default_rng(7)
    centers = np.array(
        [[-0.7, -0.5, 3.0], [0.7, -0.5, 3.0], [-0.7, 0.5, 3.0], [0.7, 0.5, 3.0]]
    )
    pts = np.concatenate(
        [rng.normal(0, 0.05, (30, 3)) + c for c in centers]
    ).astype(np.float32)
    cols = np.tile([0.5, 0.5, 0.5], (120, 1)).astype(np.float32)
    st = create_from_pcd(pts, cols, capacity=128, seed=0)
    st = dataclasses.replace(
        st,
        logit_opacity=jnp.where(
            st.alive, inverse_sigmoid(jnp.float32(0.995)), -10.0
        ),
    )
    obj_of_splat = np.full(128, -1)
    obj_of_splat[:120] = np.repeat(np.arange(4), 30)

    V = 6
    cams = [
        Camera.from_fov(
            np.eye(3), np.asarray([0.04 * v - 0.1, 0.02 * v - 0.05, 0.0]),
            1.0, 0.8, 64, 48,
        )
        for v in range(V)
    ]

    # ground-truth object per pixel from each view's projection; local SAM
    # ids are a per-view permutation of the object ids
    import jax

    sam = np.zeros((V, 48, 64), np.int64)
    gt_obj = np.full((V, 48, 64), -1)
    perms = [rng.permutation(4) for _ in range(V)]
    for v, cam in enumerate(cams):
        out = rasterize(
            cam, st.means, build_cov3d(st.scales, st.quats), st.opacity,
            jnp.asarray((obj_of_splat[:, None] == np.arange(4)).astype(np.float32)),
            jnp.zeros(4), CFG,
        )
        w = np.asarray(out.image)  # [H,W,4] per-object weight
        covered = np.asarray(out.alpha) > 0.3
        obj = w.argmax(-1)
        gt_obj[v] = np.where(covered, obj, -1)
        sam[v] = np.where(covered, perms[v][obj] + 1, 0)

    refined = refine_sam_masks(st, cams, sam, CFG, anchor_stride=1)

    # each object region must map to ONE dominant global id across all views
    match, total = 0, 0
    for obj in range(4):
        ids = refined[(gt_obj == obj) & (refined > 0)]
        assert len(ids) > 50, f"object {obj} lost its pixels"
        dom = np.bincount(ids).argmax()
        match += (ids == dom).sum()
        total += len(ids)
    assert match / total > 0.95, match / total
    # distinct objects keep distinct ids
    doms = [
        np.bincount(refined[(gt_obj == o) & (refined > 0)]).argmax()
        for o in range(4)
    ]
    assert len(set(doms)) == 4, doms


def test_refine_produces_consistent_ids():
    st, cams = two_blob_scene()
    sam = sam_from_silhouettes(st, cams)
    refined = refine_sam_masks(st, cams, sam, CFG, anchor_stride=1)
    assert refined.shape == sam.shape
    # the two views must now agree: the region covered by blob A gets the
    # same global id in both views
    a0 = refined[0][20:28, 8:24]
    a1 = refined[1][20:28, 8:24]
    ids0 = a0[a0 > 0]
    ids1 = a1[a1 > 0]
    assert len(ids0) > 10 and len(ids1) > 10
    assert np.bincount(ids0).argmax() == np.bincount(ids1).argmax()
    # left and right blobs keep distinct ids within one view
    b0 = refined[0][20:28, 40:56]
    idsb = b0[b0 > 0]
    assert len(idsb) > 10
    assert np.bincount(idsb).argmax() != np.bincount(ids0).argmax()
    # uncovered pixels are void
    assert (refined[0][0:4, 0:4] == -1).all()


def test_refiner_trace_artifacts(tmp_path):
    """RefinerTrace (refine/introspect.py) writes the stage-by-stage
    artifact set — the headless counterpart of the reference's rerun
    streaming (sam_refinement_utils.py:716-724, sam_refinement_multistage.rbl)."""
    import json
    import os

    from opengaussian_tpu.refine.introspect import RefinerTrace

    st, cams = two_blob_scene()
    sam = sam_from_silhouettes(st, cams)
    trace = RefinerTrace(str(tmp_path))
    refine_sam_masks(st, cams, sam, CFG, anchor_stride=1, trace=trace)
    base = str(tmp_path / "refine_trace")
    for f in ("depth_0.png", "depth_1.png", "stage1_sync.npz",
              "dominant_0.png", "refined_0.png", "refined_1.png",
              "summary.json"):
        assert os.path.exists(os.path.join(base, f)), f
    s = json.load(open(os.path.join(base, "summary.json")))
    assert s["n_anchors"] > 0 and s["n_global_ids"] >= 2
    assert len(s["visible_per_view"]) == 2
    import numpy as _np

    z = _np.load(os.path.join(base, "stage1_sync.npz"))
    assert z["local2global"].shape == (2, int(sam.max()) + 1)
