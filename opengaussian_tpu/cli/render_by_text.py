"""Text query -> 3D object selection -> rendered object + mask PNGs.

Counterpart of the reference's render_lerf_by_text.py (selection logic at
render_lerf_by_text.py:102-115): cosine similarity between a CLIP text
feature and the per-leaf language features from cluster_lang.npz picks the
best leaf; top-10 candidates in the same root whose codebook features are
within distance 0.9 join the selection; the union is rendered as RGB with
small-scale filtering and KNN outlier removal, with the >0.7 silhouette as
the predicted mask.

CLIP text features come from a JSON {text: [512 floats]} file (the reference
ships the same format as an asset; any CLIP ViT-B/16 text encoder output
works). Per-scene query/eval-frame lists follow the reference's tables.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SCENE_TEXTS = {
    "waldo_kitchen": ["Stainless steel pots", "dark cup", "refrigerator", "frog cup",
                      "pot", "spatula", "plate", "spoon", "toaster", "ottolenghi",
                      "plastic ladle", "sink", "ketchup", "cabinet", "red cup",
                      "pour-over vessel", "knife", "yellow desk"],
    "ramen": ["nori", "sake cup", "kamaboko", "corn", "spoon", "egg",
              "onion segments", "plate", "napkin", "bowl", "glass of water",
              "hand", "chopsticks", "wavy noodles"],
    "figurines": ["jake", "pirate hat", "pikachu", "rubber duck with hat",
                  "porcelain hand", "red apple", "tesla door handle", "waldo",
                  "bag", "toy cat statue", "miffy", "green apple", "pumpkin",
                  "rubics cube", "old camera", "rubber duck with buoy",
                  "red toy chair", "pink ice cream", "spatula",
                  "green toy chair", "toy elephant"],
    "teatime": ["sheep", "yellow pouf", "stuffed bear", "coffee mug",
                "tea in a glass", "apple", "coffee", "hooves", "bear nose",
                "dall-e brand", "plate", "paper napkin", "three cookies",
                "bag of cookies"],
}
SCENE_EVAL_FRAMES = {
    "waldo_kitchen": ["frame_00053", "frame_00066", "frame_00089", "frame_00140", "frame_00154"],
    "ramen": ["frame_00006", "frame_00024", "frame_00060", "frame_00065",
              "frame_00081", "frame_00119", "frame_00128"],
    "figurines": ["frame_00041", "frame_00105", "frame_00152", "frame_00195"],
    "teatime": ["frame_00002", "frame_00025", "frame_00043", "frame_00107",
                "frame_00129", "frame_00140"],
}
MIN_OCCU = 5  # reference render_lerf_by_text.py:62
CAND_DIST = 0.9


def select_leaves_by_text(text_feat: np.ndarray, lang: dict, leaf_centers: np.ndarray,
                          leaf_num: int) -> np.ndarray:
    """-> array of selected leaf ids (reference :102-115)."""
    leaf_feat = lang["leaf_feat"].copy()
    leaf_feat[lang["occu_count"] < MIN_OCCU] = 0.0
    t = text_feat / (np.linalg.norm(text_feat) + 1e-12)
    f = leaf_feat / (np.linalg.norm(leaf_feat, axis=1, keepdims=True) + 1e-12)
    sim = f @ t  # [k1*k2]
    max_id = int(np.argmax(sim))
    selected = [max_id]
    top = np.argsort(-sim)[:10]
    for cand in top[1:]:
        if cand - max_id < leaf_num:  # same-root window, as the reference
            d = np.linalg.norm(leaf_centers[max_id] - leaf_centers[int(cand)])
            if d < CAND_DIST:
                selected.append(int(cand))
    return np.asarray(selected)


def main(argv=None):
    import jax.numpy as jnp

    from opengaussian_tpu.data.dataset import load_scene
    from opengaussian_tpu.models.loading import load_cluster_lang, load_model
    from opengaussian_tpu.ops.knn import statistical_outlier_mask
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.render import render_selection

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--scene_name", required=True)
    p.add_argument("--text_features", required=True, help="json {text: [512]}")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--texts", nargs="*", default=None)
    p.add_argument("--frames", nargs="*", default=None)
    args = p.parse_args(argv)

    scene = load_scene(args.source_path, eval_split=False, resolution=args.resolution)
    state, kms, it = load_model(args.model_path, args.iteration)
    lang = load_cluster_lang(args.model_path)
    if args.text_features.endswith(".zip"):
        # the reference ships assets/text_features.zip (one
        # text_features.json inside; render_lerf_by_text.py:69-72 unzips it
        # at load) — accept it directly
        import zipfile

        with zipfile.ZipFile(args.text_features) as z:
            name = next(n for n in z.namelist() if n.endswith(".json"))
            tf = json.loads(z.read(name))
    else:
        with open(args.text_features) as f:
            tf = json.load(f)
    texts = args.texts or SCENE_TEXTS.get(args.scene_name, list(tf))
    frames = args.frames or SCENE_EVAL_FRAMES.get(args.scene_name)
    k1 = kms.centers.shape[0]
    leaf_num = lang["leaf_feat"].shape[0] // k1
    leaf_centers = np.asarray(kms.leaf_centers)

    out_rgb = os.path.join(args.model_path, "text2obj", f"ours_{it}", "renders_cluster")
    out_sil = os.path.join(args.model_path, "text2obj", f"ours_{it}", "renders_cluster_silhouette")
    os.makedirs(out_rgb, exist_ok=True)
    os.makedirs(out_sil, exist_ok=True)

    rcfg = RasterizeConfig()
    bg = jnp.ones(3)  # reference uses white bg for selection renders
    leaf_ids = np.asarray(kms.leaf_cls_ids)
    for text in texts:
        if text not in tf:
            print(f"[skip] no text feature for {text!r}")
            continue
        sel = select_leaves_by_text(np.asarray(tf[text], np.float32), lang,
                                    leaf_centers, leaf_num)
        print(f"query {text!r} -> leaves {sel.tolist()}")
        member = np.isin(leaf_ids, sel) & np.asarray(state.alive)
        # KNN statistical outlier removal on the selected points (host)
        pts = np.asarray(state.means)[member]
        if len(pts) >= 10:
            keep = statistical_outlier_mask(pts)
            idxs = np.flatnonzero(member)
            member[idxs[~keep]] = False
        member_j = jnp.asarray(member)
        from PIL import Image

        for v in scene.train_views:
            if frames and v.image_name not in frames:
                continue
            out = render_selection(v.camera, state, bg, member_j, rcfg)
            img = np.clip(np.asarray(out.cluster_imgs), 0, 1)
            sil = (np.asarray(out.cluster_silhouettes) > 0.7).astype(np.uint8) * 255
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_rgb, f"{v.image_name}_{text}.png"))
            Image.fromarray(sil).save(
                os.path.join(out_sil, f"{v.image_name}_{text}.png"))


if __name__ == "__main__":
    main()
