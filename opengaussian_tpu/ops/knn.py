"""KNN utilities for selection post-processing.

Replaces the reference's pytorch3d.ops.knn_points statistical outlier removal
(reference gaussian_renderer/__init__.py:293-309, scripts/render_by_click.py:
174-189): for the ~10^2-10^4 points of one selected cluster, drop points
whose mean distance to their K = sqrt(n) nearest neighbors exceeds
mean + std over the cluster. Host-side scipy cKDTree — this runs in
interactive selection tools, not the training hot path.
"""

from __future__ import annotations

import numpy as np


def knn_mean_dists(points: np.ndarray, k: int) -> np.ndarray:
    from scipy.spatial import cKDTree

    k = max(min(k, len(points) - 1), 1)
    d, _ = cKDTree(points).query(points, k=k + 1, workers=-1)
    return (d[:, 1:] ** 2).mean(axis=1)


def statistical_outlier_mask(points: np.ndarray, max_rounds: int = 1) -> np.ndarray:
    """Boolean keep-mask. The reference decrements max_time but breaks out of
    the loop after one pass (gaussian_renderer/__init__.py:292-311), so one
    round is the effective behavior."""
    keep = np.ones(len(points), bool)
    for _ in range(max_rounds):
        pts = points[keep]
        if len(pts) < 3:
            break
        k = int(max(np.sqrt(len(pts)), 1))
        md = knn_mean_dists(pts, k)
        ok = md < md.mean() + md.std()
        idx = np.flatnonzero(keep)
        keep[idx[~ok]] = False
    return keep
