"""The two-key sort fallback: when tile bits + depth-rank bits exceed the
int32 packed key (ops/binning.py bits_tile + bits_rank > 31 — multi-million
splat scenes or huge tile grids), binning must fall back to the stable
two-key lax.sort with identical semantics. No other test reaches that
branch; this one forces it (32768 tiles x 131k splats = 15 + 18 bits) and
validates the sorted stream against a numpy brute force on sampled tiles."""

import numpy as np

import jax.numpy as jnp

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.projection import TILE, build_cov3d, project


def test_two_key_sort_fallback_matches_bruteforce():
    n = 131_073  # bits_rank 18; grid 4096 x 8 tiles -> bits_tile 15 (33 > 31)
    grid_x, grid_y = 4096, 8
    bits = int(np.ceil(np.log2(grid_x * grid_y + 2))) + int(np.ceil(np.log2(n + 1)))
    assert bits > 31  # the packed one-key path cannot be taken
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.4, 0.05,
                          grid_x * TILE, grid_y * TILE)
    rng = np.random.default_rng(3)
    means = jnp.asarray(np.stack(
        [rng.normal(0, 8.0, n), rng.normal(0, 0.02, n), rng.uniform(2, 9, n)],
        -1).astype(np.float32))
    scales = jnp.asarray(np.full((n, 3), 4e-4, np.float32))
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    cov = build_cov3d(scales, quats)
    proj = project(means, cov, cam, opacities=opac)

    P = 16 * n
    bins = bin_gaussians(proj, grid_x, grid_y, P, 256, dense=False, stream=True)
    assert int(bins.n_dropped) == 0
    total = int(bins.total)
    assert total > 0

    # numpy brute force: per-tile membership + depth order, sampled tiles
    nt = np.asarray(proj.num_tiles)
    depth = np.asarray(proj.depth)
    rmin = np.asarray(proj.rect_min)
    rmax = np.asarray(proj.rect_max)
    m2d = np.asarray(proj.mean2d)
    rad = np.asarray(proj.cull_radius)
    counts = np.asarray(bins.counts)
    tstart = np.asarray(bins.tile_start)
    sg = np.asarray(bins.sorted_gauss)

    live = np.flatnonzero(counts > 0)
    sample = rng.choice(live, size=min(60, len(live)), replace=False)
    for t in sample:
        tx, ty = t % grid_x, t // grid_x
        in_rect = (nt > 0) & (rmin[:, 0] <= tx) & (tx < rmax[:, 0]) \
            & (rmin[:, 1] <= ty) & (ty < rmax[:, 1])
        # the exact circle-tile cull binning applies
        nx = np.clip(m2d[:, 0], tx * TILE, tx * TILE + (TILE - 1))
        ny = np.clip(m2d[:, 1], ty * TILE, ty * TILE + (TILE - 1))
        hits = (m2d[:, 0] - nx) ** 2 + (m2d[:, 1] - ny) ** 2 <= rad ** 2
        want = np.flatnonzero(in_rect & hits)
        got = sg[tstart[t]:tstart[t] + counts[t]]
        assert counts[t] == len(want), (t, counts[t], len(want))
        assert set(got.tolist()) == set(want.tolist()), t
        d = depth[got]
        assert np.all(np.diff(d) >= 0), f"tile {t} not depth-sorted"
