"""Pallas-vs-XLA parity on the current backend, with a cached XLA reference.

The XLA twin (ops/rasterize.py) is untouched by kernel edits, so its compiled
result is cached to an npz on first run; subsequent runs compile only the
Pallas side (~30 s on the chip instead of ~3 min). Use while iterating on
ops/rasterize_pallas.py:

    python tools/chip_parity.py            # first run caches the XLA side
    python tools/chip_parity.py            # later runs: Pallas vs cache
    python tools/chip_parity.py --refresh  # re-render the XLA reference

Bars (the measured r2 state, tighter than the test-suite tolerance):
image abs diff < 3e-4, grads normalized < 1e-3. Regressions toward the test
bar usually mean a bf16 matmul snuck in (pass precision=HIGHEST) or a
threshold-flip source — see the ops/rasterize_pallas.py header.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/tmp/xla_ref_parity.npz"


def build_inputs():
    import jax.numpy as jnp

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.ops.projection import build_cov3d

    rng = np.random.default_rng(0)
    n = 2000
    means = jnp.asarray(np.stack(
        [rng.normal(0, 0.6, n), rng.normal(0, 0.5, n), rng.uniform(2, 6, n)],
        -1).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.normal(-3.2, 0.4, (n, 3))).astype(np.float32))
    quats = jnp.asarray(np.concatenate(
        [np.ones((n, 1)), np.zeros((n, 3))], 1).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 160, 120)
    cov = build_cov3d(scales, quats)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    gt = jnp.asarray(rng.uniform(0, 1, (120, 160, 3)).astype(np.float32))
    return means, cov, op, cols, cam, bg, gt


def run(cfg):
    import jax
    import jax.numpy as jnp

    from opengaussian_tpu.ops.rasterize import rasterize

    means, cov, op, cols, cam, bg, gt = build_inputs()

    def loss(m, o, c):
        out = rasterize(cam, m, cov, o, c, bg, cfg)
        return jnp.sum((out.image - gt) ** 2), (out.image, out.alpha)

    (_, (img, alpha)), g = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)
    )(means, op, cols)
    return np.asarray(img), np.asarray(alpha), [np.asarray(x) for x in g]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refresh", action="store_true",
                    help="re-render and re-cache the XLA reference")
    ap.add_argument("--reduce", default=None,
                    choices=[None, "scatter", "sorted_mxu"],
                    help="per-splat reduction backend for the Pallas side")
    ap.add_argument("--layout", default=None, choices=[None, "dense", "compact"],
                    help="backward d_slot layout for the Pallas side")
    args = ap.parse_args()

    from opengaussian_tpu.ops.rasterize import RasterizeConfig

    base = RasterizeConfig(max_per_tile=256, chunk=64, min_intersections=32768)
    if args.refresh or not os.path.exists(REF):
        img, alpha, g = run(dataclasses.replace(base, backend="xla"))
        np.savez(REF, img=img, alpha=alpha, g0=g[0], g1=g[1], g2=g[2])
        print(f"XLA reference cached at {REF}; run again for the parity check")
        return

    z = np.load(REF)
    pcfg = dataclasses.replace(base, backend="pallas")
    if args.reduce:
        pcfg = dataclasses.replace(pcfg, reduce_backend=args.reduce)
    if args.layout:
        pcfg = dataclasses.replace(pcfg, bwd_layout=args.layout)
    img_p, alpha_p, gp = run(pcfg)
    img_err = np.abs(img_p - z["img"]).max()
    print("img maxdiff", img_err, "alpha", np.abs(alpha_p - z["alpha"]).max())
    ok = img_err < 3e-4
    for i, nm in enumerate(["d_means", "d_opac", "d_cols"]):
        ref = z[f"g{i}"]
        scale = np.abs(ref).max() or 1.0
        err = np.abs(gp[i] - ref).max() / scale
        print(nm, "normdiff", err)
        ok = ok and err < 1e-3
    print("CHIP PARITY", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
