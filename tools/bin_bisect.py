"""Bisect ops/binning.bin_gaussians: time staged prefixes on the real chip.

The microbench (tools/micro_bench.py) shows every binning primitive costs
<0.3 ms in isolation, yet the phase ablation (tools/phase_bench.py) charges
~20 ms to binning in context. This tool replays bin_gaussians' exact
computation on REAL projected data, cut off at successive stages, each output
materialized, with an iteration-varying scalar folded into the opacities so
the tunnel cannot memoize.

Usage: python tools/bin_bisect.py [--heavy]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heavy", action="store_true", default=False)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_workload
    from opengaussian_tpu.ops.binning import bin_gaussians
    from opengaussian_tpu.ops.projection import TILE, build_cov3d, project

    state, cam, rcfg, gt, bg, _ = make_workload(0.15 if args.heavy else 0.088)
    grid_x = (cam.width + TILE - 1) // TILE
    grid_y = (cam.height + TILE - 1) // TILE
    P = rcfg.max_intersections(state.capacity)
    K = rcfg.max_per_tile
    print(f"P={P} K={K} grid={grid_x}x{grid_y}", flush=True)

    def proj_of(gs, i):
        # fold i into opacity so every downstream value varies per iter
        op = gs.opacity * (1.0 + 1e-6 * i)
        return project(gs.means, build_cov3d(gs.scales, gs.quats), cam,
                       opacities=op), op

    def carry_of(proj, op, payload):
        opac_m = jnp.where(proj.valid, op, 0.0)
        return jax.lax.stop_gradient(jnp.concatenate(
            [proj.mean2d, proj.conic, opac_m[:, None], payload,
             proj.depth[:, None]], axis=-1))

    payload = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (state.capacity, 4))
        .astype(np.float32))

    def staged(stage):
        def fn(i, gs):
            proj, op = proj_of(gs, i)
            carry = carry_of(proj, op, payload)
            import opengaussian_tpu.ops.binning as B

            nt = jax.lax.stop_gradient(proj.num_tiles)
            depth = jax.lax.stop_gradient(proj.depth)
            rect_min = proj.rect_min
            rect_w = jnp.maximum(proj.rect_max[:, 0] - rect_min[:, 0], 1)
            starts = jnp.cumsum(nt) - nt
            total = jnp.sum(nt)
            n = nt.shape[0]
            gidx1 = jnp.where((nt > 0) & (starts < P),
                              jnp.arange(n, dtype=jnp.int32) + 1, 0)
            start_clip = jnp.minimum(starts, P - 1)
            seg = jnp.zeros((P,), jnp.int32).at[start_clip].max(gidx1)
            g = jax.lax.cummax(seg) - 1
            slot = jnp.arange(P, dtype=jnp.int32)
            slot_valid = (slot < total) & (g >= 0)
            g_safe = jnp.maximum(g, 0)
            if stage == "expand":
                return g_safe, slot_valid.sum()
            order = jnp.argsort(depth, stable=True)
            rank = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            pack = jnp.stack(
                [starts.astype(jnp.float32),
                 rect_min[:, 0].astype(jnp.float32),
                 rect_min[:, 1].astype(jnp.float32),
                 rect_w.astype(jnp.float32),
                 rank.astype(jnp.float32),
                 jax.lax.stop_gradient(proj.mean2d[:, 0]),
                 jax.lax.stop_gradient(proj.mean2d[:, 1]),
                 proj.cull_radius], axis=-1)
            pack = jnp.concatenate([pack, carry], axis=-1)
            pk = pack[g_safe]
            pkT = jax.lax.optimization_barrier(pk.T)
            if stage == "gather":
                return jnp.sum(pkT, axis=1)
            starts_slot = pkT[0].astype(jnp.int32)
            rank_slot = pkT[4].astype(jnp.int32)
            r = (slot - starts_slot).astype(jnp.float32)
            w = pkT[3]
            q = jnp.floor(r * (1.0 / w))
            rem = r - q * w
            q = q + (rem >= w).astype(jnp.float32) - (rem < 0).astype(jnp.float32)
            rem = r - q * w
            tx = (pkT[1] + rem).astype(jnp.int32)
            ty = (pkT[2] + q).astype(jnp.int32)
            TILE_F = float(TILE)
            cx = pkT[5]
            cy = pkT[6]
            nx = jnp.clip(cx, tx.astype(jnp.float32) * TILE_F,
                          tx.astype(jnp.float32) * TILE_F + (TILE_F - 1.0))
            ny = jnp.clip(cy, ty.astype(jnp.float32) * TILE_F,
                          ty.astype(jnp.float32) * TILE_F + (TILE_F - 1.0))
            rad = pkT[7]
            hits = (cx - nx) ** 2 + (cy - ny) ** 2 <= rad * rad
            num_tiles = grid_x * grid_y
            tile_id = jnp.where(slot_valid & hits, ty * grid_x + tx, num_tiles)
            if stage == "tileid":
                return tile_id.sum(), rank_slot.sum()
            carry_exp = tuple(pkT[8:])
            bits_rank = max(int(np.ceil(np.log2(n + 1))), 1)
            key = (tile_id << bits_rank) | rank_slot
            if stage == "sort_nocarry":
                out = jax.lax.sort((key, g_safe.astype(jnp.int32)),
                                   num_keys=1, is_stable=False)
                out = jax.lax.optimization_barrier(out)
                return tuple(jnp.sum(o) for o in out)
            if stage == "sort_postgather_slot":
                # sort only (key, slot); apply the permutation to the
                # expansion-order row table with one random row gather
                out = jax.lax.sort((key, slot), num_keys=1, is_stable=False)
                out = jax.lax.optimization_barrier(out)
                rows = pk[out[1]]  # [P, 19] random row gather
                return jnp.sum(rows, axis=0), jnp.sum(out[0])
            if stage == "sort_postgather_n":
                # sort (key, g); re-gather carry rows from the [N, 11] table
                out = jax.lax.sort((key, g_safe.astype(jnp.int32)),
                                   num_keys=1, is_stable=False)
                out = jax.lax.optimization_barrier(out)
                rows = carry[out[1]]  # [P, 11] random row gather from [N]
                return jnp.sum(rows, axis=0), jnp.sum(out[0])
            out = jax.lax.sort((key, g_safe.astype(jnp.int32)) + carry_exp,
                               num_keys=1, is_stable=False)
            out = jax.lax.optimization_barrier(out)
            if stage == "sort":
                return tuple(jnp.sum(o) for o in out)
            key_s, g_sorted = out[0], out[1]
            tile_s = key_s >> bits_rank
            band_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
            edges = jnp.searchsorted(tile_s, band_ids, side="left")
            return edges.sum(), g_sorted.sum(), tuple(
                jnp.sum(o) for o in out[2:])
        return fn

    def full_bin(i, gs):
        proj, op = proj_of(gs, i)
        carry = carry_of(proj, op, payload)
        bins = bin_gaussians(proj, grid_x, grid_y, P, K,
                             dense=False, stream=True, carry=carry)
        return (jnp.sum(bins.counts), jnp.sum(bins.sorted_gauss),
                jnp.sum(bins.tile_start),
                jnp.sum(bins.sorted_carry, axis=0))

    def timed(name, fn):
        f = jax.jit(fn)
        out = f(jnp.int32(0), state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(jnp.int32(i + 1), state)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:<28} {ms:8.2f} ms", flush=True)

    timed("proj+carry+expand", staged("expand"))
    timed("proj+carry+gatherT", staged("gather"))
    timed("proj+carry+tileid", staged("tileid"))
    timed("proj+carry+sort", staged("sort"))
    timed("proj+carry+sort_nocarry", staged("sort_nocarry"))
    timed("proj+sort_postgather_slot", staged("sort_postgather_slot"))
    timed("proj+sort_postgather_n", staged("sort_postgather_n"))
    timed("proj+carry+full bin", full_bin)


if __name__ == "__main__":
    main()
