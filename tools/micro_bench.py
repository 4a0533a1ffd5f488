"""Microbench the binning sub-ops on the real chip.

Times each suspected cost center of ops/binning.py in isolation, with an
iteration-varying scalar folded into the inputs so the axon tunnel's
identical-args memoization cannot fake the numbers (the trace_step pitfall).

Usage: python tools/micro_bench.py [--p 851968] [--n 200000] [--cols 10]

--cols defaults to the production stream carry width (mean2d 2 + conic 3 +
opacity 1 + rgb payload 3 + depth 1 = 10).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=851968)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cols", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    P, N, D = args.p, args.n, args.cols
    rng = np.random.default_rng(0)
    # ascending run-structured gather indices like binning's g_safe
    runs = rng.integers(0, 9, N)
    g = np.repeat(np.arange(N), runs)[:P]
    if g.shape[0] < P:
        g = np.pad(g, (0, P - g.shape[0]), constant_values=N - 1)
    g = jnp.asarray(g.astype(np.int32))
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    starts = jnp.asarray(np.sort(rng.integers(0, P, N)).astype(np.int32))
    vals_n = jnp.asarray(rng.integers(1, N, N).astype(np.int32))
    key = jnp.asarray(rng.integers(0, 2**30, P).astype(np.int32))
    cols_p = jnp.asarray(rng.normal(size=(D, P)).astype(np.float32))
    depth = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    fP = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(jnp.int32(0), *xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(jnp.int32(i + 1), *xs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:<42} {ms:8.3f} ms", flush=True)
        return ms

    timed("scatter_max [N]->[P] (expansion seg)",
          lambda i, s, v: jnp.zeros((P,), jnp.int32).at[s].max(v + i),
          starts, vals_n)
    timed("cummax [P]",
          lambda i, k: jax.lax.cummax(k + i), key)
    timed("argsort depth [N] + rank scatter",
          lambda i, d: jnp.zeros((N,), jnp.int32).at[
              jnp.argsort(d + 0.0 * i, stable=True)].set(
                  jnp.arange(N, dtype=jnp.int32)), depth)
    timed(f"row gather [N,{D}] -> [P,{D}] (ascending ids)",
          lambda i, t, gg: (t + i)[gg], table, g)
    timed(f"transpose [P,{D}] -> [{D},P]",
          lambda i, t, gg: ((t + i)[gg]).T, table, g)
    timed(f"sort 1 int key + {D} f32 values @ P",
          lambda i, k, c: jax.lax.sort(
              (k + i,) + tuple(c[j] for j in range(D)),
              num_keys=1, is_stable=False), key, cols_p)
    timed("sort 1 int key + 1 int value @ P",
          lambda i, k: jax.lax.sort((k + i, k), num_keys=1, is_stable=False),
          key)
    timed("10 elementwise passes over [P]",
          lambda i, x: sum(jnp.sin(x + j + i) for j in range(10)), fP)
    timed(f"stack {D}x[P] -> [P,{D}] + pad to [P,128]",
          lambda i, c: jnp.pad(jnp.stack(
              [c[j] + i for j in range(D)], axis=-1), ((0, 832), (0, 128 - D))),
          cols_p)
    timed("searchsorted 5249 queries @ P",
          lambda i, k: jnp.searchsorted(k, jnp.arange(5249, dtype=jnp.int32) + i),
          key)


if __name__ == "__main__":
    main()
