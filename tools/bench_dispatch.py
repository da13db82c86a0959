"""Measure per-call dispatch/arg-handling overhead of the runtime.

Times trivial jitted functions over (a) a ~500-leaf parameter-like pytree,
(b) the same data as ONE flat buffer — with and without donation — plus an
empty-ish scalar call. If (a) >> (b), per-buffer argument handling (not
device compute) dominates, and packing the train state into few flat
buffers is the fix for the train-step mystery (PERF.md round-2 ablations).
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--leaves", default=477, type=int)
    p.add_argument("--total_m", default=57.0, type=float,
                   help="total params in millions")
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.leaves
    per = int(args.total_m * 1e6 / n)
    tree = {f"p{i:04d}": jnp.full((per,), float(i), jnp.float32)
            for i in range(n)}
    flat = jnp.concatenate(list(tree.values()))
    jax.block_until_ready(flat)

    def timeit(name, fn, *a, donate=None):
        f = jax.jit(fn) if donate is None else jax.jit(
            fn, donate_argnums=donate)
        out = f(0, *a)
        jax.block_until_ready(out)
        state = out
        t0 = time.perf_counter()
        for i in range(args.iters):
            state = f(i + 1, *(state if isinstance(state, tuple) else (state,)))
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {dt:.2f} ms/call")

    def tree_update(i, t):
        return (jax.tree.map(lambda x: x + i * 1e-6, t),)

    def flat_update(i, f_):
        return (f_ + i * 1e-6,)

    def scalar_only(i, s):
        return (s + i,)

    timeit("scalar arg only            ", scalar_only, jnp.float32(0))
    timeit("flat 57M, update           ", flat_update, flat)
    timeit(f"{n}-leaf tree, update      ", tree_update, tree)
    timeit("flat 57M, update, donated  ", flat_update, flat, donate=(1,))
    timeit(f"{n}-leaf tree, upd, donated", tree_update, tree, donate=(1,))


if __name__ == "__main__":
    main()
