"""Micro-bench the fused dice/lava Pallas kernel vs the XLA composition.

Evolving inputs each iteration (the runtime result-caches repeated calls
with identical device inputs — PERF.md), fwd and fwd+bwd, at the PRN-101
training shapes: B=8, P=128, K=128, N=32, HW=160*160.
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", default=8, type=int)
    p.add_argument("--p", default=128, type=int)
    p.add_argument("--k", default=128, type=int)
    p.add_argument("--n", default=32, type=int)
    p.add_argument("--hw", default=160 * 160, type=int)
    p.add_argument("--iters", default=20, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from planerecnet_tpu.ops.pallas.dice_lava import (fused_dice_lava,
                                                      fused_dice_lava_xla)

    rng = np.random.RandomState(0)
    b, pp, kk, n, hw = args.b, args.p, args.k, args.n, args.hw
    kernels = jnp.asarray(rng.randn(b, pp, kk), jnp.float32)
    feat = jnp.asarray(rng.randn(b, hw, kk), jnp.float32)
    onehot = jnp.asarray(
        np.eye(n, dtype=np.float32)[rng.randint(0, n, (b, pp))])
    targets = jnp.asarray((rng.rand(b, n, hw) > 0.8), jnp.float32)
    grad_low = jnp.asarray(rng.rand(b, hw), jnp.float32)

    def bench(name, fn):
        f = jax.jit(fn)
        out = f(kernels, feat)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(kernels + i * 1e-6, feat + i * 1e-6)  # evolving inputs
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {dt:.2f} ms")
        return dt

    def fwd_fused(kr, ft):
        a, bb, lv = fused_dice_lava(kr, ft, onehot, targets, grad_low)
        return jnp.sum(a) + jnp.sum(bb) + jnp.sum(lv)

    def fwd_xla(kr, ft):
        a, bb, lv = fused_dice_lava_xla(kr, ft, onehot, targets, grad_low)
        return jnp.sum(a) + jnp.sum(bb) + jnp.sum(lv)

    bench("fused fwd           ", fwd_fused)
    bench("xla   fwd           ", fwd_xla)
    bench("fused fwd+bwd (grad)", jax.grad(fwd_fused, argnums=(0, 1)))
    bench("xla   fwd+bwd (grad)", jax.grad(fwd_xla, argnums=(0, 1)))


if __name__ == "__main__":
    main()
