"""Standalone benchmark of the optimizer update on the real param tree.

The full-step ablations (PERF.md) showed ``tx.update`` + ``apply_updates``
dominating the train step (~290 of ~300 ms): the PRN-101 tree has ~1000
leaves and per-leaf elementwise HLOs pay fixed per-kernel dispatch overhead.
This tool times optimizer variants in isolation (network-free: compiles in
seconds) to validate fixes.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="PlaneRecNet_101_config")
    p.add_argument("--iters", default=50, type=int)
    p.add_argument("--variant", default="all",
                   choices=["all", "chain", "flat", "sgd"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.models.planerecnet import PlaneRecNet
    from planerecnet_tpu.trainer import make_optimizer

    cfg = set_cfg(args.config)
    model = PlaneRecNet(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    leaves = jax.tree.leaves(params)
    n_leaves = len(leaves)
    n_params = sum(l.size for l in leaves)
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params")

    grads0 = jax.tree.map(lambda p_: jnp.ones_like(p_) * 1e-3, params)

    def bench(name, tx):
        opt_state = tx.init(params)

        @jax.jit
        def upd(i, g, s, p_):
            # Evolve the gradients INSIDE the jit (one fused scale) so the
            # runtime cannot result-cache, without paying eager dispatch.
            g = jax.tree.map(lambda x_: x_ * (1.0 + i * 1e-6), g)
            u, s2 = tx.update(g, s, p_)
            return optax.apply_updates(p_, u), s2

        p2, s2 = upd(0, grads0, opt_state, params)
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        p_cur, s_cur = p2, s2
        for i in range(args.iters):
            p_cur, s_cur = upd(i + 1, grads0, s_cur, p_cur)
        jax.block_until_ready(p_cur)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {dt:.2f} ms/update")
        return dt

    if args.variant in ("all", "chain"):
        bench("adam chain (current)   ", make_optimizer(cfg))
    if args.variant in ("all", "flat"):
        bench("optax.flatten(adam)    ", optax.flatten(make_optimizer(cfg)))
    if args.variant in ("all", "sgd"):
        bench("plain sgd (per-leaf)   ", optax.sgd(1e-4))


if __name__ == "__main__":
    main()
