"""Training-step profiler: steady-state ms/iter for the jitted train step.

Times the FULL training step (forward + all five losses + backward + Adam
update) on synthetic device-resident batches with donated state, the only
methodology trusted on this runtime (PERF.md: identical-input micro-bench
results are cached; evolving donated state cannot be).

Reference comparison: the RTX 3090 trains 125k iters in ~37 h ≈ 1065 ms/iter
(reference README.md:64, data/config.py:419).

    python tools/profile_train.py --config PlaneRecNet_101_config \
        --batch_size 8 --dtype bfloat16 --iters 20
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_batch(cfg, b, h, w, seed=0):
    """Synthetic fixed-capacity batch matching collate_batch's layout."""
    rng = np.random.RandomState(seed)
    n = cfg.max_instances
    masks = np.zeros((b, n, h, w), np.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    gt_valid = np.zeros((b, n), bool)
    for i in range(b):
        k = int(rng.randint(1, min(n, 6) + 1))
        for j in range(k):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            y1 = y0 + rng.randint(h // 8, h // 2)
            x1 = x0 + rng.randint(w // 8, w // 2)
            masks[i, j, y0:y1, x0:x1] = 1
            boxes[i, j] = [x0, y0, min(x1, w - 1), min(y1, h - 1)]
            gt_valid[i, j] = True
    planes = rng.randn(b, n, 4).astype(np.float32)
    planes[..., :3] /= np.linalg.norm(planes[..., :3], axis=-1,
                                      keepdims=True) + 1e-6
    return {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "depth": (rng.rand(b, h, w, 1) * 4 + 0.3).astype(np.float32),
        "masks": masks,
        "boxes": boxes,
        "classes": np.ones((b, n), np.int32),
        "gt_valid": gt_valid,
        "plane_paras": planes,
        "k_matrix": np.tile(
            np.array([[577.0, 0, w / 2], [0, 577.0, h / 2], [0, 0, 1]],
                     np.float32), (b, 1, 1)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="PlaneRecNet_101_config")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--size", default=640, type=int)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--warmup", default=2, type=int,
                   help="untimed steps after compile (cold caches)")
    p.add_argument("--remat", default=None,
                   choices=[None, "auto", "on", "off"],
                   help="override cfg.remat_backbone (default: config "
                        "'auto' policy — no remat when bf16 bs<=8 640^2 "
                        "fits; PERF.md round 4)")
    p.add_argument("--no_remat", action="store_true",
                   help="shorthand for --remat off (bf16 halves "
                        "activation memory, so the step may fit without it)")
    p.add_argument("--no_dcn", action="store_true",
                   help="ablation: plain-conv backbone (isolates the DCN "
                        "backward cost)")
    p.add_argument("--forward_only", action="store_true",
                   help="ablation: time the loss forward (no grad/update)")
    p.add_argument("--net_grad_only", action="store_true",
                   help="ablation: grad of sum(preds^2) through the network "
                        "only (isolates network backward from loss backward)")
    p.add_argument("--aux_losses", action="store_true",
                   help="with --net_grad_only: also compute the real loss "
                        "dict as a stop-gradient primal side output")
    p.add_argument("--no_opt", action="store_true",
                   help="with --losses: skip tx.update/apply_updates "
                        "(isolates the optimizer cost)")
    p.add_argument("--split_timing", action="store_true",
                   help="time the grad program and the update program "
                        "separately (block between them)")
    p.add_argument("--trace", default=None, type=str,
                   help="write a jax.profiler device trace of 3 steps to "
                        "this directory before the timed loop")
    p.add_argument("--losses", default=None, type=str,
                   help="ablation: comma list of losses to keep "
                        "(e.g. 'ins,cat,dpt' drops VNL+lava)")
    p.add_argument("--dcn_vjp", action="store_true",
                   help="use the hand-written DCN VJP (Pallas scatter "
                        "input-grad) instead of XLA autodiff")
    p.add_argument("--fused_loss", default=None, choices=[None, "on", "off"],
                   help="override cfg.fused_loss_kernel (ablation: Pallas "
                        "dice/lava kernel vs the XLA composition)")
    args = p.parse_args()

    if args.dcn_vjp:
        from planerecnet_tpu.ops import dcn
        dcn.USE_CUSTOM_VJP = True

    import jax

    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.trainer import create_train_state, jit_train_step
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()

    cfg = set_cfg(args.config).copy(dict(
        compute_dtype=args.dtype,
        ))
    if args.no_remat:
        args.remat = "off"
    if args.remat is not None:
        cfg = cfg.copy(dict(remat_backbone={
            "auto": "auto", "on": True, "off": False}[args.remat]))
    if args.fused_loss is not None:
        cfg = cfg.copy(dict(fused_loss_kernel=args.fused_loss))
    if args.no_dcn:
        cfg = cfg.copy(dict(backbone=cfg.backbone.copy(dict(
            dcn_layers=(0, 0, 0, 0)))))
    if args.losses is not None:
        keep = set(args.losses.split(","))
        cfg = cfg.copy(dict(use_plane_loss="pln" in keep,
                            use_lava_loss="lav" in keep))
    h = w = args.size

    t0 = time.perf_counter()
    state = create_train_state(cfg, jax.random.PRNGKey(0), input_shape=(h, w))
    print(f"state init: {time.perf_counter() - t0:.1f}s", flush=True)

    batch = jax.device_put(synth_batch(cfg, args.batch_size, h, w))
    jax.block_until_ready(batch)

    keep = set(args.losses.split(",")) if args.losses else None

    if args.forward_only:
        from planerecnet_tpu.losses.losses import compute_losses

        @jax.jit
        def step(state, batch):
            rng = jax.random.fold_in(state.rng, state.step)
            preds = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])[0]
            losses = compute_losses(cfg, preds, batch, rng)
            losses = dict(losses, total=sum(losses.values()))
            return state.replace(step=state.step + 1), losses
    elif keep is not None:
        import jax.numpy as jnp
        import optax
        from planerecnet_tpu.losses.losses import compute_losses

        @jax.jit
        def step(state, batch):
            rng = jax.random.fold_in(state.rng, state.step)

            def loss_fn(params):
                preds, mut = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["image"], train=True, mutable=["batch_stats"])
                losses = compute_losses(cfg, preds, batch, rng)
                # Only the selected losses contribute gradients; XLA DCEs
                # the rest of the backward.
                total = sum(v for kk, v in losses.items() if kk in keep)
                return total, losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if args.no_opt:
                gnorm = sum(jnp.sum(jnp.abs(g))
                            for g in jax.tree.leaves(grads))
                return (state.replace(step=state.step + 1),
                        dict(losses, total=total + 0 * gnorm))
            updates, opt_state = state.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state),
                    dict(losses, total=total))
    elif args.net_grad_only:
        import jax.numpy as jnp
        from planerecnet_tpu.losses.losses import compute_losses

        @jax.jit
        def step(state, batch):
            rng = jax.random.fold_in(state.rng, state.step)

            def loss_fn(params):
                preds = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["image"], train=True, mutable=["batch_stats"])[0]
                tot = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                          for l in jax.tree.leaves(preds))
                if args.aux_losses:
                    # The real loss dict as a PRIMAL side output — no
                    # gradient flows through it (stop_gradient), isolating
                    # "loss primal coexists with network backward" from
                    # "loss cotangent path" costs.
                    aux = compute_losses(
                        cfg, jax.tree.map(jax.lax.stop_gradient, preds),
                        batch, rng)
                    aux = dict(aux, total=sum(aux.values()))
                else:
                    aux = {}
                return tot * 1e-6, aux

            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
            out = dict(aux) if aux else {}
            out["total"] = total + 0 * gnorm
            return state.replace(step=state.step + 1), out
    else:
        step = jit_train_step(cfg)
    t0 = time.perf_counter()
    state, losses = step(state, batch)
    jax.block_until_ready(losses)
    print(f"compile + first step: {time.perf_counter() - t0:.1f}s",
          flush=True)

    for _ in range(args.warmup):
        state, losses = step(state, batch)
    jax.block_until_ready(losses)

    if args.split_timing:
        import functools as _ft
        from planerecnet_tpu.trainer import apply_grads, grad_step
        jit_g = jax.jit(_ft.partial(grad_step, cfg=cfg))
        jit_u = jax.jit(apply_grads)
        grads, new_bs, losses = jit_g(state, batch)
        st2 = jit_u(state, grads, new_bs, losses["total"])
        jax.block_until_ready(st2.params)
        tg = tu = 0.0
        for _ in range(args.iters):
            t0 = time.perf_counter()
            grads, new_bs, losses = jit_g(state, batch)
            jax.block_until_ready(grads)
            t1 = time.perf_counter()
            state = jit_u(state, grads, new_bs, losses["total"])
            jax.block_until_ready(state.params)
            t2 = time.perf_counter()
            tg += t1 - t0
            tu += t2 - t1
        print(json.dumps({
            "grad_ms": round(tg / args.iters * 1000, 1),
            "update_ms": round(tu / args.iters * 1000, 1)}))
        return

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            state, losses = step(state, batch)
        _ = jax.device_get(losses)  # force the chain before stop
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = step(state, batch)
    # device_get forces the WHOLE chain (block_until_ready on this runtime
    # can return while work is still queued — measured; see PERF.md).
    losses = jax.device_get(losses)
    dt = (time.perf_counter() - t0) / args.iters

    total = float(losses["total"])
    ref_ms = 37 * 3600 * 1000 / 125000  # reference: 37 h / 125k iters
    print(json.dumps({
        "metric": f"train step ms/iter ({args.config}, "
                  f"bs={args.batch_size}, {h}x{w}, {args.dtype})",
        "value": round(dt * 1000, 1),
        "unit": "ms/iter",
        "vs_baseline": round(ref_ms / (dt * 1000), 2),
        "final_total_loss": round(total, 4),
        "loss_finite": bool(np.isfinite(total)),
    }))


if __name__ == "__main__":
    main()
