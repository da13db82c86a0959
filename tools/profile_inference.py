"""Per-stage inference profile on the current accelerator.

Times each pipeline stage (preprocess / backbone / fpn / heads / depth /
postprocess) separately under jit, plus the end-to-end fused pipeline, to
direct kernel-optimisation effort (the TPU analogue of the reference's
per-stage ``timer.env`` instrumentation, reference planerecnet.py:76-100).

Usage: python tools/profile_inference.py [--config ...] [--trace DIR]
With --trace, also writes a jax.profiler trace viewable in TensorBoard.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _force(out):
    """Materialise one leaf on host: the whole program must have executed
    for its value to exist. (block_until_ready on this runtime can return
    while work is still queued — PERF.md.)"""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                          else leaf)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--trace", default=None, type=str)
    parser.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.models.backbone import construct_backbone
    from planerecnet_tpu.ops.image import fast_base_transform
    from planerecnet_tpu.ops.postprocess import postprocess_batch
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = set_cfg(args.config)
    if args.dtype:
        cfg = cfg.copy(dict(compute_dtype=args.dtype))
    net = PlaneRecNetRunner(cfg)
    h, w, b = args.height, args.width, args.batch_size
    rng = np.random.RandomState(0)
    frame = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.float32))

    print(f"profiling {cfg.name} at {b}x{h}x{w} on "
          f"{jax.devices()[0].platform}")

    # stage: preprocessing
    pre = jax.jit(fast_base_transform)
    t_pre = timeit(pre, frame)
    x = pre(frame)

    # stage: backbone only
    backbone = construct_backbone(cfg.backbone)
    bb_vars = {"params": net.variables["params"]["backbone"],
               "batch_stats": net.variables["batch_stats"]["backbone"]}
    bb = jax.jit(lambda v, x: backbone.apply(v, x, train=False))
    t_bb = timeit(bb, bb_vars, x)

    # stage: full forward (raw preds)
    fwd = jax.jit(lambda v, x: net.model.apply(v, x, train=False))
    t_fwd = timeit(fwd, net.variables, x)
    preds = fwd(net.variables, x)

    # stage: postprocess
    post = jax.jit(lambda p: postprocess_batch(p, cfg, (h, w)))
    t_post = timeit(post, preds)

    # end-to-end fused
    t_e2e = timeit(lambda f: net.infer(np.asarray(f)), frame, iters=20)

    rows = [
        ("preprocess", t_pre),
        ("backbone", t_bb),
        ("forward (bb+fpn+heads+depth)", t_fwd),
        ("  -> heads+fpn+depth (fwd-bb)", t_fwd - t_bb),
        ("postprocess", t_post),
        ("end-to-end fused", t_e2e),
    ]
    for name, t in rows:
        print(f"{name:34s} {t * 1000:9.3f} ms   "
              f"{b / t:9.1f} img/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                jax.block_until_ready(net.infer(np.asarray(frame)))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
