"""Inference benchmark: prints ONE JSON line with images/sec/chip.

Measures the full fused pipeline (FastBaseTransform -> PlaneRecNet-50
forward -> point-NMS -> post-processing) at 480x640 on the available
accelerator, mirroring the reference FPS harness
(reference planerecnet.py:610-677, measured at 19.1 FPS for PRN-50 on an
RTX 3090, README.md:35-37).

Every iteration feeds a DISTINCT pre-generated frame (pre-staged on device),
so no result/transfer caching can inflate the number; the timed loop keeps
at most ``queue_depth`` dispatches in flight (a bounded async pipeline, the
serving pattern) and ends with a full drain.
"""

import argparse
import json
import time
from collections import deque

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--iters", default=50, type=int)
    parser.add_argument("--warmup", default=5, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--queue_depth", default=4, type=int,
                        help="max in-flight dispatches during the timed loop")
    parser.add_argument("--dtype", default=None,
                        choices=[None, "float32", "bfloat16"])
    parser.add_argument("--image", default=None, type=str,
                        help="Benchmark on a real image (distinct noise is "
                             "added per frame so inputs still differ); the "
                             "reference harness uses data/example_nyu.jpg "
                             "(planerecnet.py:610-677).")
    args = parser.parse_args()

    import jax
    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = set_cfg(args.config)
    if args.dtype:
        cfg = cfg.copy(dict(compute_dtype=args.dtype))
    net = PlaneRecNetRunner(cfg)

    rng = np.random.RandomState(0)
    shape = (args.batch_size, args.height, args.width, 3)
    if args.image:
        import cv2
        img = cv2.imread(args.image).astype(np.float32)
        img = cv2.resize(img, (args.width, args.height))
        base = np.broadcast_to(img, shape)
        frames = [np.clip(base + rng.randn(*shape).astype(np.float32) * 2,
                          0, 255) for _ in range(args.iters)]
    else:
        frames = [(rng.rand(*shape) * 255).astype(np.float32)
                  for _ in range(args.iters)]

    # Warmup (compile included).
    for i in range(args.warmup):
        jax.block_until_ready(net.infer(frames[i % args.iters]))

    # Pre-stage all distinct frames on device so the timed loop measures the
    # compute pipeline, not host->device PCIe copies of the random inputs.
    import jax.numpy as jnp
    device_frames = [jax.device_put(jnp.asarray(f)) for f in frames]
    jax.block_until_ready(device_frames)

    t0 = time.perf_counter()
    inflight = deque()
    for f in device_frames:
        inflight.append(net.infer(f))
        if len(inflight) > args.queue_depth:
            jax.block_until_ready(inflight.popleft())
    while inflight:
        jax.block_until_ready(inflight.popleft())
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch_size * args.iters / dt
    baseline = 19.1  # PRN-50 RTX 3090 FPS (reference README.md:35-37)
    # Report the dtype that actually ran: "auto" resolves to bf16 for
    # inference on TPU (accuracy-gated, tests/test_bf16.py), f32 elsewhere.
    dtype = cfg.compute_dtype
    if dtype == "auto":
        dtype = ("auto:bf16" if jax.default_backend() == "tpu"
                 else "auto:f32")
    print(json.dumps({
        "metric": f"{args.height}x{args.width} images/sec/chip "
                  f"(PRN-50 inference, batch={args.batch_size}, "
                  f"{dtype}, distinct frames)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
