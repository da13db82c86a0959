"""Inference benchmark: prints ONE JSON line with images/sec/chip.

Measures the full fused pipeline (FastBaseTransform -> PlaneRecNet-50
forward -> point-NMS -> post-processing) at 480x640 on the available
accelerator, mirroring the reference FPS harness
(reference planerecnet.py:610-677, measured at 19.1 FPS for PRN-50 on an
RTX 3090, README.md:35-37).
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--iters", default=30, type=int)
    parser.add_argument("--warmup", default=5, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    parser.add_argument("--image", default=None, type=str,
                        help="Benchmark on a real image instead of noise "
                             "(reference planerecnet.py:610-677 uses "
                             "data/example_nyu.jpg).")
    args = parser.parse_args()

    import jax
    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.runner import PlaneRecNetRunner

    cfg = set_cfg(args.config)
    if args.dtype:
        cfg = cfg.copy(dict(compute_dtype=args.dtype))
    net = PlaneRecNetRunner(cfg)

    if args.image:
        import cv2
        img = cv2.imread(args.image).astype(np.float32)
        img = cv2.resize(img, (args.width, args.height))
        frame = np.broadcast_to(
            img, (args.batch_size,) + img.shape).copy()
    else:
        rng = np.random.RandomState(0)
        frame = (rng.rand(args.batch_size, args.height, args.width, 3)
                 * 255).astype(np.float32)

    # Warmup (compile included).
    for _ in range(args.warmup):
        jax.block_until_ready(net.infer(frame))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(net.infer(frame))
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch_size * args.iters / dt
    baseline = 19.1  # PRN-50 RTX 3090 FPS (reference README.md:35-37)
    print(json.dumps({
        "metric": f"{args.height}x{args.width} images/sec/chip "
                  f"(PRN-50 inference, batch={args.batch_size})",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
