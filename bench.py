"""Inference benchmark: prints ONE JSON line with images/sec/chip.

Measures the full fused pipeline (FastBaseTransform -> PlaneRecNet-50
forward -> point-NMS -> post-processing) at 480x640 on the available
accelerator, mirroring the reference FPS harness
(reference planerecnet.py:610-677, measured at 19.1 FPS for PRN-50 on an
RTX 3090, README.md:35-37).

Methodology (honest on THIS runtime — see PERF.md):

* every iteration feeds a DISTINCT pre-generated frame, pre-staged on
  device, so result/transfer caching cannot inflate the number;
* ``block_until_ready`` on the axon tunnel can return while work is still
  queued, so completion is proven by ``jax.device_get`` of an output leaf —
  device execution is in-order, so materialising the LAST frame's scores
  proves every dispatched frame executed (``throughput`` below);
* a per-frame ``device_get`` costs a full ~40 ms RPC round-trip through the
  development tunnel (vs ~0.5 ms of device compute), so the fully
  synchronous number measures tunnel latency, not the chip — it is reported
  separately as ``sync_roundtrip_ms``.
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--batch_size", default=8, type=int,
                        help="batch 8 is the serving sweet spot on TPU "
                             "(7.5 ms/img vs 8.6 at batch 1 — PERF.md "
                             "round 3); the reference harness is batch-1 "
                             "only (planerecnet.py:610-677)")
    parser.add_argument("--iters", default=50, type=int)
    parser.add_argument("--warmup", default=5, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--sync_iters", default=10, type=int,
                        help="iterations for the per-frame-roundtrip "
                             "latency measurement (0 disables)")
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
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()

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

    def force(out):
        # device_get of one small output leaf: execution is in-order, so
        # this frame's value existing proves every prior dispatch executed.
        return jax.device_get(out["pred_scores"])

    # Warmup (compile included).
    for i in range(args.warmup):
        force(net.infer(frames[i % args.iters]))

    # Pre-stage all distinct frames on device so the timed loop measures the
    # compute pipeline, not host->device copies of the random inputs.
    import jax.numpy as jnp
    device_frames = [jax.device_put(jnp.asarray(f)) for f in frames]
    force(net.infer(device_frames[-1]))

    # Throughput: dispatch every frame, then force the last one.
    t0 = time.perf_counter()
    outs = [net.infer(f) for f in device_frames]
    force(outs[-1])
    dt = time.perf_counter() - t0
    imgs_per_sec = args.batch_size * args.iters / dt

    # Latency: one frame at a time, each forced to host.
    sync_ms = None
    if args.sync_iters:
        t0 = time.perf_counter()
        for i in range(args.sync_iters):
            force(net.infer(device_frames[i % args.iters]))
        sync_ms = (time.perf_counter() - t0) / args.sync_iters * 1000

    # RTX 3090 FPS baselines (reference README.md:35-38). Only PRN-50 and
    # PRN-101 have published numbers; any other config (tiny, base, future
    # variants) reports no vs_baseline rather than a fake multiple.
    baseline = {
        "PlaneRecNet_50": 19.1,
        "PlaneRecNet_101": 14.4,
    }.get(cfg.name)
    # Report the dtype that actually ran: "auto" resolves to bf16 for
    # inference on TPU (accuracy-gated, tests/test_bf16.py), f32 elsewhere.
    dtype = cfg.compute_dtype
    if dtype == "auto":
        dtype = ("auto:bf16" if jax.default_backend() == "tpu"
                 else "auto:f32")
    out = {
        "metric": f"{args.height}x{args.width} images/sec/chip "
                  f"({cfg.name} inference, batch={args.batch_size}, "
                  f"{dtype}, distinct frames)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "baseline": baseline,
        "vs_baseline": (round(imgs_per_sec / baseline, 3)
                        if baseline is not None else None),
    }
    if sync_ms is not None:
        out["sync_roundtrip_ms"] = round(sync_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
