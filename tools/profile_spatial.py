"""Spatial-sharding latency study on a SINGLE chip.

The 'spatial' mesh axis (parallel/spmd.py) shards image height so one
frame's conv activations span chips — the latency lever the reference has
no analogue for (its only parallelism, CustomDataParallel, is broken;
reference train.py:153-213, README.md:103). This environment exposes ONE
real TPU chip, so the partitioned program cannot be *executed* over a real
2-chip spatial mesh here. This tool produces the next-best, honest number:

1. **Measured on the real chip**: the full-pipeline forward at full height
   (the single-chip baseline) and at shard height H/n (+ halo rows) — the
   per-shard compute a spatial-n split would execute. Each shard of an XLA
   SPMD spatial split computes its H/n slice of every conv layer plus a
   (k//2)-row halo per conv, so the halo-padded short forward brackets the
   per-shard device time from above (it pays the halo rows at *every*
   layer depth, where real SPMD re-exchanges and discards them).
2. **Analytic ICI term**: summed boundary-row bytes over every 3x3-or-wider
   conv in the backbone/FPN/depth trunk, divided by the one-way ICI
   bandwidth (v5e: ~45 GB/s/link, "How to Scale Your Model" v5e table),
   plus a per-exchange latency floor (~1 us each).

Estimated spatial-n latency = max-shard compute (measured) + ICI (analytic).

Usage: python tools/profile_spatial.py [--config ...] [--shards 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _force(out):
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


def halo_traffic_bytes(cfg, h, w, dtype_bytes=2):
    """Per-boundary halo bytes for ONE exchange direction across a height
    split: sum over spatial convs of (k//2 rows) x W_s x C_s.

    Inventory (PRN trunk, NHWC):
      stem 7x7 on (h, w, 3) + 3x3 maxpool on (h/2, w/2, 64);
      bottleneck 3x3 convs: stage s has blocks_s convs on
        (h/4/2^s, w/4/2^s, 64*2^s) inputs (the bottleneck 'width');
      FPN: 4 predict 3x3 convs on (h/4/2^s, w/4/2^s, 256);
      depth decoder: 4 conv blocks (2x 3x3 each) + 4 deconv 3x3 + refine
        3x3, all 256-channel at strides 4..32.
    DCN layers add an offset-conv halo (3x3) AND data-dependent sample
    rows; offsets are clamped to +-max(h,w)/4 (reference dcn.py:47-50), so
    worst-case deformable halo is large — in practice offsets stay within
    a few pixels; we charge 2 extra rows per DCN layer and call it out.
    """
    blocks = cfg.backbone.layers  # e.g. (3, 4, 6, 3)
    total = 0
    # stem: 7x7 (3 rows) at (h, w, 3); maxpool 3x3 (1 row) at (h/2, 64)
    total += 3 * w * 3
    total += 1 * (w // 2) * 64
    dcn_layers = getattr(cfg.backbone, "dcn_layers", (0, 0, 0, 0))
    for s, n in enumerate(blocks):
        ws_ = w // (4 * 2 ** s)
        c = 64 * 2 ** s
        total += n * 1 * ws_ * c          # bottleneck 3x3 convs
        total += dcn_layers[s] * 3 * ws_ * c  # DCN: offset conv + 2 sample rows
    for s in range(4):                     # FPN predict convs
        total += 1 * (w // (4 * 2 ** s)) * 256
    for s in range(4):                     # depth decoder trunk
        total += (2 + 1) * (w // (4 * 2 ** s)) * 256
    total += 1 * (w // 4) * 256            # refine conv
    return total * dtype_bytes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="PlaneRecNet_50_config")
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--shards", default=2, type=int)
    parser.add_argument("--halo_rows", default=32, type=int,
                        help="halo padding rows for the shard-emulation "
                             "forward (covers every conv's k//2 rows at "
                             "trunk depth)")
    parser.add_argument("--ici_gbps", default=45.0, type=float,
                        help="one-way ICI bandwidth GB/s (v5e ~45)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from planerecnet_tpu.config import set_cfg
    from planerecnet_tpu.runner import PlaneRecNetRunner
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()

    cfg = set_cfg(args.config)
    net = PlaneRecNetRunner(cfg)
    h, w, n = args.height, args.width, args.shards
    rng = np.random.RandomState(0)

    def fwd_at(hh):
        # The multi-level mask fusion needs /32-divisible heights; round UP,
        # so shard-compute estimates are conservative (over-)estimates.
        hh = (hh + 31) // 32 * 32
        frame = jnp.asarray((rng.rand(1, hh, w, 3) * 255).astype(np.float32))
        f = jax.jit(lambda v, x: net.model.apply(
            v, x, train=False))
        from planerecnet_tpu.ops.image import fast_base_transform
        pre = jax.jit(fast_base_transform)
        x = pre(frame)
        return timeit(f, net.variables, x)

    t_full = fwd_at(h)
    hs = h // n
    t_shard = fwd_at(hs)
    t_shard_halo = fwd_at(hs + args.halo_rows)

    # ICI: each of the (n-1) internal boundaries exchanges halo rows both
    # ways; shards overlap their sends, so latency ~= one boundary's
    # one-way traffic / BW + per-layer latency floor.
    hbytes = halo_traffic_bytes(cfg, h, w)
    n_exchanges = 60  # ~conv count in the trunk (latency floor, 1 us each)
    t_ici = hbytes / (args.ici_gbps * 1e9) + n_exchanges * 1e-6

    est = t_shard_halo + t_ici
    rows = [
        ("full forward (1 chip, baseline)", t_full),
        (f"shard compute H/{n} (no halo)", t_shard),
        (f"shard compute H/{n}+{args.halo_rows} halo rows", t_shard_halo),
        (f"analytic ICI halo exchange ({hbytes/1e6:.2f} MB)", t_ici),
        (f"=> estimated spatial-{n} forward latency", est),
    ]
    for name, t in rows:
        print(f"{name:46s} {t * 1000:8.3f} ms")
    print(json.dumps({
        "metric": f"spatial-{n} estimated forward latency ({cfg.name}, "
                  f"{h}x{w})",
        "value": round(est * 1000, 2),
        "unit": "ms",
        "single_chip_ms": round(t_full * 1000, 2),
        "speedup": round(t_full / est, 2),
    }))


if __name__ == "__main__":
    main()
