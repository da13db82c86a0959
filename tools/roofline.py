"""Roofline / MFU accounting for the headline numbers (VERDICT r4 task 5).

Turns "147.8 img/s is the practical plateau" from an empirical claim into
an accounting: XLA's own compiled cost model gives FLOPs and HBM bytes for
the exact programs the benchmarks run; chip peak comes from the device
kind; and a random-gather microbench measures the achievable HBM
random-access bandwidth that bounds the DCN im2col gathers (the measured
floor of both inference and training, PERF.md).

    # FLOP/byte accounting + MFU at a measured throughput:
    python tools/roofline.py --config PlaneRecNet_50_config --imgs_per_s 147.83
    # include the train-step program (slow first compile):
    python tools/roofline.py --train --train_ms 308.7
    # random-gather bandwidth microbench (device-trace timed):
    python tools/roofline.py --gather

Peaks: TPU v5 lite (v5e) 197 TFLOP/s bf16 / 394 int8, ~819 GB/s HBM
(public spec). Override with --peak_tflops / --peak_hbm_gbs for other
chips. All analysis numbers are from ``compiled.cost_analysis()`` — the
compiler's static count for the landed HLO (fusion included), not a
hand count; the gather bench is timed from a jax.profiler device trace
because wall clocks through the remote tunnel are untrustworthy
(PERF.md "environment caveats").
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

PEAKS = {
    # device_kind prefix -> (bf16 TFLOP/s, HBM GB/s), public specs
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5": (459.0, 1228.0),      # v5p
    "TPU v4": (275.0, 1228.0),
    "TPU v6": (918.0, 1640.0),      # trillium
}


def peak_for(kind: str):
    for prefix, peaks in sorted(PEAKS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return peaks
    return (None, None)


def cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def fmt_flops(f):
    return f"{f / 1e9:.2f} GFLOP"


def analyze_inference(cfg, args):
    import jax.numpy as jnp
    from planerecnet_tpu.runner import PlaneRecNetRunner

    net = PlaneRecNetRunner(cfg)
    net.init_weights(None)
    h, w, b = args.height, args.width, args.batch_size
    x = jnp.zeros((b, h, w, 3), jnp.float32)
    # the exact fused program bench.py measures: normalise + forward +
    # point-NMS + postprocess
    run = net._pipeline((b, h, w, 3), (h, w))
    flops, bytes_ = cost(run.lower(net.variables, x).compile())
    return flops / b, bytes_ / b


def analyze_train(cfg, args):
    import functools
    import jax
    import jax.numpy as jnp
    from planerecnet_tpu.trainer import (apply_grads, create_train_state,
                                         grad_step)

    s = args.train_size
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               input_shape=(s, s))
    b = args.batch_size
    n = cfg.max_instances
    batch = {
        "image": jnp.zeros((b, s, s, 3), jnp.uint8),
        "depth_q": jnp.zeros((b, s, s, 1), jnp.uint16),
        "masks_packed": jnp.zeros((b, n, s, s // 8), jnp.uint8),
        "boxes": jnp.zeros((b, n, 4), jnp.float32),
        "classes": jnp.zeros((b, n), jnp.int32),
        "plane_paras": jnp.zeros((b, n, 4), jnp.float32),
        "gt_valid": jnp.zeros((b, n), bool),
        "k_matrix": jnp.tile(jnp.eye(3) * 500, (b, 1, 1)),
    }
    jit_g = jax.jit(functools.partial(grad_step, cfg=cfg))
    gf, gb = cost(jit_g.lower(state, batch).compile())
    grads, new_bs, losses = jax.eval_shape(jit_g, state, batch)
    jit_u = jax.jit(apply_grads)
    uf, ub = cost(jit_u.lower(state, grads, new_bs,
                              losses["total"]).compile())
    return gf + uf, gb + ub


def dcn_bytes(cfg, args):
    """Exact gather-byte accounting for the DCN floor claim (PERF.md
    round-5 roofline): per output pixel the deformable conv gathers
    9 taps x 4 bilinear corners x C channels of the stage feature map
    (``ops/dcn.py``), so bytes/image per DCN block is
    H_s * W_s * 36 * C * 2 (bf16). Block placement comes from the same
    ``_stage_plan`` the backbone builds from, so the count is the
    model's, not a hand count."""
    from planerecnet_tpu.models.backbone import _stage_plan

    bb = cfg.backbone
    plan = _stage_plan(bb.layers, bb.dcn_layers, bb.dcn_interval,
                       getattr(bb, "atrous_layers", ()) or ())
    h, w = args.height, args.width
    total = 0
    print(f"\nDCN gather bytes/image ({args.config}, {h}x{w}, bf16):")
    stride = 4  # C2 feature stride; _stage_plan strides are relative
    for s, (planes, blocks, st, _dil, flags) in enumerate(plan):
        if s > 0:
            stride *= st
        n = sum(flags)
        if not n:
            continue
        per = (h // stride) * (w // stride) * 9 * 4 * planes * 2
        total += n * per
        print(f"  conv{s + 2}: {n} DCN block(s) x {per / 1e6:.2f} MB "
              f"({h // stride}x{w // stride} x 36 x {planes}ch bf16)"
              f" = {n * per / 1e6:.1f} MB")
    print(f"  total {total / 1e6:.1f} MB gathered/image")
    if args.gather_gbs:
        floor_ms = total / (args.gather_gbs * 1e9) * 1e3
        print(f"  at {args.gather_gbs} GB/s measured random-gather bw: "
              f"{floor_ms:.2f} ms/image gather floor "
              f"= {1e3 / floor_ms:.0f} img/s ceiling (gathers alone)")
    return total


def gather_bench(args):
    """Random-gather HBM bandwidth: the bound on the DCN im2col corner
    gathers (4 corners x 9 taps per output pixel). Timed from a device
    trace; indices evolve per iteration so the runtime cannot cache."""
    import glob
    import gzip
    import json
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    rows, c = args.gather_rows, args.gather_cols
    m = args.gather_m
    table = jax.device_put(
        jnp.arange(rows * c, dtype=jnp.float32).reshape(rows, c)
        .astype(jnp.bfloat16))
    base = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(0), (m,), 0, rows,
                           dtype=jnp.int32))

    @jax.jit
    def many(table, base):
        def body(acc, i):
            idx = (base + i) % rows
            return acc + jnp.sum(table[idx], dtype=jnp.float32), 0
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(args.gather_iters))
        return acc

    jax.device_get(many(table, base))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="roofline_trace_")
    with jax.profiler.trace(tdir):
        jax.device_get(many(table, base))
    files = sorted(glob.glob(
        os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    tnames = {}
    for e in t.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    dev_us = sum(
        e.get("dur", 0) for e in t.get("traceEvents", [])
        if e.get("ph") == "X" and "XLA Ops" in tnames.get(
            (e.get("pid"), e.get("tid")), ""))
    bytes_moved = args.gather_iters * m * c * 2  # bf16 rows gathered
    gbs = bytes_moved / (dev_us * 1e-6) / 1e9 if dev_us else float("nan")
    print(f"random gather: {m} rows x {c} cols bf16 x "
          f"{args.gather_iters} iters = {bytes_moved / 1e9:.2f} GB "
          f"in {dev_us / 1e3:.1f} ms device time -> {gbs:.1f} GB/s")
    return gbs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="PlaneRecNet_50_config")
    p.add_argument("--height", default=480, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--imgs_per_s", default=None, type=float,
                   help="Measured inference throughput (bench.py) for MFU.")
    p.add_argument("--train", action="store_true")
    p.add_argument("--train_size", default=640, type=int)
    p.add_argument("--train_ms", default=None, type=float,
                   help="Measured train step ms/iter for train MFU.")
    p.add_argument("--gather", action="store_true")
    p.add_argument("--gather_rows", default=40 * 60, type=int,
                   help="Feature rows (H/16*W/16 at 640^2 = 1600... "
                        "default 2400 = 40x60 at 480x640).")
    p.add_argument("--gather_cols", default=256, type=int)
    p.add_argument("--gather_m", default=40 * 60 * 36, type=int,
                   help="Gathered rows per iter (out pixels x 9 taps x 4 "
                        "corners).")
    p.add_argument("--gather_iters", default=200, type=int)
    p.add_argument("--dcn_bytes", action="store_true",
                   help="Print per-stage DCN gather-byte accounting.")
    p.add_argument("--gather_gbs", default=None, type=float,
                   help="Measured random-gather GB/s (from --gather) to "
                        "turn --dcn_bytes into a ms/image floor.")
    p.add_argument("--peak_tflops", default=None, type=float)
    p.add_argument("--peak_hbm_gbs", default=None, type=float)
    args = p.parse_args()

    import jax
    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    from planerecnet_tpu.config import set_cfg

    kind = jax.devices()[0].device_kind
    peak_tf, peak_hbm = peak_for(kind)
    peak_tf = args.peak_tflops or peak_tf
    peak_hbm = args.peak_hbm_gbs or peak_hbm
    print(f"device: {kind}  peak {peak_tf} bf16 TFLOP/s, {peak_hbm} GB/s "
          f"HBM (public spec; override with --peak_*)")

    cfg = set_cfg(args.config)
    if args.dcn_bytes:
        dcn_bytes(cfg, args)
        if not (args.imgs_per_s or args.train or args.gather):
            return  # pure accounting run — skip the compiles

    flops_img, bytes_img = analyze_inference(cfg, args)
    print(f"\ninference pipeline ({args.config}, {args.height}x{args.width},"
          f" bs={args.batch_size}, {cfg.compute_dtype}):")
    print(f"  {fmt_flops(flops_img)}/image, "
          f"{bytes_img / 1e6:.1f} MB HBM traffic/image (XLA cost model)")
    if args.imgs_per_s and peak_tf:
        ach = flops_img * args.imgs_per_s / 1e12
        print(f"  at {args.imgs_per_s} img/s: {ach:.2f} TFLOP/s achieved "
              f"= {ach / peak_tf * 100:.1f}% MFU; "
              f"{bytes_img * args.imgs_per_s / 1e9:.0f} GB/s HBM "
              f"= {bytes_img * args.imgs_per_s / 1e9 / peak_hbm * 100:.0f}%"
              f" of peak")

    if args.train:
        tf_, tb = analyze_train(cfg, args)
        print(f"\ntrain step ({args.train_size}^2, bs={args.batch_size}):")
        print(f"  {fmt_flops(tf_)}/step, {tb / 1e6:.1f} MB HBM "
              f"traffic/step")
        if args.train_ms and peak_tf:
            ach = tf_ / (args.train_ms / 1e3) / 1e12
            print(f"  at {args.train_ms} ms/it: {ach:.2f} TFLOP/s "
                  f"= {ach / peak_tf * 100:.1f}% MFU; "
                  f"{tb / (args.train_ms / 1e3) / 1e9:.0f} GB/s HBM "
                  f"= {tb / (args.train_ms / 1e3) / 1e9 / peak_hbm * 100:.0f}"
                  f"% of peak")

    if args.gather:
        gather_bench(args)


if __name__ == "__main__":
    main()
