"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native re-design of the reference's single native dependency,
``torchvision.ops.deform_conv2d`` (called from reference models/dcn.py:59-66).

Formulation
-----------
The deformable conv is decomposed into two MXU-friendly stages:

1. **Deformable im2col**: for each output position ``p`` and kernel tap ``k``
   bilinearly sample the input at ``p*stride - pad + k + offset[p, k]`` with
   zero out-of-bounds semantics, multiply by the modulation scalar
   ``mask[p, k]``. The sampling is 4 batched row-gathers from the flattened
   ``(H*W, Cin)`` feature map (channels stay on the 128-lane minor axis) —
   XLA lowers these to efficient dynamic-gathers on TPU.

2. **One large matmul**: ``(B*Ho*Wo, K*Cin) @ (K*Cin, Cout)`` — the FLOPs all
   land on the MXU, exactly like a regular conv's im2col.

Backward
--------
Two interchangeable backward paths (both tested against each other):

* **autodiff** (default): XLA differentiates the gather/matmul composition;
  the input gradient lowers to an XLA scatter-add. With the batched forward
  chunked through ``lax.scan`` (``DCN_BATCH_CHUNK``) the backward is a
  reverse scan whose per-chunk scatter working set stays VMEM-resident:
  full PRN-101 train step (bs=8, 640x640, bf16, no remat) = **311.9
  ms/iter** on one v5e chip (370.6 unchunked; PERF.md round 3).
* **hand-written VJP** (``USE_CUSTOM_VJP = True``): gathers + matmuls for
  weight/offset/modulation gradients and a Pallas VMEM-resident scatter
  kernel (``ops/pallas/dcn_scatter.py``) for the input gradient, applied at
  CHUNK granularity so the reverse scan keeps its corner transients small.
  Measured 532.3 ms/iter (round 3; the round-2 full-batch form was 651.8)
  vs autodiff's 311.9 — XLA's fused scatter-add beats the Pallas kernel
  end-to-end, so autodiff stays the default. The custom path is kept as the
  reference implementation of the analytic DCN backward.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Select the hand-written VJP + Pallas scatter backward (see module
# docstring); module-level because flax modules call deform_conv2d without
# a config handle. Read at trace time.
USE_CUSTOM_VJP = False


def _sampling_positions(b, h, w, ho, wo, k_size, stride, padding, offset):
    """Float sample coordinates (sy, sx): (B, Ho*Wo*K) each."""
    kh = kw = k_size
    k = kh * kw
    oy = (np.arange(ho) * stride - padding).astype(np.float32)
    ox = (np.arange(wo) * stride - padding).astype(np.float32)
    ty, tx = np.meshgrid(np.arange(kh, dtype=np.float32),
                         np.arange(kw, dtype=np.float32), indexing="ij")
    off = offset.astype(jnp.float32).reshape(b, ho, wo, k, 2)
    base_y = oy[None, :, None, None] + ty.reshape(-1)[None, None, None, :]
    base_x = ox[None, None, :, None] + tx.reshape(-1)[None, None, None, :]
    sy = (base_y + off[..., 0]).reshape(b, ho * wo * k)
    sx = (base_x + off[..., 1]).reshape(b, ho * wo * k)
    return sy, sx


def _corner_data(sy, sx, h, w):
    """Corner indices, validity-zeroed bilinear weights, flat gather ids.

    Returns (y0, x0, weights(B,R,4), flat_ids(B,R,4)) with corner order
    (y0,x0), (y0,x1), (y1,x0), (y1,x1).
    """
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    ws, ids, vs = [], [], []
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            ws.append(jnp.where(valid, wy * wx, 0.0))
            ids.append(yi * w + xi)
            vs.append(valid)
    return (y0.astype(jnp.int32), x0.astype(jnp.int32),
            jnp.stack(ws, axis=-1), jnp.stack(ids, axis=-1),
            jnp.stack(vs, axis=-1))


def _gather_corners(x_flat, flat_ids):
    """4 corner gathers: x_flat (B, H*W, C), flat_ids (B, R, 4) ->
    (B, R, 4, C). Four separate R-row gathers beat one (B, 4R) combined
    gather here — the combined output exceeds the scoped-VMEM budget and
    regressed the train step ~50 ms (trace-measured, round 2)."""
    outs = [jnp.take_along_axis(x_flat, flat_ids[..., i:i + 1], axis=1)
            for i in range(4)]
    return jnp.stack(outs, axis=2)


def _gather_patches(x: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray
                    ) -> jnp.ndarray:
    """One 2x2xC-patch gather per sample: x (B, H, W, C), y0/x0 (B, R)
    top-left corner coords (may be out of range) -> (B, R, 4, C) in corner
    order (00, 01, 10, 11).

    The operand is padded by a 1-pixel zero margin on every side so the
    patch start ``clip(y0, -1, H-1) + 1`` always covers the VALID corner
    rows/cols exactly: for y0 = -1 the patch is (margin, row 0) and the
    invalid corner carries zero weight; for y0 = H-1 it is (row H-1,
    margin). Any sample fully out of range has all-zero weights and its
    patch values are irrelevant.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    starts = jnp.stack([jnp.clip(y0, -1, h - 1) + 1,
                        jnp.clip(x0, -1, w - 1) + 1], axis=-1)  # (B, R, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(
        xp, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out.reshape(b, y0.shape[1], 4, c)


# Corner-sampling strategy for the forward: "rows" = 4 separate row
# gathers from the flattened (B, H*W, C) map; "patch" = one 2x2xC patch
# gather (corners are memory-adjacent). Forward bit-exact; backward equal
# to ~2 ulp — the scatters accumulate in a different order
# (tests/test_dcn.py). They differ in speed:
#   * inference: patch wins (batch-8 PRN-50 pipeline 145.1 vs 132.1 img/s,
#     PERF.md round 3);
#   * training: patch's autodiff backward lowers to a catastrophic 2x2-slice
#     scatter (6632 ms/iter vs rows' 311.9) — rows only.
# ``default_gather_mode(train)`` encodes that policy; PRN_CORNER_GATHER
# overrides it for experiments. Read at trace time.
import os as _os

CORNER_GATHER = _os.environ.get("PRN_CORNER_GATHER", "rows")


def default_gather_mode(train: bool) -> str:
    env = _os.environ.get("PRN_CORNER_GATHER")
    if env:
        return env
    return "rows" if train else "patch"


# Experiment knobs (PERF.md round 4; defaults = the measured round-3 policy):
#   PRN_DCN_IDX16=1       s16 gather indices where they fit (halves index
#                         traffic; only helps if XLA doesn't upcast).
#   mode "mix:<R>"        per-LAYER gather policy: patch when the layer's
#                         sample count Ho*Wo*K <= R, rows otherwise.
#   mode "onehot"         interp-matmul gather (see _gather_onehot): the 4
#                         corner weights fold into an on-the-fly (R, HW)
#                         one-hot matrix and sampling becomes one MXU
#                         matmul whose BACKWARD is also a matmul (no
#                         scatter). Only sane for small maps.
#   mode "onehot:<HW>[:fb]"  onehot when the layer's H*W <= <HW>, else the
#                         fallback mode fb (default rows).
DCN_IDX16 = _os.environ.get("PRN_DCN_IDX16") == "1"


def _gather_onehot(x_flat: jnp.ndarray, ids: jnp.ndarray,
                   ws: jnp.ndarray) -> jnp.ndarray:
    """Interp-matmul "gather": fold the 4 validity-zeroed bilinear corner
    weights into ONE (R, H*W) interpolation matrix built on the fly from an
    iota-compare, then take all samples as a single MXU matmul
    ``M @ x``.

    Why: TPU per-element gathers cost far more than their bytes, while the
    MXU is nearly free at these sizes. For a SMALL feature map (conv4/conv5
    stages: H*W <= ~1.6k at 640^2) the matmul costs R*HW*C MACs (~12 GFLOP
    per conv4 image = ~30 us on a v5e) and — decisively for training — its
    autodiff backward is ``M^T @ dout``: another matmul instead of the
    scatter-add the rows/patch modes lower to. For large maps (conv3:
    HW = 6.4k) the (R, HW) matrix is ~740 MB/image and the formulation
    loses; mode "auto<HW>" keys the choice per layer.

    x_flat: (B, H*W, C); ids/ws: (B, R, 4). Returns (B, R, C) with the
    bilinear weights ALREADY applied (unlike the other modes, which return
    per-corner values for a later weighted sum).
    """
    hw = x_flat.shape[1]
    iota = jnp.arange(hw, dtype=ids.dtype)
    m = jnp.sum(
        jnp.where(ids[..., None] == iota, ws[..., None], 0.0),
        axis=2).astype(x_flat.dtype)                     # (B, R, HW)
    return jnp.einsum("brh,bhc->brc", m, x_flat,
                      preferred_element_type=jnp.float32
                      ).astype(x_flat.dtype)


# Rematerialise the interp matrix in the backward instead of saving it as a
# residual: M is (R, HW) bf16 — ~46 MB per conv4 image at 640^2, ~3 GB of
# residuals across 8 layers x 8 scan chunks — while rebuilding it costs one
# VPU iota-compare pass. PRN_DCN_ONEHOT_SAVE=1 keeps the residual for A/B.
_gather_onehot_remat = jax.checkpoint(_gather_onehot)


def _bilinear_gather(x_flat: jnp.ndarray, h: int, w: int,
                     sy: jnp.ndarray, sx: jnp.ndarray,
                     gather_mode: Optional[str] = None) -> jnp.ndarray:
    """Bilinearly sample ``x_flat``: (B, H*W, C) at float positions with
    zero out-of-bounds semantics (torchvision deform_conv2d convention).
    Returns (B, R, C)."""
    y0, x0, ws, ids, _ = _corner_data(sy, sx, h, w)
    mode = gather_mode or CORNER_GATHER
    if mode.startswith("mix:"):
        mode = "patch" if sy.shape[1] <= int(mode[4:]) else "rows"
    if mode.startswith("onehot:"):
        # "onehot:<HW>[:fallback]" — interp-matmul when the layer's map has
        # at most <HW> positions, else the fallback mode (default rows).
        parts = mode.split(":")
        mode = "onehot" if h * w <= int(parts[1]) else (
            parts[2] if len(parts) > 2 else "rows")
    if mode == "onehot":
        fn = (_gather_onehot if _os.environ.get("PRN_DCN_ONEHOT_SAVE") == "1"
              else _gather_onehot_remat)
        return fn(x_flat, ids, ws)
    if mode == "patch":
        b = x_flat.shape[0]
        if DCN_IDX16 and max(h, w) + 2 < 2 ** 15:
            y0, x0 = y0.astype(jnp.int16), x0.astype(jnp.int16)
        corners = _gather_patches(
            x_flat.reshape(b, h, w, -1), y0, x0)      # (B, R, 4, C)
    else:
        if DCN_IDX16 and h * w < 2 ** 15:
            ids = ids.astype(jnp.int16)
        corners = _gather_corners(x_flat, ids)        # (B, R, 4, C)
    return jnp.sum(corners * ws[..., None].astype(corners.dtype), axis=2)


def _forward_chunk(x, offset, mask, weight, bias, stride, padding,
                   kernel_size, gather_mode=None):
    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    _, ho, wo, _ = offset.shape
    sy, sx = _sampling_positions(b, h, w, ho, wo, kernel_size, stride,
                                 padding, offset)
    x_flat = x.reshape(b, h * w, cin)
    sampled = _bilinear_gather(x_flat, h, w, sy, sx, gather_mode)
    sampled = sampled.reshape(b, ho * wo, k, cin)
    sampled = sampled * mask.reshape(b, ho * wo, k, 1).astype(sampled.dtype)

    cols = sampled.reshape(b, ho * wo, k * cin)
    wmat = weight.reshape(k * cin, -1)
    out = jnp.einsum("bpf,fo->bpo", cols, wmat,
                     preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, ho, wo, -1)


# Batched calls are processed ``DCN_BATCH_CHUNK`` images at a time through a
# lax.scan: the per-corner gather working set then stays at its batch-1,
# scoped-VMEM-resident size (1.1 ms/fusion) instead of the full-batch
# bf16[B*Ho*Wo*K, C] form that spills to HBM (38.8 ms on one stride-8
# fusion at batch 8 — PERF.md round 2). 0 disables chunking.
DCN_BATCH_CHUNK = int(_os.environ.get("PRN_DCN_BATCH_CHUNK", "1"))

# lax.scan unroll factor for the chunk loop: unroll>1 inlines several
# chunks per loop iteration so XLA can interleave one chunk's gathers with
# another's matmuls WITHOUT merging them into a single (spilling) gather
# the way chunk=2 does. Measured (PERF.md round 3): no win — kept at 1.
DCN_SCAN_UNROLL = int(_os.environ.get("PRN_DCN_SCAN_UNROLL", "1"))

# Adaptive chunking threshold (MB): a layer is scan-chunked only when its
# FULL-BATCH corner working set (B*Ho*Wo*K taps x 4 corners x Cin, compute
# dtype) exceeds this budget — small levels (e.g. the 20x20 conv5 maps)
# then run as one fused gather with no scan overhead. 0 = chunk every
# batched layer (round-3 default behaviour).
DCN_CHUNK_MAX_MB = float(_os.environ.get("PRN_DCN_CHUNK_MAX_MB", "0"))

# Hoist the sampling geometry (positions, corner indices/weights) OUT of
# the chunk scan: only the gathers + matmuls spill at full batch — the
# corner prep is elementwise VPU work ((B, R, 4) transients, ~7 MB at the
# largest stage) and recomputing it inside every scan iteration paid
# per-iteration scheduling overhead on ~40 sub-50us ops x 22 scans x 8
# chunks (the round-4 trace's "in-scan bookkeeping" tail, PERF.md).
# Bit-exact either way (tests/test_dcn.py::test_outer_prep_bit_exact);
# 0 restores the round-3 all-inside-the-body formulation.
DCN_OUTER_PREP = _os.environ.get("PRN_DCN_OUTER_PREP", "1") == "1"


def _resolve_mode(mode: Optional[str], r: int, h: int, w: int) -> str:
    """Collapse the mix:/onehot: policy strings to a concrete gather mode
    for one layer (r = Ho*Wo*K samples, h*w = input positions)."""
    mode = mode or CORNER_GATHER
    if mode.startswith("mix:"):
        return "patch" if r <= int(mode[4:]) else "rows"
    if mode.startswith("onehot:"):
        parts = mode.split(":")
        return "onehot" if h * w <= int(parts[1]) else (
            parts[2] if len(parts) > 2 else "rows")
    return mode


def _modulate_matmul(sampled, mask, weight, bias, b, k, cin, out_dtype):
    """Shared tail of the deformable conv: modulation + the one MXU matmul
    (sampled: (B, Ho*Wo*K, Cin) with bilinear weights already applied)."""
    p = sampled.shape[1] // k
    sampled = sampled.reshape(b, p, k, cin)
    sampled = sampled * mask.reshape(b, p, k, 1).astype(sampled.dtype)
    cols = sampled.reshape(b, p, k * cin)
    wmat = weight.reshape(k * cin, -1)
    out = jnp.einsum("bpf,fo->bpo", cols, wmat,
                     preferred_element_type=jnp.float32)
    out = out.astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _forward_outer_prep(x, offset, mask, weight, bias, stride, padding,
                        kernel_size, gather_mode, chunk):
    """Chunk-scanned forward with the corner prep hoisted to full batch;
    identical math and order to ``_forward_chunk`` per chunk."""
    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    _, ho, wo, _ = offset.shape
    sy, sx = _sampling_positions(b, h, w, ho, wo, kernel_size, stride,
                                 padding, offset)
    y0, x0, ws, ids, _ = _corner_data(sy, sx, h, w)
    mode = _resolve_mode(gather_mode, sy.shape[1], h, w)
    nb = b // chunk

    def chunks(a):
        return a.reshape(nb, chunk, *a.shape[1:])

    x_flat = x.reshape(b, h * w, cin)
    if mode == "patch":
        if DCN_IDX16 and max(h, w) + 2 < 2 ** 15:
            y0, x0 = y0.astype(jnp.int16), x0.astype(jnp.int16)
        xs = (chunks(x), chunks(y0), chunks(x0), chunks(ws), chunks(mask))

        def body(carry, args):
            xc, y0c, x0c, wsc, mc = args
            corners = _gather_patches(xc, y0c, x0c)
            sampled = jnp.sum(
                corners * wsc[..., None].astype(corners.dtype), axis=2)
            return carry, _modulate_matmul(sampled, mc, weight, bias,
                                           chunk, k, cin, x.dtype)
    elif mode == "onehot":
        fn = (_gather_onehot if _os.environ.get("PRN_DCN_ONEHOT_SAVE") == "1"
              else _gather_onehot_remat)
        xs = (chunks(x_flat), chunks(ids), chunks(ws), chunks(mask))

        def body(carry, args):
            xc, idsc, wsc, mc = args
            sampled = fn(xc, idsc, wsc)
            return carry, _modulate_matmul(sampled, mc, weight, bias,
                                           chunk, k, cin, x.dtype)
    else:
        if DCN_IDX16 and h * w < 2 ** 15:
            ids = ids.astype(jnp.int16)
        xs = (chunks(x_flat), chunks(ids), chunks(ws), chunks(mask))

        def body(carry, args):
            xc, idsc, wsc, mc = args
            corners = _gather_corners(xc, idsc)
            sampled = jnp.sum(
                corners * wsc[..., None].astype(corners.dtype), axis=2)
            return carry, _modulate_matmul(sampled, mc, weight, bias,
                                           chunk, k, cin, x.dtype)

    _, out = jax.lax.scan(body, None, xs, unroll=DCN_SCAN_UNROLL)
    out = out.reshape(b, ho * wo, -1)
    return out.reshape(b, ho, wo, -1)


def _forward_impl(x, offset, mask, weight, bias, stride, padding,
                  kernel_size, gather_mode=None):
    # Per-chunk op: with USE_CUSTOM_VJP the chunk gets the hand-written
    # backward — applied at chunk granularity so the reverse scan keeps its
    # corner transients chunk-sized. The custom core's forward gather mode
    # comes from PRN_DCN_CUSTOM_FWD (default "rows"); its primal is bit-exact
    # either way, so "patch" buys the inference-mode forward speed while the
    # hand-written backward sidesteps patch autodiff's catastrophic
    # 2x2-slice scatter.
    fwd = (_deform_conv2d_core if USE_CUSTOM_VJP
           else functools.partial(_forward_chunk, gather_mode=gather_mode))
    b = x.shape[0]
    chunk = DCN_BATCH_CHUNK
    if DCN_CHUNK_MAX_MB > 0:
        k = kernel_size * kernel_size
        ho, wo = offset.shape[1], offset.shape[2]
        corner_mb = (b * ho * wo * k * 4 * x.shape[-1]
                     * jnp.dtype(x.dtype).itemsize) / 2**20
        if corner_mb <= DCN_CHUNK_MAX_MB:
            chunk = 0  # fits: one fused gather, no scan
    if 0 < chunk < b and b % chunk == 0:
        if not USE_CUSTOM_VJP and DCN_OUTER_PREP:
            return _forward_outer_prep(x, offset, mask, weight, bias,
                                       stride, padding, kernel_size,
                                       gather_mode, chunk)
        nb = b // chunk
        xs = (x.reshape(nb, chunk, *x.shape[1:]),
              offset.reshape(nb, chunk, *offset.shape[1:]),
              mask.reshape(nb, chunk, *mask.shape[1:]))

        def body(carry, args):
            xc, oc, mc = args
            return carry, fwd(xc, oc, mc, weight, bias, stride,
                              padding, kernel_size)

        _, out = jax.lax.scan(body, None, xs, unroll=DCN_SCAN_UNROLL)
        return out.reshape(b, *out.shape[2:])
    return fwd(x, offset, mask, weight, bias, stride, padding, kernel_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _deform_conv2d_core(x, offset, mask, weight, bias, stride, padding,
                        kernel_size):
    # Primal = ONE chunk's forward: _forward_impl applies this per scan
    # chunk, so the hand-written backward below also runs per-chunk inside
    # the reverse scan — its (B_chunk, R, C) corner transients stay at the
    # VMEM-resident chunk size (the round-2 full-batch form materialised
    # ~3.8 GB corner tensors and lost to autodiff end-to-end; PERF.md).
    return _forward_chunk(x, offset, mask, weight, bias, stride, padding,
                          kernel_size, gather_mode=CUSTOM_FWD_GATHER)


# Forward gather mode of the custom-VJP core ("rows" | "patch"); the
# backward is hand-written either way so patch's autodiff-scatter problem
# does not apply. Read at trace time.
CUSTOM_FWD_GATHER = _os.environ.get("PRN_DCN_CUSTOM_FWD", "rows")

# Input-gradient scatter used by the hand-written backward: "pallas" (the
# banded VMEM-accumulator kernel) or "xla" (plain scatter-add — the same op
# autodiff emits, here paired with the analytic dweight/doffset/dmask
# formulas above instead of autodiff's recomputation graph).
CUSTOM_BWD_SCATTER = _os.environ.get("PRN_DCN_SCATTER", "pallas")


def _dcn_fwd(x, offset, mask, weight, bias, stride, padding, kernel_size):
    out = _forward_chunk(x, offset, mask, weight, bias, stride, padding,
                         kernel_size, gather_mode=CUSTOM_FWD_GATHER)
    return out, (x, offset, mask, weight, bias is not None)


def _dcn_bwd(stride, padding, kernel_size, res, dout):
    x, offset, mask, weight, has_bias = res
    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    _, ho, wo, _ = offset.shape
    p = ho * wo
    cout = weight.shape[-1]

    dout32 = dout.astype(jnp.float32)
    dflat = dout32.reshape(b, p, cout)

    # Recompute sampling geometry + corner values (cheaper than saving).
    sy, sx = _sampling_positions(b, h, w, ho, wo, kernel_size, stride,
                                 padding, offset)
    y0, x0, cw, ids, inb = _corner_data(sy, sx, h, w)  # (B, R, 4) each
    x_flat = x.astype(jnp.float32).reshape(b, h * w, cin)

    maskf = mask.astype(jnp.float32).reshape(b, p, k, 1)
    wmat = weight.astype(jnp.float32).reshape(k * cin, cout)

    dcols = jnp.einsum("bpo,fo->bpf", dflat, wmat,
                       preferred_element_type=jnp.float32)
    dcols = dcols.reshape(b, p * k, cin)              # (B, R, Cin)

    # Per-corner loop: each corner's gathered values feed BOTH the sampled
    # reconstruction (for dweight/dmask) and the row-dot with dcols (for
    # doffset). Looping keeps the peak at (B, R, Cin) transients that XLA
    # fuses — a stacked (B, R, 4, Cin) f32 corner tensor is ~3.8 GB at the
    # stride-8 stage and was the reason the round-1 custom VJP lost to
    # autodiff end-to-end (890 vs 715 ms/iter, PERF.md).
    sampled_unmod = jnp.zeros((b, p * k, cin), jnp.float32)
    dots = []
    for i in range(4):
        g = jnp.take_along_axis(x_flat, ids[..., i:i + 1], axis=1)
        sampled_unmod = sampled_unmod + g * cw[..., i:i + 1]
        # In-bounds gating (NOT weight>0: at integer sample positions — the
        # zero-init case — a corner can have zero bilinear weight yet a
        # non-zero offset derivative).
        gv = jnp.where(inb[..., i:i + 1], g, 0.0)
        dots.append(jnp.einsum("brc,brc->br", gv, dcols))
    dot = jnp.stack(dots, axis=-1)                    # (B, R, 4)

    # dweight / dbias from the reconstructed modulated samples.
    cols = (sampled_unmod.reshape(b, p, k, cin) * maskf).reshape(
        b, p, k * cin)
    dweight = jnp.einsum("bpf,bpo->fo", cols, dflat,
                         preferred_element_type=jnp.float32)
    dweight = dweight.reshape(weight.shape).astype(weight.dtype)
    dbias = (jnp.sum(dout32, axis=(0, 1, 2)).astype(jnp.float32)
             if has_bias else None)

    # dmask: dL/dmask = <sampled_unmod, dcols>.
    dmask = jnp.sum(sampled_unmod * dcols, axis=-1).reshape(b, ho, wo, k)
    dmask = dmask.astype(mask.dtype)

    # doffset: analytic bilinear derivative, validity-gated like the
    # forward weights. Corner order (00, 01, 10, 11).
    fx = sx - jnp.floor(sx)
    fy = sy - jnp.floor(sy)
    vmaskr = mask.astype(jnp.float32).reshape(b, p * k)
    one = jnp.float32(1.0)
    dsy = (-(one - fx) * dot[..., 0] - fx * dot[..., 1]
           + (one - fx) * dot[..., 2] + fx * dot[..., 3]) * vmaskr
    dsx = (-(one - fy) * dot[..., 0] + (one - fy) * dot[..., 1]
           - fy * dot[..., 2] + fy * dot[..., 3]) * vmaskr
    doffset = jnp.stack([dsy.reshape(b, ho, wo, k),
                         dsx.reshape(b, ho, wo, k)], axis=-1)
    doffset = doffset.reshape(b, ho, wo, 2 * k).astype(offset.dtype)

    # dx: the scatter-add — Pallas on TPU, XLA fallback elsewhere.
    from planerecnet_tpu.ops.pallas.dcn_scatter import (dcn_input_grad_pallas,
                                                        dcn_input_grad_xla)
    contrib_w = cw * (vmaskr * 1.0)[..., None]        # (B, R, 4) modulated
    cy = jnp.clip(y0 + 1, 0, h)
    cx = jnp.clip(x0 + 1, 0, w)
    corner_idx = jnp.stack([cy, cx], axis=-1).astype(jnp.int32)
    scatter = (dcn_input_grad_pallas
               if (jax.default_backend() == "tpu"
                   and CUSTOM_BWD_SCATTER == "pallas")
               else dcn_input_grad_xla)
    dx = scatter(corner_idx, contrib_w, dcols, h, w).astype(x.dtype)

    return dx, doffset, dmask, dweight, dbias


_deform_conv2d_core.defvjp(_dcn_fwd, _dcn_bwd)


@functools.partial(jax.jit, static_argnames=("stride", "padding",
                                             "kernel_size", "gather_mode"))
def deform_conv2d(x: jnp.ndarray,
                  offset: jnp.ndarray,
                  mask: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  *,
                  stride: int = 1,
                  padding: int = 1,
                  kernel_size: int = 3,
                  gather_mode: Optional[str] = None) -> jnp.ndarray:
    """Modulated deformable convolution, NHWC.

    Args:
      x:      (B, H, W, Cin) input features.
      offset: (B, Ho, Wo, 2*K) per-tap offsets; channel ``2k`` is the y
              offset and ``2k+1`` the x offset of tap ``k`` (torchvision
              layout, reference models/dcn.py:25-30).
      mask:   (B, Ho, Wo, K) modulation scalars.
      weight: (kh, kw, Cin, Cout) conv weights (HWIO).
      bias:   (Cout,) or None.

      gather_mode: "rows" | "patch" | None (None = module default;
              see ``default_gather_mode`` — patch is the inference choice,
              rows the training one).

    Returns (B, Ho, Wo, Cout).
    """
    return _forward_impl(x, offset, mask, weight, bias, stride, padding,
                         kernel_size, gather_mode)


@functools.partial(jax.jit, static_argnames=("stride", "padding",
                                             "kernel_size"))
def deform_conv2d_reference(x, offset, mask, weight, bias=None, *,
                            stride: int = 1, padding: int = 1,
                            kernel_size: int = 3) -> jnp.ndarray:
    """Plain-autodiff implementation (no custom VJP): the correctness oracle
    for the hand-written backward."""
    return _forward_impl(x, offset, mask, weight, bias, stride, padding,
                         kernel_size)
