"""Pallas TPU scatter-add kernel for the deformable-conv input gradient.

The backward of deformable sampling w.r.t. the input feature map is a
scatter-add: every (output-position, tap, corner) contribution lands at a
dynamic pixel. XLA lowers such scatters to a serialized update loop on TPU —
measured at ~30 ms per DCN layer in the PRN-101 training step (~330 ms of a
715 ms step; see PERF.md). This kernel keeps a band of the dx accumulator
resident in VMEM and streams the contributions, accumulating each corner
with a single-pixel vector add:

    dx[y, x, :] += w_corner * dcols[r, :]

Mosaic/VMEM constraints shape the design:
  * corner coordinates arrive as FLAT padded positions (y*(W+2)+x) in
    (rows8, 128)-tiled SMEM blocks (1-D/odd-shaped SMEM blocks lane-pad to
    megabytes; dynamic 2x2 sublane slices can't be proven 8-aligned, so
    each bilinear corner is its own accumulate);
  * the accumulator is split into row BANDS over a third grid dimension so
    the double-buffered output block fits the ~16MB VMEM scoped limit at
    C=512; every band pass streams all contributions and predicates each
    corner's store on membership in the band.
Out-of-bounds corners carry zero weight and land in the 1-pixel margin of
the padded (H+2, W+2, C) accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_CHUNK = 2048
_BAND_BYTES = 4 * 1024 * 1024  # target VMEM per accumulator band


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(wpad: int, band_rows: int):
    def kernel(fidx_ref, w_ref, dcols_ref, out_ref):
        k = pl.program_id(1)
        j = pl.program_id(2)
        lo = k * band_rows

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = dcols_ref.shape[1]

        def body(r, _):
            d = dcols_ref[0, r, :]                       # (C,)
            fidx = fidx_ref[0, 0, r // 128, r % 128]
            y = fidx // wpad
            x = fidx % wpad
            w0 = 4 * r

            def corner(dy, dx, widx):
                yy = y + dy

                @pl.when((yy >= lo) & (yy < lo + band_rows))
                def _():
                    out_ref[0, yy - lo, x + dx, :] += (
                        w_ref[0, 0, widx // 128, widx % 128] * d)

            corner(0, 0, w0)
            corner(0, 1, w0 + 1)
            corner(1, 0, w0 + 2)
            corner(1, 1, w0 + 3)
            return 0

        jax.lax.fori_loop(0, rows, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w"))
def dcn_input_grad_pallas(corner_idx: jnp.ndarray, corner_w: jnp.ndarray,
                          dcols: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Accumulate deformable-sampling gradients into the input feature map.

    Args:
      corner_idx: (B, R, 2) int32 — top-left corner (y0+1, x0+1) of each
        contribution's 2x2 patch in *padded* coordinates, pre-clamped to
        [0, H] x [0, W].
      corner_w:   (B, R, 4) f32 — bilinear x modulation weights for the
        (y0,x0),(y0,x1),(y1,x0),(y1,x1) corners; zero where invalid.
      dcols:      (B, R, C) f32 — upstream gradient rows.

    Returns dx: (B, H, W, C) f32.
    """
    b, r, c = dcols.shape
    wpad = w + 2
    row_bytes = wpad * c * 4
    band_rows = max(8, min(h + 2, _BAND_BYTES // row_bytes))
    bands = -(-(h + 2) // band_rows)
    hpad = bands * band_rows

    chunk = min(_ROW_CHUNK, _round_up(r, 128))
    pad_r = _round_up(r, chunk) - r
    if pad_r:
        corner_idx = jnp.pad(corner_idx, ((0, 0), (0, pad_r), (0, 0)))
        corner_w = jnp.pad(corner_w, ((0, 0), (0, pad_r), (0, 0)))
        dcols = jnp.pad(dcols, ((0, 0), (0, pad_r), (0, 0)))
    r_pad = corner_idx.shape[1]
    nj = r_pad // chunk

    fidx = (corner_idx[..., 0] * wpad + corner_idx[..., 1]).astype(jnp.int32)
    fidx = fidx.reshape(b, nj, chunk // 128, 128)
    w_flat = corner_w.astype(jnp.float32).reshape(b, nj, chunk * 4 // 128,
                                                  128)

    out = pl.pallas_call(
        _make_kernel(wpad, band_rows),
        grid=(b, bands, nj),
        in_specs=[
            pl.BlockSpec((1, 1, chunk // 128, 128),
                         lambda i, k, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, chunk * 4 // 128, 128),
                         lambda i, k, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, c), lambda i, k, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band_rows, wpad, c),
                               lambda i, k, j: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hpad, wpad, c), jnp.float32),
    )(fidx, w_flat, dcols.astype(jnp.float32))
    return out[:, 1:h + 1, 1:w + 1, :]


def dcn_input_grad_xla(corner_idx: jnp.ndarray, corner_w: jnp.ndarray,
                       dcols: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """XLA scatter-add fallback / oracle (same padded-margin contract)."""
    b, r, c = dcols.shape
    flat = jnp.zeros((b, (h + 2) * (w + 2), c), jnp.float32)
    contrib = corner_w[..., None].astype(jnp.float32) * \
        dcols[:, :, None, :].astype(jnp.float32)       # (B, R, 4, C)
    cy = corner_idx[..., 0]
    cx = corner_idx[..., 1]
    for k, (dy, dx_) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        idx = (cy + dy) * (w + 2) + (cx + dx_)
        flat = flat.at[jnp.arange(b)[:, None], idx].add(contrib[:, :, k, :])
    out = flat.reshape(b, h + 2, w + 2, c)
    return out[:, 1:h + 1, 1:w + 1, :]
