"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native re-design of the reference's single native dependency,
``torchvision.ops.deform_conv2d`` (called from reference models/dcn.py:59-66).

Formulation
-----------
The deformable conv is decomposed into two MXU-friendly stages:

1. **Deformable im2col**: for each output position ``p`` and kernel tap ``k``
   bilinearly sample the input at ``p*stride - pad + k + offset[p, k]`` with
   zero out-of-bounds semantics, multiply by the modulation scalar
   ``mask[p, k]``. This yields a column tensor ``(B, Ho*Wo, K*Cin)``.
   The sampling is 4 batched row-gathers from the flattened ``(H*W, Cin)``
   feature map (channels stay on the 128-lane minor axis) + a lerp — XLA
   lowers these to efficient dynamic-gathers on TPU.

2. **One large matmul**: ``(B*Ho*Wo, K*Cin) @ (K*Cin, Cout)`` — the FLOPs all
   land on the MXU, exactly like a regular conv's im2col.

The backward pass is obtained for free through XLA autodiff (gather ->
scatter-add), matching the structure of the CUDA backward kernel.

A Pallas kernel for stage 1 lives in ``planerecnet_tpu/ops/pallas/dcn_pallas.py``
and is used when enabled; this XLA composition is the reference/fallback
implementation and the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(x_flat: jnp.ndarray, h: int, w: int,
                     sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample ``x_flat``: (B, H*W, C) at float positions.

    ``sy``/``sx``: (B, P) sample coordinates. Out-of-bounds corners contribute
    zero (torchvision deform_conv2d semantics: a sample point more than one
    pixel outside the image yields zero; partially-outside points keep
    contributions from their in-bounds corners).
    Returns (B, P, C).
    """
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0

    out = None
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            flat = yi * w + xi                                    # (B, P)
            corner = jnp.take_along_axis(x_flat, flat[..., None], axis=1)
            weight = jnp.where(valid, wy * wx, 0.0)
            term = corner * weight[..., None].astype(x_flat.dtype)
            out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("stride", "padding", "kernel_size"))
def deform_conv2d(x: jnp.ndarray,
                  offset: jnp.ndarray,
                  mask: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  *,
                  stride: int = 1,
                  padding: int = 1,
                  kernel_size: int = 3) -> jnp.ndarray:
    """Modulated deformable convolution, NHWC.

    Args:
      x:      (B, H, W, Cin) input features.
      offset: (B, Ho, Wo, 2*K) per-tap offsets; channel ``2k`` is the y
              offset and ``2k+1`` the x offset of tap ``k`` (torchvision
              layout, reference models/dcn.py:25-30).
      mask:   (B, Ho, Wo, K) modulation scalars.
      weight: (kh, kw, Cin, Cout) conv weights (HWIO).
      bias:   (Cout,) or None.

    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh = kw = kernel_size
    k = kh * kw
    _, ho, wo, _ = offset.shape

    # Base sampling grid: output position * stride - pad + tap index.
    oy = (np.arange(ho) * stride - padding).astype(np.float32)      # (Ho,)
    ox = (np.arange(wo) * stride - padding).astype(np.float32)      # (Wo,)
    ty, tx = np.meshgrid(np.arange(kh, dtype=np.float32),
                         np.arange(kw, dtype=np.float32), indexing="ij")
    ty = ty.reshape(-1)                                             # (K,)
    tx = tx.reshape(-1)

    off = offset.reshape(b, ho, wo, k, 2)
    base_y = oy[None, :, None, None] + ty[None, None, None, :]      # (1,Ho,1,K)
    base_x = ox[None, None, :, None] + tx[None, None, None, :]      # (1,1,Wo,K)
    sy = (base_y + off[..., 0]).reshape(b, ho * wo * k)
    sx = (base_x + off[..., 1]).reshape(b, ho * wo * k)

    x_flat = x.reshape(b, h * w, cin)
    sampled = _bilinear_gather(x_flat, h, w, sy, sx)                # (B,P,Cin)
    sampled = sampled.reshape(b, ho * wo, k, cin)
    sampled = sampled * mask.reshape(b, ho * wo, k, 1).astype(sampled.dtype)

    # (B, Ho*Wo, K*Cin) @ (K*Cin, Cout) on the MXU.
    cols = sampled.reshape(b, ho * wo, k * cin)
    wmat = weight.reshape(k * cin, -1)  # HWIO flattens to (kh*kw*Cin, Cout)
    out = jnp.einsum("bpf,fo->bpo", cols, wmat,
                     preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, ho, wo, -1)
