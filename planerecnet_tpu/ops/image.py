"""Device-side image ops (resize / pad / normalise) for PlaneRecNet-TPU.

These replace the reference's host-side cv2 calls in the hot paths
(reference models/functions/funcs.py:95-210, data/augmentations.py:496-530)
with XLA-compiled equivalents so that preprocessing fuses into the model
graph and host->device traffic is raw pixels only.

Layout convention: NHWC everywhere (TPU-native; channels on the 128-lane
minor dimension).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planerecnet_tpu.config import MEANS, STD


def _resize_weights(in_size: int, out_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dense (in, out) bilinear interpolation matrix, half-pixel convention.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False)`` and cv2.INTER_LINEAR. Expressing the 1-D resample
    as a matmul keeps the op on the MXU instead of emitting gathers.
    """
    if in_size == out_size:
        return jnp.eye(in_size, dtype=dtype)
    scale = in_size / out_size
    # Half-pixel source coordinate of each output pixel centre.
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w = np.zeros((in_size, out_size), dtype=np.float64)
    w[lo, np.arange(out_size)] += 1.0 - frac
    w[hi, np.arange(out_size)] += frac
    return jnp.asarray(w, dtype=dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to ``size=(H, W)``.

    Separable matmul formulation (rows then columns): for the model's
    pyramid shapes both matrices are tiny and XLA tiles the contractions
    onto the MXU.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = size
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)
    wh = _resize_weights(h, oh, dtype)   # (h, oh)
    ww = _resize_weights(w, ow, dtype)   # (w, ow)
    # (b, h, w, c) -> (b, oh, w, c)
    y = jnp.einsum("bhwc,ho->bowc", xf, wh)
    # -> (b, oh, ow, c)
    y = jnp.einsum("bhwc,wo->bhoc", y, ww)
    if squeeze:
        y = y[0]
    return y


@functools.partial(jax.jit, static_argnums=(1,))
def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize matching torch ``interpolate(mode='nearest')``
    (floor convention: src = floor(dst * in/out))."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = size
    rows = np.minimum((np.arange(oh) * (h / oh)).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(ow) * (w / ow)).astype(np.int64), w - 1)
    y = x[:, rows][:, :, cols]
    if squeeze:
        y = y[0]
    return y


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (torch ``Upsample(scale_factor=2, mode='nearest')``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """NHWC reflection padding (torch ``ReflectionPad2d``)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def pad_to_multiple(x: np.ndarray, divisor: int = 32) -> np.ndarray:
    """Zero-pad HWC image at bottom/right so H and W divide ``divisor``.

    Host-side equivalent of reference funcs.py:204-210 (pad_even_divided).
    """
    h, w = x.shape[:2]
    ext_h = (-h) % divisor
    ext_w = (-w) % divisor
    if ext_h == 0 and ext_w == 0:
        return x
    pads = [(0, ext_h), (0, ext_w)] + [(0, 0)] * (x.ndim - 2)
    return np.pad(x, pads, mode="constant")


def calc_size_preserve_ar(img_w: int, img_h: int, max_size: int) -> Tuple[int, int]:
    """Aspect-preserving target size, long side = max_size
    (reference funcs.py:195-202). Returns (w, h)."""
    if img_w > img_h:
        w = max_size
        h = img_h / img_w * max_size
    else:
        h = max_size
        w = img_w / img_h * max_size
    return (int(w), int(h))


@jax.jit
def fast_base_transform(images_bgr: jnp.ndarray) -> jnp.ndarray:
    """Fused device-side preprocessing (reference FastBaseTransform,
    data/augmentations.py:496-530).

    Input: (B, H, W, 3) float BGR pixels in [0, 255].
    Output: (B, H, W, 3) normalised RGB, ready for the backbone.
    """
    mean = jnp.asarray(MEANS, dtype=jnp.float32)
    std = jnp.asarray(STD, dtype=jnp.float32)
    x = (images_bgr.astype(jnp.float32) - mean) / std
    # BGR -> RGB.
    return x[..., ::-1]


def point_sample_grid(h: int, w: int) -> jnp.ndarray:
    """Normalised coord-conv channels in [-1, 1]: returns (h, w, 2) with
    channel 0 = x, channel 1 = y (reference planerecnet.py:370-376)."""
    x = jnp.linspace(-1.0, 1.0, w)
    y = jnp.linspace(-1.0, 1.0, h)
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)
