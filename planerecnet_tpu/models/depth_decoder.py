"""Monocular depth decoder with cross-task mask injection
(reference planerecnet.py:499-607).

FPN-style decoder over backbone C2..C5 (reversed): lateral 1x1 convs to 256,
ReflectionPad+conv+BN blocks, nearest-2x-upsample deconv blocks, Softplus
depth head at 1/2 input resolution.

Cross-task hook (reference planerecnet.py:586-600): instance masks are
assembled by convolving the (stop-gradient) mask features with the flattened
predicted kernels of all grid levels — a single batched matmul on TPU —
1x1-compressed from sum(S^2) channels to 256, bilinearly downsampled x0.25,
and injected at the coarsest level via ``refine_conv(concat[x, x*masks])``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn

import functools as _functools

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)
import jax
import jax.numpy as jnp

from planerecnet_tpu.config import SOLOv2Config
from planerecnet_tpu.models.layers import ReflectConvBNReLU
from planerecnet_tpu.ops.image import (reflect_pad, resize_bilinear,
                                       upsample2x_nearest)


class DepthDecoderFPN(nn.Module):
    cfg: SOLOv2Config
    # Channel width at the coarsest decoder level; the reference hard-codes
    # 256 (planerecnet.py:510-538). F -> F/2 -> F/4 down the decoder.
    num_features: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray],
                 seg_preds: jnp.ndarray,
                 kernel_preds: Sequence[jnp.ndarray],
                 train: bool = False):
        c = self.cfg
        F, F2, F4 = (self.num_features, self.num_features // 2,
                     self.num_features // 4)
        b = feature_maps[0].shape[0]

        # --- dynamic-conv mask assembly (all grid levels, one matmul) ---
        # kernel_preds[i]: (B, S, S, K) -> flatten row-major over the grid.
        flat_kernels = jnp.concatenate(
            [k.reshape(b, -1, c.num_kernels) for k in kernel_preds], axis=1)
        flat_kernels = jax.lax.stop_gradient(flat_kernels)   # (B, N, K)
        seg = jax.lax.stop_gradient(seg_preds)               # (B, H, W, K)
        masks = jnp.einsum("bhwk,bnk->bhwn", seg, flat_kernels,
                           preferred_element_type=jnp.float32)
        masks = jax.lax.stop_gradient(jax.nn.sigmoid(masks)).astype(seg.dtype)

        masks = XConv(F, (1, 1), dtype=self.dtype,
                        name="conv1x1")(masks)
        mh, mw = masks.shape[1] // 4, masks.shape[2] // 4
        masks = resize_bilinear(masks, (mh, mw))

        feats = list(reversed(list(feature_maps)))           # C5, C4, C3, C2

        def deconv(x, feats_out, name):
            x = upsample2x_nearest(x)
            return ReflectConvBNReLU(feats_out, dtype=self.dtype,
                                     name=name)(x, train=train)

        # Coarsest level.
        x = XConv(F, (1, 1), dtype=self.dtype, name="latlayer1")(feats[0])
        x = ReflectConvBNReLU(F, dtype=self.dtype, name="conv1")(x, train=train)
        x = deconv(x, F, "deconv1")

        x = jnp.concatenate([x, x * masks], axis=-1)
        x = ReflectConvBNReLU(F2, dtype=self.dtype, name="refine_conv")(x, train=train)

        l2 = XConv(F, (1, 1), dtype=self.dtype, name="latlayer2")(feats[1])
        l2 = ReflectConvBNReLU(F2, dtype=self.dtype, name="conv2")(l2, train=train)
        x = deconv(jnp.concatenate([l2, x], axis=-1), F2, "deconv2")

        l3 = XConv(F, (1, 1), dtype=self.dtype, name="latlayer3")(feats[2])
        l3 = ReflectConvBNReLU(F2, dtype=self.dtype, name="conv3")(l3, train=train)
        x = deconv(jnp.concatenate([l3, x], axis=-1), F2, "deconv3")

        l4 = XConv(F, (1, 1), dtype=self.dtype, name="latlayer4")(feats[3])
        l4 = ReflectConvBNReLU(F2, dtype=self.dtype, name="conv4")(l4, train=train)
        x = deconv(jnp.concatenate([l4, x], axis=-1), F4, "deconv4")

        x = reflect_pad(x, 1)
        x = XConv(1, (3, 3), padding="VALID", dtype=self.dtype,
                    name="depth_pred")(x)
        return jax.nn.softplus(x)
