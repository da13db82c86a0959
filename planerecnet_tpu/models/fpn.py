"""Feature pyramid network with the reference's fine-to-coarse accumulator.

The reference FPN (models/fpn.py:45-73) is *not* a classic top-down FPN:
inputs arrive high-res -> low-res (C2..C5) and a running sum is bilinearly
resized **down** to each next (smaller) level before being added to its
lateral. This must be replicated exactly for checkpoint parity.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

import functools as _functools

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)
import jax.numpy as jnp

from planerecnet_tpu.config import FPNConfig
from planerecnet_tpu.ops.image import resize_bilinear, resize_nearest


class FPN(nn.Module):
    num_ins: int
    num_features: int = 256
    start_level: int = 0
    interpolation_mode: str = "bilinear"
    high_level_mode: Optional[str] = None   # 'original' | 'retina' | None
    relu_pred_layers: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        assert len(inputs) == self.num_ins
        laterals = []
        x = None
        for i in range(self.start_level, self.num_ins):
            lat = XConv(self.num_features, (1, 1), dtype=self.dtype,
                          name=f"lateral_conv{i - self.start_level}")(
                              inputs[i])
            if x is not None:
                # The accumulator resize honours cfg.fpn.interpolation_mode
                # (reference fpn.py:54 passes it to F.interpolate).
                h, w = inputs[i].shape[1], inputs[i].shape[2]
                resize = (resize_nearest
                          if self.interpolation_mode == "nearest"
                          else resize_bilinear)
                x = resize(x, (h, w)).astype(lat.dtype)
                x = lat + x
            else:
                x = lat
            laterals.append(x)

        outs = []
        for i, lat in enumerate(laterals):
            p = XConv(self.num_features, (3, 3), dtype=self.dtype,
                        padding=[(1, 1), (1, 1)], name=f"fpn_conv{i}")(lat)
            if self.relu_pred_layers:
                p = nn.relu(p)
            outs.append(p)

        if self.high_level_mode == "original":
            # max_pool2d(kernel=1, stride=2) == stride-2 subsampling
            # (reference fpn.py:66).
            outs.append(outs[-1][:, ::2, ::2, :])
        elif self.high_level_mode == "retina":
            p6 = XConv(self.num_features, (3, 3), strides=(2, 2),
                         dtype=self.dtype,
                         padding=[(1, 1), (1, 1)], name="downsample0")(outs[-1])
            p7 = XConv(self.num_features, (3, 3), strides=(2, 2),
                         dtype=self.dtype,
                         padding=[(1, 1), (1, 1)], name="downsample1")(
                             nn.relu(p6))
            outs.append(p6)
            outs.append(p7)
        return outs


def build_fpn(cfg: FPNConfig, num_inputs: int, dtype=None) -> FPN:
    return FPN(num_ins=num_inputs,
               num_features=cfg.num_features,
               start_level=cfg.start_level or 0,
               interpolation_mode=cfg.interpolation_mode,
               high_level_mode=cfg.high_level_mode,
               relu_pred_layers=cfg.relu_pred_layers,
               dtype=dtype)
