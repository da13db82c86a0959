"""Shared flax.linen building blocks with torch-compatible semantics.

All modules operate in NHWC with HWIO conv weights. Parameter structure is
designed so the PyTorch-checkpoint converter
(``planerecnet_tpu/utils/torch_convert.py``) can map reference state_dicts
mechanically.
"""

from __future__ import annotations

import functools as _functools
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from planerecnet_tpu.ops.image import reflect_pad

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)


class ReflectConvBNReLU(nn.Module):
    """ReflectionPad(1) + 3x3 conv + BN(eps=1e-3, momentum=.01) + ReLU block
    used throughout the depth decoder (reference planerecnet.py:515-584)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = reflect_pad(x, 1)
        x = XConv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)
