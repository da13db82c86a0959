"""Shared flax.linen building blocks with torch-compatible semantics.

All modules operate in NHWC with HWIO conv weights. Parameter structure is
designed so the PyTorch-checkpoint converter
(``planerecnet_tpu/utils/torch_convert.py``) can map reference state_dicts
mechanically.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn

import functools as _functools

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)
import jax
import jax.numpy as jnp

from planerecnet_tpu.ops.image import reflect_pad


class Conv(nn.Module):
    """2-D conv with torch-style integer stride/padding defaults."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm matching ``torch.nn.BatchNorm2d`` semantics.

    ``torch`` momentum m updates running stats as
    ``r = (1-m)*r + m*batch``; flax's momentum is the ``(1-m)`` factor.
    """

    momentum_torch: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum_torch,
            epsilon=self.eps,
            dtype=jnp.float32,
            name="bn",
        )(x)


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups (reference heads use ``nn.GroupNorm(32, C)``)."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                            dtype=jnp.float32, name="gn")(x)


class ConvGNReLU(nn.Module):
    """3x3 conv + GN(32) + ReLU tower stage used by the SOLOv2 heads
    (reference planerecnet.py:322-344, 412-454)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_gn: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=[(self.padding, self.padding)] * 2,
                    use_bias=not self.use_gn, name="conv")(x)
        if self.use_gn:
            x = nn.GroupNorm(num_groups=32, name="gn")(x)
        return nn.relu(x)


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
