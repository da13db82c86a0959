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
import jax
import jax.numpy as jnp

from planerecnet_tpu.ops.image import reflect_pad

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact TRAIN-mode running-statistic semantics.

    torch's ``nn.BatchNorm2d`` normalises the batch with the *biased*
    variance but updates ``running_var`` with the *unbiased* one
    (Bessel-corrected by ``n/(n-1)``, n = B*H*W per channel);
    ``flax.linen.BatchNorm`` stores the biased variance — a silent skew of
    every self-trained checkpoint's eval-mode behaviour (negligible at
    640^2 activations, material at small spatial sizes). Same variable
    layout as flax BatchNorm ({params: {scale, bias}},
    {batch_stats: {mean, var}}) so the .pth converter and existing
    checkpoints are unchanged. ``momentum`` keeps flax's convention
    (decay of the OLD value): torch ``momentum=0.1`` == flax ``0.9``
    (reference backbone BN defaults; depth decoder BN(momentum=0.01,
    eps=1e-3) — reference planerecnet.py:515-538).

    Pinned against torch by
    ``tests/test_torch_parity.py::test_train_mode_bn_running_stats``.
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones,
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (features,), jnp.float32)

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            # Single-pass biased variance (E[x^2] - E[x]^2, the same
            # formulation flax uses — both reductions fuse into one sweep).
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // features
                bessel = n / max(n - 1, 1)
                # Running stats are statistics, not differentiable state.
                m_new = jax.lax.stop_gradient(mean)
                v_new = jax.lax.stop_gradient(var) * bessel
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * m_new)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * v_new)

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        out_dtype = self.dtype if self.dtype is not None else x.dtype
        return y.astype(out_dtype)


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
        x = TorchBatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, name="bn")(x)
        return nn.relu(x)
