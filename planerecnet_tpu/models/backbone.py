"""ResNet-50/101 backbone with DCNv2 stages, NHWC / TPU-native.

Re-implements the capability of reference models/backbone.py:76-243
(torchvision-style bottleneck ResNet returning the C2..C5 feature tuple,
with per-stage deformable-conv insertion controlled by ``dcn_layers`` /
``dcn_interval``) as flax modules over the XLA/Pallas deformable conv.

DCN block selection replicates the reference rules exactly
(backbone.py:170, 184):
  * first block of a stage:   ``use_dcn = dcn_layers[s] >= blocks``
  * block i >= 1:             ``use_dcn = (i + dcn_layers[s]) >= blocks
                                           and i % dcn_interval == 0``
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from planerecnet_tpu.config import BackboneConfig
from planerecnet_tpu.models.layers import TorchBatchNorm
from planerecnet_tpu.ops.dcn import deform_conv2d


class DeformableConv2d(nn.Module):
    """DCNv2 block: two plain convs predict offsets (2*k^2 ch) and
    modulators (k^2 ch, ``2*sigmoid``), offsets clamped to ±max(h,w)/4,
    feeding the deformable sampling + matmul op
    (reference models/dcn.py:11-67).

    The offset/modulator convs are zero-initialised so the block starts as
    an identity-offset regular conv (reference models/dcn.py:32-43).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    # Corner-gather strategy ("rows" | "patch" | None = module default):
    # train/eval-dependent — "patch" is ~10% faster end-to-end at inference
    # but its backward is catastrophic, so the model passes
    # default_gather_mode(train) down (ops/dcn.py, PERF.md round 3).
    # Bit-exact either way.
    gather_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size * self.kernel_size
        conv_kw = dict(kernel_size=(self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       dtype=self.dtype)
        # Offsets stay f32: sub-pixel sampling positions lose too much
        # precision in bf16.
        offset = nn.Conv(2 * k, use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="offset_conv",
                         **{**conv_kw, "dtype": None})(x.astype(jnp.float32))
        modulator = 2.0 * jax.nn.sigmoid(
            nn.Conv(k, use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name="modulator_conv", **conv_kw)(x))

        h, w = x.shape[1], x.shape[2]
        max_offset = max(h, w) / 4.0
        offset = jnp.clip(offset, -max_offset, max_offset)

        weight = self.param(
            "regular_conv_kernel",
            nn.initializers.he_uniform(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            jnp.float32)
        bias = (self.param("regular_conv_bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            weight = weight.astype(self.dtype)
        return deform_conv2d(x, offset, modulator, weight, bias,
                             stride=self.stride, padding=self.padding,
                             kernel_size=self.kernel_size,
                             gather_mode=self.gather_mode)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck (reference models/backbone.py:5-73)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dilation: int = 1
    use_dcn: bool = False
    expansion: int = 4
    dtype: Optional[jnp.dtype] = None
    gather_mode: Optional[str] = None  # DCN corner-gather strategy

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_dilation=(self.dilation, self.dilation),
                      dtype=self.dtype, name="conv1")(x)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn1")(out)
        out = nn.relu(out)

        if self.use_dcn:
            out = DeformableConv2d(self.planes, kernel_size=3,
                                   stride=self.stride,
                                   padding=self.dilation, use_bias=True,
                                   gather_mode=self.gather_mode,
                                   dtype=self.dtype, name="conv2")(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                          padding=[(self.dilation, self.dilation)] * 2,
                          kernel_dilation=(self.dilation, self.dilation),
                          use_bias=False, dtype=self.dtype,
                          name="conv2")(out)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_dilation=(self.dilation, self.dilation),
                      dtype=self.dtype, name="conv3")(out)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn3")(out)

        if self.has_downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_dilation=(self.dilation,) * 2,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = TorchBatchNorm(use_running_average=not train,
                                      momentum=0.9,
                                      name="downsample_bn")(residual)
        return nn.relu(out + residual)


def _stage_plan(layers: Sequence[int], dcn_layers: Sequence[int],
                dcn_interval: int, atrous_layers: Sequence[int] = ()):
    """Per-stage (planes, blocks, stride, dilation, dcn flags) build plan.

    Atrous semantics replicate reference backbone.py:146-153 exactly: when a
    stage index is in ``atrous_layers`` the cumulative dilation increments
    and that stage's stride becomes 1; the dilation persists into later
    stages' FIRST blocks, while non-first blocks always use dilation 1 (the
    reference passes dilation only to the first block, backbone.py:171-189).
    """
    plan = []
    planes = (64, 128, 256, 512)
    strides = (1, 2, 2, 2)
    dilation = 1
    for s, blocks in enumerate(layers):
        dcn = dcn_layers[s] if s < len(dcn_layers) else 0
        stride = strides[s] if s < 4 else 2
        if s in atrous_layers:
            dilation += 1
            stride = 1
        flags = []
        for i in range(blocks):
            if i == 0:
                flags.append(dcn >= blocks)
            else:
                flags.append(((i + dcn) >= blocks) and (i % dcn_interval == 0))
        plan.append((planes[s] if s < 4 else 512, blocks, stride, dilation,
                     tuple(flags)))
    return plan


class ResNetBackbone(nn.Module):
    """ResNet backbone returning the tuple of C2..C5(+extra) feature maps.

    ``extra_layers`` appends SSD-style stride-2 bottleneck stages, mirroring
    reference backbone.py:226-243 (``add_layer`` until
    ``max(selected_layers)+1`` stages exist). The three shipped presets need
    exactly the 4 base stages.
    """

    layers: Tuple[int, ...]
    dcn_layers: Tuple[int, ...] = (0, 0, 0, 0)
    dcn_interval: int = 1
    atrous_layers: Tuple[int, ...] = ()
    extra_layers: int = 0
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    dcn_gather_mode: Optional[str] = None  # forwarded to every DCN block

    @property
    def channels(self) -> Tuple[int, ...]:
        base = (256, 512, 1024, 2048)
        return base + tuple(1024 for _ in range(self.extra_layers))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1) pads with -inf.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        inplanes = 64
        # Under remat, each bottleneck's activations are recomputed in the
        # backward pass instead of stored (jax.checkpoint via nn.remat).
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        plan = _stage_plan(self.layers, self.dcn_layers, self.dcn_interval,
                           self.atrous_layers)
        for s, (planes, blocks, stride, dilation, dcn_flags) in \
                enumerate(plan):
            for i in range(blocks):
                if i == 0:
                    # The downsample connection exists whenever stride != 1
                    # OR channels change — with atrous stride forced to 1
                    # the 1x1 projection is still built
                    # (reference backbone.py:152-162).
                    has_ds = stride != 1 or inplanes != planes * 4
                    x = block_cls(planes, stride=stride, has_downsample=has_ds,
                                  dilation=dilation,
                                  use_dcn=dcn_flags[i],
                                  gather_mode=self.dcn_gather_mode,
                                  dtype=self.dtype,
                                  name=f"layer{s}_{i}")(x, train)
                    inplanes = planes * 4
                else:
                    x = block_cls(planes, use_dcn=dcn_flags[i],
                                  gather_mode=self.dcn_gather_mode,
                                  dtype=self.dtype,
                                  name=f"layer{s}_{i}")(x, train)
            outs.append(x)

        for e in range(self.extra_layers):
            x = Bottleneck(256, stride=2, has_downsample=True,
                           dtype=self.dtype,
                           name=f"extra{e}_0")(x, train=train)
            outs.append(x)
        return tuple(outs)


def construct_backbone(cfg: BackboneConfig, dtype=None,
                       remat: bool = False,
                       dcn_gather_mode: Optional[str] = None
                       ) -> ResNetBackbone:
    """Build a backbone from a config (reference backbone.py:233-243)."""
    num_layers = max(cfg.selected_layers) + 1
    extra = max(0, num_layers - len(cfg.layers))
    return ResNetBackbone(layers=tuple(cfg.layers),
                          dcn_layers=tuple(cfg.dcn_layers),
                          dcn_interval=cfg.dcn_interval,
                          atrous_layers=tuple(cfg.atrous_layers),
                          extra_layers=extra,
                          dtype=dtype,
                          remat=remat,
                          dcn_gather_mode=dcn_gather_mode)
