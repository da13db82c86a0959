"""SOLOv2 instance and mask heads (reference planerecnet.py:292-496)."""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn

import functools as _functools

# Non-backbone convs are xavier-uniform initialised with zero bias
# (reference planerecnet.py:135-145 init_weights).
_XAVIER = nn.initializers.xavier_uniform()
XConv = _functools.partial(nn.Conv, kernel_init=_XAVIER)
import jax.numpy as jnp

from planerecnet_tpu.config import SOLOv2Config
from planerecnet_tpu.ops.image import point_sample_grid, resize_bilinear


def bias_init_with_prob(prior_prob: float) -> float:
    """Focal-loss prior bias (reference funcs.py:329-332)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


class SOLOv2InsHead(nn.Module):
    """Per-level category + kernel prediction (reference planerecnet.py:292-391).

    Per FPN level: append normalised coord channels, bilinearly resize the
    feature to S x S, run the (shared-across-levels) cate / kernel conv+GN
    towers, and predict ``cate_pred`` (S,S,num_classes) and ``kernel_pred``
    (S,S,num_kernels).
    """

    cfg: SOLOv2Config
    num_classes: int
    in_channels: int
    dtype: Optional[jnp.dtype] = None
    # Corner-gather strategy for the optional deformable towers; the model
    # passes default_gather_mode(train) (see models/backbone.py).
    dcn_gather_mode: Optional[str] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.cfg
        cate_preds, kernel_preds = [], []

        # Shared towers: modules are constructed once and re-applied per
        # level (the reference shares cate_tower/kernel_tower across levels,
        # planerecnet.py:322-344).
        #
        # ``use_dcn_in_instance`` builds the towers from DCNv2 blocks. NB the
        # reference carries this flag but its own plumbing is DEAD CODE:
        # reference planerecnet.py:324 unpacks ``use_deformable`` and line
        # 326 then hard-codes ``conv_func = nn.Conv2d`` unconditionally, so
        # the flag never has an effect there (and no released checkpoint can
        # contain DCN tower weights). Here the flag's *intended* semantics
        # (deformable tower convs, as in upstream SOLOv2) are implemented;
        # default False preserves exact reference behaviour.
        if c.use_dcn_in_instance:
            from planerecnet_tpu.models.backbone import DeformableConv2d

            def make_conv(name):
                return DeformableConv2d(c.instance_channels, use_bias=False,
                                        gather_mode=self.dcn_gather_mode,
                                        dtype=self.dtype, name=name)
        else:
            def make_conv(name):
                return XConv(c.instance_channels, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             use_bias=False,  # norm == GN
                             dtype=self.dtype, name=name)

        towers = {}
        for name in ("kernel", "cate"):
            stages = []
            for i in range(c.num_instance_convs):
                stages.append((
                    make_conv(f"{name}_tower{i}_conv"),
                    nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f"{name}_tower{i}_gn"),
                ))
            towers[name] = stages

        def tower(name: str, depth: int, x):
            for conv, gn in towers[name][:depth]:
                x = nn.relu(gn(conv(x)))
            return x

        cate_out = XConv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(c.focal_loss_init_pi)),
                           dtype=self.dtype, name="cate_pred")
        kernel_out = XConv(c.num_kernels, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype, name="kernel_pred")

        for idx, feat in enumerate(features):
            b, h, w, _ = feat.shape
            coord = point_sample_grid(h, w).astype(feat.dtype)
            coord = jnp.broadcast_to(coord[None], (b, h, w, 2))
            ins_kernel_feat = jnp.concatenate([feat, coord], axis=-1)

            s = c.num_grids[idx]
            kernel_feat = resize_bilinear(ins_kernel_feat, (s, s))
            cate_feat = kernel_feat[..., :-2]

            kf = tower("kernel", c.num_instance_convs, kernel_feat)
            kernel_preds.append(kernel_out(kf))

            cf = tower("cate", c.num_instance_convs, cate_feat)
            cate_preds.append(cate_out(cf))
        return cate_preds, kernel_preds


class SOLOv2MaskHead(nn.Module):
    """Unified mask feature branch (reference planerecnet.py:394-496).

    Level i gets i conv+GN+ReLU / 2x-bilinear-upsample steps to reach 1/4
    input scale; coord channels are appended only at level 3; the per-level
    outputs are summed and compressed to ``num_masks`` channels by a
    1x1 conv + GN + ReLU.
    """

    cfg: SOLOv2Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.cfg
        num_levels = len(c.masks_in_features)
        assert len(features) == num_levels

        def conv_gn_relu(x, feats, name):
            x = XConv(feats, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"{name}_gn")(x)
            return nn.relu(x)

        out = conv_gn_relu(features[0], c.masks_channels, "level0_conv0")
        target_hw = (features[0].shape[1], features[0].shape[2])
        for i in range(1, num_levels):
            x = features[i]
            if i == 3:
                b, h, w, _ = x.shape
                coord = point_sample_grid(h, w).astype(x.dtype)
                coord = jnp.broadcast_to(coord[None], (b, h, w, 2))
                x = jnp.concatenate([x, coord], axis=-1)
            for j in range(i):
                x = conv_gn_relu(x, c.masks_channels, f"level{i}_conv{j}")
                h, w = x.shape[1], x.shape[2]
                x = resize_bilinear(x, (2 * h, 2 * w))
            out = out + x

        out = XConv(c.num_masks, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_pred_conv")(out)
        out = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="conv_pred_gn")(out)
        return nn.relu(out)
