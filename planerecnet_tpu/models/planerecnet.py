"""PlaneRecNet top-level model (reference planerecnet.py:20-153).

Single-stage multi-task CNN: from one RGB image, jointly predicts
(a) SOLOv2-style instance segmentation of planar surfaces and (b) a dense
monocular depth map sharing the same backbone pyramid.

The flax module returns the raw prediction pytree; post-processing
(point-NMS, dynamic-conv mask assembly, matrix-NMS) lives in
``planerecnet_tpu/ops/postprocess.py`` as shape-static jitted functions and
is composed with the forward by ``PlaneRecNetRunner`` in
``planerecnet_tpu/runner.py``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from planerecnet_tpu.config import PlaneRecNetConfig
from planerecnet_tpu.models.backbone import construct_backbone
from planerecnet_tpu.ops.dcn import default_gather_mode
from planerecnet_tpu.models.depth_decoder import DepthDecoderFPN
from planerecnet_tpu.models.fpn import build_fpn
from planerecnet_tpu.models.heads import SOLOv2InsHead, SOLOv2MaskHead
from planerecnet_tpu.ops.image import resize_bilinear


class PlaneRecNet(nn.Module):
    cfg: PlaneRecNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict:
        """Forward pass on normalised NHWC images.

        Returns a dict with:
          ``cate_preds``:   list per level, (B, S, S, num_classes) logits
          ``kernel_preds``: list per level, (B, S, S, num_kernels)
          ``mask_pred``:    (B, H/4, W/4, num_masks) mask features
          ``depth_pred``:   (B, H/2, W/2, 1) softplus depth
        """
        cfg = self.cfg
        # freeze_bn puts EVERY BatchNorm (backbone and depth decoder) in
        # running-stats mode (reference planerecnet.py:147-153 freeze_bn
        # iterates all modules; enabled when per-device batch < 6,
        # train.py:115-118).
        bn_train = train and not cfg.freeze_bn
        cd = cfg.compute_dtype
        if cd == "auto":
            # bf16 auto-selects for inference on TPU only (accuracy-gated,
            # tests/test_bf16.py); the training path stays f32 unless
            # explicitly configured.
            import jax
            cd = ("bfloat16" if (not train
                                 and jax.default_backend() == "tpu")
                  else "float32")
        dtype = (jnp.bfloat16 if cd == "bfloat16" else None)

        # DCN corner-gather strategy: "patch" for inference (~10% faster
        # end-to-end), "rows" when gradients will flow — keyed on the REAL
        # train flag, not bn_train (freeze_bn still trains weights).
        gm = default_gather_mode(train)
        remat = cfg.remat_backbone
        if remat == "auto":
            # Remat only when the activation footprint exceeds the measured
            # fitting point: bf16 bs=8 640x640 trains WITHOUT remat on a
            # 16GB v5e at 308.9 ms/iter vs 355.6 rematted (PERF.md round
            # 4); f32 doubles activation bytes and keeps remat on.
            itemsize = 2 if dtype == jnp.bfloat16 else 4
            act_bytes = x.shape[0] * x.shape[1] * x.shape[2] * itemsize
            remat = train and act_bytes > 8 * 640 * 640 * 2
        backbone = construct_backbone(cfg.backbone, dtype=dtype,
                              remat=bool(remat),
                              dcn_gather_mode=gm)
        feats_enc = backbone.copy(name="backbone")(x, train=bn_train)

        fpn_inputs = [feats_enc[i] for i in cfg.fpn.selected_layers]
        fpn = build_fpn(cfg.fpn, len(fpn_inputs), dtype=dtype)
        features = fpn.copy(name="fpn")(fpn_inputs)

        # Instance branch: halve p2 so level strides are [8, 8, 16, 32].
        # The reference's split_feats (planerecnet.py:113-118) always returns
        # exactly 4 levels, silently truncating a configured 5th instance
        # feature (the base config lists p6 but it is never consumed).
        p2 = features[0]
        h, w = p2.shape[1] // 2, p2.shape[2] // 2
        ins_feats = [resize_bilinear(p2, (h, w)),
                     features[1], features[2], features[3]]
        cate_preds, kernel_preds = SOLOv2InsHead(
            cfg.solov2, num_classes=cfg.num_classes,
            in_channels=cfg.fpn.num_features, dtype=dtype,
            dcn_gather_mode=gm,
            name="inst_head")(ins_feats)

        # Mask branch.
        n_mask = len(cfg.solov2.masks_in_features)
        mask_feats = [features[f] for f in range(n_mask)]
        mask_pred = SOLOv2MaskHead(cfg.solov2, dtype=dtype,
                                   name="mask_head")(mask_feats)

        # Depth branch over the raw backbone features.
        depth_inputs = [feats_enc[i] for i in cfg.depth.selected_layers]
        depth_pred = DepthDecoderFPN(cfg.solov2,
                                     num_features=cfg.depth.num_features,
                                     dtype=dtype,
                                     name="depth_decoder")(
            depth_inputs, mask_pred, kernel_preds, train=bn_train)

        return {
            "cate_preds": cate_preds,
            "kernel_preds": kernel_preds,
            "mask_pred": mask_pred,
            "depth_pred": depth_pred,
        }
