"""Immutable configuration system for PlaneRecNet-TPU.

Re-designed replacement for the reference's mutable attr-dict config
(reference: data/config.py:42-81) built on frozen dataclasses so that configs
are hashable pytree-static values that can be closed over by ``jax.jit``.

The three public presets (``PlaneRecNet_base_config``, ``PlaneRecNet_101_config``,
``PlaneRecNet_50_config``; reference data/config.py:407-528) and the dataset
presets (scannet/nyu/S2D3DS; reference data/config.py:112-173) are preserved
name-for-name, as is the ``set_cfg(name)`` / ``set_dataset(name)`` CLI surface
(reference data/config.py:533-545) — but ``set_cfg`` returns a new config
instead of mutating a global.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

# Display colours (BGR) used by the visualisation CLI.
COLORS = (
    (244, 67, 54), (233, 30, 99), (156, 39, 176), (103, 58, 183),
    (63, 81, 181), (33, 150, 243), (3, 169, 244), (0, 188, 212),
    (0, 150, 136), (76, 175, 80), (139, 195, 74), (205, 220, 57),
    (255, 235, 59), (255, 193, 7), (255, 152, 0), (255, 87, 34),
    (121, 85, 72), (158, 158, 158), (96, 125, 139),
)

# ImageNet channel statistics in BGR order (reference data/config.py:33-34).
MEANS = (103.94, 116.78, 123.68)
STD = (57.38, 57.12, 58.40)

PLANE_CLASSES = ("plane",)
PLANE_LABEL_MAP = {1: 1}


def _tup(x):
    """Recursively convert lists to tuples so dataclass fields stay hashable."""
    if isinstance(x, (list, tuple)):
        return tuple(_tup(v) for v in x)
    return x


class _FrozenBase:
    """Mixin adding the reference Config's ``.copy()``/``.replace()`` surface
    (reference data/config.py:55-77) on top of frozen dataclasses."""

    def copy(self, overrides: Optional[dict] = None):
        overrides = {k: _tup(v) for k, v in (overrides or {}).items()}
        return replace(self, **overrides)

    # The reference's in-place ``replace`` becomes a functional update.
    def replace(self, overrides):
        if dataclasses.is_dataclass(overrides):
            overrides = dataclasses.asdict(overrides)
        return self.copy(overrides)

    def print(self):
        for f in dataclasses.fields(self):
            print(f.name, " = ", getattr(self, f.name))


# ----------------------- Datasets ----------------------- #


@dataclass(frozen=True)
class DatasetConfig(_FrozenBase):
    """Dataset preset (reference data/config.py:85-173)."""

    name: str = "PlaneAnnoDataset"
    train_images: str = ""
    train_info: str = ""
    valid_images: str = ""
    valid_info: str = ""
    eval_images: str = ""
    eval_info: str = ""
    has_gt: bool = True
    has_pos: bool = True
    class_names: Tuple[str, ...] = PLANE_CLASSES
    # Depth png value -> metres.
    depth_resolution: Optional[float] = None
    min_depth: Optional[float] = None
    max_depth: Optional[float] = None
    # Scale applied to the camera intrinsics when back-projecting depth.
    scale_factor: Optional[float] = None
    # category_id -> label mapping; None = identity over class_names
    # (reference data/datasets.py:15-19).
    label_map: Optional[Tuple[Tuple[int, int], ...]] = tuple(
        PLANE_LABEL_MAP.items())


dataset_base = DatasetConfig()

scannet_dataset = dataset_base.copy(dict(
    name="ScanNetDataset",
    train_images="./scannet/scans/",
    train_info="./scannet/scannet_train.json",
    valid_images="./scannet/scans/",
    valid_info="./scannet/scannet_val.json",
    eval_images="./scannet/scans/",
    eval_info="./scannet/scannet_eval.json",
    depth_resolution=1 / 1000,
    min_depth=1 / 1000,
    max_depth=40.0,
    scale_factor=1.0,
))

nyu_eval = dataset_base.copy(dict(
    name="NYUDataset",
    eval_images="./NYU/nyu_images/",
    eval_info="./NYU/nyu_eval.json",
    scale_factor=1.0,
    min_depth=1 / 1000,
    max_depth=40.0,
    has_pos=False,
    depth_resolution=1 / 65535.0 * 9.99547,
))

S2D3DS_dataset = dataset_base.copy(dict(
    name="S2D3DSDataset",
    train_images="./S2D3DS/images/",
    train_info="./S2D3DS/s2d3ds_train.json",
    valid_images="./S2D3DS/images_val/",
    valid_info="./S2D3DS/s2d3ds_val.json",
    depth_resolution=1 / 512,
    min_depth=1 / 512,
    max_depth=40.0,
    scale_factor=0.5,
))


# ----------------------- Augmentation ----------------------- #


@dataclass(frozen=True)
class AugmentConfig(_FrozenBase):
    """Train-time augmentation switches (reference data/config.py:177-192)."""

    photometric_distort: bool = True
    random_mirror: bool = True
    random_flip: bool = True
    random_rot90: bool = False
    motion_blur: bool = False
    gaussian_noise: bool = False


data_augment = AugmentConfig()


# ----------------------- Transforms / Backbone ----------------------- #


@dataclass(frozen=True)
class TransformConfig(_FrozenBase):
    """Input normalisation recipe (reference data/config.py:196-203)."""

    channel_order: str = "RGB"
    normalize: bool = True
    subtract_means: bool = False
    to_float: bool = False


resnet_transform = TransformConfig()


@dataclass(frozen=True)
class BackboneConfig(_FrozenBase):
    """ResNet backbone preset (reference data/config.py:208-250).

    ``type`` becomes a registry string instead of a live class reference.
    """

    name: str = "Base Backbone"
    path: str = "path/to/pretrained/weights"
    type: str = "ResNetBackbone"
    # (layers, dcn_layers, dcn_interval) — mirrors the positional args tuple.
    layers: Tuple[int, ...] = ()
    dcn_layers: Tuple[int, ...] = (0, 0, 0, 0)
    dcn_interval: int = 1
    # Stage indices converted to dilated (stride-1) stages
    # (reference backbone.py:84,146-153). No shipped preset uses it.
    atrous_layers: Tuple[int, ...] = ()
    transform: TransformConfig = resnet_transform
    selected_layers: Tuple[int, ...] = ()


resnet101_backbone = BackboneConfig(
    name="ResNet101",
    path="resnet101_reducedfc.pth",
    layers=(3, 4, 23, 3),
    selected_layers=tuple(range(3, 7)),
)

resnet101_dcn_inter3_backbone = resnet101_backbone.copy(dict(
    name="ResNet101_DCN_Interval3",
    layers=(3, 4, 23, 3),
    dcn_layers=(0, 4, 23, 3),
    dcn_interval=3,
))

resnet50_backbone = resnet101_backbone.copy(dict(
    name="ResNet50",
    path="resnet50-19c8e357.pth",
    layers=(3, 4, 6, 3),
    dcn_layers=(0, 0, 0, 0),
    dcn_interval=1,
))

resnet50_dcnv2_backbone = resnet50_backbone.copy(dict(
    name="ResNet50_DCNv2",
    layers=(3, 4, 6, 3),
    dcn_layers=(0, 4, 6, 3),
))


# ----------------------- FPN / Depth ----------------------- #


@dataclass(frozen=True)
class FPNConfig(_FrozenBase):
    """FPN preset (reference data/config.py:254-269)."""

    selected_layers: Tuple[int, ...] = tuple(range(0, 4))
    start_level: Optional[int] = None
    num_features: int = 256
    interpolation_mode: str = "bilinear"
    high_level_mode: Optional[str] = None  # 'retina' | 'original' | None
    relu_pred_layers: bool = True


fpn_base = FPNConfig()


@dataclass(frozen=True)
class DepthConfig(_FrozenBase):
    """Depth decoder preset (reference data/config.py:273-282)."""

    selected_layers: Tuple[int, ...] = tuple(range(0, 4))
    skip_layers: Tuple[int, ...] = tuple(range(0, 4))
    use_refle: bool = True
    # Decoder channel width at the coarsest level (halved down the decoder).
    # The reference hard-codes 256 (planerecnet.py:510-538); configurable here
    # so the multi-chip dryrun can compile a narrow variant quickly on CPU.
    num_features: int = 256


depth_fpn = DepthConfig()


# ----------------------- SOLOv2 ----------------------- #


@dataclass(frozen=True)
class SOLOv2Config(_FrozenBase):
    """SOLOv2 head + NMS preset (reference data/config.py:286-403)."""

    num_kernels: int = 256
    masks_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    masks_channels: int = 128
    num_masks: int = 256
    instance_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    instance_channels: int = 512
    fpn_instance_strides: Tuple[int, ...] = (8, 8, 16, 32, 32)
    fpn_scale_ranges: Tuple[Tuple[int, int], ...] = (
        (1, 96), (48, 192), (96, 384), (192, 768), (384, 2048))
    num_grids: Tuple[int, ...] = (40, 36, 24, 16, 12)
    num_instance_convs: int = 4
    use_dcn_in_instance: bool = False
    sigma: float = 0.2
    nms_pre: int = 500
    score_thr: float = 0.1
    nms_type: str = "matrix"
    mask_thr: float = 0.1
    update_thr: float = 0.15
    nms_kernel: str = "gaussian"
    nms_sigma: float = 2.0
    top_k: int = 100
    use_coord_conv: bool = True
    norm: str = "GN"
    focal_loss_init_pi: float = 0.01
    # TPU-specific: fixed candidate capacity for the shape-static
    # post-processing pipeline (replaces the reference's dynamic boolean
    # indexing at planerecnet.py:189-197). Must be >= nms_pre.
    max_candidates: int = 512


solov2_base = SOLOv2Config()

solov2_light = SOLOv2Config(
    num_kernels=128,
    masks_in_features=("p2", "p3", "p4", "p5"),
    masks_channels=128,
    num_masks=128,
    instance_in_features=("p2", "p3", "p4", "p5"),
    instance_channels=256,
    fpn_instance_strides=(8, 8, 16, 32),
    fpn_scale_ranges=((1, 128), (64, 256), (128, 512), (256, 2048)),
    num_grids=(40, 36, 24, 16),
    num_instance_convs=3,
)


# ----------------------- Model configs ----------------------- #


@dataclass(frozen=True)
class PlaneRecNetConfig(_FrozenBase):
    """Top-level model/training config (reference data/config.py:407-528)."""

    name: str = "PlaneRecNet_base"
    dataset: DatasetConfig = scannet_dataset
    num_classes: int = len(scannet_dataset.class_names) + 1
    augment: AugmentConfig = data_augment

    # Training schedule.
    max_iter: int = 125000
    lr_steps: Tuple[int, ...] = (62500, 100000)
    lr: float = 1e-4
    momentum: float = 0.9
    decay: float = 5e-4
    freeze_bn: bool = False
    lr_warmup_init: float = 1e-6
    lr_warmup_until: int = 2000
    gamma: float = 0.1
    delayed_settings: Tuple = ()

    backbone: BackboneConfig = resnet101_backbone.copy(
        dict(selected_layers=tuple(range(2, 4))))
    fpn: FPNConfig = fpn_base.copy(dict(start_level=0, high_level_mode="original"))
    depth: DepthConfig = depth_fpn
    solov2: SOLOv2Config = solov2_base

    # Loss weights (reference data/config.py:459-468).
    dice_weight: float = 3.0
    focal_weight: float = 1.0
    depth_weight: float = 5.0
    use_lava_loss: bool = False
    use_plane_loss: bool = False
    lava_weight: float = 0.5
    pln_weight: float = 1.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25

    discard_box_width: float = 4 / 640
    discard_box_height: float = 4 / 640

    max_size: int = 640
    device: str = "tpu"
    preserve_aspect_ratio: bool = False

    # TPU-specific training capacities (shape-static GT preparation; replaces
    # the reference's variable-length python lists, losses.py:200-286).
    max_instances: int = 32          # max GT instances per image
    max_positives: int = 128         # max positive (cell, inst) slots/img/level
    vnl_samples: int = 512           # point-triplet samples per plane / image
    # VNL runs on at most this many (valid-first) GT planes per image. Real
    # scenes carry far fewer planes than max_instances padding slots, and
    # sampling cost scales with the slot count; when n_valid <= cap the
    # semantics are exactly the reference's (every plane sampled).
    vnl_max_planes: int = 16

    # Train-time wire format for images: True ships the augmented image as
    # u8 BGR and normalises on device (4x less host->device transfer —
    # the sustained-training bottleneck on a remote-attached chip, PERF.md
    # round 4); photometric-distorted values are clipped+rounded to the u8
    # sensor range. False is the reference-exact unclipped f32 path
    # (reference data/augmentations.py:359-394). Override with
    # --cfg_overrides '{"device_normalize": false}'.
    device_normalize: bool = True

    # Train-time wire format for GT masks: True ships ONLY the valid
    # instance slots (a (M, H, W/8) bit-packed row array + slot index
    # vector, M rounded up to a multiple of 16) and scatters them into the
    # dense (B, max_instances, H, W/8) form on device — scenes carry ~6
    # planes against the 32-slot capacity, so the all-slots wire was ~80%
    # zero padding (~13 MB of the ~30 MB batch; host->device transfer is
    # the sustained-training bottleneck on a remote-attached chip, PERF.md
    # round 4). Bit-exact vs the dense wire
    # (tests/test_data.py::test_sparse_mask_wire_bit_exact). Automatically
    # disabled for multi-host runs (every process must ship uniform
    # shapes into make_array_from_process_local_data).
    wire_sparse_masks: bool = True

    # Compute dtype for conv/matmul heavy paths: "bfloat16", "float32", or
    # "auto" = bfloat16 for INFERENCE on TPU (gated by the bf16 drift tests
    # in tests/test_bf16.py: post-processed mask IoU >= 0.99 and depth rel
    # err <= 1% vs f32), float32 everywhere else (training stays f32).
    compute_dtype: str = "auto"

    # Fused Pallas dice/lava loss kernel: "auto" (on TPU), "on", "off".
    fused_loss_kernel: str = "auto"

    # Rematerialize backbone blocks under autodiff (jax.checkpoint): trades
    # ~30% backward FLOPs for activation memory. "auto" (default) remats
    # only when the activation footprint exceeds the measured-fitting
    # reference point — bf16 bs=8 640x640 runs WITHOUT remat on one 16GB
    # v5e chip at 308.9 ms/iter vs 355.6 rematted (13% faster, PERF.md
    # round 4); f32 doubles activations and keeps remat. True/False force.
    remat_backbone: object = "auto"


PlaneRecNet_base_config = PlaneRecNetConfig()

PlaneRecNet_101_config = PlaneRecNet_base_config.copy(dict(
    name="PlaneRecNet_101",
    lr_steps=(62500, 100000),
    backbone=resnet101_dcn_inter3_backbone.copy(
        dict(selected_layers=tuple(range(2, 4)))),
    fpn=fpn_base.copy(dict(start_level=0, high_level_mode=None)),
    solov2=solov2_light.copy(dict(
        instance_in_features=("p2", "p3", "p4", "p5"),
        num_grids=(40, 36, 24, 16),
        fpn_instance_strides=(8, 8, 16, 32),
    )),
    use_lava_loss=True,
    use_plane_loss=True,
    lava_weight=1.0,
    pln_weight=1.0,
))

PlaneRecNet_50_config = PlaneRecNet_101_config.copy(dict(
    name="PlaneRecNet_50",
    backbone=resnet50_dcnv2_backbone.copy(
        dict(selected_layers=tuple(range(2, 4)))),
))


# Shrunken PlaneRecNet-50 with the same architecture (DCN backbone, FPN,
# both SOLOv2 heads, depth decoder, all five losses) at smoke-test scale:
# used by the multi-chip dryrun and the mesh/SPMD tests, where a full
# PRN-50 train-step compile takes >10 min on CPU.
PlaneRecNet_tiny_config = PlaneRecNet_50_config.copy(dict(
    name="PlaneRecNet_tiny",
    backbone=PlaneRecNet_50_config.backbone.copy(dict(
        layers=(1, 1, 1, 1), dcn_layers=(0, 1, 1, 1), dcn_interval=1)),
    fpn=PlaneRecNet_50_config.fpn.copy(dict(num_features=32)),
    depth=PlaneRecNet_50_config.depth.copy(dict(num_features=32)),
    solov2=PlaneRecNet_50_config.solov2.copy(dict(
        num_kernels=32, num_masks=32, masks_channels=32,
        instance_channels=32, num_instance_convs=1,
        num_grids=(8, 8, 4, 4),
        nms_pre=16, top_k=8, max_candidates=32)),
    max_instances=4, max_positives=16, vnl_samples=32,
    remat_backbone=False,
))


_CONFIGS = {
    "PlaneRecNet_base_config": PlaneRecNet_base_config,
    "PlaneRecNet_101_config": PlaneRecNet_101_config,
    "PlaneRecNet_50_config": PlaneRecNet_50_config,
    "PlaneRecNet_tiny_config": PlaneRecNet_tiny_config,
}

_DATASETS = {
    "dataset_base": dataset_base,
    "scannet_dataset": scannet_dataset,
    "nyu_eval": nyu_eval,
    "S2D3DS_dataset": S2D3DS_dataset,
}


def get_cfg(config_name: str) -> PlaneRecNetConfig:
    """Registry lookup replacing the reference's ``eval(config_name)``
    (reference data/config.py:533-541)."""
    if config_name not in _CONFIGS:
        raise KeyError(
            f"Unknown config '{config_name}'. Available: {sorted(_CONFIGS)}")
    cfg = _CONFIGS[config_name]
    if cfg.name is None:
        cfg = cfg.copy(dict(name=config_name.split("_config")[0]))
    return cfg


# Alias preserving the reference CLI spelling.
set_cfg = get_cfg


def set_dataset(cfg: PlaneRecNetConfig, dataset_name: str) -> PlaneRecNetConfig:
    """Functional replacement for reference data/config.py:543-545."""
    if dataset_name not in _DATASETS:
        raise KeyError(
            f"Unknown dataset '{dataset_name}'. Available: {sorted(_DATASETS)}")
    return cfg.copy(dict(dataset=_DATASETS[dataset_name]))


def apply_overrides(cfg, overrides: dict):
    """Recursively apply a plain (possibly nested) dict of overrides to a
    frozen config tree: ``{"max_iter": 10, "solov2": {"top_k": 20}}``.

    The functional replacement for the reference's ad-hoc global-``cfg``
    surgery (``cfg.solov2.replace(...)``, reference eval.py:377-384, and the
    batch-autoscaling mutation, train.py:91-97): CLIs expose it as
    ``--cfg_overrides`` JSON so subprocess-driven runs (multi-host workers,
    the synthetic closed loop) can reshape any preset without a new named
    config. Unknown keys raise; JSON lists become tuples via ``copy``.
    """
    upd = {}
    for key, val in overrides.items():
        if not hasattr(cfg, key):
            raise KeyError(f"{type(cfg).__name__} has no field '{key}'")
        cur = getattr(cfg, key)
        if isinstance(val, dict) and isinstance(cur, _FrozenBase):
            upd[key] = apply_overrides(cur, val)
        else:
            upd[key] = val
    return cfg.copy(upd)
