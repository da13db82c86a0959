"""Host-side augmentation / preprocessing chain (numpy + cv2).

Re-implements the capability of reference data/augmentations.py:14-530: a
6-tuple ``(img, depth, masks, boxes, labels, plane_paras)`` pipeline with
photometric distortion, geometric flips that also rotate the GT plane
normals, motion blur / gaussian noise, square resize to ``max_size`` and
backbone normalisation. Randomness flows through an explicit
``np.random.RandomState`` instead of the global ``random`` module so the
pipeline is reproducible and shardable across data-loader workers.

The device-side normalisation twin (``FastBaseTransform``,
reference data/augmentations.py:496-530) lives in
``planerecnet_tpu/ops/image.py::fast_base_transform`` and fuses into the
XLA graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from planerecnet_tpu.config import MEANS, STD, PlaneRecNetConfig


class SSDAugmentation:
    """Train-time chain (reference data/augmentations.py:464-481):
    photometric -> mirror -> flip -> [rot90] -> [motion blur] -> [noise]
    -> square resize -> normalise + BGR->RGB.

    With ``device_normalize`` (default ``cfg.device_normalize``, True in
    every preset) the final normalise + channel swap moves ONTO the device
    (``trainer.unpack_wire_batch``) and the host ships the augmented image
    as u8 BGR — 4x less host->device transfer, the training bottleneck on
    a remote-attached chip (PERF.md round 4). Divergence from the
    reference (documented): photometric distortion can push values outside
    [0, 255] (the reference normalises them unclipped,
    data/augmentations.py:359-394); the u8 wire form clips+rounds to the
    sensor range. For the reference-exact f32 path run with
    ``--cfg_overrides '{"device_normalize": false}'`` (or pass
    ``device_normalize=False`` here).
    """

    def __init__(self, cfg: PlaneRecNetConfig, mean=MEANS, std=STD,
                 rng: Optional[np.random.RandomState] = None,
                 device_normalize: Optional[bool] = None):
        self.cfg = cfg
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.rng = rng if rng is not None else np.random.RandomState()
        self.device_normalize = (getattr(cfg, "device_normalize", True)
                                 if device_normalize is None
                                 else device_normalize)

    def __call__(self, img, depth, masks, boxes, labels, plane_paras):
        cfg, rng = self.cfg, self.rng
        a = cfg.augment
        if a.photometric_distort:
            img = photometric_distort(img, rng)
        if a.random_mirror:
            img, depth, masks, boxes, plane_paras = random_mirror(
                img, depth, masks, boxes, plane_paras, rng)
        if a.random_flip:
            img, depth, masks, boxes, plane_paras = random_flip(
                img, depth, masks, boxes, plane_paras, rng)
        if a.random_rot90:
            img, depth, masks, boxes, plane_paras = random_rot90(
                img, depth, masks, boxes, plane_paras, rng)
        if a.motion_blur:
            img = random_motion_blur(img, rng)
        if a.gaussian_noise:
            img = random_gaussian_noise(img, rng)
        img, depth, masks, boxes, labels, plane_paras = resize_square(
            cfg, img, depth, masks, boxes, labels, plane_paras)
        if self.device_normalize:
            img = np.clip(np.round(img), 0, 255).astype(np.uint8)  # BGR u8
        else:
            img = backbone_transform(cfg, img, self.mean, self.std)
        return img, depth, masks, boxes, labels, plane_paras


class BaseTransform:
    """Eval-time chain: square resize + normalise
    (reference data/augmentations.py:483-493)."""

    def __init__(self, cfg: PlaneRecNetConfig, mean=MEANS, std=STD):
        self.cfg = cfg
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, depth, masks, boxes, labels, plane_paras):
        img, depth, masks, boxes, labels, plane_paras = resize_square(
            self.cfg, img, depth, masks, boxes, labels, plane_paras)
        img = backbone_transform(self.cfg, img, self.mean, self.std)
        return img, depth, masks, boxes, labels, plane_paras


class ResizeAndPad:
    """Aspect-preserving resize (long side = max_size) + mean-fill pad to a
    max_size square, image in the top-left (reference Resize_and_Pad,
    data/augmentations.py:34-102)."""

    def __init__(self, cfg: PlaneRecNetConfig, mean=MEANS,
                 resize_gt: bool = True, pad_gt: bool = True):
        self.cfg = cfg
        self.mean = np.asarray(mean, np.float32)
        self.resize_gt = resize_gt
        self.pad_gt = pad_gt

    def __call__(self, image, depth, masks, boxes, labels, plane_paras):
        cfg = self.cfg
        size = cfg.max_size
        img_h, img_w, channels = image.shape
        if img_h == size and img_w == size:
            return _discard_small(cfg, image, depth, masks, boxes, labels,
                                  plane_paras)
        if img_h > img_w:
            height, width = size, int(img_w * (size / img_h))
        else:
            height, width = int(img_h * (size / img_w)), size
        image = cv2.resize(image, (width, height))
        depth = cv2.resize(depth, (width, height))
        if self.resize_gt and masks.size:
            m = cv2.resize(masks.transpose(1, 2, 0), (width, height))
            masks = m[None] if m.ndim == 2 else m.transpose(2, 0, 1)
            boxes = boxes.copy()
            boxes[:, [0, 2]] *= width / img_w
            boxes[:, [1, 3]] *= height / img_h

        exp_img = np.zeros((size, size, channels), image.dtype)
        exp_img[:, :, :] = self.mean
        exp_img[:height, :width] = image
        exp_depth = np.zeros((size, size), depth.dtype)
        exp_depth[:height, :width] = depth
        if self.pad_gt and masks.size:
            exp_masks = np.zeros((masks.shape[0], size, size), masks.dtype)
            exp_masks[:, :height, :width] = masks
            masks = exp_masks
        return _discard_small(cfg, exp_img, exp_depth, masks, boxes, labels,
                              plane_paras)


class Pad:
    """Mean-fill pad to (height, width), image in the top-left
    (reference Pad, data/augmentations.py:105-138)."""

    def __init__(self, width: int, height: int, mean=MEANS,
                 pad_gt: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.width = width
        self.height = height
        self.pad_gt = pad_gt

    def __call__(self, image, depth, masks, boxes=None, labels=None,
                 plane_paras=None):
        im_h, im_w, channels = image.shape
        exp_img = np.zeros((self.height, self.width, channels), image.dtype)
        exp_img[:, :, :] = self.mean
        exp_img[:im_h, :im_w] = image
        exp_depth = np.zeros((self.height, self.width), depth.dtype)
        exp_depth[:im_h, :im_w] = depth
        if self.pad_gt and masks is not None and masks.size:
            exp_masks = np.zeros((masks.shape[0], self.height, self.width),
                                 masks.dtype)
            exp_masks[:, :im_h, :im_w] = masks
            masks = exp_masks
        return exp_img, exp_depth, masks, boxes, labels, plane_paras


def _discard_small(cfg, img, depth, masks, boxes, labels, plane_paras):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    keep = (w > cfg.discard_box_width) & (h > cfg.discard_box_height)
    masks = masks[keep]
    boxes = boxes[keep]
    labels = labels[keep]
    if plane_paras is not None and plane_paras.size:
        plane_paras = plane_paras[keep]
    return img, depth, masks, boxes, labels, plane_paras


# ---------------------------------------------------------------- pieces


def photometric_distort(img: np.ndarray,
                        rng: np.random.RandomState) -> np.ndarray:
    """Brightness / contrast / HSV saturation+hue jitter
    (reference data/augmentations.py:184-256, 336-356). Input float BGR
    [0,255]."""
    img = img.copy()
    if rng.randint(2):
        img += rng.uniform(-32, 32)

    # One of the two contrast slots is active per sample (reference
    # PhotometricDistort picks pd[:-1] or pd[1:]).
    first_contrast = bool(rng.randint(2))

    def contrast(x):
        if rng.randint(2):
            x *= rng.uniform(0.5, 1.5)
        return x

    if first_contrast:
        img = contrast(img)
    hsv = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2HSV)
    if rng.randint(2):
        hsv[:, :, 1] *= rng.uniform(0.5, 1.5)
    if rng.randint(2):
        hsv[:, :, 0] += rng.uniform(-18.0, 18.0)
        hsv[:, :, 0][hsv[:, :, 0] > 360.0] -= 360.0
        hsv[:, :, 0][hsv[:, :, 0] < 0.0] += 360.0
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if not first_contrast:
        img = contrast(img)
    return img


def random_mirror(img, depth, masks, boxes, plane_paras, rng):
    """Horizontal mirror; also mirrors plane normals
    (reference data/augmentations.py:264-276)."""
    if rng.randint(2):
        width = img.shape[1]
        img = img[:, ::-1].copy()
        depth = depth[:, ::-1].copy()
        masks = masks[:, :, ::-1].copy()
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
        if plane_paras is not None and plane_paras.size:
            plane_paras = plane_paras.copy()
            plane_paras[:, 0] *= -1
    return img, depth, masks, boxes, plane_paras


def random_flip(img, depth, masks, boxes, plane_paras, rng):
    """Vertical flip; flips plane normal y
    (reference data/augmentations.py:278-290)."""
    if rng.randint(2):
        height = img.shape[0]
        img = img[::-1, :].copy()
        depth = depth[::-1, :].copy()
        masks = masks[:, ::-1, :].copy()
        boxes = boxes.copy()
        boxes[:, 1::2] = height - boxes[:, 3::-2]
        if plane_paras is not None and plane_paras.size:
            plane_paras = plane_paras.copy()
            plane_paras[:, 1] *= -1
    return img, depth, masks, boxes, plane_paras


def random_rot90(img, depth, masks, boxes, plane_paras, rng):
    """k*90-degree rotation (reference data/augmentations.py:292-307)."""
    k = rng.randint(4)
    if k:
        old_h, old_w = img.shape[:2]
        img = np.rot90(img, k).copy()
        depth = np.rot90(depth, k).copy()
        masks = np.stack([np.rot90(m, k) for m in masks]) if masks.size \
            else masks
        boxes = boxes.copy()
        for _ in range(k):
            boxes = np.stack([
                np.array([b[1], old_w - 1 - b[2], b[3], old_w - 1 - b[0]])
                for b in boxes]) if len(boxes) else boxes
            old_w, old_h = old_h, old_w
        if plane_paras is not None and plane_paras.size:
            rot = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
            plane_paras = plane_paras.copy()
            # reference applies the single-90° rotation once regardless of k
            # (data/augmentations.py:305-306) — replicated.
            plane_paras[:, :3] = (rot @ plane_paras[:, :3].T).T
    return img, depth, masks, boxes, plane_paras


def random_motion_blur(img, rng, lower=3, upper=12, angle=180):
    """Directional motion blur (reference data/augmentations.py:397-426)."""
    if rng.randint(3) < 1:
        degree = rng.randint(lower, upper)
        ang = rng.randint(0, angle)
        m = cv2.getRotationMatrix2D((degree / 2, degree / 2), ang, 1)
        kernel = cv2.warpAffine(np.diag(np.ones(degree)), m, (degree, degree))
        kernel = kernel / degree
        blurred = cv2.filter2D(img, -1, kernel)
        cv2.normalize(blurred, blurred, 0, 255, cv2.NORM_MINMAX)
        return blurred.astype(np.float32)
    return img


def random_gaussian_noise(img, rng, mean=0.0, var=0.0002):
    """Additive gaussian noise (reference data/augmentations.py:428-453)."""
    if rng.randint(3) < 1:
        x = img / 255.0
        v = rng.randint(5, 11) * var
        noise = rng.normal(mean, v ** 0.5, x.shape)
        out = np.clip(x + noise, -1.0 if (x + noise).min() < 0 else 0.0, 1.0)
        return (out * 255).astype(np.float32)
    return img


def resize_square(cfg, img, depth, masks, boxes, labels, plane_paras):
    """Resize to max_size x max_size and drop degenerate boxes
    (reference Resize, data/augmentations.py:140-181)."""
    img_h, img_w = img.shape[:2]
    size = cfg.max_size
    if img_h != size and img_w != size:
        img = cv2.resize(img, (size, size))
        depth = cv2.resize(depth, (size, size))
        if masks.size:
            m = masks.transpose(1, 2, 0)
            m = cv2.resize(m, (size, size))
            masks = m[None] if m.ndim == 2 else m.transpose(2, 0, 1)
        else:
            masks = np.zeros((0, size, size), masks.dtype)
        boxes = boxes.copy()
        boxes[:, [0, 2]] *= size / img_w
        boxes[:, [1, 3]] *= size / img_h

    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    keep = (w > cfg.discard_box_width) & (h > cfg.discard_box_height)
    masks = masks[keep]
    boxes = boxes[keep]
    labels = labels[keep]
    if plane_paras is not None and plane_paras.size:
        plane_paras = plane_paras[keep]
    return img, depth, masks, boxes, labels, plane_paras


def backbone_transform(cfg, img, mean, std):
    """Normalise + channel permutation (reference BackboneTransform,
    data/augmentations.py:359-394). Input float BGR [0,255], output RGB."""
    t = cfg.backbone.transform
    img = img.astype(np.float32)
    if t.normalize:
        img = (img - mean) / std
    elif t.subtract_means:
        img = img - mean
    elif t.to_float:
        img = img / 255.0
    if t.channel_order == "RGB":
        img = img[:, :, ::-1]
    return np.ascontiguousarray(img, np.float32)
